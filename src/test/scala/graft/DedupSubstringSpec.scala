package graft

import graft.operators.Dedup

/** dedup_substring semantics on hand-built corpora: coverage is the
  * interval UNION of duplicated 8-token windows, duplication means ≥2
  * DISTINCT documents (verbatim copies included; within-doc repetition
  * excluded), and verbatim-duplicate groups are fully covered without
  * running the window stage over every copy.
  */
class DedupSubstringSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    Dedup.dedupSubstringDf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("a shared 8-token run covers exactly its span in both docs") {
    val out = run(Seq(
      1L -> "a b c d e f g h x y z",
      2L -> "p q a b c d e f g h r",
      3L -> "one two three"))
    assert(out(1L) == ((11L, 8L, 0.727273)))
    assert(out(2L) == ((11L, 8L, 0.727273)))
    assert(out(3L) == ((3L, 0L, 0.0))) // too short for any window
  }

  test("overlapping duplicated windows union, not sum") {
    // a 10-token shared run yields 3 overlapping windows; coverage is 10
    val shared = (1 to 10).map("t" + _).mkString(" ")
    val out = run(Seq(
      1L -> s"$shared u1 u2",
      2L -> s"v1 $shared"))
    assert(out(1L) == ((12L, 10L, 0.833333)))
    assert(out(2L) == ((11L, 10L, 0.909091)))
  }

  test("verbatim duplicates are fully covered; short verbatim pairs are not") {
    val nine = (1 to 9).map("d" + _).mkString(" ")
    val five = (1 to 5).map("e" + _).mkString(" ")
    val out = run(Seq(1L -> nine, 2L -> nine, 3L -> five, 4L -> five))
    assert(out(1L) == ((9L, 9L, 1.0)))
    assert(out(2L) == ((9L, 9L, 1.0)))
    assert(out(3L) == ((5L, 0L, 0.0))) // no 8-token window exists
    assert(out(4L) == ((5L, 0L, 0.0)))
  }

  test("within-document repetition alone is not duplication") {
    val run8 = (1 to 8).map("m" + _).mkString(" ")
    val out = run(Seq(1L -> s"$run8 z $run8", 2L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
    assert(out(1L)._2 == 0L)
    assert(out(2L)._2 == 0L)
  }

  test("a single-member doc sharing a window with a verbatim group is covered") {
    val nine = (1 to 9).map("g" + _).mkString(" ")
    // docs 1/2 are verbatim copies; doc 3 shares their first 8 tokens
    val eight = (1 to 8).map("g" + _).mkString(" ")
    val out = run(Seq(1L -> nine, 2L -> nine, 3L -> s"$eight tail1 tail2"))
    assert(out(1L) == ((9L, 9L, 1.0)))
    assert(out(2L) == ((9L, 9L, 1.0)))
    assert(out(3L) == ((10L, 8L, 0.8)))
  }
}
