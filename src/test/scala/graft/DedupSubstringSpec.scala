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

  private def spans(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] = {
    import spark.implicits._
    Dedup.dedupSubstringSpansDf(docs.toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
  }

  test("spans: a shared run yields one merged range at its position") {
    val shared = (1 to 10).map("t" + _).mkString(" ")
    val out = spans(Seq(
      1L -> s"$shared u1 u2",   // run at tokens [0, 10)
      2L -> s"v1 $shared"))     // run at tokens [1, 11)
    assert(out(1L) == Set((0L, 10L)))
    assert(out(2L) == Set((1L, 11L)))
  }

  test("spans: disjoint duplicated runs stay separate islands") {
    val a = (1 to 8).map("a" + _).mkString(" ")
    val b = (1 to 8).map("b" + _).mkString(" ")
    // doc 1 carries both runs separated by a 3-token gap; docs 2/3 carry one each
    val out = spans(Seq(
      1L -> s"$a gap1 gap2 gap3 $b",
      2L -> s"$a tailx taily tailz",
      3L -> s"lead1 lead2 lead3 $b"))
    assert(out(1L) == Set((0L, 8L), (11L, 19L)))
    assert(out(2L) == Set((0L, 8L)))
    assert(out(3L) == Set((3L, 11L)))
  }

  test("spans: verbatim duplicates emit the closed-form full span") {
    val nine = (1 to 9).map("d" + _).mkString(" ")
    val out = spans(Seq(1L -> nine, 2L -> nine))
    assert(out(1L) == Set((0L, 9L)) && out(2L) == Set((0L, 9L)))
  }

  test("spans: total span tokens equal dedup_substring's dup_tokens") {
    val shared = (1 to 10).map("t" + _).mkString(" ")
    val docs = Seq(1L -> s"$shared u1 u2", 2L -> s"v1 $shared", 3L -> "one two three")
    val cov = run(docs).map { case (id, (_, dup, _)) => id -> dup }
    val sp = spans(docs)
    docs.foreach { case (id, _) =>
      val total = sp.getOrElse(id, Set.empty).toSeq.map { case (s, e) => e - s }.sum
      assert(total == cov(id), s"doc $id: spans $total vs coverage ${cov(id)}")
    }
  }

  test("spans on real data: per-doc ranges are disjoint, ordered gaps > 0, in bounds") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val ntok = run(docs.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq)
      .map { case (id, (n, _, _)) => id -> n }
    val sp = Dedup.dedupSubstringSpansDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sp.nonEmpty, "no duplicated spans at sf0.001 — signal lost")
    sp.groupBy(_._1).foreach { case (id, rows) =>
      val ranges = rows.map(r => (r._2, r._3)).sortBy(_._1)
      ranges.foreach { case (s, e) =>
        assert(s >= 0 && e > s && e <= ntok(id), s"doc $id span [$s,$e) vs ntok ${ntok(id)}")
      }
      ranges.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(s2 > e1, s"doc $id: spans not disjoint/merged ($e1 vs $s2)")
        case _ =>
      }
    }
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
