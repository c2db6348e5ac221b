package graft

import graft.functions.PrefixSum

/** The distributed exclusive prefix sum must agree exactly with the naive
  * ordered running sum, for any bucketing — the bucket decomposition is an
  * execution detail, never a semantics change.
  */
class PrefixSumSpec extends SparkSpec {

  private def check(rows: Seq[(Long, Long)], bucket: Long): Unit = {
    import spark.implicits._
    val df = rows.toDF("id", "v")
    val got = PrefixSum.exclusive(df, "id", "v", "pre", bucket)
      .select("id", "pre").as[(Long, Long)].collect().toMap
    val sorted = rows.sortBy(_._1)
    val expect = sorted.map(_._1)
      .zip(sorted.map(_._2).scanLeft(0L)(_ + _))
      .toMap
    assert(got == expect, s"bucket=$bucket mismatch")
  }

  test("dense ids, bucket small enough to exercise all three levels") {
    val rows = (0L until 100L).map(i => i -> (i * 7 % 13))
    check(rows, bucket = 4L) // b²=16 → seven b2 groups, 25 b1 groups
  }

  test("sparse ids: empty buckets shift nothing") {
    val rows = (0L until 40L).map(i => (i * i) -> (i % 5 + 1L))
    check(rows, bucket = 8L)
    check(rows, bucket = 3L)
  }

  test("production bucket on a small frame (single-bucket degenerate case)") {
    val rows = Seq(5L -> 10L, 1L -> 3L, 9L -> 7L, 3L -> 1L)
    check(rows, bucket = PrefixSum.Bucket)
  }

  test("reserved intermediate names collide loudly, never silently corrupt") {
    import spark.implicits._
    val df = Seq((1L, 2L, 9L)).toDF("id", "v", "__b1")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.exclusive(df, "id", "v", "pre")
    }
    assert(e.getMessage.contains("__b1"))
  }

  test("payload columns pass through untouched") {
    import spark.implicits._
    val df = Seq((3L, 1L, "x"), (1L, 5L, "y")).toDF("id", "v", "tag")
    val got = PrefixSum.exclusive(df, "id", "v", "pre")
      .select("id", "pre", "tag").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, "y"), (3L, 5L, "x")))
  }

  test("unordered, non-contiguous input partitions do not change the result") {
    import spark.implicits._
    val rows = scala.util.Random.shuffle((0L until 300L).toList)
      .map(i => i -> (i % 17 + 1L))
    val df = rows.toDF("id", "v").repartition(7)
    val got = PrefixSum.exclusive(df, "id", "v", "pre", 16L)
      .select("id", "pre").as[(Long, Long)].collect().toMap
    val sorted = rows.sortBy(_._1)
    val expect = sorted.map(_._1)
      .zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
    assert(got == expect)
  }
}
