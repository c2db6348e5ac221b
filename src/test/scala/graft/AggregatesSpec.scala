package graft

import org.apache.spark.sql.functions._

import graft.functions.BoundedSortedCollect

/** BoundedSortedCollect: the single-pass stop-bucket guard.
  * Pins the two invariants dedup_minhash / dedup_embedding_lsh rely on:
  * under-cap groups come back EXACT (sorted collect_list semantics) and
  * over-cap groups saturate at exactly cap+1 smallest values.
  */
class AggregatesSpec extends SparkSpec {

  test("under-capacity groups equal array_sort(collect_list) exactly") {
    val s = spark
    import s.implicits._
    // Deterministic pseudo-random (key, value) rows, every group under cap.
    val df = s.range(0, 5000)
      .select((col("id") % 37).as("k"),
        pmod(xxhash64(col("id")), lit(1000000L)).as("v"))
      .repartition(8)
    val got = df.groupBy("k")
      .agg(BoundedSortedCollect.column(col("v"), 1000).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.groupBy("k")
      .agg(array_sort(collect_set(col("v"))).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want)
  }

  test("over-capacity groups saturate at the maxSize smallest values") {
    val s = spark
    import s.implicits._
    // One group with 500 distinct values, shuffled across 16 partitions so
    // merge() paths execute; cap 101 (the dedup MaxBucketSize+1 shape).
    val df = s.range(0, 500)
      .select(lit(0L).as("k"), xxhash64(col("id")).as("v"))
      .repartition(16)
    val row = df.groupBy("k")
      .agg(BoundedSortedCollect.column(col("v"), 101).as("ids"))
      .collect().head
    val got = row.getSeq[Long](1)
    val want = df.select("v").collect().map(_.getLong(0)).sorted.take(101).toSeq
    assert(got.size == 101, "saturated group must hold exactly maxSize values")
    assert(got == want, "saturated contents must be the globally smallest ids")
  }

  test("size-filter keeps exactly the under-cap groups (guard equivalence)") {
    val s = spark
    import s.implicits._
    // Groups of size 1, 2, cap, cap+1, 3*cap — the filter must keep only
    // those with true size in [2, cap].
    val cap = 10
    val sizes = Seq(1, 2, cap, cap + 1, 3 * cap)
    val rows = sizes.zipWithIndex.flatMap { case (n, k) =>
      (0 until n).map(i => (k.toLong, (k * 1000 + i).toLong))
    }
    val df = rows.toDF("k", "v").repartition(8)
    val kept = df.groupBy("k")
      .agg(BoundedSortedCollect.column(col("v"), cap + 1).as("ids"))
      .filter(size(col("ids")).between(2, cap))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"expected groups of size 2 and $cap, got $kept")
  }

  test("rows variant equals array_sort(collect_list(struct)) under capacity") {
    val s = spark
    import s.implicits._
    val df = s.range(0, 3000)
      // doc_id must be UNIQUE per group (the aggregate's contract; LSH
      // buckets hold one row per doc): odd-constant multiply is a
      // bijection on longs, so ids are distinct but sort-shuffled.
      .select((col("id") % 23).as("k"),
        struct((col("id") * 2654435761L).as("doc_id"),
          array(col("id"), col("id") * 2).as("cs")).as("r"))
      .repartition(8)
    val got = df.groupBy("k")
      .agg(graft.functions.BoundedSortedCollectRows.column(col("r"), 1000).as("ids"))
      .selectExpr("k", "transform(ids, x -> x.doc_id) AS ids", "transform(ids, x -> x.cs) AS cs")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Seq[Long]](2))).toMap
    val want = df.groupBy("k")
      .agg(array_sort(collect_list(col("r"))).as("ids"))
      .selectExpr("k", "transform(ids, x -> x.doc_id) AS ids", "transform(ids, x -> x.cs) AS cs")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Seq[Long]](2))).toMap
    assert(got == want)
  }

  test("rows variant saturates at maxSize smallest-id rows across partitions") {
    val s = spark
    import s.implicits._
    val df = s.range(0, 400)
      .select(lit(0L).as("k"),
        struct(xxhash64(col("id")).as("doc_id"), col("id").as("payload")).as("r"))
      .repartition(16)
    val row = df.groupBy("k")
      .agg(graft.functions.BoundedSortedCollectRows.column(col("r"), 101).as("ids"))
      .selectExpr("transform(ids, x -> x.doc_id) AS ids").collect().head
    val got = row.getSeq[Long](0)
    val want = df.selectExpr("r.doc_id").collect().map(_.getLong(0)).sorted.take(101).toSeq
    assert(got.size == 101 && got == want)
  }

  test("rows variant rejects a non-struct or non-bigint-led child") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k")
        .agg(graft.functions.BoundedSortedCollectRows.column(struct(col("v")), 5))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("rejects a non-bigint child with a typed analysis error") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "x")).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(BoundedSortedCollect.column(col("v"), 5)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }
}
