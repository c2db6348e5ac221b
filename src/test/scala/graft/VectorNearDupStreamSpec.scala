package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.VectorStream

case class TimedVec(vec_id: Long, ts: Timestamp, embedding: Array[Float])

/** Streaming embedding-LSH near-dup candidates: batch parity against the
  * bucket pair set of [[Dedup.dedupEmbeddingLsh]] on the real testdata
  * embeddings.
  */
class VectorNearDupStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val T0 = 1700000000000L

  test("streamed candidate pairs match the batch chunk-bucket pair set") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val embs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dim = embs.head._2.length

    val mem = MemoryStream[TimedVec]
    mem.addData(embs.map { case (id, v) =>
      TimedVec(id, new Timestamp(T0 + id), v) }.toIndexedSeq: _*)
    val q = VectorStream.nearDupCandidates(mem.toDF(), dim)
      .writeStream.format("memory").queryName("vec_neardup").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vec_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    // batch reference: the chunk-bucket candidate pairs (pre-verify) —
    // replicate with the same hyperplanes and packing
    val planes = Array.tabulate(Dedup.EmbLshBits, dim)((k, j) => Dedup.hyperplane(k, j))
    def keys(v: Array[Float]): Seq[(Int, Long)] = {
      val ks = new Array[Long](Dedup.EmbLshBits / Dedup.EmbLshChunkBits)
      for (k <- 0 until Dedup.EmbLshBits) {
        var acc = 0.0
        for (j <- 0 until dim) acc += v(j).toDouble * planes(k)(j)
        if (acc >= 0.0) ks(k / Dedup.EmbLshChunkBits) |= 1L << (k % Dedup.EmbLshChunkBits)
      }
      ks.zipWithIndex.map { case (key, c) => (c, key) }.toSeq
    }
    val buckets = embs.flatMap { case (id, v) => keys(v).map(ck => ck -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      .filter { case (_, ids) => ids.length >= 2 && ids.length <= Dedup.MaxBucketSize }
    val want = buckets.values.flatMap { ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    assert(streamed == want)
    assert(want.nonEmpty, "testdata should produce at least one candidate")
  }

  test("grouped vector stream: a duplicate-vector flood emits one rep pair") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val dim = 8
    val base = Array.tabulate(dim)(j => (0.3f + 0.05f * j))
    val near = base.clone(); near(0) = base(0) + 1e-4f // same signs -> same buckets
    val far = Array.tabulate(dim)(j => (if (j % 2 == 0) -1f else 1f) * (1f + j))
    // 40 byte-identical copies + 1 near-dup + 1 unrelated
    val vecs = (0L until 40L).map(i => TimedVec(i, new Timestamp(T0 + i), base)) ++
      Seq(TimedVec(40L, new Timestamp(T0 + 40), near),
        TimedVec(41L, new Timestamp(T0 + 41), far))
    val mem = MemoryStream[TimedVec]
    mem.addData(vecs: _*)
    val q = VectorStream.nearDupCandidatesGrouped(mem.toDF(), dim)
      .writeStream.format("memory").queryName("vec_neardup_grouped")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("vec_neardup_grouped").collect()
      .map(r => (r.getAs[Long]("rep_a"), r.getAs[Long]("rep_b")))
    // the 40-copy group pairs once per shared chunk-band with the near-dup,
    // never within itself; the unrelated vector shares no full chunk
    assert(rows.toSet == Set((0L, 40L)))
    assert(rows.length <= Dedup.EmbLshBits / Dedup.EmbLshChunkBits,
      s"raw emissions ${rows.length} exceed the chunk-band count")
  }
}
