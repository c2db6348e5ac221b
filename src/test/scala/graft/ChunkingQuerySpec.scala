package graft

import graft.functions.TextChunk
import graft.operators.Chunking
import graft.sources.Tables

/** The chunk_fixed column program must agree exactly with the pure Scala
  * kernel (which is itself reference-parity-tested) on real data.
  */
class ChunkingQuerySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("chunk_fixed column program == TextChunk.chunkFixed kernel") {
    val got = Chunking.chunkFixed(spark, dir)
      .collect().map(r => (r.getAs[String]("chunk_id"), r.getAs[String]("chunk"))).toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      TextChunk.chunkFixed(text, Chunking.Size, Chunking.Overlap)
        .zipWithIndex.map { case (c, j) => (s"$id#$j", c) }
    }.toMap
    assert(got == want)
  }

  test("chunk_stats p95 sits within [min,max] and avg is consistent") {
    val rows = Chunking.chunkStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("len_min"), r.getAs[Long]("len_max"))
      val p95 = r.getAs[Double]("len_p95")
      assert(p95 >= mn && p95 <= mx, s"p95 $p95 outside [$mn,$mx]")
      assert(r.getAs[Double]("len_avg") >= mn && r.getAs[Double]("len_avg") <= mx)
    }
  }

  test("chunk_histogram bins cover all chunks exactly once") {
    val hist = Chunking.chunkHistogram(spark, dir).collect()
    assert(hist.length == 20)
    val total = hist.map(_.getAs[Long]("n")).sum
    val chunks = Chunking.chunkFixed(spark, dir).count()
    assert(total == chunks)
  }
}
