package graft

import graft.operators.{Chunking, Search}
import graft.functions.TextChunk
import graft.sources.Tables

class PreviewSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("search_preview slices at 220 chars with ellipsis, like the reference") {
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Search.searchPreview(spark, dir).collect()
    assert(rows.length == Search.BmK)
    rows.foreach { r =>
      val full = texts(r.getAs[Long]("doc_id"))
      val preview = r.getAs[String]("preview")
      if (full.length > Search.PreviewLen)
        assert(preview == full.take(Search.PreviewLen) + "…")
      else assert(preview == full)
      Search.QueryText.split(" ").foreach { t =>
        val hits = r.getAs[Long](s"hits_$t")
        assert(hits >= 0 && hits <= Search.MaxHitsPerTerm)
      }
    }
  }

  test("chunk_preview applies the alternative params to the doc sample") {
    val rows = Chunking.chunkPreview(spark, dir).collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).distinct.sorted
    assert(ids.forall(_ < Chunking.PreviewDocs))
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      val got = rows.filter(_.getAs[Long]("doc_id") == id)
        .sortBy(_.getAs[Long]("j")).map(_.getAs[String]("chunk")).toSeq
      assert(got == TextChunk.chunkFixed(texts(id),
        Chunking.PreviewSize, Chunking.PreviewOverlap))
    }
  }
}
