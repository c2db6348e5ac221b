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

  test("search_highlights spans replicate the reference regex semantics") {
    // python replica: re.finditer(rf"\b{re.escape(t)}\b", text, IGNORECASE)
    // spans capped at 8 — expressed with the equivalent Java regex
    def refSpans(text: String, t: String): Seq[(Long, Long)] = {
      val m = java.util.regex.Pattern
        .compile("\\b" + java.util.regex.Pattern.quote(t) + "\\b",
          java.util.regex.Pattern.CASE_INSENSITIVE)
        .matcher(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (m.find() && out.length < Search.MaxHitsPerTerm)
        out += ((m.start.toLong, m.end.toLong))
      out.toSeq
    }
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Search.searchHighlights(spark, dir).collect()
      .groupBy(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getAs[Long]("span_idx"))
          .map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSeq
      }
    val topIds = Search.searchPreview(spark, dir).collect().map(_.getAs[Long]("doc_id"))
    assert(topIds.nonEmpty)
    var checked = 0
    topIds.foreach { id =>
      val preview = {
        val full = texts(id)
        if (full.length > Search.PreviewLen) full.take(Search.PreviewLen) + "…" else full
      }
      Search.QueryText.split(" ").foreach { t =>
        val want = refSpans(preview, t)
        val have = got.getOrElse((id, t), Seq.empty)
        assert(have == want, s"doc $id term $t")
        checked += have.length
      }
    }
    assert(checked > 0, "expected at least one highlight span in the top-k")
  }

  test("highlight span kernel: boundaries, case, cap, edges") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    def spans(text: String, t: String): Seq[(Long, Long)] =
      Seq(text).toDF("x")
        .select(graft.functions.HighlightSpans.column(col("x"), t, 8).as("sp"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
    assert(spans("Spark sparks the spark.", "spark") == Seq((0L, 5L), (17L, 22L)))
    assert(spans("a-spark_b spark", "spark") == Seq((10L, 15L))) // _b glues; -spark doesn't
    assert(spans("spark", "spark") == Seq((0L, 5L)))
    assert(spans("", "spark").isEmpty)
    assert(spans("no match here", "spark").isEmpty)
    assert(spans(Seq.fill(12)("spark").mkString(" "), "spark").length == 8) // cap
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
