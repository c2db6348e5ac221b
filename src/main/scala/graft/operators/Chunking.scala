package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextChunk
import graft.sources.Tables

/** Chunking + chunk analytics, re-expressing the reference ingest/analytics
  * surface (`/root/reference/app/ingest/chunker.py`,
  * `/root/reference/app/api/analytics.py:106-135`) Spark-first.
  *
  * chunk_fixed is a pure column program (sequence + posexplode + substring):
  * it stays inside WholeStageCodegen, is a narrow map (zero shuffle), and at
  * 100 TB scales linearly with input splits. The sentence/heading variants
  * need real regex state machines, so they run as Scala UDFs — still narrow
  * maps, still embarrassingly parallel; a native Catalyst Expression is the
  * upgrade path if they ever dominate a profile.
  */
object Chunking {

  val Size = 100
  val Overlap = 20
  val Step: Int = Size - Overlap

  // chunk_preview params (reference api/chunk_preview.py: try params on a
  // small sample before building).
  val PreviewSize = 50
  val PreviewOverlap = 10
  val PreviewDocs = 5

  /** Fixed-size char windows with overlap as columns only.
    * Window starts are 0, step, 2*step, …; the reference loop
    * (chunker.py:14-21) emits `1 + ceil((n-size)/step)` chunks for n > size,
    * which in exact integer form is `1 + (n - size + step - 1) div step`.
    */
  def chunkFixedDf(docs: DataFrame, size: Int = Size, overlap: Int = Overlap): DataFrame = {
    val step = size - overlap
    val n = length(col("text"))
    val nchunks = when(n <= size, lit(1L))
      .otherwise(lit(1L) + ((n - size + (step - 1)).cast("long")) / step cast "long")
    docs
      .withColumn("j", explode(sequence(lit(0L), nchunks - 1)))
      .withColumn("chunk", substring(col("text"), (col("j") * step + 1).cast("int"), lit(size)))
      .withColumn("chunk_id", concat_ws("#", col("doc_id").cast("string"), col("j").cast("string")))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** SURVEY §2 `chunk_fixed`: chunk every document, id = `{doc}#{j}`. */
  def chunkFixed(spark: SparkSession, dir: String): DataFrame =
    chunkFixedDf(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("chunk_id"), col("doc_id"), col("j"), col("chunk"), col("chunk_len"))

  /** `chunk_preview` (reference `api/chunk_preview.py`): try alternative
    * chunking params on a small sample of documents — same column program
    * with (size=50, overlap=10) over doc_id < 5.
    */
  def chunkPreview(spark: SparkSession, dir: String): DataFrame =
    chunkFixedDf(
      Tables.documents(spark, dir).select(col("doc_id"), col("text"))
        .filter(col("doc_id") < PreviewDocs),
      PreviewSize, PreviewOverlap)
      .select(col("chunk_id"), col("doc_id"), col("j"), col("chunk"), col("chunk_len"))

  private def chunkUdfQuery(spark: SparkSession, dir: String,
                            kernel: String => Seq[String]): DataFrame = {
    val chunker = udf(kernel)
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(chunker(col("text"))).as(Seq("j", "chunk")))
      .select(
        concat_ws("#", col("doc_id").cast("string"), col("j").cast("string")).as("chunk_id"),
        col("doc_id"), col("j").cast("long").as("j"), col("chunk"),
        length(col("chunk")).as("chunk_len"))
  }

  /** SURVEY §2 `chunk_sentences` (rows-only oracle). */
  def chunkSentences(spark: SparkSession, dir: String): DataFrame =
    chunkUdfQuery(spark, dir, TextChunk.chunkSentences(_, Size, Overlap))

  /** SURVEY §2 `chunk_headings` (rows-only oracle). */
  def chunkHeadings(spark: SparkSession, dir: String): DataFrame =
    chunkUdfQuery(spark, dir, TextChunk.chunkByHeadings(_, Size, Overlap))

  /** SURVEY §2 `chunk_stats`: per-source chunk-length stats with the
    * reference's linear-interpolation p95 (analytics.py:106-115), computed
    * with the SAME arithmetic the DuckDB oracle uses so doubles are
    * bit-identical: k = (cnt-1)*0.95; p95 = lo + (hi-lo)*(k-floor(k)).
    * One shuffle on source for the rank, one for the agg — at scale the
    * rank-based percentile avoids collecting per-group arrays.
    */
  def chunkStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text"))
    val chunks = chunkFixedDf(docs).select(col("source"), col("chunk_len").as("len"))
    val bySrc = Window.partitionBy(col("source"))
    val ranked = chunks
      .withColumn("rn", row_number().over(bySrc.orderBy(col("len"))))
      .withColumn("cnt", count(lit(1)).over(bySrc))
      .withColumn("k", (col("cnt") - 1).cast("double") * 0.95)
    ranked.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        min(col("len")).cast("long").as("len_min"),
        max(col("len")).cast("long").as("len_max"),
        (sum(col("len")).cast("double") / count(lit(1))).as("len_avg"),
        max(when((col("rn") - 1).cast("double") === floor(col("k")), col("len"))).as("lo"),
        max(when((col("rn") - 1).cast("double") === ceil(col("k")), col("len"))).as("hi"),
        max(col("k")).as("kk"))
      .select(col("source"), col("n_chunks"), col("len_min"), col("len_max"), col("len_avg"),
        (col("lo") + (col("hi") - col("lo")) * (col("kk") - floor(col("kk")))).as("len_p95"))
  }

  /** SURVEY §2 `chunk_histogram`: the reference's 20-bin integer-step
    * histogram (analytics.py:118-135): step = max(1, ceil((max-min)/20));
    * x==vmax lands in the last bin; all 20 bins emitted, zeros included.
    * Global min/max is a 2-value broadcastable agg; the bin count is one
    * shuffle keyed on bin (≤20 groups).
    */
  def chunkHistogram(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkFixedDf(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("chunk_len").as("len"))
    val ext = chunks.agg(min(col("len")).as("vmin"), max(col("len")).as("vmax"))
    val counts = chunks.crossJoin(broadcast(ext))
      .withColumn("step", greatest(lit(1L), (col("vmax") - col("vmin") + 19) / 20 cast "long"))
      .withColumn("bin",
        when(col("vmin") === col("vmax"), lit(0L))
          .otherwise(when(col("len") === col("vmax"), lit(19L))
            .otherwise(least(lit(19L), ((col("len") - col("vmin")).cast("long") / col("step")).cast("long")))))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val bins = spark.range(0, 20).select(col("id").as("bin")).crossJoin(broadcast(ext))
      .withColumn("step", greatest(lit(1L), (col("vmax") - col("vmin") + 19) / 20 cast "long"))
      .filter(col("vmin") =!= col("vmax") || col("bin") === 0)
    bins.join(counts, Seq("bin"), "left")
      .select(
        col("bin"),
        (col("vmin") + col("bin") * col("step")).as("lo"),
        when(col("vmin") === col("vmax"), col("vmax"))
          .otherwise(when(col("bin") === 19, col("vmax"))
            .otherwise(col("vmin") + (col("bin") + 1) * col("step"))).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
