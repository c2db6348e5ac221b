package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tabular ingest + normalization (reference `app/ingest/reader.py` +
  * `normalize.py:3-7`): read a file into a DataFrame, strip/clean column
  * names, drop all-null rows. CSV/JSON/parquet/text are Spark-native
  * distributed readers; the office formats (xlsx/docx/html) need codec
  * libraries this container doesn't ship, so they fail fast with a clear
  * message (the reference parses them driver-side with pandas — at 100 TB
  * they'd be converted to a splittable format upstream anyway).
  */
object Readers {

  /** normalize_df semantics: trim + newline-strip column names, drop rows
    * where every column is null.
    */
  def normalize(df: DataFrame): DataFrame = {
    val renamed = df.columns.foldLeft(df) { (d, c) =>
      d.withColumnRenamed(c, c.trim.replace("\n", " "))
    }
    renamed.na.drop("all")
  }

  def readCsv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.option("header", "true").option("inferSchema", "true").csv(path))

  def readJson(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.json(path))

  def readParquet(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.parquet(path))

  /** One row per line, like the reference's plain-text fallback. */
  def readText(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.text(path).withColumnRenamed("value", "text"))

  /** Dependency-free HTML ingest (reference `reader.py:10-20`: parse HTML
    * to text, decoding with errors-ignore): one row per file (wholetext —
    * tags span lines), drop script/style/comment blocks, strip tags,
    * decode the common entities, collapse whitespace. Malformed bytes are
    * replaced by the text reader (the decode-ignore analogue). A regex
    * strip is not a full HTML5 parser — it is the reference's "get the
    * visible text" behavior without a parser dependency; real pipelines
    * convert office formats upstream (SURVEY §3).
    */
  def readHtml(spark: SparkSession, path: String): DataFrame = {
    val stripped = Seq(
      "(?is)<(script|style)[^>]*>.*?</\\1\\s*>" -> " ",
      "(?s)<!--.*?-->" -> " ",
      "(?s)<[^>]*>" -> " "
    ).foldLeft(col("value")) { case (c, (re, rep)) => regexp_replace(c, re, rep) }
    val entities = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(stripped) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    normalize(spark.read.option("wholetext", "true").text(path)
      .select(trim(regexp_replace(entities, "\\s+", " ")).as("text"))
      .filter(length(col("text")) > 0))
  }

  def read(spark: SparkSession, path: String, format: String): DataFrame =
    format.toLowerCase match {
      case "csv" => readCsv(spark, path)
      case "json" | "jsonl" => readJson(spark, path)
      case "parquet" => readParquet(spark, path)
      case "text" | "txt" => readText(spark, path)
      case "html" | "htm" => readHtml(spark, path)
      case f @ ("xlsx" | "docx") =>
        throw new UnsupportedOperationException(
          s"$f ingestion requires a parser dependency not present in this build; " +
            "convert to csv/json/parquet upstream")
      case f => throw new IllegalArgumentException(s"unknown format: $f")
    }
}
