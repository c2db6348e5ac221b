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

  def read(spark: SparkSession, path: String, format: String): DataFrame =
    format.toLowerCase match {
      case "csv" => readCsv(spark, path)
      case "json" | "jsonl" => readJson(spark, path)
      case "parquet" => readParquet(spark, path)
      case "text" | "txt" => readText(spark, path)
      case f @ ("xlsx" | "docx" | "html") =>
        throw new UnsupportedOperationException(
          s"$f ingestion requires a parser dependency not present in this build; " +
            "convert to csv/json/parquet upstream")
      case f => throw new IllegalArgumentException(s"unknown format: $f")
    }
}
