package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tabular ingest + normalization (reference `app/ingest/reader.py` +
  * `normalize.py:3-7`): read a file into a DataFrame, strip/clean column
  * names, drop all-null rows. CSV/JSON/parquet/text are Spark-native
  * distributed readers; xlsx/docx/html parse dependency-free (zip + JDK
  * SAX, [[OfficeParsers]]) over `binaryFile` rows, so a DIRECTORY of
  * office files fans out one file per task — a single file is inherently
  * unsplittable (it's one zip), which is also true of the reference's
  * driver-side pandas read.
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

  /** File bytes, one row per file — the distribution unit for the office
    * formats (each file parses inside one task; a directory scales out).
    */
  private def binaryFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path).select(col("path"), col("content"))

  /** Spreadsheet ingest (reference `reader.py:153-154`: `pd.read_excel` —
    * first sheet, first row = header), shared by the xlsx and legacy xls
    * paths; `parse` is the per-file grid codec. Schema discovery is
    * bounded driver work: the header row comes from the
    * lexicographically-first file; every file's data rows then parse
    * distributed and are fitted to that header (extra cells dropped,
    * missing cells null — the multi-shard contract). All columns are
    * strings (csv-without-inferSchema convention).
    */
  private def readGrid(spark: SparkSession, path: String, fmt: String)(
      parse: Array[Byte] => Seq[Seq[String]]): DataFrame = {
    val bin = binaryFiles(spark, path)
    val firstBytes = bin.orderBy(col("path")).limit(1).collect()
    require(firstBytes.nonEmpty, s"no files under $path")
    val header = parse(firstBytes(0).getAs[Array[Byte]]("content"))
      .headOption.getOrElse(Seq.empty)
    require(header.nonEmpty, s"first $fmt under $path has no header row")
    val names = header.zipWithIndex.map { case (h, i) =>
      if (h == null || h.trim.isEmpty) s"col$i" else h
    }
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val n = names.length
    val parsed = bin.select(col("content")).as(Encoders.BINARY)
      .flatMap { bytes =>
        parse(bytes).drop(1).map { cells =>
          Row.fromSeq(cells.padTo(n, null).take(n))
        }
      }(Encoders.row(schema))
    normalize(parsed.toDF())
  }

  def readXlsx(spark: SparkSession, path: String): DataFrame =
    readGrid(spark, path, "xlsx")(OfficeParsers.parseXlsx)

  /** Legacy `.xls` (Excel 97-2003, OLE2/BIFF8) ingest via the
    * dependency-free [[XlsParser]]; same header-fit contract as
    * [[readXlsx]] (reference `reader.py:153` routes `.xls` through the
    * same `pd.read_excel` call as `.xlsx`).
    */
  def readXls(spark: SparkSession, path: String): DataFrame =
    readGrid(spark, path, "xls")(XlsParser.parseXls)

  /** DOCX ingest: `word/document.xml` → visible text, one row per file
    * (the reference's one-document-one-text convention for txt/md), parsed
    * distributed per file.
    */
  def readDocx(spark: SparkSession, path: String): DataFrame = {
    val parsed = binaryFiles(spark, path).select(col("content")).as(Encoders.BINARY)
      .map(bytes => OfficeParsers.parseDocx(bytes))(Encoders.STRING)
      .toDF("text")
      .filter(length(trim(col("text"))) > 0)
    normalize(parsed)
  }

  /** Compiled HTML Help ingest via the dependency-free [[ChmParser]]
    * (ITSF container + [[Lzx]] decompression): one row per HTML-family
    * entry, `path` = `<archive file name>/<entry path>` so rows from a
    * directory of .chm files stay attributed to their source archive
    * (same-named entries in different archives remain distinct) — the
    * reference's post-decompile shape (`reader.py:60-80`; there it needs
    * Windows `hh.exe` or 7-Zip and raises otherwise; here it parses
    * in-process). A directory of .chm files fans out one file per task
    * like the other office formats.
    *
    * Memory bound: each archive's LZX content section is decompressed
    * in-memory on its task (capped at 2× [[ChmParser.MaxChmBytes]], i.e.
    * 200 MB uncompressed, before the per-file HTML byte cap applies) —
    * a .chm is a help FILE, not a dataset; archives past the cap fail
    * that task with a clear message rather than silently truncating.
    */
  def readChm(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val parsed = binaryFiles(spark, path)
      .select(col("path"), col("content"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (src, bytes) =>
        val archive = src.substring(src.lastIndexOf('/') + 1)
        ChmParser.parseChm(bytes).map { case (p, t) => Row(s"$archive/$p", t) }
      }(Encoders.row(schema))
    normalize(parsed.toDF())
  }

  /** The reference's `read_any` (`reader.py:140-161`): dispatch on the
    * file suffix. `.md` rides the plain-text handler, as there.
    */
  def readAny(spark: SparkSession, path: String): DataFrame = {
    val dot = path.lastIndexOf('.')
    require(dot >= 0 && dot < path.length - 1, s"no file suffix to dispatch on: $path")
    read(spark, path, path.substring(dot + 1).toLowerCase match {
      case "md" => "text"
      case e    => e
    })
  }

  def read(spark: SparkSession, path: String, format: String): DataFrame =
    format.toLowerCase match {
      case "csv" => readCsv(spark, path)
      case "json" | "jsonl" => readJson(spark, path)
      case "parquet" => readParquet(spark, path)
      case "text" | "txt" => readText(spark, path)
      case "html" | "htm" => readHtml(spark, path)
      case "xlsx" => readXlsx(spark, path)
      case "xls" => readXls(spark, path)
      case "docx" => readDocx(spark, path)
      case "chm" => readChm(spark, path)
      case f => throw new IllegalArgumentException(s"unknown format: $f")
    }
}
