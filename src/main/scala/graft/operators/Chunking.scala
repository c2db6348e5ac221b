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

  /** SURVEY §2 `chunk_boilerplate`: per-document share of chunks that
    * recur in OTHER documents — the C4-style boilerplate signal (headers,
    * footers, navigation shared across pages show up as corpus-duplicated
    * windows). Chunks key on their [[graft.operators.TextOps.fingerprint]]
    * rolling hash, so the duplicate-count shuffle carries a scalar key
    * instead of chunk text; the ≥2-distinct-docs count joins back on the
    * same key; per-doc ratios are one final doc_id agg.
    *
    * The key is [[graft.operators.TextOps.fingerprintWide]] — four
    * independent polyhash lanes (~120-bit combined keyspace), so birthday
    * collisions are impossible at any corpus size; the oracle replays the
    * identical four lanes in SQL. (A single 30-bit lane — the previous
    * form — starts colliding at ~50k chunks.)
    */
  def chunkBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    // Single-scan shape: the self-join form (chunks ⋈ per-fp distinct-doc
    // counts) reads the corpus and evaluates the fingerprint kernel TWICE
    // (once per join branch) — at 100 TB the scan is the dominant cost.
    // Instead pre-aggregate to one row per (fp, doc_id) carrying its
    // chunk count, window-count distinct docs per fp over that reduced
    // frame, and roll up per doc: one scan, one kernel pass, three
    // narrow-key shuffles, identical semantics (nd = rows per fp in the
    // pre-agg = distinct docs holding that fingerprint).
    val perDoc = chunkFixedDf(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextOps.fingerprintWide(col("chunk")).as("fp"))
      .groupBy(col("fp"), col("doc_id")).agg(count(lit(1)).as("c"))
    val nd = count(lit(1)).over(Window.partitionBy(col("fp")))
    perDoc
      .withColumn("nd", nd)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chunks"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_boilerplate"))
      .withColumn("boiler_ratio",
        round(col("n_boilerplate").cast("double") / col("n_chunks").cast("double"), 6))
  }

  /** DuckDB oracle for chunk_boilerplate: the chunk_fixed CTE + the same
    * four polyhash lanes as [[graft.operators.TextOps.fingerprintWide]]
    * (the dedup_exact list_reduce replication, once per lane).
    */
  def chunkBoilerplateOracleSql: String = {
    val lanes = graft.operators.TextOps.FpLanes.zipWithIndex.map {
      case ((b, m), i) =>
        s"""        CASE WHEN length(chunk) < 1 THEN 0
           |             ELSE list_reduce(cps, (a, b) -> (a * $b + b) % $m) END AS fp$i""".stripMargin
    }.mkString(",\n")
    val key = graft.operators.TextOps.FpLanes.indices
      .map(i => s"fp$i").mkString(", ")
    val joinOn = graft.operators.TextOps.FpLanes.indices
      .map(i => s"f.fp$i = g.fp$i").mkString(" AND ")
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |e AS (SELECT doc_id, substr(text, CAST(t.j * 80 + 1 AS INT), 100) AS chunk
       |      FROM d, UNNEST(range(CASE WHEN n <= 100 THEN 1 ELSE 1 + (n - 21) // 80 END)) AS t(j)),
       |e2 AS (SELECT doc_id, chunk,
       |         list_transform(range(1, length(chunk) + 1),
       |           i -> CAST(ord(substr(chunk, CAST(i AS INT), 1)) AS BIGINT)) AS cps
       |       FROM e),
       |f AS (SELECT doc_id,
       |$lanes
       |      FROM e2),
       |g AS (SELECT $key, count(DISTINCT doc_id) AS nd FROM f GROUP BY ALL)
       |SELECT f.doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       |  round(CAST(sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
       |FROM f JOIN g ON $joinOn
       |GROUP BY f.doc_id""".stripMargin
  }

  /** `chunk_preview` (reference `api/chunk_preview.py`): try alternative
    * chunking params on a small sample of documents — same column program
    * with (size=50, overlap=10) over doc_id 0..4 (sign-robust slice).
    */
  def chunkPreview(spark: SparkSession, dir: String): DataFrame =
    chunkFixedDf(
      Tables.documents(spark, dir).select(col("doc_id"), col("text"))
        .filter(col("doc_id").between(0, PreviewDocs - 1)),
      PreviewSize, PreviewOverlap)
      .select(col("chunk_id"), col("doc_id"), col("j"), col("chunk"), col("chunk_len"))

  private def chunkKernelDf(docs: DataFrame, mode: String,
                            size: Int, overlap: Int): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(graft.functions.ChunkText.column(col("text"), mode, size, overlap))
          .as(Seq("j", "chunk")))
      .select(
        concat_ws("#", col("doc_id").cast("string"), col("j").cast("string")).as("chunk_id"),
        col("doc_id"), col("j").cast("long").as("j"), col("chunk"),
        length(col("chunk")).cast("long").as("chunk_len"))

  private def chunkKernelQuery(spark: SparkSession, dir: String,
                               mode: String): DataFrame =
    chunkKernelDf(Tables.documents(spark, dir), mode, Size, Overlap)

  /** Chunk any (doc_id, text) frame in a reference chunk mode
    * (`chunker.py:26-31` dispatch: "fixed"/"fixed_chars", "sentences",
    * "headings"), ids `{doc}#{j}` — the upload path's chunk_mode knob.
    * All modes are narrow maps (column program or ChunkText kernel).
    */
  def chunkDf(docs: DataFrame, mode: String, size: Int, overlap: Int): DataFrame =
    mode match {
      case "fixed" | "fixed_chars" =>
        chunkFixedDf(docs, size, overlap)
          .select(col("chunk_id"), col("doc_id"), col("j").cast("long").as("j"),
            col("chunk"), col("chunk_len"))
      case "sentences" | "headings" => chunkKernelDf(docs, mode, size, overlap)
      case m => throw new IllegalArgumentException(s"unknown chunk mode: $m")
    }

  // chunk_tokens params: the LLM-native budget is counted in TOKENS, not
  // chars (context windows are token-sized) — 50-token windows, 10-token
  // overlap, the RAG-standard sliding shape.
  val TokenSize = 50
  val TokenOverlap = 10
  val TokenStep: Int = TokenSize - TokenOverlap

  /** SURVEY §2 `chunk_tokens`: token-budget chunking — fixed windows of
    * [[TokenSize]] whitespace tokens with [[TokenOverlap]] overlap, chunk
    * text re-joined with single spaces. Same exact window-count formula as
    * [[chunkFixedDf]] (`1 + ceil((n-size)/step)` for n > size) applied to
    * the token count, so the two operators differ only in the unit. A pure
    * column program (split → sequence → explode → slice → array_join):
    * narrow, zero shuffle, codegen'd end to end.
    */
  def chunkTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = when(length(trim(col("text"))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+"))
    val n = size(col("toks")).cast("long")
    val nchunks = when(n <= TokenSize, lit(1L))
      .otherwise(lit(1L) + ((n - TokenSize + (TokenStep - 1)) / TokenStep).cast("long"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("j", explode(sequence(lit(0L), nchunks - 1)))
      .select(
        concat_ws("#", col("doc_id").cast("string"), col("j").cast("string")).as("chunk_id"),
        col("doc_id"), col("j"),
        array_join(slice(col("toks"), (col("j") * TokenStep + 1).cast("int"), lit(TokenSize)), " ")
          .as("chunk"),
        size(slice(col("toks"), (col("j") * TokenStep + 1).cast("int"), lit(TokenSize)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** DuckDB oracle for chunk_tokens — identical token split (trim keeps
    * case, spaces-only trim parity) and window math.
    */
  def chunkTokensOracleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
       |  FROM documents),
       |f AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
       |e AS (SELECT doc_id, toks, t.j AS j
       |      FROM f, UNNEST(range(CASE WHEN n <= $TokenSize THEN 1
       |                                ELSE 1 + (n - ${TokenSize - TokenStep + 1}) // $TokenStep END)) AS t(j))
       |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR) AS chunk_id,
       |  doc_id, j,
       |  array_to_string(array_slice(toks, CAST(j * $TokenStep + 1 AS INT),
       |    CAST(j * $TokenStep + $TokenSize AS INT)), ' ') AS chunk,
       |  CAST(len(array_slice(toks, CAST(j * $TokenStep + 1 AS INT),
       |    CAST(j * $TokenStep + $TokenSize AS INT))) AS BIGINT) AS n_chunk_tokens
       |FROM e""".stripMargin

  /** SURVEY §2 `chunk_sentences` — native [[graft.functions.ChunkText]]
    * kernel (no UDF boundary).
    */
  def chunkSentences(spark: SparkSession, dir: String): DataFrame =
    chunkKernelQuery(spark, dir, "sentences")

  /** SURVEY §2 `chunk_headings` — same kernel, heading mode. */
  def chunkHeadings(spark: SparkSession, dir: String): DataFrame =
    chunkKernelQuery(spark, dir, "headings")

  // ---- DuckDB oracles for the regex chunkers -----------------------------
  // Both replicate the Java kernels exactly for the testdata charset
  // (verified ASCII, no control chars beyond \t\n\r, no \x1E):
  // - Java's lookbehind split has no RE2 equivalent, so the oracle inserts
  //   a \x1E sentinel at each split point with regexp_replace('g') and
  //   str_splits on it — same segments because matches can't be adjacent.
  // - Java String.trim strips codepoints <= 0x20 from both ends; DuckDB
  //   trim(s, chars) with the whitespace-control set matches on this data.
  // - length()/substr() agree (codepoints == UTF-16 units for ASCII/BMP).
  private val TrimCh =
    "(' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))"

  /** DuckDB oracle for chunk_sentences: sentinel-split into sentences, then
    * the greedy ≤size packing fold as a recursive CTE stepping one sentence
    * per round per doc (state = the accumulated `cur` string, exactly the
    * kernel's), then the tail-overlap prepend via lag().
    */
  def chunkSentencesOracleSql: String = {
    val s = "sp.sents[CAST(r.i + 1 AS INT)]"
    s"""WITH RECURSIVE
       |sp AS (
       |  SELECT doc_id,
       |    list_filter(
       |      str_split(regexp_replace(text, '([.!?])[\t\n\f\r ]+', '\\1' || chr(30), 'g'), chr(30)),
       |      x -> x <> '') AS sents
       |  FROM documents),
       |rec AS (
       |  SELECT doc_id, 0 AS i, '' AS cur, CAST(NULL AS VARCHAR) AS emit FROM sp
       |  UNION ALL
       |  SELECT r.doc_id, r.i + 1,
       |    CASE WHEN length(r.cur) + length($s) + 1 <= $Size
       |         THEN trim(r.cur || ' ' || $s, $TrimCh)
       |         ELSE $s END,
       |    CASE WHEN length(r.cur) + length($s) + 1 <= $Size THEN NULL
       |         WHEN r.cur <> '' THEN r.cur END
       |  FROM rec r JOIN sp ON r.doc_id = sp.doc_id
       |  WHERE r.i < len(sp.sents)),
       |em AS (
       |  SELECT doc_id, i AS ord, emit AS chunk FROM rec WHERE emit IS NOT NULL
       |  UNION ALL
       |  SELECT r.doc_id, r.i + 1 AS ord, r.cur
       |  FROM rec r JOIN sp ON r.doc_id = sp.doc_id
       |  WHERE r.i = len(sp.sents) AND r.cur <> ''),
       |o AS (
       |  SELECT doc_id, chunk,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS j,
       |    lag(chunk) OVER (PARTITION BY doc_id ORDER BY ord) AS prev
       |  FROM em),
       |f AS (
       |  SELECT doc_id, j,
       |    CASE WHEN j = 0 THEN chunk ELSE right(prev, $Overlap) || chunk END AS chunk
       |  FROM o)
       |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR) AS chunk_id,
       |  doc_id, j, chunk, length(chunk) AS chunk_len
       |FROM f""".stripMargin
  }

  /** DuckDB oracle for chunk_headings: sentinel-split on the heading
    * pattern (keeping the captured marker as its own part, like python
    * re.split-with-group), rebuild sections with a cumulative heading
    * count + ordered string_agg, then fixed-chunk each section and number
    * chunks globally per doc.
    */
  def chunkHeadingsOracleSql: String = {
    val step = Step
    s"""WITH p0 AS (
       |  SELECT doc_id,
       |    str_split(regexp_replace(text,
       |      '\n[\t\n\f\r ]*(#+|<h[1-3]>|</h[1-3]>)',
       |      chr(30) || '\\1' || chr(30), 'g'), chr(30)) AS parts
       |  FROM documents),
       |pr AS (
       |  SELECT doc_id, unnest(parts) AS p,
       |    unnest(range(1, len(parts) + 1)) AS ord
       |  FROM p0),
       |fl AS (
       |  SELECT doc_id, p, ord,
       |    CASE WHEN p <> '' AND (starts_with(t, '#') OR starts_with(t, '<h')
       |                           OR starts_with(t, '</h')) THEN 1 ELSE 0 END AS is_head
       |  FROM (SELECT doc_id, p, ord, trim(p, $TrimCh) AS t FROM pr) x),
       |sec AS (
       |  SELECT doc_id, p, ord, is_head,
       |    sum(is_head) OVER (PARTITION BY doc_id ORDER BY ord
       |                       ROWS UNBOUNDED PRECEDING) AS s
       |  FROM fl),
       |bufs AS (
       |  SELECT doc_id, s,
       |    trim(string_agg(chr(10) || p, '' ORDER BY ord), $TrimCh) AS sect
       |  FROM sec WHERE is_head = 0
       |  GROUP BY doc_id, s),
       |secs AS (SELECT doc_id, s, sect, length(sect) AS n FROM bufs WHERE sect <> ''),
       |ch AS (
       |  SELECT doc_id, s, t.j AS cj,
       |    substr(sect, CAST(t.j * $step + 1 AS INT), $Size) AS chunk
       |  FROM secs, UNNEST(range(CASE WHEN n <= $Size THEN 1
       |                               ELSE 1 + (n - ${Size - step + 1}) // $step END)) AS t(j)),
       |numbered AS (
       |  SELECT doc_id, chunk,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY s, cj) - 1 AS j
       |  FROM ch)
       |SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR) AS chunk_id,
       |  doc_id, j, chunk, length(chunk) AS chunk_len
       |FROM numbered""".stripMargin
  }

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
    // Rank positions come from CUMULATIVE COUNTS over (source, DISTINCT
    // len) — chunk lengths are bounded by the chunk size, so the windowed
    // frame stays constant-sized however many chunks a source holds (a
    // row-level rank would sort each source's whole chunk set in one
    // task). Same interpolation arithmetic as the oracle.
    val byLen = chunks.groupBy(col("source"), col("len"))
      .agg(count(lit(1)).as("c"), sum(col("len")).as("len_sum"))
    val w = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byLen
      .withColumn("cum_end", sum(col("c")).over(w))
      .withColumn("cum_start", col("cum_end") - col("c"))
    cum
      .withColumn("cnt", sum(col("c")).over(Window.partitionBy(col("source"))))
      .withColumn("k", (col("cnt") - 1).cast("double") * 0.95)
      .groupBy(col("source"))
      .agg(
        max(col("cnt")).as("n_chunks"),
        min(col("len")).cast("long").as("len_min"),
        max(col("len")).cast("long").as("len_max"),
        (sum(col("len_sum")).cast("double") / max(col("cnt"))).as("len_avg"),
        max(when(col("cum_start") <= floor(col("k")) &&
          floor(col("k")) < col("cum_end"), col("len"))).as("lo"),
        max(when(col("cum_start") <= ceil(col("k")) &&
          ceil(col("k")) < col("cum_end"), col("len"))).as("hi"),
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
  def chunkHistogram(spark: SparkSession, dir: String): DataFrame =
    lengthHistogram(
      chunkFixedDf(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
        .select(col("chunk_len").as("len")))

  /** The reference's 20-bin histogram over any single `len` column —
    * shared by chunk_histogram and the index-sidecar analytics
    * ([[graft.index.IndexStats]]).
    */
  def lengthHistogram(chunks: DataFrame): DataFrame = {
    val spark = chunks.sparkSession
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
