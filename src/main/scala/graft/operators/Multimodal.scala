package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: treat media as an opaque `binary` column
  * with typed metadata extracted by a decode step. The real decoder
  * (image/audio codecs) is STUBBED — deterministic arithmetic stands in
  * for it — but everything Spark-side is real: schema, binary payloads,
  * narrow extraction, and a typed `mapPartitions` pipeline (the Scala
  * analogue of `mapInPandas` batch decoding; a per-partition decoder
  * amortizes codec init exactly like a pandas batch would).
  */
object Multimodal {

  /** SURVEY §2 `multimodal_meta` (SQL oracle): binary payload + typed
    * metadata as a pure column program. The payload is the utf-8 document
    * text (the testdata has no real media); media_type/width/height/etc.
    * are the deterministic decode-stub outputs.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    val nBytes = length(payload).cast("long")
    val mt = col("doc_id") % 3
    val width = (lit(320L) + (col("doc_id") % 4) * 160L)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(mt === 0, "image").when(mt === 1, "audio").otherwise("video").as("media_type"),
      nBytes.as("n_bytes"),
      upper(substring(hex(payload), 1, 8)).as("magic"),
      when(mt === 0, width).otherwise(lit(null).cast("long")).as("width"),
      when(mt === 0, (width / 4).cast("long") * 3).otherwise(lit(null).cast("long")).as("height"),
      when(mt === 1, lit(16000L)).otherwise(lit(null).cast("long")).as("sample_rate"),
      when(mt =!= 0, round(nBytes.cast("double") / 1000.0, 3))
        .otherwise(lit(null).cast("double")).as("duration_s"))
  }

  // ---- typed mapPartitions decode pipeline (ScalaTest-covered) ----------

  case class MediaFile(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                       width: Option[Long], height: Option[Long],
                       duration_s: Option[Double])

  /** STUB decoder: a real implementation would parse the codec headers
    * (e.g. PNG IHDR / WAV fmt chunk) here. Deterministic fake so the
    * pipeline is testable without codec libraries in the container.
    */
  def decodeStub(f: MediaFile): MediaMeta = {
    val n = f.payload.length.toLong
    f.media_type match {
      case "image" =>
        val w = 320L + (f.doc_id % 4) * 160L
        MediaMeta(f.doc_id, f.media_type, n, Some(w), Some(w / 4 * 3), None)
      case _ =>
        MediaMeta(f.doc_id, f.media_type, n, None, None, Some(n / 1000.0))
    }
  }

  /** Batch decode: one decoder instance per partition (mirrors
    * mapInPandas' batch shape — codec init happens once per partition,
    * rows stream through). Narrow map, no shuffle.
    */
  def extractMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { iter =>
      // (real impl: initialize the codec/decoder context here, once)
      iter.map(decodeStub)
    }
  }

  val ResizeMaxDim = 256L
  val VideoFps = 25L
  val MaxSampledFrames = 8L

  /** SURVEY §2 `multimodal_resize` (SQL oracle): aspect-preserving resize
    * plan for the image rows — scale = min(1, 256/max(w,h)), output dims
    * floored, output byte size = w'·h'·3 (RGB stub). The arithmetic a real
    * thumbnailer performs on decoded headers, as a narrow column program;
    * the pixel work would live in the per-partition decode step.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    val images = multimodalMeta(spark, dir).filter(col("media_type") === "image")
    val scale = least(lit(1.0),
      lit(ResizeMaxDim).cast("double") /
        greatest(col("width"), col("height")).cast("double"))
    images
      .withColumn("scale", round(scale, 6))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("long"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("long"))
      .select(col("doc_id"), col("width"), col("height"), col("scale"),
        col("out_width"), col("out_height"),
        (col("out_width") * col("out_height") * 3).as("out_bytes"))
  }

  /** SURVEY §2 `multimodal_framesample` (SQL oracle): uniform frame
    * sampling for the video rows — n_frames = floor(duration·fps), step
    * chosen so ≤ [[MaxSampledFrames]] frames survive, one row per sampled
    * frame with its time offset. posexplode keeps it a narrow map; a real
    * pipeline hands (doc_id, frame_idx) to the per-partition decoder.
    */
  def multimodalFramesample(spark: SparkSession, dir: String): DataFrame = {
    val videos = multimodalMeta(spark, dir).filter(col("media_type") === "video")
      .withColumn("n_frames",
        floor(col("duration_s") * VideoFps).cast("long"))
      .filter(col("n_frames") > 0)
      .withColumn("step",
        greatest(lit(1L), ceil(col("n_frames").cast("double") / MaxSampledFrames).cast("long")))
    videos
      .select(col("doc_id"), col("n_frames"), col("step"),
        posexplode(sequence(lit(0L), col("n_frames") - 1, col("step"))).as(Seq("k", "frame_idx")))
      .select(col("doc_id"), col("n_frames"),
        (col("k") + 1).cast("long").as("sample_idx"), col("frame_idx"),
        round(col("frame_idx").cast("double") / VideoFps, 6).as("t_offset_s"))
  }

  val AudioRate = 16000L
  val WinSamples = 16000L
  val HopSamples = 8000L

  /** SURVEY §2 `multimodal_audiowindows` (SQL oracle): the framing plan
    * for the audio rows — 1 s windows ([[WinSamples]]) with a 0.5 s hop
    * ([[HopSamples]]) over the decoded sample stream, one row per window
    * with sample offsets and whether the tail window needs padding. This
    * is how audio reaches a feature extractor (fbank/wav2vec windows);
    * the sample count is integer-exact from the payload size
    * (`bytes × 16` at 16 kHz / 1000 bytes-per-second stub, so both
    * engines frame identically). posexplode keeps it a narrow map — the
    * per-partition decoder receives (doc_id, start, end) slices.
    */
  def multimodalAudiowindows(spark: SparkSession, dir: String): DataFrame = {
    val audio = Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"),
        (length(col("text").cast("binary")).cast("long") * 16L).as("n_samples"))
    val nWin = when(col("n_samples") <= WinSamples, lit(1L))
      .otherwise(lit(1L) +
        ((col("n_samples") - WinSamples) / HopSamples).cast("long"))
    audio
      .withColumn("n_win", nWin)
      .select(col("doc_id"), col("n_samples"),
        explode(sequence(lit(0L), col("n_win") - 1)).as("win_idx"))
      .select(col("doc_id"), col("n_samples"), col("win_idx"),
        (col("win_idx") * HopSamples).as("start_sample"),
        least(col("win_idx") * HopSamples + WinSamples, col("n_samples"))
          .as("end_sample"),
        (col("win_idx") * HopSamples + WinSamples > col("n_samples")).as("padded"),
        round((col("win_idx") * HopSamples).cast("double") / AudioRate.toDouble, 6)
          .as("t_start_s"))
  }

  /** DuckDB oracle for multimodal_audiowindows: same integer framing. */
  def audiowindowsOracleSql: String =
    s"""WITH a AS (SELECT doc_id, octet_length(encode(text)) * 16 AS n_samples
       |           FROM documents WHERE doc_id % 3 = 1),
       |w AS (SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
       |        CASE WHEN n_samples <= $WinSamples THEN 1
       |             ELSE 1 + (n_samples - $WinSamples) // $HopSamples END AS n_win
       |      FROM a),
       |e AS (SELECT doc_id, n_samples, t.k AS k FROM w, UNNEST(range(n_win)) AS t(k))
       |SELECT doc_id, n_samples, CAST(k AS BIGINT) AS win_idx,
       |  CAST(k * $HopSamples AS BIGINT) AS start_sample,
       |  CAST(least(k * $HopSamples + $WinSamples, n_samples) AS BIGINT) AS end_sample,
       |  k * $HopSamples + $WinSamples > n_samples AS padded,
       |  round(CAST(k * $HopSamples AS DOUBLE) / $AudioRate.0, 6) AS t_start_s
       |FROM e""".stripMargin

  val PhashBits = 60

  /** SURVEY §2 `multimodal_phash` (SQL oracle): blockhash/aHash-style
    * perceptual fingerprint of each image payload — [[PhashBits]] slice
    * sums vs the mean, packed into one BIGINT
    * ([[graft.functions.SliceHash]], one narrow kernel pass). Near-dup
    * media then pairs by hamming distance over the same chunk-bucket LSH
    * machinery as SimHash — the image-dedup primitive of a training-data
    * pipeline. The decode step is the stub (the "pixels" are the payload
    * codepoints); the fingerprint math, plan shape, and oracle parity are
    * the real part. Payloads shorter than [[PhashBits]] are skipped (no
    * slice may be empty), mirrored in the oracle.
    */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0 && length(col("text")) >= PhashBits)
      .select(col("doc_id"),
        graft.functions.SliceHash.column(col("text"), PhashBits).as("phash"),
        length(col("text")).cast("long").as("n_bytes"))

  /** DuckDB oracle for multimodal_phash: the identical integer program —
    * position → slice via `(i-1)*bits // n`, bit k set iff
    * `slice_sum * bits > total` — over `ord()` codepoints (== payload
    * bytes for this ASCII testdata, == the kernel's codepoints always).
    */
  def phashOracleSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |  WHERE doc_id % 3 = 0 AND length(text) >= $PhashBits),
       |pos AS (
       |  SELECT doc_id, n, t.i AS i,
       |    CAST(ord(substr(text, CAST(t.i AS INT), 1)) AS BIGINT) AS v
       |  FROM c, UNNEST(range(1, n + 1)) AS t(i)),
       |sl AS (SELECT doc_id, ((i - 1) * $PhashBits) // n AS k, sum(v) AS s
       |       FROM pos GROUP BY 1, 2),
       |tot AS (SELECT doc_id, sum(v) AS t, any_value(n) AS n FROM pos GROUP BY 1),
       |ph AS (
       |  SELECT sl.doc_id,
       |    CAST(sum(CASE WHEN sl.s * $PhashBits > tot.t
       |                  THEN (CAST(1 AS BIGINT) << CAST(sl.k AS INT)) ELSE 0 END) AS BIGINT) AS phash,
       |    CAST(any_value(tot.n) AS BIGINT) AS n_bytes
       |  FROM sl JOIN tot ON sl.doc_id = tot.doc_id
       |  GROUP BY 1)
       |SELECT doc_id, phash, n_bytes FROM ph""".stripMargin

  val PhashChunks = 4
  val PhashChunkBits = 15
  val PhashMaxHamming = 8

  /** SURVEY §2 `multimodal_phash_pairs`: near-duplicate MEDIA pairs —
    * candidates share ≥1 of the phash's 4 fifteen-bit chunks (the SimHash
    * chunk-LSH shape: bucket-grouped, stop-bucket-capped, hamming scored
    * in-bucket), emitted when hamming ≤ [[PhashMaxHamming]] of
    * [[PhashBits]]. This is image dedup for a training pipeline: at
    * 100 TB the only shuffle is keyed on (chunk idx, chunk value), never
    * all-pairs. The per-bucket count uses a plain groupBy (count partial-
    * aggregates map-side, so a dominant chunk value stays flat); the
    * skew-sensitive collect_list sits behind the stop-bucket anti-join.
    */
  def multimodalPhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val banded = multimodalPhash(spark, dir).select(col("doc_id"), col("phash"))
      .select(col("doc_id"), col("phash"),
        posexplode(array((0 until PhashChunks).map(j =>
          shiftright(col("phash"), j * PhashChunkBits)
            .bitwiseAND(lit((1L << PhashChunkBits) - 1))): _*)).as(Seq("j", "chunk")))
    // Stop-bucket guard fused into the collection (the simhash shape,
    // functions.BoundedSortedCollectRows): one aggregation pass, one
    // SliceHash kernel execution, no fingerprint checkpoint; a dominant
    // chunk value ships at most cap+1 rows per map partition.
    val buckets = banded
      .groupBy(col("j"), col("chunk"))
      .agg(graft.functions.BoundedSortedCollectRows
        .column(struct(col("doc_id"), col("phash")), Dedup.MaxBucketSize + 1).as("ids"))
      .filter(size(col("ids")).between(2, Dedup.MaxBucketSize))
    buckets.select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1), y =>
            struct(element_at(col("ids"), (i + 1).cast("int")).as("a"),
              y.as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.phash").bitwiseXOR(col("p.b.phash"))).cast("long").as("hamming"))
      .groupBy(col("doc_a"), col("doc_b")).agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
  }

  /** DuckDB oracle for multimodal_phash_pairs: the phash CTE plus the
    * chunk-LSH pair program, all exact integer arithmetic.
    */
  def phashPairsOracleSql: String = {
    val phCte = phashOracleSql.stripSuffix("\nSELECT doc_id, phash, n_bytes FROM ph")
    s"""$phCte,
       |b AS (SELECT doc_id, phash, t.j AS j,
       |        (phash >> (CAST(t.j AS INT) * $PhashChunkBits)) & ${(1L << PhashChunkBits) - 1} AS chunk
       |      FROM ph, UNNEST(range($PhashChunks)) AS t(j)),
       |bc AS (SELECT j, chunk, count(*) AS n FROM b GROUP BY 1, 2),
       |bf AS (SELECT b.j, b.chunk, b.doc_id, b.phash FROM b JOIN bc
       |         ON b.j = bc.j AND b.chunk = bc.chunk
       |       WHERE bc.n BETWEEN 2 AND ${Dedup.MaxBucketSize}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa, b2.doc_id AS doc_b, b2.phash AS pb
       |  FROM bf a JOIN bf b2 ON a.j = b2.j AND a.chunk = b2.chunk AND a.doc_id < b2.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(pa, pb)) <= $PhashMaxHamming""".stripMargin
  }

  /** SURVEY §2 `multimodal_phash_clusters`: the media dedup DECISION —
    * connected components over the phash near-dup pairs, one canonical
    * keeper per cluster ([[Dedup.clustersFromPairs]], the same generic
    * primitive as text dedup; the pair graph is tiny relative to the
    * corpus, so the loop never touches media rows).
    */
  def multimodalPhashClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.clustersFromPairs(
      multimodalPhashPairs(spark, dir).select(col("doc_a"), col("doc_b")))

  /** DuckDB oracle for multimodal_phash_clusters: the phash pair CTEs +
    * the shared fixed-round hash-to-min component chain (the all-pairs
    * reachability closure this replaces is Θ(Σ component²) rows — fine on
    * the small media dup graph, but one shared scale-safe generator beats
    * two closure idioms; see [[Dedup.hashToMinCcSql]]).
    */
  def phashClustersOracleSql: String = {
    val pairCte = phashPairsOracleSql
      .replaceFirst("(?s)\\nSELECT doc_a, doc_b.*$", "")
    s"""$pairCte,
       |pp AS (SELECT doc_a, doc_b FROM cand
       |       WHERE bit_count(xor(pa, pb)) <= $PhashMaxHamming),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pp
       |          UNION ALL SELECT doc_b, doc_a FROM pp),
       |nodes AS (SELECT DISTINCT src AS rep FROM edges),
       |${Dedup.hashToMinCcSql("mcc", "nodes", "edges", "mcl")}
       |SELECT rep_id AS doc_id, cluster_rep, rep_id = cluster_rep AS keep
       |FROM mcl""".stripMargin
  }

  /** Feature-extract for media payloads: the stub encoder over the payload
    * bytes (a real system swaps in CLIP/wav2vec per modality — loaded once
    * per partition, exactly this mapPartitions shape).
    */
  case class MediaFeatures(doc_id: Long, media_type: String, features: Array[Float])

  def extractFeatures(files: Dataset[MediaFile],
                      dim: Int = graft.functions.Embedder.DefaultDim): Dataset[MediaFeatures] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions { iter =>
      // (real impl: load the per-modality encoder here, once per partition)
      iter.map(f => MediaFeatures(f.doc_id, f.media_type,
        graft.functions.Embedder.encodeStub(
          new String(f.payload, java.nio.charset.StandardCharsets.UTF_8), dim,
          normalize = true)))
    }
  }

  /** documents → MediaFile dataset (payload = utf-8 text bytes). */
  def mediaFiles(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaFile]
  }
}
