package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pluggable text-encoder contract (reference `app/ingest/embedder.py`'s
  * model seam). An implementation ships to executors (Serializable) and is
  * OPENED once per partition — that call is where a real backend loads its
  * ONNX session / JNI handle / tokenizer; the returned closure then encodes
  * row after row against the loaded model. Nothing else in the pipeline
  * knows which encoder runs: [[IndexPipeline]] resolves one by config name
  * through [[Encoders]].
  */
trait TextEncoder extends Serializable {
  /** Registry key; also recorded in index manifests for provenance. */
  def name: String

  /** Called once per partition ON THE EXECUTOR. Do per-task model setup
    * here (load weights, create the inference session) and return the
    * per-row encode function that closes over it.
    */
  def openPartition(dim: Int, normalize: Boolean): String => Array[Float]
}

/** The default deterministic stub: content-hash projection (no ML runtime
  * ships in this build). Same text ⇒ same vector, so self-retrieval and
  * round-trip properties hold and the pipeline is fully testable.
  */
object StubEncoder extends TextEncoder {
  val name = "stub-hash-projection"
  def openPartition(dim: Int, normalize: Boolean): String => Array[Float] =
    Embedder.encodeStub(_, dim, normalize)
}

/** A REAL pure-JVM encoder (not a content-hash stub): signed feature
  * hashing (Weinberger et al. '09, the "hashing trick") over word unigrams
  * plus boundary-marked character trigrams — the fastText subword shape.
  * Every feature occurrence adds ±1 to one of `dim` buckets (sign and
  * bucket both from a mixed 64-bit feature hash), then the vector is
  * L2-normalized, so cosine between two texts estimates their weighted
  * lexical/subword overlap: texts sharing vocabulary score high, disjoint
  * texts are near-orthogonal in expectation. That is retrieval-grade
  * behavior with zero model weights shipped and zero ML runtime — and it
  * exercises the EXACT deployment path a sentence-transformer ONNX session
  * would (resolved by config name, opened once per partition, fed the row
  * stream). No external dependency exists in this build, so this encoder —
  * not an ONNX binding — is the registry's production proof.
  *
  * Versioned name ("…-v1"): output vectors are part of a persisted index's
  * contract, so any change to tokenization/hashing must ship as -v2.
  */
object HashedNgramEncoder extends TextEncoder {
  val name = "hashed-ngram-v1"

  /** splitmix64 finalizer over the polynomial text hash — the raw rolling
    * hash is a poor bucket hash (low-order structure); the mix spreads
    * features uniformly over buckets AND supplies an independent sign bit.
    */
  private def mix(h0: Long): Long = {
    var z = h0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def addFeature(acc: Array[Double], f: String, dim: Int): Unit = {
    val h = mix(PolyHash.hash(f, 31, 1000000007L))
    val idx = (((h % dim) + dim) % dim).toInt
    acc(idx) += (if ((h >>> 63) == 0L) 1.0 else -1.0)
  }

  def encode(text: String, dim: Int, normalize: Boolean): Array[Float] = {
    val acc = new Array[Double](dim)
    val words = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    words.foreach { w =>
      addFeature(acc, "w:" + w, dim) // word unigram (tf-weighted by repetition)
      val m = "<" + w + ">" // boundary markers: "<ca" ≠ "cat"-internal "cat"
      var i = 0
      while (i + 3 <= m.length) {
        addFeature(acc, "g:" + m.substring(i, i + 3), dim)
        i += 1
      }
    }
    val v = new Array[Float](dim)
    var n = 0.0
    var i = 0
    while (i < dim) { n += acc(i) * acc(i); i += 1 }
    val inv = if (normalize && n > 0.0) 1.0 / math.sqrt(n) else 1.0
    i = 0
    while (i < dim) { v(i) = (acc(i) * inv).toFloat; i += 1 }
    v
  }

  def openPartition(dim: Int, normalize: Boolean): String => Array[Float] =
    encode(_, dim, normalize)
}

/** Config-keyed encoder registry (the [[graft.pipeline.Defaults]] pattern):
  * `GRAFT_EMBEDDING_MODEL=<name>` selects the encoder a pipeline build
  * embeds with, and a real ONNX/JNI implementation drops in by calling
  * [[register]] at startup — no pipeline code changes.
  */
object Encoders {
  private val registry =
    scala.collection.concurrent.TrieMap[String, TextEncoder](
      StubEncoder.name -> StubEncoder,
      HashedNgramEncoder.name -> HashedNgramEncoder)

  def register(enc: TextEncoder): Unit = registry.put(enc.name, enc)

  def get(name: String): TextEncoder =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown encoder '$name'; registered: ${names.mkString(", ")}"))

  def names: Seq[String] = registry.keys.toSeq.sorted
}

/** Text → embedding step (reference `app/ingest/embedder.py`:
  * sentence-transformers encode + optional L2 normalize).
  *
  * The model inference is STUBBED — no ML runtime ships in this build — by
  * a deterministic content-hash projection: same text ⇒ same vector, so
  * self-retrieval and round-trip properties hold and the pipeline is fully
  * testable. The Spark plumbing is the real shape: `mapPartitions` +
  * [[TextEncoder.openPartition]], so a real model is loaded ONCE per
  * partition and fed row batches (exactly how sentence-transformers/ONNX
  * is deployed on executors — register a [[TextEncoder]] and nothing else
  * changes).
  */
object Embedder {

  val DefaultDim = 64

  /** STUB encoder: xorshift64* stream seeded from the text's rolling hash,
    * mapped to [-1, 1]; optionally L2-normalized. Replace with a real
    * model call for production.
    */
  def encodeStub(text: String, dim: Int, normalize: Boolean): Array[Float] = {
    var s = PolyHash.hash(text, 31, 1000000007L) * 2654435761L + 1
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val r = (s * 2685821657736338717L >>> 11).toDouble / (1L << 53).toDouble
      v(i) = (2.0 * r - 1.0).toFloat
      i += 1
    }
    if (normalize) {
      var n = 0.0
      i = 0
      while (i < dim) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      val inv = (1.0 / math.sqrt(n)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  case class Embedded(id: String, text: String, vec: Array[Float])

  /** Embed an (id, text) frame. Narrow map — at 100 TB this is the
    * model-inference pass, embarrassingly parallel, batched per partition.
    * The encoder is opened once per partition (the model-load site).
    */
  def embed(rows: DataFrame, dim: Int = DefaultDim,
            normalize: Boolean = true,
            encoder: TextEncoder = StubEncoder): Dataset[Embedded] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("cast(id as string) id", "cast(text as string) text")
      .as[(String, String)]
      .mapPartitions { iter =>
        val enc = encoder.openPartition(dim, normalize) // model loads here
        iter.map { case (id, text) => Embedded(id, text, enc(text)) }
      }
  }
}
