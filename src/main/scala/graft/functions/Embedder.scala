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

/** Config-keyed encoder registry (the [[graft.pipeline.Defaults]] pattern):
  * `GRAFT_EMBEDDING_MODEL=<name>` selects the encoder a pipeline build
  * embeds with, and a real ONNX/JNI implementation drops in by calling
  * [[register]] at startup — no pipeline code changes.
  */
object Encoders {
  private val registry =
    scala.collection.concurrent.TrieMap[String, TextEncoder](
      StubEncoder.name -> StubEncoder)

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
