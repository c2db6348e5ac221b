package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Text → embedding step (reference `app/ingest/embedder.py`:
  * sentence-transformers encode + optional L2 normalize).
  *
  * The model inference is STUBBED — no ML runtime ships in this build — by
  * a deterministic content-hash projection: same text ⇒ same vector, so
  * self-retrieval and round-trip properties hold and the pipeline is fully
  * testable. The Spark plumbing is the real shape: `mapPartitions`, so a
  * real model would be loaded ONCE per partition and fed row batches
  * (exactly how sentence-transformers/ONNX is deployed on executors —
  * swap `encodeStub` for the model call and nothing else changes).
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
    */
  def embed(rows: DataFrame, dim: Int = DefaultDim,
            normalize: Boolean = true): Dataset[Embedded] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("cast(id as string) id", "cast(text as string) text")
      .as[(String, String)]
      .mapPartitions { iter =>
        // (real impl: load the encoder model here, once per partition)
        iter.map { case (id, text) => Embedded(id, text, encodeStub(text, dim, normalize)) }
      }
  }
}
