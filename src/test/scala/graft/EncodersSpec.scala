package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{Embedder, Encoders, StubEncoder, TextEncoder}
import graft.pipeline.IndexPipeline

/** The pluggable-encoder contract (reference `app/ingest/embedder.py`'s
  * model seam): a second toy encoder registered at runtime must flow
  * through Embedder.embed AND an IndexPipeline build selected purely by
  * config name — proving a real ONNX/JNI encoder drops in with zero
  * pipeline changes.
  */
class EncodersSpec extends SparkSpec {

  /** Toy second encoder: dim floats, v(i) = ((len + i) % 7) / 7, then L2. */
  private object ToyEncoder extends TextEncoder {
    val name = "toy-len-cycle"
    def openPartition(dim: Int, normalize: Boolean): String => Array[Float] =
      text => {
        val v = Array.tabulate(dim)(i => (((text.length + i) % 7) + 1) / 7.0f)
        if (!normalize) v
        else {
          val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
          v.map(_ / n)
        }
      }
  }
  Encoders.register(ToyEncoder)

  test("registry resolves by name and rejects unknown encoders") {
    assert(Encoders.get(StubEncoder.name) eq StubEncoder)
    assert(Encoders.get("toy-len-cycle") eq ToyEncoder)
    val e = intercept[IllegalArgumentException](Encoders.get("bert-onnx"))
    assert(e.getMessage.contains("toy-len-cycle"),
      "error must list the registered encoders")
    assert(Encoders.names.contains(StubEncoder.name))
  }

  test("Embedder.embed dispatches through the passed encoder") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", "hello"), ("b", "worlds!")).toDF("id", "text")
    val got = Embedder.embed(rows, dim = 8, normalize = false, ToyEncoder)
      .collect().map(e => e.id -> e.vec.toSeq).toMap
    val enc = ToyEncoder.openPartition(8, normalize = false)
    assert(got("a") == enc("hello").toSeq)
    assert(got("b") == enc("worlds!").toSeq)
  }

  test("IndexPipeline builds + searches with a config-selected encoder") {
    val root = Files.createTempDirectory("graft-enc").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(20)
    val cfg = IndexPipeline.Config(name = "e2e_toy", backend = "flat",
      model = ToyEncoder.name)
    val manifest = IndexPipeline.build(docs, root, cfg)
    assert(manifest.model == ToyEncoder.name,
      "manifest must record the configured encoder for provenance")
    // the toy encoder keys on text LENGTH, so any same-length query text
    // scores 1.0 against a chunk of that length (normalized identical vecs)
    val hits = IndexPipeline.search(spark, root, "e2e_toy", "x" * 100, 3, cfg)
      .collect()
    assert(hits.nonEmpty)
    assert(math.abs(hits.head.getAs[Double]("score") - 1.0) < 1e-6)
  }
}
