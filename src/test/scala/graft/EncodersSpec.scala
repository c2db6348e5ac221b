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

  test("hashed-ngram encoder: deterministic, unit-norm, and lexically meaningful") {
    import graft.functions.HashedNgramEncoder
    val enc = HashedNgramEncoder.openPartition(64, normalize = true)
    val a = enc("the quick brown fox jumps")
    // deterministic across open calls (a second "partition")
    assert(HashedNgramEncoder.openPartition(64, true)("the quick brown fox jumps").toSeq == a.toSeq)
    // unit norm
    assert(math.abs(a.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum /
        (math.sqrt(x.map(p => p.toDouble * p).sum) * math.sqrt(y.map(q => q.toDouble * q).sum))
    // shared vocabulary ⇒ higher cosine than disjoint vocabulary
    val b = enc("the quick brown fox sleeps")
    val c = enc("xylophone quartz zephyr vortex")
    assert(cos(a, b) > 0.5, s"overlap pair scored ${cos(a, b)}")
    assert(cos(a, b) > cos(a, c) + 0.3)
    // subword overlap: morphological variants are NOT orthogonal. Checked
    // at dim 256, where random-unit-vector cosine noise (~1/√dim) is well
    // below the shared-trigram signal.
    val enc256 = HashedNgramEncoder.openPartition(256, normalize = true)
    val d = enc256("jumping")
    val e = enc256("jumped")
    assert(cos(d, e) > 0.2, s"shared-stem pair scored ${cos(d, e)}")
    // empty text encodes to zeros, not NaN
    assert(enc("").forall(_ == 0.0f))
  }

  test("IndexPipeline e2e with the hashed-ngram encoder: manifest provenance + build/query agreement") {
    import graft.functions.HashedNgramEncoder
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-hng").toString
    val docs = Seq(
      ("d1", "spark shuffles data between executors during wide transformations"),
      ("d2", "the recipe calls for two cups of flour and one egg"),
      ("d3", "broadcast joins avoid shuffling the large table entirely"))
      .toDF("doc_id", "text")
    val cfg = IndexPipeline.Config(name = "e2e_hng", backend = "flat",
      model = HashedNgramEncoder.name)
    val manifest = IndexPipeline.build(docs, root, cfg)
    assert(manifest.model == HashedNgramEncoder.name,
      "manifest must record the hashed-ngram encoder for provenance")
    // build/query agreement: querying with an indexed chunk's exact text
    // must retrieve that chunk at rank 1 with cosine/IP ≈ 1 — the encoder
    // opened at query time is the same program that built the index.
    val exact = IndexPipeline.search(spark, root, "e2e_hng",
      "the recipe calls for two cups of flour and one egg", 3, cfg).collect()
    assert(exact.head.getAs[String]("id").startsWith("d2#"))
    assert(math.abs(exact.head.getAs[Double]("score") - 1.0) < 1e-6)
    // retrieval is semantic-by-overlap: a paraphrase-ish query sharing
    // vocabulary with d3 ranks d3 first without matching it verbatim
    val para = IndexPipeline.search(spark, root, "e2e_hng",
      "avoid a shuffle by broadcasting the small join table", 3, cfg).collect()
    assert(para.head.getAs[String]("id").startsWith("d3#"),
      s"expected d3 first, got ${para.map(_.getAs[String]("id")).mkString(",")}")
  }

  test("the hashed-ngram encoder is registered for config selection") {
    import graft.functions.HashedNgramEncoder
    assert(Encoders.get(HashedNgramEncoder.name) eq HashedNgramEncoder)
    assert(graft.pipeline.Defaults.allowedModels.contains(HashedNgramEncoder.name),
      "GRAFT_EMBEDDING_MODEL=hashed-ngram-v1 must be an allowed value")
  }

  test("GRAFT_EMBEDDING_MODEL selects the encoder end-to-end via Defaults") {
    import graft.functions.HashedNgramEncoder
    val s = spark
    import s.implicits._
    // the env-var channel itself (via its JVM-property override — a spec
    // cannot mutate its own process environment): the reference's
    // EMBEDDING_MODEL setting (core/config.py) selecting the model for a
    // build with NO encoder named anywhere in code
    System.setProperty("GRAFT_EMBEDDING_MODEL", HashedNgramEncoder.name)
    try {
      val cfg = graft.pipeline.Defaults.pipelineConfig("env_sel")
      assert(cfg.model == HashedNgramEncoder.name)
      val root = Files.createTempDirectory("graft-envsel").toString
      val docs = Seq(
        ("d1", "partition pruning skips irrelevant parquet files"),
        ("d2", "the marathon route follows the river for ten miles"))
        .toDF("doc_id", "text")
      val manifest = IndexPipeline.build(docs, root, cfg)
      assert(manifest.model == HashedNgramEncoder.name,
        "manifest must record the env-selected encoder")
      val hits = IndexPipeline.search(spark, root, "env_sel",
        "prune partitions to skip parquet files", 1, cfg).collect()
      assert(hits.head.getAs[String]("id").startsWith("d1#"))
    } finally System.clearProperty("GRAFT_EMBEDDING_MODEL")
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
