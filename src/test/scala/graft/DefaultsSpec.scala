package graft

import graft.pipeline.Defaults

class DefaultsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("defaults mirror the reference /config payload shape") {
    val p = Defaults.configPayload
    assert(p.keySet == Set("allowed_models", "allowed_backends", "defaults"))
    val d = p("defaults").asInstanceOf[Map[String, Any]]
    assert(d.keySet == Set("embedding_model", "normalize_embeddings", "chunk_mode",
      "chunk_size", "chunk_overlap", "backend", "top_k"))
    // the reference's three backends plus the engine's two-level build
    assert(Defaults.allowedBackends == Seq("flat", "ivf", "ivf_hier", "ivfpq"))
    assert(Defaults.allowedBackends.contains(Defaults.defaultBackend))
    assert(Defaults.chunkSize > Defaults.chunkOverlap,
      "overlap must be smaller than the window")
  }

  test("pipelineConfig carries the defaults into the build flow") {
    val cfg = Defaults.pipelineConfig("x")
    assert(cfg.name == "x")
    assert(cfg.backend == Defaults.defaultBackend)
    assert(cfg.chunkMode == Defaults.chunkMode)
    assert(cfg.chunkSize == Defaults.chunkSize)
    assert(cfg.normalize == Defaults.normalizeEmbeddings)
  }
}
