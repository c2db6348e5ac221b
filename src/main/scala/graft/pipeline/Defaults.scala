package graft.pipeline

/** The reference's settings surface (`core/config.py` + the GET `/config`
  * payload, `api/config.py:7-20`): env-overridable defaults for the build
  * and search knobs, plus the allowed-value lists a client renders.
  * Same override mechanism (environment variables, GRAFT_-prefixed), same
  * payload shape re-expressed as a Scala map.
  */
object Defaults {

  // A JVM system property of the same name overrides the environment —
  // the per-submit channel (`spark-submit --driver-java-options
  // -DGRAFT_…`) on clusters where the driver env is not caller-settable,
  // and the only way a spec can exercise the GRAFT_* selection path
  // in-process (the JVM cannot mutate its own environment).
  private def env(name: String, default: String): String =
    sys.props.get(name).orElse(sys.env.get(name)).getOrElse(default)

  def allowedModels: Seq[String] =
    sys.props.get("GRAFT_ALLOWED_MODELS")
      .orElse(sys.env.get("GRAFT_ALLOWED_MODELS")) match {
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None    => graft.functions.Encoders.names // whatever is registered
    }
  def defaultModel: String =
    env("GRAFT_EMBEDDING_MODEL", graft.functions.StubEncoder.name)
  def normalizeEmbeddings: Boolean =
    env("GRAFT_NORMALIZE_EMBEDDINGS", "true").toLowerCase == "true"

  def chunkMode: String = env("GRAFT_CHUNK_MODE", "fixed")
  def chunkSize: Int = env("GRAFT_CHUNK_SIZE", graft.operators.Chunking.Size.toString).toInt
  def chunkOverlap: Int =
    env("GRAFT_CHUNK_OVERLAP", graft.operators.Chunking.Overlap.toString).toInt

  def topK: Int = env("GRAFT_TOP_K", graft.operators.VectorOps.DefaultK.toString).toInt

  /** Parquet-native backends (the reference lists its faiss pair). */
  def allowedBackends: Seq[String] = Seq("flat", "ivf", "ivf_hier", "ivfpq")
  def defaultBackend: String = env("GRAFT_BACKEND", "flat")

  /** A [[IndexPipeline.Config]] built from the current defaults. */
  def pipelineConfig(name: String): IndexPipeline.Config =
    IndexPipeline.Config(name = name, backend = defaultBackend,
      chunkMode = chunkMode, chunkSize = chunkSize, chunkOverlap = chunkOverlap,
      normalize = normalizeEmbeddings, model = defaultModel)

  /** The GET `/config` payload (api/config.py): allowed lists + defaults. */
  def configPayload: Map[String, Any] = Map(
    "allowed_models" -> allowedModels,
    "allowed_backends" -> allowedBackends,
    "defaults" -> Map(
      "embedding_model" -> defaultModel,
      "normalize_embeddings" -> normalizeEmbeddings,
      "chunk_mode" -> chunkMode,
      "chunk_size" -> chunkSize,
      "chunk_overlap" -> chunkOverlap,
      "backend" -> defaultBackend,
      "top_k" -> topK))
}
