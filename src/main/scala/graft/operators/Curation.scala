package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical training-data curation decision, composed from the
  * oracle-verified building blocks as ONE declarative query:
  * keep a document iff it scores above the quality bar, is identified as
  * the target language, and is the canonical keeper of its duplicate
  * cluster (docs in no cluster keep by default).
  *
  * Composition is plain joins — Catalyst fuses the narrow feature maps
  * into the scan and the only shuffles are the (tiny) cluster propagation
  * and the final joins on doc_id.
  */
object Curation {

  val QualityBar = 0.75
  val TargetLang = "en"

  // Per-language sampling rates in percent: downsample the dominant
  // language, keep the rest — the standard language-rebalancing step of a
  // training-data mix (e.g. Gopher/CC pipelines).
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 40, "de" -> 100, "es" -> 100, "fr" -> 100, "unknown" -> 25)

  /** SURVEY §2 `curation_sample`: deterministic stratified downsampling —
    * keep a doc iff `polyhash(doc_id) mod 100 < rate(pred_lang)`. The
    * hash-based decision is a narrow map (reproducible across runs and
    * engines, unlike rand()-based sampling), so the operator scales as a
    * filter; per-language rates arrive via a broadcast literal map.
    */
  def curationSample(spark: SparkSession, dir: String): DataFrame = {
    val lang = TextOps.textLangid(spark, dir).select(col("doc_id"), col("pred_lang"))
    val rate = SampleRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("pred_lang") === l, lit(r)).otherwise(acc)
    }
    val bucket = pmod(
      graft.functions.PolyHash.column(col("doc_id").cast("string")), lit(100L))
    lang
      .withColumn("rate", rate.cast("long"))
      .withColumn("bucket", bucket)
      .withColumn("keep", col("bucket") < col("rate"))
  }

  val TokenBudget = 20000L

  /** SURVEY §2 `curation_budget`: the token-budget quality threshold —
    * admit documents from the top quality band down until the token
    * budget is spent; emit per-band cumulative totals and the keep
    * decision. The cumulative sum runs over DISTINCT (rounded) quality
    * values — a bounded frame (quality is a 6dp score in [0,1]) — so no
    * corpus-sized single-task window exists; docs join their band's
    * running total via a tiny broadcast. A band that straddles the budget
    * boundary is admitted whole (deterministic, no intra-band ordering).
    */
  def curationBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = TextOps.textQuality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val bands = docs.groupBy(col("quality"))
      .agg(sum(col("n_tokens")).as("band_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bands.withColumn("cum_tokens", sum(col("band_tokens")).over(w))
      .withColumn("band_keep",
        (col("cum_tokens") - col("band_tokens")) < TokenBudget)
    docs.join(broadcast(cum.select(col("quality"), col("cum_tokens"), col("band_keep"))),
        Seq("quality"))
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("cum_tokens"), col("band_keep").as("keep"))
  }

  def pipelineFilter(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.textQuality(spark, dir).select(col("doc_id"), col("quality"))
    val lang = TextOps.textLangid(spark, dir).select(col("doc_id"), col("pred_lang"))
    val dup = Dedup.dedupClusters(spark, dir).select(col("doc_id"), col("keep").as("dk"))
    quality.join(lang, Seq("doc_id"))
      .join(dup, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("quality"), col("pred_lang"),
        coalesce(col("dk"), lit(true)).as("dup_keep"),
        (col("quality") >= QualityBar && col("pred_lang") === TargetLang &&
          coalesce(col("dk"), lit(true))).as("keep"))
  }
}
