package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextOps}

/** The end-to-end training-data curation job — the capstone over the
  * oracle-verified building blocks, the way [[IndexPipeline]] is the
  * capstone over the index family: one call takes a raw document frame
  * through quality scoring, language ID, two-stage LSH-verified near-dup
  * collapse, optional deterministic language rebalancing, and optional
  * sequence packing, returning the curated frame plus the funnel report a
  * pipeline run logs.
  *
  * Everything is a declarative frame transform: the stages compose into
  * ONE job graph (Catalyst fuses the narrow feature maps into the scan;
  * the only shuffles are the LSH bucket key, the pair-graph propagation,
  * and the final doc_id joins). With default config the keep decision is
  * EXACTLY the oracle-gated `pipeline_filter` operator — spec-pinned, so
  * the pipeline can't drift from the verified semantics.
  */
object CurationPipeline {

  case class Config(
      qualityBar: Double = Curation.QualityBar,
      targetLang: String = Curation.TargetLang,
      // optional stage: deterministic per-language downsampling (the
      // curation_sample rates); off by default so keep == pipeline_filter
      applySampling: Boolean = false,
      sampleRates: Seq[(String, Int)] = Curation.SampleRates,
      // optional stage: pack kept docs into fixed token-budget sequences
      applyPacking: Boolean = false,
      packBudget: Long = Curation.PackBudget)

  case class Report(
      nDocs: Long, nQualityFail: Long, nLangFail: Long, nDupDrop: Long,
      nSampledOut: Long, nKept: Long, keepRate: Double)

  /** Per-document decisions: `doc_id, quality, pred_lang, dup_keep,
    * sample_keep, keep` over any frame with (doc_id, text).
    */
  def decide(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val quality = TextOps.withQuality(base).select(col("doc_id"), col("quality"))
    val lang = TextOps.withLangid(base).select(col("doc_id"), col("pred_lang"))
    val dup = Dedup.clustersFromPairs(Dedup.verifiedComponentEdgesDf(base))
      .select(col("doc_id"), col("keep").as("dk"))
    val rate = cfg.sampleRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("pred_lang") === l, lit(r)).otherwise(acc)
    }
    val bucket = pmod(
      graft.functions.PolyHash.column(col("doc_id").cast("string")), lit(100L))
    val sampleKeep =
      if (cfg.applySampling) bucket < rate.cast("long") else lit(true)
    quality.join(lang, Seq("doc_id"))
      .join(dup, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("quality"), col("pred_lang"),
        coalesce(col("dk"), lit(true)).as("dup_keep"),
        sampleKeep.as("sample_keep"))
      .withColumn("keep",
        col("quality") >= cfg.qualityBar && col("pred_lang") === cfg.targetLang &&
          col("dup_keep") && col("sample_keep"))
  }

  /** Run the full job: returns (curated docs [+ packing columns when
    * configured], per-doc decisions, funnel report). The curated frame
    * keeps every input column of the surviving docs.
    */
  def run(docs: DataFrame, cfg: Config = Config()): (DataFrame, DataFrame, Report) = {
    val decisions = decide(docs, cfg)
    val kept = docs.join(decisions.filter(col("keep")).select(col("doc_id")), Seq("doc_id"))
    val curated =
      if (!cfg.applyPacking) kept
      else {
        // per-source sequence packing (the curation_pack shape); a frame
        // without `source` packs as one shard
        val src = if (kept.columns.contains("source")) col("source") else lit("all")
        val toks = kept.withColumn("__src", src)
          .withColumn("n_ws_tokens",
            when(length(trim(col("text"))) === 0, 0L)
              .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")))
          .filter(col("n_ws_tokens") > 0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__src")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        toks
          .withColumn("tokens_before", coalesce(sum(col("n_ws_tokens")).over(w), lit(0L)))
          .withColumn("seq_id", (col("tokens_before") / cfg.packBudget).cast("long"))
          .withColumn("seq_offset", col("tokens_before") % cfg.packBudget)
          .drop("__src", "tokens_before")
      }
    // sums over an EMPTY frame are NULL, not 0 — coalesce before collect
    val r = decisions.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("quality") < cfg.qualityBar, 1L).otherwise(0L)), lit(0L)).as("nq"),
        coalesce(sum(when(col("pred_lang") =!= cfg.targetLang, 1L).otherwise(0L)), lit(0L)).as("nl"),
        coalesce(sum(when(!col("dup_keep"), 1L).otherwise(0L)), lit(0L)).as("nd"),
        coalesce(sum(when(!col("sample_keep"), 1L).otherwise(0L)), lit(0L)).as("ns"),
        coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L)).as("nk"))
      .collect()(0)
    val report = Report(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5),
      if (r.getLong(0) == 0) 0.0 else r.getLong(5).toDouble / r.getLong(0))
    (curated, decisions, report)
  }
}
