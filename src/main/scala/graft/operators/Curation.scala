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
