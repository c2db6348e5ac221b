package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}
import graft.sources.Tables

/** Dev scratch: stage-level timing of curation_decontam_bloom's plan —
  * `runMain graft.DevProfileBloom <sfDir>`. Times (1) the normGroups
  * materialization, (2) the eval-side kernel + Bloom build + collect,
  * (3) the train-side kernel + probe + groupBy, (4) the member-expansion
  * join, each after the previous is warm, so the deltas attribute cost to
  * stages not to the shared cache.
  */
object DevProfileBloom {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("normGroups (cached materialize)") {
      Dedup.normGroups(Tables.documents(spark, dir)).count()
    }
    (1 to 3).foreach { i =>
      t(s"full bloom run$i") {
        Curation.curationDecontamBloom(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    val contents = t("contents kernel count") {
      val c = Curation.decontamContents(spark, dir)
      c.count(); c
    }
    t("eval kernel + bloom build + collect") {
      contents.filter(col("has_eval"))
        .select(explode(col("hs")).as("h"))
        .coalesce(1)
        .agg(graft.functions.BloomAgg.column(col("h"),
          Curation.DecontamBloomEstItems, Curation.DecontamBloomBits).as("bf"))
        .collect()
    }
    t("train kernel + explode only") {
      contents.filter(size(col("train_members")) >= 1)
        .select(col("rep_id"), explode_outer(col("hs")).as("h"))
        .write.mode("overwrite").format("noop").save()
    }
    val bf = contents.filter(col("has_eval"))
      .select(explode(col("hs")).as("h")).coalesce(1)
      .agg(graft.functions.BloomAgg.column(col("h"),
        Curation.DecontamBloomEstItems, Curation.DecontamBloomBits).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    (1 to 2).foreach { i =>
      t(s"probe branch with prebuilt bf run$i") {
        val train = contents.filter(size(col("train_members")) >= 1)
          .select(col("rep_id"), size(col("hs")).cast("long").as("n_ngrams"),
            explode_outer(col("hs")).as("h"))
        val perContent = train
          .withColumn("hit", coalesce(
            graft.functions.MightContain.column(bf, col("h")), lit(false)))
          .groupBy(col("rep_id"))
          .agg(max(col("n_ngrams")).as("n_ngrams"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_contaminated"))
        perContent
          .join(contents.select(col("rep_id"), col("train_members")), Seq("rep_id"))
          .select(explode(col("train_members")).as("doc_id"), col("n_ngrams"),
            col("n_contaminated"), (col("n_contaminated") > 0L).as("contaminated"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    (1 to 2).foreach { i =>
      t(s"probe branch WITHOUT MightContain run$i") {
        val train = contents.filter(size(col("train_members")) >= 1)
          .select(col("rep_id"), size(col("hs")).cast("long").as("n_ngrams"),
            explode_outer(col("hs")).as("h"))
        val perContent = train
          .withColumn("hit", col("h") % 2 === 0)
          .groupBy(col("rep_id"))
          .agg(max(col("n_ngrams")).as("n_ngrams"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_contaminated"))
        perContent
          .join(contents.select(col("rep_id"), col("train_members")), Seq("rep_id"))
          .select(explode(col("train_members")).as("doc_id"), col("n_ngrams"),
            col("n_contaminated"), (col("n_contaminated") > 0L).as("contaminated"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    t("raw mightContainLong microbench (10M probes, 1 thread)") {
      val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bf))
      var acc = 0L
      var i = 0L
      while (i < 10000000L) { if (f.mightContainLong(i * 2654435761L)) acc += 1; i += 1 }
      println(s"  hits=$acc")
    }
    spark.stop()
  }
}
