package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfModel, VectorOps}
import graft.sources.Tables

/** Latent-cluster geometry diagnostic for the GenScale `--clustered`
  * corpora: attributes a probe-dial anomaly to what the coarse fit
  * actually did with the latent clusters, instead of guessing from the
  * recall curve alone (r14: the 1024-cluster arm needed dial 7 for
  * recall ≥ 0.8 where the ⌈cluster/TargetCellSize⌉ span formula
  * predicted 2 — this report shows whether that is span, fit
  * fragmentation, or cap overlap).
  *
  * Membership is recomputed exactly as GenScale derives it
  * (`pmod(xxhash64(vec_id, 911), latentK)` — GenScale.scala `--clustered`
  * arm), so the report works on any corpus the generator produced.
  * Reports, per corpus:
  *  - span histogram: how many distinct IVF cells each latent cluster's
  *    members were assigned to (exact argmin assignment), plus the share
  *    of each cluster's members in its OWN modal cell — fragmentation
  *    (many cells, thin tail) vs clean subdivision (few cells, thick);
  *  - rule-dial hot-cell overlap: how many latent clusters have members
  *    whose multi-probe assignments land in capped cells, and the share
  *    of all within-cluster anchor pairs those members carry — the cap's
  *    actual exposure to the recall measurement.
  *
  * Everything aggregates through (cluster, cell) count tables (≤
  * latentK·span rows), never pairs. One JSON line to stdout.
  *
  * Usage: `runMain graft.ClusterDiag <dir> <latentK> [assignProbes]`
  */
object ClusterDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val latentK = args(1).toInt
    val dialArg = if (args.length > 2) args(2).toInt else -1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = Tables.embeddings(spark, dir).count()
    val cents = IvfModel.centroids(spark, dir)
    val k = cents.length
    val dial = if (dialArg >= 1) dialArg else VectorOps.scaledAssignProbes(k)

    // exact single-assign (the ivf_build shape) + latent membership
    val cl = pmod(xxhash64(col("vec_id"), lit(911)), lit(latentK.toLong))
    val assigned = VectorOps.ivfBuild(spark, dir)
      .select(col("vec_id"), col("cell")).withColumn("cluster", cl)
    // (cluster, cell) count table — ≤ latentK · span rows
    val cc = assigned.groupBy(col("cluster"), col("cell"))
      .agg(count(lit(1)).as("nm")).localCheckpoint(true)
    val spans = cc.groupBy(col("cluster"))
      .agg(count(lit(1)).as("span"), max(col("nm")).as("modal"),
        sum(col("nm")).as("members"))
      .localCheckpoint(true)
    val spanHist = spans.groupBy(col("span")).agg(count(lit(1)).as("nc"))
      .orderBy(col("span")).collect()
      .map(r => s""""${r.getLong(0)}":${r.getLong(1)}""").mkString(",")
    val st = spans.agg(
      avg(col("span")), avg(col("modal").cast("double") / col("members")),
      min(col("members")), max(col("members"))).head()

    // rule-dial multi-probe hot cells (the exact MaxCellFactor arithmetic)
    val multi = VectorOps.flatMulti(spark, dir, cents, dial)
      .select(col("vec_id"), col("cell"))
    val hist = multi.groupBy(col("cell")).agg(count(lit(1)).as("na"))
      .localCheckpoint(true)
    val tot = hist.agg(coalesce(sum(col("na")), lit(0L))).head().getLong(0)
    val hot = hist.filter(
      col("na") * k > lit(VectorOps.MaxCellFactor.toLong * tot))
      .select(col("cell"))
    // which latent clusters OWN members whose exact cell is capped, and
    // what share of the corpus those members are: a latent cluster whose
    // single cell is hot loses ALL its within-cluster pairs to the cap
    // unless redundancy re-finds them in another probed cell
    val touch = cc.join(broadcast(hot), Seq("cell"))
      .agg(countDistinct(col("cluster")), coalesce(sum(col("nm")), lit(0L)))
      .head()
    val hotCells = hot.count()
    // within-cluster share of the EXACT ≥ τ anchor pair set (the recall
    // denominator): latent clusters whose random centers land close
    // produce CROSS-cluster true pairs, which no within-cluster span
    // formula can see — their recovery needs probes that reach the
    // neighboring cluster's cells (the r14 1024-cluster finding)
    val step = math.max(1L, n / 2000L)
    val clOf = assigned.select(col("vec_id"), col("cluster"))
    val pairs = VectorOps.anchorExactPairs(spark, dir, step)
    val ps = pairs
      .join(clOf.withColumnRenamed("vec_id", "vec_id_a")
        .withColumnRenamed("cluster", "cl_a"), Seq("vec_id_a"))
      .join(clOf.withColumnRenamed("vec_id", "vec_id_b")
        .withColumnRenamed("cluster", "cl_b"), Seq("vec_id_b"))
      .agg(count(lit(1)),
        coalesce(sum(when(col("cl_a") === col("cl_b"), 1L).otherwise(0L)),
          lit(0L))).head()
    val nPairs = ps.getLong(0)
    val within = if (nPairs > 0) ps.getLong(1).toDouble / nPairs else 1.0
    println(s"""{"dir":"$dir","n_vectors":$n,"nlist":$k,""" +
      s""""latent_k":$latentK,"assign_probes":$dial,""" +
      s""""span_hist":{$spanHist},""" +
      s""""mean_span":${st.getDouble(0)},""" +
      s""""mean_modal_share":${st.getDouble(1)},""" +
      s""""min_members":${st.getLong(2)},"max_members":${st.getLong(3)},""" +
      s""""hot_cells":$hotCells,""" +
      s""""clusters_touching_hot":${touch.getLong(0)},""" +
      s""""member_share_in_hot":${touch.getLong(1).toDouble / n},""" +
      s""""anchor_step":$step,"n_exact_anchor_pairs":$nPairs,""" +
      s""""within_cluster_pair_share":$within}""")
    spark.stop()
  }
}
