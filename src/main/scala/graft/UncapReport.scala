package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfModel, VectorOps}
import graft.sources.Tables

/** Scale evidence for the un-capped IVF family (r10: MaxCells 256 →
  * 65536): measures, on a corpus LARGER than the old ~65k-vector pin and
  * on a reference corpus below it, that
  *  - adaptive nlist actually grew past the old 256-cell cap,
  *  - mean cell occupancy stayed ≈ [[VectorOps.TargetCellSize]] (flat, not
  *    growing with n — the Θ(n²/K) pair-stage guard),
  *  - the pair-family runtimes scale sub-quadratically (wall-clock ratio
  *    vs the vector-count ratio),
  *  - recall holds, via [[VectorOps.sampledPairRecall]] — the bounded
  *    anchor-sampled measurement, since the exact all-pairs frame is
  *    infeasible past [[graft.operators.Dedup.EmbeddingAuditMaxRows]].
  *
  * Prints ONE JSON line: per-dir {n_vectors, nlist, fit_sec, occupancy
  * mean/max, hot cells, per-query seconds, sampled recalls} plus
  * big/small ratios. Companion to [[SkewReport]] in the sweep tooling.
  *
  * `--buildonly` restricts the per-dir report to the fit + the O(N·√K)
  * hier build + occupancy (no flat build, no pair stages, no recall):
  * the measurement mode for the MEGA corpus (>1M vectors, k > 4096)
  * where the flat O(N·K) coarse assignment is exactly the thing the
  * design retired — it exercises [[IvfModel.refineDistributed]] (the
  * k > DriverFitMaxK seed-plus-one-distributed-round path) on real
  * volume instead of the unit spec's toy frame.
  *
  * Usage: `runMain graft.UncapReport <bigDir> <smallDir> [--buildonly]`
  */
object UncapReport {

  def main(args: Array[String]): Unit = {
    val bigDir = args(0)
    val smallDir = args(1)
    val buildOnly = args.contains("--buildonly")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dirReport(dir: String): String = {
      val n = Tables.embeddings(spark, dir).count()
      val t0 = System.nanoTime()
      val cents = IvfModel.centroids(spark, dir) // includes the sample fit
      val fitSec = (System.nanoTime() - t0) / 1e9
      val k = cents.length
      System.err.println(f"[uncap] $dir n=$n k=$k fit: $fitSec%.2f s")

      // single-assign occupancy: the flat argmin (dedup_semantic /
      // ivf_build shape) normally; the O(N·√K) hier build in
      // --buildonly mode, where K makes a flat O(N·K) pass the retired
      // design
      val occSrc =
        if (buildOnly) VectorOps.ivfBuildHier(spark, dir)
        else VectorOps.ivfBuild(spark, dir)
      val occ = occSrc
        .groupBy(col("cell")).agg(count(lit(1)).as("nc"))
        .agg(count(lit(1)).as("cells_used"), max(col("nc")).as("occ_max"),
          sum(col("nc")).as("tot"))
        .head()
      val cellsUsed = occ.getLong(0)
      val occMax = occ.getLong(1)
      val occMean = occ.getLong(2).toDouble / k

      if (buildOnly) {
        def time(name: String): Double = {
          val t = System.nanoTime()
          SparkEntry.queries(name)(spark, dir)
            .write.mode("overwrite").format("noop").save()
          val sec = (System.nanoTime() - t) / 1e9
          System.err.println(f"[uncap] $dir $name: $sec%.2f s")
          sec
        }
        val hb = time("ivf_build_hier")
        return s"""{"n_vectors":$n,"nlist":$k,"fit_sec":$fitSec,""" +
          s""""cells_used":$cellsUsed,"occ_mean":$occMean,"occ_max":$occMax,""" +
          s""""queries":{"ivf_build_hier":$hb}}"""
      }
      // hot cells under the integer-exact MaxCellFactor rule on the
      // multi-probe assignment (the ann_ivf guard's own counting frame)
      val multi = Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          explode(graft.functions.IvfProbes.column(col("embedding"), cents,
            VectorOps.scaledAssignProbes(cents.length))).as("p"))
        .select(col("vec_id"), col("p.cell").as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("nc"))
        .localCheckpoint(true)
      val mTot = multi.agg(sum(col("nc"))).head().getLong(0)
      val hotCells = multi
        .filter(col("nc") * k > lit(VectorOps.MaxCellFactor.toLong * mTot))
        .count()

      def time(name: String): Double = {
        val t = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t) / 1e9
        System.err.println(f"[uncap] $dir $name: $sec%.2f s")
        sec
      }
      val qs = Seq("ivf_build", "ivf_build_hier", "ann_ivf", "ann_ivf_hier",
        "dedup_semantic").map(q => s""""$q":${time(q)}""").mkString(",")

      // anchor-sampled recall (~≤2000 anchors either way)
      val step = math.max(1L, n / 2000L)
      def recall(approx: org.apache.spark.sql.DataFrame): (Long, Double) = {
        val t = System.nanoTime()
        val r = VectorOps.sampledPairRecall(spark, dir, approx, step).head()
        System.err.println(f"[uncap] $dir recall pass: ${(System.nanoTime() - t) / 1e9}%.2f s")
        (r.getAs[Long]("n_exact_pairs"), r.getAs[Double]("recall"))
      }
      val (nExactFlat, recFlat) = recall(VectorOps.annIvf(spark, dir))
      val (_, recHier) = recall(VectorOps.annIvfHier(spark, dir))
      // the hier build's agreement with the exact flat argmin — the
      // O(N·√K) form's quality pin, measured at scale, not just gate SF
      val agree = VectorOps.ivfHierAgreement(spark, dir)
        .head().getAs[Double]("agreement")

      s"""{"n_vectors":$n,"nlist":$k,"fit_sec":$fitSec,""" +
        s""""cells_used":$cellsUsed,"occ_mean":$occMean,"occ_max":$occMax,""" +
        s""""hot_cells_capped":$hotCells,"anchor_step":$step,""" +
        s""""n_exact_anchor_pairs":$nExactFlat,"recall_ivf":$recFlat,""" +
        s""""recall_ivf_hier":$recHier,"hier_agreement":$agree,""" +
        s""""queries":{$qs}}"""
    }

    val small = dirReport(smallDir)
    val big = dirReport(bigDir)
    def field(j: String, k: String): Double =
      ("\"" + k + "\":([0-9.E-]+)").r.findFirstMatchIn(j).get.group(1).toDouble
    val nRatio = field(big, "n_vectors") / field(small, "n_vectors")
    def qRatio(q: String): Option[Double] = {
      val r = ("\"" + q + "\":([0-9.E-]+)").r
      for (b <- r.findFirstMatchIn(big); s <- r.findFirstMatchIn(small))
        yield b.group(1).toDouble / s.group(1).toDouble
    }
    val ratios = Seq("ann_ivf", "ann_ivf_hier", "dedup_semantic", "ivf_build_hier")
      .flatMap(q => qRatio(q).map(v => s""""$q":$v""")).mkString(",")
    println(s"""{"small":$small,"big":$big,"n_ratio":$nRatio,""" +
      s""""time_ratios":{$ratios},""" +
      s""""occ_mean_ratio":${field(big, "occ_mean") / field(small, "occ_mean")}}""")
    spark.stop()
  }
}
