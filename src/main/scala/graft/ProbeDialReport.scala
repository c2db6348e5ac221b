package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfModel, VectorOps}
import graft.sources.Tables

/** The recall-vs-probe-dial curve (r12 judge #1): on a corpus whose
  * latent clusters have SUBDIVIDED (cluster size > [[IvfModel]]'s target
  * cell occupancy, so one semantic cluster spans several IVF cells), the
  * nlist-driven [[VectorOps.scaledAssignProbes]] rule under-probes — the
  * clustered 512k arm measured pair recall 0.566 against the ≥ 0.8
  * design expectation, with cap share 0 and flat == hier recall to four
  * decimals, i.e. the loss is pure probe coverage. This harness measures
  * the dial directly: for each probe count it builds the flat and hier
  * multi-probe assignments, reports the post-cap candidate-pair estimate
  * (the (r/r₀)² pair-stage cost model, exact from the ≤ nCells-row cell
  * histogram) and the anchor-sampled pair recall of both probe forms,
  * and optionally times the full scan-form pair stage
  * ([[VectorOps.cellLocalPairs]] dedup=false) at selected dials.
  *
  * Per-dial recall uses [[VectorOps.anchorCellPairs]] — the approx pair
  * set restricted AT THE JOIN to anchor-touching pairs — so a dial point
  * costs one corpus assignment pass plus an anchors×cells join, not the
  * full Σ |cell|² pair stage (which the `--scan` dials price
  * separately, explicitly).
  *
  * Prints ONE JSON line:
  * `{dir, n_vectors, nlist, rule_probes, anchor_step,
  *   n_exact_anchor_pairs, dials:[{probes, cand_est_flat, cand_est_hier,
  *   assign_sec_flat, assign_sec_hier, recall_flat, recall_hier,
  *   recall_pass_sec, scan_sec_hier?}]}`
  *
  * Usage: `runMain graft.ProbeDialReport <dir> [--dials 3,4,6,8,10]
  *   [--scan 3,8]` (scan dials must be a subset of dials).
  *
  * `--target 0.8` switches to AUTO-DIAL: walk the assign dial upward
  * from the rule until each form's anchor recall meets the target
  * (capped at [[MaxAutoDial]]), then report the walked rows plus
  * `chosen_flat`/`chosen_hier` — the one-command tuning loop for a new
  * corpus ("what dial does MY data need for recall ≥ X, and what does
  * it cost?"). Each step costs one assignment pass + one anchor-join
  * recall (~15 s at 512k vectors), never a pair stage.
  */
object ProbeDialReport {

  /** Auto-dial walk ceiling: past this many probes per vector the pair
    * stage costs ≥ (MaxAutoDial/2)² × the 2-probe baseline — if recall
    * still hasn't met the target, the corpus needs a different index
    * shape (larger nlist / PQ re-rank), not more probes.
    */
  val MaxAutoDial = 16

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    def listArg(flag: String, dflt: Seq[Int]): Seq[Int] =
      args.sliding(2).collectFirst { case Array(`flag`, v) =>
        v.split(",").map(_.trim.toInt).toSeq }.getOrElse(dflt)
    val target = args.sliding(2).collectFirst {
      case Array("--target", v) => v.toDouble }
    val dials = listArg("--dials", Seq(3, 4, 6, 8, 10))
    val scans = listArg("--scan", Seq.empty).toSet
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

    val n = Tables.embeddings(spark, dir).count()
    val cents = IvfModel.centroids(spark, dir)
    val k = cents.length
    val rule = VectorOps.scaledAssignProbes(k)
    IvfModel.superModel(cents) // pre-warm so hier dials time assignment only
    System.err.println(s"[dial] $dir n=$n k=$k rule_probes=$rule")

    // the same anchor rule as UncapReport's non-buildonly path (step =
    // n/2000), so dial recalls are directly comparable with
    // UNCAP_CLUSTERED's recall_ivf/recall_ivf_hier at the rule dial
    val step = math.max(1L, n / 2000L)
    val t0 = System.nanoTime()
    val exact = VectorOps.anchorExactPairs(spark, dir, step)
      .localCheckpoint(true)
    val nExact = exact.count()
    System.err.println(f"[dial] $dir exact anchor pairs: $nExact " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s, step=$step)")

    def unpersistCk(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }

    // post-cap candidate estimate straight from the cell histogram (the
    // UncapReport arithmetic — integer-exact MaxCellFactor rule)
    def candEst(multi: DataFrame): Long = {
      val cc = multi.groupBy(col("cell")).agg(count(lit(1)).as("nc"))
      val tot = cc.agg(coalesce(sum(col("nc")), lit(0L))).head().getLong(0)
      cc.filter(col("nc") * k <= lit(VectorOps.MaxCellFactor.toLong * tot))
        .agg(coalesce(sum(col("nc") * (col("nc") - lit(1L))), lit(0L)))
        .head().getLong(0) / 2L
    }

    // optional SECOND dimension: super-probe dial at a fixed assign dial
    // (--super-dials 3,4,5,6 [--super-assign 8]) — attributes the
    // hier-vs-flat recall gap: if it is coarse-level coverage, one more
    // super-probe closes it at O(N·√K) assignment cost with ZERO
    // pair-stage cost increase (the per-vector cell count — and so the
    // candidate set — is assignProbes, not superProbes).
    val superDials = listArg("--super-dials", Seq.empty)
    val superAssign = listArg("--super-assign", Seq(8)).head

    def measureDial(d: Int): (String, Double, Double) = {
      val tf = System.nanoTime()
      val mf = VectorOps.flatMulti(spark, dir, cents, d)
      mf.count()
      val assignF = (System.nanoTime() - tf) / 1e9
      val th = System.nanoTime()
      val mh = VectorOps.hierMulti(spark, dir, cents, d)
      mh.count()
      val assignH = (System.nanoTime() - th) / 1e9
      val (cf, ch) = (candEst(mf), candEst(mh))
      val tr = System.nanoTime()
      val rf = VectorOps.dialedPairRecall(exact, mf, k, step)
        .head().getAs[Double]("recall")
      val rh = VectorOps.dialedPairRecall(exact, mh, k, step)
        .head().getAs[Double]("recall")
      val recallSec = (System.nanoTime() - tr) / 1e9
      System.err.println(f"[dial] $dir probes=$d cand flat=$cf%,d " +
        f"hier=$ch%,d recall flat=$rf%.4f hier=$rh%.4f " +
        f"(assign $assignF%.1f/$assignH%.1f s, recall $recallSec%.1f s)")
      val scan = if (scans(d)) {
        val t = System.nanoTime()
        VectorOps.cellLocalPairs(mh, k, dedup = false)
          .write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t) / 1e9
        System.err.println(f"[dial] $dir probes=$d hier scan: $s%.1f s")
        f""","scan_sec_hier":$s%.3f"""
      } else ""
      unpersistCk(mf); unpersistCk(mh)
      (f"""{"probes":$d,"cand_est_flat":$cf,"cand_est_hier":$ch,""" +
        f""""assign_sec_flat":$assignF%.3f,"assign_sec_hier":$assignH%.3f,""" +
        f""""recall_flat":$rf,"recall_hier":$rh,""" +
        f""""recall_pass_sec":$recallSec%.3f$scan}""", rf, rh)
    }

    // --target: walk the dial upward from the rule until each form meets
    // the target (or the MaxAutoDial ceiling says "wrong lever")
    val (rows, chosenJson) = target match {
      case Some(t) =>
        var chosenFlat = -1
        var chosenHier = -1
        val walked = Iterator.from(rule)
          .takeWhile(d => d <= MaxAutoDial &&
            (chosenFlat < 0 || chosenHier < 0))
          .map { d =>
            val (row, rf, rh) = measureDial(d)
            if (chosenFlat < 0 && rf >= t) chosenFlat = d
            if (chosenHier < 0 && rh >= t) chosenHier = d
            row
          }.toSeq
        System.err.println(s"[dial] $dir target=$t chosen " +
          s"flat=$chosenFlat hier=$chosenHier (-1 = not reached by " +
          s"$MaxAutoDial; consider a larger nlist or a re-rank stage)")
        (walked, s""","target":$t,"chosen_flat":$chosenFlat,""" +
          s""""chosen_hier":$chosenHier""")
      case None => (dials.map(d => measureDial(d)._1), "")
    }
    val superRows = superDials.map { s =>
      val th = System.nanoTime()
      val mh = VectorOps.hierMulti(spark, dir, cents, superAssign, s)
      mh.count()
      val assignH = (System.nanoTime() - th) / 1e9
      val ch = candEst(mh)
      val rh = VectorOps.dialedPairRecall(exact, mh, k, step)
        .head().getAs[Double]("recall")
      System.err.println(f"[dial] $dir supers=$s assign=$superAssign " +
        f"cand hier=$ch%,d recall hier=$rh%.4f (assign $assignH%.1f s)")
      unpersistCk(mh)
      f"""{"super_probes":$s,"assign_probes":$superAssign,""" +
        f""""cand_est_hier":$ch,"assign_sec_hier":$assignH%.3f,""" +
        f""""recall_hier":$rh}"""
    }
    val superJson = if (superRows.isEmpty) ""
      else s""","rule_super_probes":${VectorOps.scaledSuperProbes(k)},""" +
        s""""super_dials":[${superRows.mkString(",")}]"""
    println(s"""{"dir":"$dir","n_vectors":$n,"nlist":$k,""" +
      s""""rule_probes":$rule,"anchor_step":$step,""" +
      s""""n_exact_anchor_pairs":$nExact,""" +
      s""""dials":[${rows.mkString(",")}]$superJson$chosenJson}""")
    spark.stop()
  }
}
