package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Driver-visible correctness for the approx lane: the 4 sketch "serving
  * twins" have no DuckDB oracle (`SparkEntry.rowsOnlyQueries` documents
  * why), so the hash gate reports them `err: no_oracle` and their
  * error-bound evidence lived only in `sbt test`. This main computes each
  * twin AGAINST ITS EXACT TWIN in one run and emits a machine-checkable
  * JSON row per query — measured bound, spec threshold, pass/fail — the
  * per-round artifact (`CORRECTNESS_approx_r0N.json`) a judge or driver
  * can read without trusting the test suite.
  *
  * Scale discipline: every comparison is an aggregation JOIN between the
  * two twins' results, collapsed to ONE summary row before any collect —
  * the only full result ever collected is the percentile frame (one row
  * per event_type, bounded by the type vocabulary). Nothing here scales
  * with the event/document count.
  */
object VerifyApprox {

  final case class Check(query: String, exactTwin: String, metric: String,
      value: Double, bound: Double, pass: Boolean, detail: String)

  /** GK percentile twin: max |CDF(p̂) − p| over (event_type, p∈{50,95,99}).
    * The sketch guarantee is rank-space; spec threshold 1e-3 (10× the
    * configured 1e-4 accuracy, robust to ties). Empirical CDF is computed
    * distributively: the (type, p, value) probe set — 3 rows per type — is
    * broadcast against events and reduced to conditional counts.
    */
  private def percentilesCheck(spark: SparkSession, dir: String): Check = {
    import spark.implicits._
    val approx = operators.Relational.qEventsPercentilesApprox(spark, dir)
      .collect() // bounded: one row per event_type
    val probes = approx.toSeq.flatMap { r =>
      Seq("p50" -> 0.50, "p95" -> 0.95, "p99" -> 0.99).map { case (cn, p) =>
        (r.getAs[String]("event_type"), cn, p, r.getAs[Double](cn))
      }
    }.toDF("event_type", "q", "p", "a")
    val agg = sources.Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .join(broadcast(probes), Seq("event_type"))
      .groupBy(col("event_type"), col("q"), col("p"), col("a"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("a") - lit(5e-7), 1L).otherwise(0L)).as("nlt"),
        sum(when(col("value") <= col("a") + lit(5e-7), 1L).otherwise(0L)).as("nle"))
      .collect() // bounded: 3 rows per event_type
    val errs = agg.map { r =>
      val n = r.getAs[Long]("n").toDouble
      val lo = r.getAs[Long]("nlt") / n
      val hi = r.getAs[Long]("nle") / n
      val p = r.getAs[Double]("p")
      if (p < lo) lo - p else if (p > hi) p - hi else 0.0
    }
    val v = if (errs.isEmpty) 1.0 else errs.max
    Check("q_events_percentiles_approx", "q_events_percentiles",
      "max_rank_error", v, 1e-3, errs.nonEmpty && v <= 1e-3,
      s"${agg.length} (event_type, percentile) probes")
  }

  /** HLL DAU/WAU twin: max per-day relative error on both counts, plus
    * exact day-coverage agreement. Spec threshold 3% (lgK=14 → rsd ≈0.8%,
    * 3σ ≈2.4%).
    */
  private def dauWauCheck(spark: SparkSession, dir: String): Check = {
    val exact = operators.Relational.qEventsDauWau(spark, dir)
    val approx = operators.Relational.qEventsDauWauApprox(spark, dir)
    val j = exact.join(approx, Seq("day"), "full_outer")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("dau").isNull || col("dau_approx").isNull, 1L)
          .otherwise(0L)).as("n_uncovered"),
        max(abs(col("dau_approx") - col("dau")).cast("double") / col("dau"))
          .as("dau_err"),
        max(abs(col("wau_approx") - col("wau")).cast("double") / col("wau"))
          .as("wau_err"))
      .collect().head // one summary row
    val uncovered = j.getAs[Long]("n_uncovered")
    val v = math.max(j.getAs[Double]("dau_err"), j.getAs[Double]("wau_err"))
    Check("q_events_dau_wau_approx", "q_events_dau_wau",
      "max_relative_error", v, 0.03,
      uncovered == 0 && v <= 0.03,
      s"${j.getAs[Long]("n_days")} days, $uncovered uncovered")
  }

  /** Frequent-items heavy-hitter twin, saturation-aware (the r8 judge's
    * finding: the old checker implemented ONLY the unsaturated criterion,
    * so a saturated sketch failed its own pinned bound instead of being
    * held to the contract that actually applies). Per trailing window:
    *
    * - UNSATURATED (distinct users ≤ maxTracked — the sketch never
    *   evicts, a Misra-Gries-family sketch is then exact): per-day top-K
    *   count multisets must equal the exact twin's, and every reported
    *   (day, user) must carry its TRUE trailing count.
    * - SATURATED: Spark's `approx_top_k_estimate` reads the DataSketches
    *   frequent-items sketch with `ErrorType.NO_FALSE_POSITIVES`
    *   (verified against the 4.1.2 bytecode), i.e. it reports ONLY items
    *   confidently above the eviction error — so a saturated window may
    *   legitimately report FEWER than K rows (even zero). With
    *   maxMapSize = 2^ceil(log2(maxTracked / 0.75)) (Spark's
    *   `calMaxMapSize`) and the DataSketches a-priori error bound
    *   eps = 3.5 · n_window / maxMapSize, the checkable contract is:
    *   (a) every reported (day, user) is a REAL window user with
    *       estimate ∈ [true, true + eps];
    *   (b) an absent user is explainable: absent from a day with no
    *       reported rows ⇒ its true count ≤ 2·eps (item didn't qualify:
    *       true ≤ est ≤ lowerBound + maxError ≤ 2·maxError); absent from
    *       a day with < K rows ⇒ same bound; absent from a full-K day ⇒
    *       true ≤ (k-th reported estimate) + eps (it may merely rank
    *       below the k-th place).
    *
    * Day coverage: every unsaturated real day must be reported, and no
    * invented day may appear; a saturated day may vanish only under
    * (b)'s no-qualifier bound. Metric = total violations, bound 0.
    */
  private def heavyHittersCheck(spark: SparkSession, dir: String): Check =
    heavyHittersCheckImpl(spark, dir, operators.Relational.HeavyHittersMaxTracked)

  /** Spark's ApproxTopK map sizing: next power of two ≥ maxTracked/0.75.
    * Re-derived here (with the eps = 3.5·n/maxMapSize a-priori constant)
    * rather than imported; VerifyApproxSpec cross-checks BOTH against the
    * actual `ApproxTopK.calMaxMapSize` and DataSketches
    * `ItemsSketch.getAprioriError`, so a Spark/DataSketches upgrade that
    * changes either constant breaks a unit test instead of silently
    * invalidating the sweep bounds (r9 advisor).
    */
  private[graft] def maxMapSize(maxTracked: Int): Int =
    Integer.highestOneBit(math.ceil(maxTracked / 0.75).toInt * 2 - 1)

  /** Spec hook: the same check at an explicit sketch capacity, so the
    * saturated branch is exercisable on gate-SF data.
    */
  private[graft] def heavyHittersCheckImpl(spark: SparkSession, dir: String,
      maxTracked: Int): Check = {
    val k = operators.Relational.HeavyHittersK
    val approx = operators.Relational
      .qEventsHeavyHittersApprox(spark, dir, maxTracked).localCheckpoint(true)
    // TRUE trailing counts for EVERY window user (not just the top-K) —
    // the saturated bounds need the full distribution. Per-(day, user)
    // rows: bounded by (active users × days), far below the event count.
    val full = operators.Relational.heavyHittersTrailing(spark, dir)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("user_id"),
        col("n_events").as("ne"))
      .localCheckpoint(true)
    // The exact twin is heavyHittersTrailing + a per-day top-K rank
    // (qEventsHeavyHitters's own definition), so derive it from the
    // checkpointed `full` instead of re-running the whole events scan +
    // trailing aggregation a second time per VerifyApprox run.
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("ne").desc, col("user_id"))
    val exact = full.withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select(col("day"), col("user_id"), col("ne").as("n_events"))
    val dayStats = full.groupBy(col("day"))
      .agg(count(lit(1)).as("u"), sum(col("ne")).as("n"))
      .select(col("day"), col("u"),
        (col("n").cast("double") * 3.5 / maxMapSize(maxTracked)).as("eps"),
        (col("u") > maxTracked).as("saturated"))
      .localCheckpoint(true)
    val nDays = dayStats.count()
    val nSat = dayStats.filter(col("saturated")).count()
    val approxDays = approx.select(col("day")).distinct()
    val coverageViol =
      dayStats.filter(!col("saturated")).select(col("day"))
        .join(approxDays, Seq("day"), "left_anti").count() +
      approxDays.join(dayStats.select(col("day")), Seq("day"), "left_anti").count()
    // Unsaturated regime: exact agreement.
    val unsatDays = dayStats.filter(!col("saturated")).select(col("day"))
    def multisets(df: DataFrame, as: String) = df.groupBy(col("day"))
      .agg(sort_array(collect_list(col("n_events"))).as(as))
    val msMismatch = multisets(exact.join(unsatDays, Seq("day")), "ce")
      .join(multisets(approx.join(unsatDays, Seq("day")), "ca"),
        Seq("day"), "full_outer")
      .filter(col("ce").isNull || col("ca").isNull || col("ce") =!= col("ca"))
      .count()
    val unsatDrift = approx.join(unsatDays, Seq("day"))
      .select(col("day"), col("user_id"), col("n_events").as("na"))
      .join(full, Seq("day", "user_id"), "left")
      .filter(col("ne").isNull || col("ne") =!= col("na")).count()
    // Saturated regime: estimate bound + absence explainability.
    val satStats = dayStats.filter(col("saturated")).select(col("day"), col("eps"))
    val satApprox = approx.join(satStats, Seq("day"))
      .select(col("day"), col("user_id"), col("n_events").as("na"))
    val estViol = satApprox.join(full, Seq("day", "user_id"), "left")
      .join(satStats, Seq("day"))
      .filter(col("ne").isNull || col("na") < col("ne") ||
        col("na").cast("double") > col("ne").cast("double") + col("eps"))
      .count()
    val satDayAgg = satApprox.groupBy(col("day"))
      .agg(min(col("na")).as("min_est"), count(lit(1)).as("n_rows"))
    val presenceViol = full.join(satStats, Seq("day"))
      .join(satDayAgg, Seq("day"), "left")
      .join(satApprox.select(col("day"), col("user_id"), lit(1).as("present")),
        Seq("day", "user_id"), "left")
      .filter(col("present").isNull && (
        ((col("n_rows").isNull || col("n_rows") < k) &&
          col("ne").cast("double") > lit(2.0) * col("eps")) ||
        (col("n_rows") >= k &&
          col("ne").cast("double") > col("min_est").cast("double") + col("eps"))))
      .count()
    val v = (coverageViol + msMismatch + unsatDrift + estViol + presenceViol).toDouble
    val nApprox = approx.count()
    // Zero reported rows is legitimate ONLY when every day is saturated
    // AND no user clears the 2·eps qualification floor — the saturated
    // NO_FALSE_POSITIVES contract then allows an empty report (r9 advisor:
    // the unconditional nApprox > 0 gate failed exactly that corpus).
    // Any unsaturated day, or any user the absence bound says MUST appear,
    // makes an empty report a real failure again.
    val mustReport = (nDays - nSat) > 0 ||
      full.join(dayStats.filter(col("saturated")), Seq("day"))
        .filter(col("ne").cast("double") > lit(2.0) * col("eps"))
        .limit(1).count() > 0
    Check("q_events_heavy_hitters_approx", "q_events_heavy_hitters",
      "n_disagreements", v, 0.0, (nApprox > 0 || !mustReport) && v == 0.0,
      s"$nApprox reported rows over $nDays days ($nSat saturated, " +
        s"maxTracked=$maxTracked); coverage=$coverageViol multiset=$msMismatch " +
        s"drift=$unsatDrift est_bound=$estViol presence=$presenceViol")
  }

  /** Bloom decontamination twin: the probe has NO false negatives, so
    * every exact contaminated count must be dominated by the bloom count
    * (metric = false-negative cells, bound 0 — the one-sided guarantee).
    * The false-positive overcount rate is reported alongside; at gate SFs
    * the 4 MiB filter's FPP ≈ 0, so it should read 0.
    */
  private def decontamBloomCheck(spark: SparkSession, dir: String): Check = {
    val exact = operators.Curation.curationDecontam(spark, dir)
      .select(col("doc_id"), col("n_ngrams").as("eng"),
        col("n_contaminated").as("enc"))
    val bloom = operators.Curation.curationDecontamBloom(spark, dir)
      .select(col("doc_id"), col("n_ngrams").as("bng"),
        col("n_contaminated").as("bnc"))
    val j = exact.join(bloom, Seq("doc_id"), "full_outer")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("enc").isNull || col("bnc").isNull ||
          col("eng") =!= col("bng"), 1L).otherwise(0L)).as("n_uncovered"),
        sum(when(col("bnc") < col("enc"), 1L).otherwise(0L)).as("n_fn"),
        sum(when(col("bnc") > col("enc"), 1L).otherwise(0L)).as("n_fp_cells"),
        sum(col("bnc") - col("enc")).as("overcount"),
        sum(col("enc")).as("total_exact"))
      .collect().head // one summary row
    val fn = j.getAs[Long]("n_fn") + j.getAs[Long]("n_uncovered")
    Check("curation_decontam_bloom", "curation_decontam",
      "n_false_negative_cells", fn.toDouble, 0.0,
      j.getAs[Long]("n_docs") > 0 && fn == 0,
      s"${j.getAs[Long]("n_docs")} docs, ${j.getAs[Long]("n_fp_cells")} " +
        s"false-positive cells, overcount ${j.getAs[Long]("overcount")} " +
        s"of ${j.getAs[Long]("total_exact")} exact contaminated n-grams")
  }

  def checks(spark: SparkSession, dir: String): Seq[Check] =
    Seq(percentilesCheck(spark, dir), dauWauCheck(spark, dir),
      heavyHittersCheck(spark, dir), decontamBloomCheck(spark, dir))

  /** The artifact body: one JSON object keyed by query name. */
  def reportJson(spark: SparkSession, dir: String): String = {
    def qs(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def num(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else f"$d%.8f"
    checks(spark, dir).map { c =>
      s"${qs(c.query)}: {" +
        s"${qs("exact_twin")}: ${qs(c.exactTwin)}, " +
        s"${qs("metric")}: ${qs(c.metric)}, " +
        s"${qs("measured")}: ${num(c.value)}, " +
        s"${qs("bound")}: ${num(c.bound)}, " +
        s"${qs("pass")}: ${c.pass}, " +
        s"${qs("detail")}: ${qs(c.detail)}}"
    }.mkString("{", ", ", "}")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val json = reportJson(spark, sfDir)
    Files.writeString(Paths.get(outPath), json + "\n")
    println(s"[verify-approx] wrote $outPath")
    println(json)
    spark.stop()
  }
}
