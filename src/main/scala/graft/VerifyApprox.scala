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

  /** Frequent-items heavy-hitter twin: with maxTracked ≥ distinct users
    * the sketch never evicts, so the spec pins EXACT agreement — per-day
    * top-K count multisets equal, and every reported (day, user) count
    * equal to the exact per-user count. Metric = total disagreements.
    */
  private def heavyHittersCheck(spark: SparkSession, dir: String): Check = {
    val exact = operators.Relational.qEventsHeavyHitters(spark, dir)
    val approx = operators.Relational.qEventsHeavyHittersApprox(spark, dir)
    def multisets(df: DataFrame, as: String) = df.groupBy(col("day"))
      .agg(sort_array(collect_list(col("n_events"))).as(as))
    val msMismatch = multisets(exact, "ce")
      .join(multisets(approx, "ca"), Seq("day"), "full_outer")
      .agg(sum(when(col("ce").isNull || col("ca").isNull ||
        col("ce") =!= col("ca"), 1L).otherwise(0L)).as("m"))
      .collect().head.getAs[Long]("m")
    // every reported (day, user) ALSO in the exact top-K must carry the
    // true count; a boundary-tied user absent from the exact K is fine
    // (tie ORDER is the sketch's only latitude — the multiset check above
    // already pins the count values), hence inner join + spec's filter.
    val drift = approx.select(col("day"), col("user_id"),
        col("n_events").as("na"))
      .join(exact.select(col("day"), col("user_id"), col("n_events").as("ne")),
        Seq("day", "user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ne") =!= col("na"), 1L).otherwise(0L)).as("d"))
      .collect().head
    val v = (msMismatch + drift.getAs[Long]("d")).toDouble
    Check("q_events_heavy_hitters_approx", "q_events_heavy_hitters",
      "n_disagreements", v, 0.0, drift.getAs[Long]("n") > 0 && v == 0.0,
      s"${drift.getAs[Long]("n")} reported (day,user) rows, " +
        s"$msMismatch multiset mismatches (unsaturated sketch ⇒ exact)")
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
