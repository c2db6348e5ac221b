package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic IVF coarse quantizer (reference `backends/faiss_ivf.py:6-22`:
  * train once on the corpus, `nlist` cells, probe `nprobe`).
  *
  * The fit is a bounded, canonical computation so the SAME centroids can be
  * embedded as literals into a DuckDB oracle (the minhashOracleSql pattern):
  *  - sample = first [[SampleSize]] vectors ordered by id (a TakeOrdered —
  *    never a full pass over the corpus, which is the 100 TB requirement;
  *    faiss likewise trains on a bounded training set);
  *  - fixed [[Iters]]-iteration Lloyd's loop on the driver, init = the first
  *    k sample vectors in id order, ties broken toward the lower cell id,
  *    empty cells keep their previous centroid;
  *  - centroids rounded to 6 dp at the end, making them short exact decimal
  *    literals both engines parse to the identical double.
  *
  * Everything downstream (assignment, probing) is a narrow broadcast map via
  * [[graft.functions.IvfProbes]] — the fit result is a few KB of doubles.
  */
object IvfModel {

  val SampleSize = 4096
  val Iters = 10

  private val cache =
    scala.collection.concurrent.TrieMap[(String, Int), Array[Array[Double]]]()

  /** Centroids for the embeddings table under `dir` (cached per (dir, k) —
    * plain doubles, no session reference, so ivf_build / ivf_search /
    * ann_ivf in one run share one fit). Oracle-SQL generation calls this
    * with the SAME (session, dir) threaded explicitly from Verify
    * ([[graft.SparkEntry.oracleSqlFor]]), so the literals in the generated
    * SQL are the fit the queries actually ran with — no global ordering
    * assumptions.
    */
  def centroids(spark: SparkSession, dir: String,
                k: Int = 0): Array[Array[Double]] = {
    val kk = if (k > 0) k else adaptiveK(spark, dir)
    cache.getOrElseUpdate((dir, kk),
      fitFromDf(Tables.embeddings(spark, dir), "vec_id", "embedding", kk))
  }

  private val countCache = scala.collection.concurrent.TrieMap[String, Long]()

  /** Corpus-adaptive nlist (see [[VectorOps.TargetCellSize]]): one cached
    * count job per dir; every gate scale factor lands on the historical
    * [[VectorOps.NumCells]] floor, larger corpora get proportionally more
    * cells so mean occupancy — and with it the Θ(n²/nlist) in-cell pair
    * stage — stays flat.
    */
  def adaptiveK(spark: SparkSession, dir: String): Int = {
    val n = countCache.getOrElseUpdate(dir, Tables.embeddings(spark, dir).count())
    math.max(VectorOps.NumCells,
      math.min(VectorOps.MaxCells, ((n + VectorOps.TargetCellSize - 1) /
        VectorOps.TargetCellSize).toInt))
  }

  /** Fit on the deterministic bounded sample of any (id, array<float>) frame:
    * TakeOrdered(SampleSize) by id, then driver-side Lloyd's.
    */
  def fitFromDf(df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] = {
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(SampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    fit(sample, k)
  }

  /** Canonical Lloyd's: init = first k sample rows, [[Iters]] iterations,
    * argmin ties to the lower cell, empty cells keep their centroid,
    * output rounded to 6 dp. Pure function of (sample, k).
    */
  def fit(sample: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF fit needs a non-empty sample")
    val dim = sample.head.length
    val n = sample.length
    var cents = Array.tabulate(k)(i => sample(i % n).clone())
    var it = 0
    while (it < Iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < n) {
        val x = sample(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          while (j < dim) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += x(j); j += 1 }
        i += 1
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(dim)(j => sums(c)(j) / counts(c)))
      it += 1
    }
    cents.map(_.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  /** Hierarchical coarse layer over a flat fit: super-centroids are the
    * SAME canonical Lloyd's run over the cell centroids themselves
    * (S = ⌈√K⌉ supers), and each cell joins its argmin super (d2 rounded
    * 6 dp, ties to the lower super id — the [[graft.functions.IvfProbes]]
    * determinism rules). A pure function of the flat centroids, so both
    * levels embed as literals in generated oracle SQL; FAISS's IMI /
    * two-level IVF plays the same trick to cut coarse assignment from
    * O(N·K) to O(N·√K).
    */
  def superModel(cents: Array[Array[Double]]): (Array[Array[Double]], Array[Int]) = {
    val s = math.max(1, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val supers = fit(cents, s)
    val memberOf = cents.map { c =>
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < supers.length) {
        var acc = 0.0
        var d = 0
        while (d < c.length) { val t = c(d) - supers(j)(d); acc += t * t; d += 1 }
        val r = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (r < bd) { bd = r; best = j }
        j += 1
      }
      best
    }
    (supers, memberOf)
  }

  /** DuckDB CTE `cents(cell, centroid)` embedding the fitted centroids as
    * literals — the oracle replays assignment/probing as exact arithmetic on
    * the identical doubles.
    */
  def centsCte(cents: Array[Array[Double]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"(CAST($i AS BIGINT), [${c.mkString(", ")}]::DOUBLE[])"
    }.mkString("cents(cell, centroid) AS (SELECT * FROM (VALUES\n    ",
      ",\n    ", ") AS t(cell, centroid))")

  /** DuckDB CTEs `supers(sup, supcent)` + `mem(cell, sup)` embedding the
    * [[superModel]] literals — the two-level probe replays exactly.
    */
  def superCtes(supers: Array[Array[Double]], memberOf: Array[Int]): String = {
    val sc = supers.zipWithIndex.map { case (c, i) =>
      s"(CAST($i AS BIGINT), [${c.mkString(", ")}]::DOUBLE[])"
    }.mkString("supers(sup, supcent) AS (SELECT * FROM (VALUES\n    ",
      ",\n    ", ") AS t(sup, supcent))")
    val mc = memberOf.zipWithIndex.map { case (s, cell) =>
      s"(CAST($cell AS BIGINT), CAST($s AS BIGINT))"
    }.mkString("mem(cell, sup) AS (SELECT * FROM (VALUES\n    ",
      ",\n    ", ") AS t(cell, sup))")
    s"$sc,\n$mc"
  }
}
