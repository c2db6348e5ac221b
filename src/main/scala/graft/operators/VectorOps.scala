package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Vector index surface: exact flat search (reference
  * `backends/faiss_flat.py` — exact top-k), IVF build/probe (reference
  * `backends/faiss_ivf.py` — k-means `nlist` cells, probe `nprobe`),
  * re-expressed as DataFrame programs.
  *
  * Scale design (SURVEY §4): the query side is always the small side and is
  * broadcast, so flat search is a broadcast nested-loop scoring pass over
  * the big vector set — narrow, no shuffle of the corpus. IVF fits k-means
  * on a bounded sample (standard practice), broadcasts the centroids,
  * assigns cells in a narrow map, and writes partitioned-by-cell so probing
  * nprobe cells is a partition-pruned scan of nprobe/nlist of the data.
  */
object VectorOps {

  val DefaultK = 5
  val NumCells = 16
  val NProbe = 4
  val Seed = 42L

  /** Embeddings with precomputed L2 norms (computed once, reused in joins). */
  def embWithNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))

  /** Exact top-k for a (small, broadcast) query set over the full corpus.
    * Ranking is on the 6dp-ROUNDED score with vec_id tiebreak — identical
    * to the oracle, so near-tie float noise can never flip a rank across
    * engines. metric: "cos" | "dot".
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, metric: String): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("score_raw", metric match {
        case "dot" => dot(col("q_emb"), col("embedding"))
        case _     => cosinePre(dot(col("q_emb"), col("embedding")), col("q_nrm"), col("nrm"))
      })
      .withColumn("score", round(col("score_raw"), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("neighbor_id"), col("score"))
  }

  /** SURVEY §2 `knn_bruteforce`: exact cosine top-5 for queries vec_id<10. */
  def knnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = embWithNorm(spark, dir)
    topK(e, e.filter(col("vec_id") < 10), DefaultK, "cos")
  }

  /** SURVEY §2 `ann_bruteforce`: exact inner-product top-5 (the faiss-flat
    * IP metric), same broadcast shape.
    */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = embWithNorm(spark, dir)
    topK(e, e.filter(col("vec_id") < 10), DefaultK, "dot")
  }

  /** Fit seeded k-means on any (vec_id, embedding) frame and return
    * (assignments, centroids). The fit runs on the full set here; at
    * 100 TB fit on a ≤1M-row sample — the assignment pass (broadcast
    * centroids, narrow map) is unchanged.
    */
  def fitIvfOn(vectors: DataFrame, k: Int = NumCells): (DataFrame, DataFrame) = {
    val e = vectors
      .withColumn("features",
        array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    val model = new KMeans()
      .setK(k).setSeed(Seed).setMaxIter(20).setFeaturesCol("features")
      .fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val cdf = vectors.sparkSession.createDataFrame(centroids.toIndexedSeq)
      .toDF("cell", "centroid")
    (assigned, cdf)
  }

  // The fit is deterministic (fixed seed) and eager, so memoize it per
  // (session, dir): ivf_build / ivf_search / ann_ivf in one run share one
  // k-means fit instead of three. Keyed weakly on the session itself so
  // entries (and the DataFrames bound to them) die with the session —
  // an identity-hash key could collide after a session is GC'd.
  private val ivfCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, (DataFrame, DataFrame)]]()

  def fitIvf(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val perSession = ivfCache.synchronized {
      var m = ivfCache.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty
        ivfCache.put(spark, m)
      }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate(dir,
        fitIvfOn(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))))
    }
  }

  /** SURVEY §2 `ivf_build` (rows-only): cell assignment for every vector,
    * plus squared L2 distance to its centroid. Written partitioned-by-cell
    * in [[graft.index.IndexStore]].
    */
  def ivfBuild(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, cdf) = fitIvf(spark, dir)
    assigned.join(broadcast(cdf), Seq("cell"))
      .withColumn("d2",
        aggregate(
          zip_with(col("embedding"), col("centroid"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        round(col("d2"), 6).as("d2"))
  }

  /** SURVEY §2 `ivf_search` (rows-only): probe the `nprobe` nearest cells
    * per query (by centroid L2), exact cosine top-k within probed cells.
    * With a cell-partitioned index this scans nprobe/nlist of the corpus.
    */
  def ivfSearch(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, cdf) = fitIvf(spark, dir)
    val queries = embWithNorm(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val qCells = queries.crossJoin(broadcast(cdf))
      .withColumn("d2",
        aggregate(
          zip_with(col("q_emb"), col("centroid"), (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cell"))))
      .filter(col("crk") <= NProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))
    val corpus = assigned.withColumn("nrm", norm(col("embedding")))
    corpus.join(broadcast(qCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score",
        round(cosinePre(dot(col("q_emb"), col("embedding")), col("q_nrm"), col("nrm")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rk") <= DefaultK)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("vec_id").as("neighbor_id"), col("score"))
  }

  /** Vectors with multi-probe cell assignment: each vector participates in
    * its `r` nearest cells (by centroid L2), so near-boundary pairs that a
    * single-cell assignment would separate still meet. 2× the join rows
    * for a large recall gain — the standard IVF recall/cost dial.
    */
  val AssignProbes = 2

  /** SURVEY §2 `ann_ivf` (rows-only): the 100 TB scale path for
    * embedding near-dup — pairs meet only inside a shared IVF cell, so
    * the join is cell-local (shuffle keyed on cell), never n². Multi-probe
    * assignment (r=2) recovers near-boundary pairs; recall < 1 remains by
    * construction — that's the ANN trade. Same τ as dedup_embedding.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val (assigned0, cdf) = fitIvf(spark, dir)
    val multi = assigned0.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cdf))
      .withColumn("d2",
        aggregate(
          zip_with(col("embedding"), col("centroid"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cell"))))
      .filter(col("crk") <= AssignProbes)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val e = multi.withColumn("nrm", norm(col("embedding")))
    e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
      // a pair can share both probed cells; duplicate rows carry identical
      // payloads, so key the dedup on the pair ids only
      .dropDuplicates("vec_id_a", "vec_id_b")
      .withColumn("c", cosinePre(dot(col("ea"), col("eb")), col("na"), col("nb")))
      .filter(col("c") >= Dedup.EmbeddingCosThreshold)
      .select(col("vec_id_a"), col("vec_id_b"), round(col("c"), 6).as("cos_sim"))
  }
}
