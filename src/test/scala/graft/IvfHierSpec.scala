package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IvfModel, VectorOps}

/** The hierarchical coarse quantizer: probing ALL supers must reproduce
  * the flat probe exactly (the restriction is the only approximation),
  * the pair set keeps precision 1 by construction (exact cosine scoring),
  * and the recall twin pins the loss numerically.
  */
class IvfHierSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("superModel is a pure function: every cell joins exactly one super") {
    val cents = IvfModel.centroids(spark, dir)
    val (supers, memberOf) = IvfModel.superModel(cents)
    assert(supers.length == math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    assert(memberOf.length == cents.length)
    assert(memberOf.forall(s => s >= 0 && s < supers.length))
    val (s2, m2) = IvfModel.superModel(cents)
    assert(s2.map(_.toSeq).toSeq == supers.map(_.toSeq).toSeq && m2.toSeq == memberOf.toSeq)
  }

  test("probing all supers degenerates to the flat probe, element for element") {
    val cents = IvfModel.centroids(spark, dir)
    val (supers, memberOf) = IvfModel.superModel(cents)
    val e = graft.sources.Tables.embeddings(spark, dir).limit(50)
    val flat = e.select(col("vec_id"),
        graft.functions.IvfProbes.column(col("embedding"), cents, 2).cast("string").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hier = e.select(col("vec_id"),
        graft.functions.IvfProbesHier.column(col("embedding"), supers, cents,
          memberOf, supers.length, 2).cast("string").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hier == flat)
  }

  test("hier pairs keep precision 1: every emitted pair is exact-cosine >= tau") {
    val pairs = VectorOps.annIvfHier(spark, dir).collect()
    assert(pairs.nonEmpty, "hier path found no pairs at this SF")
    val exact = Dedup.dedupEmbedding(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(exact.contains(k), s"pair $k not in the exact >=tau set")
      assert(math.abs(exact(k) - r.getDouble(2)) < 1e-9)
    }
  }

  test("ivf_build_hier covers the corpus; agreement with the flat build is pinned") {
    val flat = VectorOps.ivfBuild(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val hier = VectorOps.ivfBuildHier(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(hier.keySet == flat.keySet, "hier build must assign every vector")
    // when hier picks the same cell, the d2 is the identical rounded value
    hier.foreach { case (id, (cell, d2)) =>
      if (flat(id)._1 == cell) assert(flat(id)._2 == d2)
      else assert(d2 >= flat(id)._2, "hier d2 can never beat the exact argmin")
    }
    val a = VectorOps.ivfHierAgreement(spark, dir).collect()(0)
    assert(a.getLong(0) == flat.size.toLong)
    assert(a.getLong(1) <= a.getLong(0) && a.getDouble(2) > 0.5,
      s"two-probe agreement unexpectedly low: ${a.getDouble(2)}")
  }

  test("ann_hier_recall pins the compound loss in (0, 1]") {
    val r = VectorOps.annHierRecall(spark, dir).collect()(0)
    val (nExact, nApprox, nHit, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nExact > 0)
    assert(nHit <= nExact && nHit <= nApprox)
    assert(nApprox == nHit, "precision must be 1: approx pairs are exact-scored")
    assert(recall > 0.0 && recall <= 1.0)
  }

  test("memberless probed supers yield an empty probe array, dropped not thrown") {
    // IvfModel.fit keeps empty-cluster centroids, so superModel can emit
    // supers no cell maps to; a vector whose probed supers are ALL
    // memberless gets an EMPTY IvfProbesHier array. Under ANSI (Spark 4
    // default) element_at(…, 1) throws on that — the build path must use
    // try_element_at and drop the row. Construct the degenerate geometry
    // directly: supers 0 and 1 are nearest to the query but memberless
    // (every cell maps to super 2, far away).
    val s = spark
    import s.implicits._
    val supers = Array(Array(0.0), Array(1.0), Array(100.0))
    val cents = Array(Array(99.0), Array(101.0))
    val memberOf = Array(2, 2)
    val df = Seq((1L, Seq(0.5f)), (2L, Seq(100.0f))).toDF("vec_id", "embedding")
    val probed = df.withColumn("p",
        try_element_at(graft.functions.IvfProbesHier.column(
          col("embedding"), supers, cents, memberOf, 2, 1), lit(1)))
      .filter(col("p").isNotNull)
      .select(col("vec_id"), col("p.cell").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // vec 1 probes supers {0,1}: both memberless → dropped, no crash.
    // vec 2 probes supers {2,1}: super 2 has cells {0,1} → argmin cell 0
    // (d2 1.0 each side, tie to lower id).
    assert(probed == Map(2L -> 0L))
  }
}
