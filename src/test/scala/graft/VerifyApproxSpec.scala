package graft

/** The approx-lane artifact generator must agree with the per-twin
  * error-bound specs: 4/4 checks pass at test SF, each naming its exact
  * twin, and the emitted JSON is machine-parseable (the driver/judge
  * reads it as data — a malformed artifact would silently un-gate the
  * approx lane).
  */
class VerifyApproxSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("all four sketch twins pass their measured bound at test SF") {
    val cs = VerifyApprox.checks(spark, dir)
    assert(cs.map(_.query).toSet == SparkEntry.rowsOnlyQueries,
      "the artifact must cover exactly the rows-only lane")
    cs.foreach { c =>
      assert(SparkEntry.queries.contains(c.exactTwin),
        s"${c.query}: exact twin ${c.exactTwin} is not a registered query")
      assert(c.pass, s"${c.query}: ${c.metric}=${c.value} > ${c.bound} (${c.detail})")
    }
  }

  test("heavy-hitter check applies the saturated contract when capacity is exceeded") {
    // Force the saturated regime on gate data: capacity 8 < the 15
    // distinct users per trailing window, so the sketch must evict. The
    // check should detect saturation per-day and hold the sketch to the
    // heavy-hitter bound (estimates in [true, true+n/maxTracked], presence
    // above the error floor) instead of exact agreement — and pass.
    val c = VerifyApprox.heavyHittersCheckImpl(spark, dir, 8)
    assert(!c.detail.contains("(0 saturated"),
      s"capacity 8 did not saturate the sketch: ${c.detail}")
    assert(c.pass, s"${c.metric}=${c.value} (${c.detail})")
  }

  test("maxMapSize and the eps constant track Spark and DataSketches exactly") {
    // The saturated heavy-hitters bound re-derives two library constants:
    // Spark ApproxTopK's map sizing (0.75 load factor, next power of two)
    // and DataSketches' a-priori error factor (3.5/maxMapSize). A library
    // upgrade changing either must break HERE, not silently invalidate
    // the committed sweep artifacts (r9 advisor).
    for (cap <- Seq(8, 100, 8192, 65536, 100000)) {
      val m = VerifyApprox.maxMapSize(cap)
      assert(m == org.apache.spark.sql.catalyst.expressions.aggregate
        .ApproxTopK.calMaxMapSize(cap),
        s"maxMapSize($cap) diverged from Spark's calMaxMapSize")
      for (n <- Seq(1000L, 1000000L))
        assert(3.5 * n / m == org.apache.datasketches.frequencies
          .ItemsSketch.getAprioriError(m, n),
          s"eps constant diverged from DataSketches at maxMapSize=$m n=$n")
    }
  }

  test("report JSON parses and carries the contract fields") {
    val json = VerifyApprox.reportJson(spark, dir)
    // dependency-free structural probe: one object per rows-only query,
    // each with pass:true and the numeric fields present
    SparkEntry.rowsOnlyQueries.foreach { q =>
      assert(json.contains("\"" + q + "\""), s"$q missing from artifact")
    }
    assert(json.count(_ == '{') == 1 + SparkEntry.rowsOnlyQueries.size)
    assert("\"pass\": (true|false)".r.findAllIn(json).size ==
      SparkEntry.rowsOnlyQueries.size)
    assert(!json.contains("\"pass\": false"))
  }
}
