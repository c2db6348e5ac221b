package graft

import graft.operators.Relational

/** Shape/invariant checks for the relational core. Deep value parity is
  * covered by the DuckDB oracle gate (scripts/selfcheck.py) at sf0.01.
  */
class RelationalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q1_agg emits the (returnflag, linestatus) grid with positive sums") {
    val rows = Relational.q1Agg(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("avg_price") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q3_top_orders is revenue-descending with <= 10 rows") {
    val rev = Relational.q3TopOrders(spark, dir).collect().map(_.getAs[Double]("revenue"))
    assert(rev.nonEmpty && rev.length <= 10)
    assert(rev.toSeq == rev.toSeq.sorted.reverse)
  }

  test("q_window_topk keeps at most 3 per brand, rank-consecutive") {
    val byBrand = Relational.qWindowTopk(spark, dir).collect()
      .groupBy(_.getAs[String]("p_brand"))
    byBrand.foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length))
      val prices = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("p_retailprice")).toSeq
      assert(prices == prices.sorted.reverse)
    }
  }

  test("q_events_sessionize respects the 30-minute gap invariant") {
    val sessions = Relational.qEventsSessionize(spark, dir).collect()
    assert(sessions.nonEmpty)
    // sessions of one user must not overlap and must be gap-separated
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.map(s => (s.getAs[String]("session_start"), s.getAs[String]("session_end")))
        .sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 < s2)
        case _ =>
      }
    }
  }

  test("q_events_window counts sum to the event count") {
    val n = Relational.qEventsWindow(spark, dir).collect().map(_.getAs[Long]("n_events")).sum
    assert(n == graft.sources.Tables.events(spark, dir).count())
  }

  test("q_events_asof matches a brute-force latest-purchase replica") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val purchases = ev.filter(_._4 == "purchase")
    val got = graft.operators.Relational.qEventsAsof(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("match_event_id")).map(_.toLong)).toMap
    val clicks = ev.filter(_._4 == "click")
    assert(got.size == clicks.length)
    clicks.take(200).foreach { case (id, ts, uid, _, _) =>
      val cand = purchases.filter(p => p._3 == uid && p._2 <= ts)
      val want =
        if (cand.isEmpty) None
        else Some(cand.maxBy(p => (p._2, p._1))._1)
      assert(got(id) == want, s"click $id")
    }
  }


  test("q_events_asof carries a NULL-valued purchase as the match (struct carry)") {
    // The hostile-input-lane regression: a purchase whose VALUE is NULL is
    // still the latest purchase — per-field last(..., ignoreNulls) carries
    // would skip it for the value while the id points at it. Also pins the
    // same-instant tie-break (max event_id among equal-ts purchases, and
    // a purchase at the click's own instant counts).
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("asofnull").toString
    val ts = (h: Int, m: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (1L, ts(10, 0), 1L, "purchase", Some(5.0), "{}"),
      (2L, ts(10, 30), 1L, "purchase", None: Option[Double], "{}"),
      (3L, ts(11, 0), 1L, "click", Some(1.0), "{}"),
      (4L, ts(10, 45), 1L, "click", Some(1.0), "{}"),
      (5L, ts(9, 0), 2L, "click", Some(1.0), "{}"),
      (6L, ts(12, 0), 3L, "purchase", Some(1.0), "{}"),
      (7L, ts(12, 0), 3L, "purchase", Some(2.0), "{}"),
      (8L, ts(12, 0), 3L, "click", Some(9.0), "{}"))
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Relational.qEventsAsof(spark, tmp).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("match_event_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("match_value")).map(_.toDouble))).toMap
    assert(got(3L) == (Some(2L), None), "NULL-valued purchase must be the match")
    assert(got(4L) == (Some(2L), None))
    assert(got(5L) == (None, None))
    assert(got(8L) == (Some(7L), Some(2.0)), "max event_id wins the same-instant tie")
  }

  test("q_events_range_join matches a brute-force trailing-hour replica") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val purchases = ev.filter(_._4 == "purchase")
    val got = graft.operators.Relational.qEventsRangeJoin(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_recent_purchases"), r.getAs[Double]("sum_recent_value"))).toMap
    val clicks = ev.filter(_._4 == "click")
    assert(got.size == clicks.length)
    clicks.take(200).foreach { case (id, ts, uid, _, _) =>
      val in = purchases.filter(p =>
        p._3 == uid && p._2 >= ts - 3600L * 1000000L && p._2 <= ts)
      val (n, sv) = got(id)
      assert(n == in.length, s"click $id count")
      assert(math.abs(sv - in.map(_._5).sum) < 1e-5, s"click $id sum")
    }
  }


  test("q_events_funnel matches a scala replica of the windowed funnel") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000L +
        (r.getTimestamp(2).getNanos / 1000L) % 1000L))
    def firstAfter(tpe: String, prev: Map[Long, Long]): Map[Long, Long] =
      ev.filter(e => e._2 == tpe && prev.contains(e._1) &&
          e._3 > prev(e._1) && e._3 <= prev(e._1) + Relational.FunnelWindowUs)
        .groupBy(_._1).map { case (u, es) => u -> es.map(_._3).min }
    val vStage = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val cStage = firstAfter("click", vStage)
    val pStage = firstAfter("purchase", cStage)
    val r = Relational.qEventsFunnel(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_view") == vStage.size.toLong)
    assert(r.getAs[Long]("n_click") == cStage.size.toLong)
    assert(r.getAs[Long]("n_purchase") == pStage.size.toLong)
  }

  test("q_events_retention: offsets are non-negative and offset-0 covers every user") {
    val rows = Relational.qEventsRetention(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0L))
    val users = graft.sources.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    val dayZero = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(dayZero == users, "every user is active on their cohort day")
  }

  test("q_events_anomaly z-scores match a scala moments replica") {
    val daily = graft.sources.Tables.events(spark, dir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString))
      .groupBy(identity).map { case ((t, d), es) => (t, d, es.length.toLong) }.toSeq
    val stats = daily.groupBy(_._1).map { case (t, rows) =>
      val n = rows.length.toLong
      val sm = rows.map(_._3).sum
      val sq = rows.map(r => r._3 * r._3).sum
      val mean = sm.toDouble / n
      t -> (mean, math.sqrt(sq.toDouble / n - mean * mean))
    }
    val got = Relational.qEventsAnomaly(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("z"), r.getAs[Boolean]("is_anomaly")))
      .toMap
    assert(got.size == daily.size)
    daily.foreach { case (t, d, c) =>
      val (mean, std) = stats(t)
      val z = BigDecimal((c.toDouble - mean) / std)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gc, gz, ga) = got((t, d))
      assert(gc == c && gz == z, s"($t, $d)")
      assert(ga == (math.abs((c.toDouble - mean) / std) > 2.0))
    }
  }
  test("q4_order_priority matches a scala exists replica") {
    val ords = graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getString(2)))
      .filter { case (_, d, _) =>
        !d.isBefore(java.time.LocalDateTime.parse("1996-01-01T00:00:00")) &&
          d.isBefore(java.time.LocalDateTime.parse("1996-07-01T00:00:00")) }
    val liMax = graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).maxBy(_.toString)).toMap
    val want = ords
      .filter { case (k, d, _) => liMax.get(k).exists(_.isAfter(d)) }
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val got = Relational.q4OrderPriority(spark, dir).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n_orders")).toMap
    assert(got == want)
  }

  test("q15_top_supplier returns exactly the max-revenue supplier(s)") {
    val rows = Relational.q15TopSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue"))
    assert(revs.distinct.length == 1, "all returned suppliers tie at the max")
    // replica: decimal-exact revenue per supplier over the quarter
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate").collect()
      .filter { r =>
        val d = r.getAs[java.time.LocalDateTime](3)
        !d.isBefore(java.time.LocalDateTime.parse("1996-01-01T00:00:00")) &&
          d.isBefore(java.time.LocalDateTime.parse("1996-04-01T00:00:00")) }
    val rev = li.groupBy(_.getLong(0)).view.mapValues(_.map { r =>
      BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) - BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }.sum).toMap
    val mx = rev.values.max
    val wantKeys = rev.filter(_._2 == mx).keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == wantKeys)
    assert(math.abs(revs.head - mx.toDouble) < 1e-6)
  }
  test("q_events_percentiles matches a scala interpolation replica") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = graft.sources.Tables.events(spark, dir).select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val want = ev.groupBy(_._1).map { case (t, rs) =>
      val v = rs.map(_._2).sorted
      def pct(p: Double) = {
        val k = (v.length - 1).toDouble * p
        val lo = v(math.floor(k).toInt); val hi = v(math.ceil(k).toInt)
        r6(lo + (hi - lo) * (k - math.floor(k)))
      }
      (t, v.length.toLong, r6(v.head), r6(v.last), pct(0.50), pct(0.95), pct(0.99))
    }.toSet
    val got = Relational.qEventsPercentiles(spark, dir).collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("v_min"), r.getAs[Double]("v_max"),
        r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))).toSet
    assert(got == want)
  }
  test("q_events_dau_wau_approx stays within the HLL relative-error bound of exact") {
    // rsd 0.5% → 3σ ≈ 1.5%; assert 3% slack per day on both counts.
    val exact = Relational.qEventsDauWau(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    val approx = Relational.qEventsDauWauApprox(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("dau_approx"), r.getAs[Long]("wau_approx"))).toMap
    assert(approx.keySet == exact.keySet, "day coverage must match the exact twin")
    approx.foreach { case (day, (da, wa)) =>
      val (de, we) = exact(day)
      assert(math.abs(da - de).toDouble / de <= 0.03, s"$day dau $da vs $de")
      assert(math.abs(wa - we).toDouble / we <= 0.03, s"$day wau $wa vs $we")
    }
  }
  test("q_events_percentiles_approx stays within the GK rank-error bound of exact") {
    // The sketch guarantee is in RANK space: the returned value's empirical
    // CDF position must be within 1/accuracy (=1e-4) of the target
    // percentile. Assert a 10× slack (1e-3) so the spec is robust to ties.
    val vals = graft.sources.Tables.events(spark, dir)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    val got = Relational.qEventsPercentilesApprox(spark, dir).collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == vals.keySet)
    got.foreach { r =>
      val v = vals(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == v.length.toLong)
      for ((cn, p) <- Seq("p50" -> 0.50, "p95" -> 0.95, "p99" -> 0.99)) {
        val a = r.getAs[Double](cn)
        // rank interval of values == a (ties give a range; any rank in it ok)
        val lo = v.count(_ < a - 5e-7).toDouble / v.length
        val hi = v.count(_ <= a + 5e-7).toDouble / v.length
        val err = if (p < lo) p - lo else if (p > hi) p - hi else 0.0
        assert(math.abs(err) <= 1e-3,
          s"$cn=$a rank window [$lo,$hi] misses $p by $err")
      }
    }
  }
  test("q_events_heavy_hitters_approx matches exact when the sketch is unsaturated") {
    // 65536 tracked slots ≥ distinct users at this SF ⇒ the frequent-items
    // sketch never evicts ⇒ counts are provably exact. Ranks can differ only
    // in tie ORDER at the K boundary, so compare (day → count multiset) and
    // pin every reported (day, user) count against the exact per-user count.
    val exact = Relational.qEventsHeavyHitters(spark, dir).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events")))
    val approx = Relational.qEventsHeavyHittersApprox(spark, dir).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events")))
    assert(approx.nonEmpty)
    val exactCounts = exact.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(_._3).sorted.toSeq }
    val approxCounts = approx.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(_._3).sorted.toSeq }
    assert(approxCounts == exactCounts, "per-day top-K count multisets differ")
    // Every reported user's count is its TRUE trailing-window count.
    val truth = exact.map(t => (t._1, t._2) -> t._3).toMap
    approx.filter(t => truth.contains((t._1, t._2))).foreach { t =>
      assert(truth((t._1, t._2)) == t._3, s"count drift for $t")
    }
  }

  test("heavy-hitter sketch keeps the dominant item within bound when saturated") {
    // Saturate on purpose: 100 distinct values into an 8-slot sketch, with
    // one value at ~half the stream. The heavy-hitter contract: the dominant
    // item survives eviction and estimate ∈ [true, true + n/maxTracked].
    import spark.implicits._
    val n = 2000
    val xs = (0 until n).map(i => if (i % 2 == 0) 7L else (i % 100).toLong + 100L)
    val est = xs.toDF("x")
      .agg(org.apache.spark.sql.functions.expr("approx_top_k(x, 1, 8)").as("tk"))
      .select(org.apache.spark.sql.functions.expr("tk[0].item").as("item"),
        org.apache.spark.sql.functions.expr("tk[0].count").as("count"))
      .collect().head
    val trueCount = n / 2
    assert(est.getAs[Long]("item") == 7L, "dominant item evicted")
    val c = est.getAs[Long]("count")
    assert(c >= trueCount && c <= trueCount + n / 8, s"estimate $c outside bound")
  }

  test("q_events_dau_wau counts trailing-7-day distinct users") {
    val act = graft.sources.Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    val days = act.map(_._2).distinct
    val want = days.map { d =>
      val dau = act.count(_._2 == d).toLong
      val wau = act.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(7))
      }.map(_._1).distinct.length.toLong
      (d.toString, dau, wau)
    }.toSet
    val got = Relational.qEventsDauWau(spark, dir).collect().map(r =>
      (r.getAs[String]("day"), r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toSet
    assert(got == want)
  }
  test("q_orders_growth computes MoM deltas over the month table") {
    val rows = Relational.qOrdersGrowth(spark, dir).collect()
      .map(r => (r.getAs[String]("month"), r.getAs[Double]("revenue"),
        r.getAs[Long]("n_orders"),
        Option(r.get(r.fieldIndex("mom_growth"))).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._4.isEmpty, "first month has no previous to grow from")
    rows.toSeq.sliding(2).foreach {
      case Seq((_, prevRev, _, _), (_, rev, _, Some(g))) =>
        val want = BigDecimal((rev - prevRev) / prevRev)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(g - want) < 1e-9)
      case _ => fail("non-first month must carry a growth value")
    }
    // months are distinct and the order totals add up
    assert(rows.map(_._1).distinct.length == rows.length)
    val nOrders = graft.sources.Tables.orders(spark, dir).count()
    assert(rows.map(_._3).sum == nOrders)
  }
  test("q13 histogram covers every customer exactly once, zero bucket included") {
    val rows = Relational.q13CustomerDistribution(spark, dir).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("n_customers"))
    val nCust = graft.sources.Tables.customer(spark, dir).count()
    assert(rows.map(_._2).sum == nCust, "histogram must partition the customers")
    val orders = graft.sources.Tables.orders(spark, dir)
      .select("o_custkey").collect().map(_.getLong(0))
    val perCust = orders.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val zeros = nCust - perCust.size
    val want = (perCust.values.groupBy(identity).view.mapValues(_.size.toLong).toMap ++
      (if (zeros > 0) Map(0L -> zeros) else Map.empty)).toSet
    assert(rows.toSet == want)
  }

  test("q18 returns the largest orders above the quantity bar, ranked") {
    val rows = Relational.q18LargeOrders(spark, dir).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Double]("total_qty")))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (_, q) => assert(q >= 300.0) }
    val qs = rows.map(_._2).toSeq
    assert(qs == qs.sorted.reverse, "must be ordered by quantity desc")
    // replica: top orders by summed quantity
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val want = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .filter(_._2 >= 300)
      .sortBy { case (k, q) => (-q, k) }.take(10)
      .map { case (k, q) => (k, q.toDouble) }
    assert(rows.toSeq == want)
  }
}
