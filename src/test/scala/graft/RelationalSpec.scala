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
}
