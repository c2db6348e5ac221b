package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionOut}

/** The streaming sessionizer must produce exactly the sessions the
  * oracle-verified batch query produces on the same events — the batch
  * query is the specification, the stream is the incremental form.
  */
class StreamBatchParitySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourlyAgg == batch q_events_window on real events") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    val mem = MemoryStream[Event]
    val q = EventStream.hourlyAgg(mem.toDF())
      .writeStream.format("memory").queryName("parity_hourly")
      .outputMode(OutputMode.Complete).start()
    try {
      events.grouped(300).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val streamed = spark.table("parity_hourly").collect()
        .map(r => (r.getAs[Timestamp]("hour_start").getTime / 1000, r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val batch = Relational.qEventsWindow(spark, dir).collect()
        .map(r => (fmt.parse(r.getAs[String]("hour_start")).getTime / 1000, r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (k, (n, sv)) =>
        assert(streamed(k)._1 == n, s"count mismatch at $k")
        assert(math.abs(streamed(k)._2 - sv) < 1e-6, s"sum mismatch at $k")
      }
    } finally q.stop()
  }

  test("streaming sessionize == batch q_events_sessionize on real events") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext

    val events = Tables.events(spark, dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    assert(events.length >= 500)

    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("parity_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // feed in three event-time-ordered batches, then a far-future
      // sentinel (fake user) so the watermark closes every real session
      val (b1, rest) = events.splitAt(events.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val lastTs = events.map(_.ts.getTime).max
      val sentinel = Event(-1L, new Timestamp(lastTs + 86400000L), -1L, "x", 0.0)
      mem.addData(sentinel); q.processAllAvailable()
      mem.addData(sentinel.copy(event_id = -2L)); q.processAllAvailable()

      val streamed = spark.table("parity_sessions").as[SessionOut].collect()
        .filter(_.user_id >= 0)
        .map(x => (x.user_id,
          x.session_start.getTime / 1000, x.session_end.getTime / 1000, x.n_events))
        .toSet
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val batch = Relational.qEventsSessionize(spark, dir).collect()
        .map(r => (r.getAs[Long]("user_id"),
          fmt.parse(r.getAs[String]("session_start")).getTime / 1000,
          fmt.parse(r.getAs[String]("session_end")).getTime / 1000,
          r.getAs[Long]("n_events")))
        .toSet
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}\nbatch-only: ${batch -- streamed}")
    } finally q.stop()
  }
}
