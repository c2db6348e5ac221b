package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionOut}

class EventStreamSpec extends SparkSpec {

  // Offset from epoch: an event at exactly the initial watermark (0) is
  // dropped as late by the stateful operator, so never use t=0 in tests.
  private val Base = 60L
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60000L)

  test("hourlyAgg over a memory stream emits per-hour per-type counts") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    val q = EventStream.hourlyAgg(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("hour_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set((Base, "click", 2L, 3.0), (Base + 60L, "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionize closes a session once the watermark passes end+gap") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart -> one session [0, 10]
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      // far-future event advances the watermark past 10 + 30 + 10(wm delay)
      mem.addData(Event(3, ts(600), 2, "view", 1.0))
      q.processAllAvailable()
      // one more batch so the timeout actually fires after the new watermark
      mem.addData(Event(4, ts(610), 2, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[SessionOut].collect()
      val u1 = sessions.filter(_.user_id == 1)
      assert(u1.length == 1)
      assert(u1.head.session_start == ts(0) && u1.head.session_end == ts(10)
        && u1.head.n_events == 2)
    } finally q.stop()
  }

  test("dedupStream drops same-fingerprint docs across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(1), "hello world"), (2L, ts(2), "HELLO   world"))
      q.processAllAvailable()
      mem.addData((3L, ts(3), "hello world"), (4L, ts(4), "something else"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id").as[Long].collect().sorted
      // doc 2 normalizes to doc 1's fingerprint; doc 3 is a later dup
      assert(kept.length == 2)
      assert(kept.contains(4L))
      assert(kept.exists(d => d == 1L || d == 2L))
    } finally q.stop()
  }

  test("sessionize splits on gaps within one batch") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions2")
      .outputMode(OutputMode.Append).start()
    try {
      // two bursts 100 min apart: first closes immediately (intra-batch gap)
      mem.addData(
        Event(1, ts(0), 7, "a", 1.0), Event(2, ts(5), 7, "a", 1.0),
        Event(3, ts(105), 7, "a", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions2").as[SessionOut].collect()
      assert(sessions.length == 1) // [0,5] closed; [105,105] still open
      assert(sessions.head.session_start == ts(0)
        && sessions.head.session_end == ts(5) && sessions.head.n_events == 2)
    } finally q.stop()
  }
}
