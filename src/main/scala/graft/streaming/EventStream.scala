package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the events schema: watermarked
  * tumbling-window aggregation and gap-based sessionization with
  * `flatMapGroupsWithState` — the streaming forms of the batch queries
  * `q_events_window` / `q_events_sessionize` in [[graft.operators.Relational]].
  *
  * Scale: state is keyed by user_id, so it shards across executors with the
  * shuffle; the watermark bounds state size (sessions close and are
  * evicted once the watermark passes end+gap). Works identically on a
  * `readStream` source and (for the window agg) on batch frames.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)
  case class SessionState(startMs: Long, endMs: Long, n: Long)

  val DefaultGapMinutes = 30

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact-dedup: drop later arrivals with the same content
    * fingerprint (graft_polyhash of normalized text). State is the set of
    * seen fingerprints, bounded by the watermark:
    * `dropDuplicatesWithinWatermark` evicts a fingerprint once the
    * watermark passes its first-seen time + `withinMinutes`, so a
    * duplicate arriving within the window is dropped and state stays
    * bounded (plain `dropDuplicates("fp")` would keep every fingerprint
    * forever — fp alone isn't the event-time column, so nothing evicts).
    * This is the streaming form of the batch `dedup_exact` operator —
    * the continuous-ingest path of a training-data pipeline.
    */
  def dedupStream(docs: org.apache.spark.sql.DataFrame,
                  withinMinutes: Int = 60): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .withColumn("fp", graft.functions.PolyHash.column(
        regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withWatermark("ts", s"$withinMinutes minutes")
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Streaming HLL DAU — the incremental form of the batch serving twin
    * [[graft.operators.Relational.qEventsDauWauApprox]]. Mergeable state
    * is the entire point of the sketch: each micro-batch folds its users
    * into the day's constant-size (~16 KB) HLL register state, partial
    * merges happen map-side, and the state store holds one sketch per open
    * day window instead of a distinct-user set (which is what the exact
    * form would pin in state forever). Same lgK as the batch twin, so on
    * identical input the final register state — and therefore the estimate
    * — is identical regardless of micro-batch slicing (HLL registers are a
    * per-item max; merge order cannot change the result).
    */
  def dauApproxStream(events: DataFrame,
      lgK: Int = graft.operators.Relational.DauWauLgK): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sk"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        hll_sketch_estimate(col("sk")).as("dau_approx"))

  /** Streaming trailing-7-day WAU: a SLIDING 7-day/1-day window whose HLL
    * union is folded incrementally — observation day d covers event days
    * [d-6, d], i.e. the window ending at d+1. Each event updates 7 open
    * window sketches (the batch twin's ×7 day expansion, paid as state
    * updates instead of shuffle rows); state stays ≤ 7 sketches × open
    * days. Register-max merging makes the estimate batch-identical on the
    * same input.
    */
  def wauApproxStream(events: DataFrame,
      lgK: Int = graft.operators.Relational.DauWauLgK): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "7 days", "1 day"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sk"))
      .select(date_format(date_sub(to_date(col("window.end")), 1), "yyyy-MM-dd").as("day"),
        hll_sketch_estimate(col("sk")).as("wau_approx"))

  /** Streaming trailing-7-day heavy hitters — the incremental form of
    * [[graft.operators.Relational.qEventsHeavyHittersApprox]]: per sliding
    * window, a bounded frequent-items sketch accumulates counts across
    * micro-batches (partial merges map-side, constant state per window),
    * then the top-k estimate is a stateless projection on the finalized
    * sketch. Unsaturated (distinct users ≤ maxTracked) the counts are
    * exact, so batch parity is exact equality; saturated, the classic
    * heavy-hitter bound degrades gracefully exactly as in the batch twin.
    */
  def heavyHittersApproxStream(events: DataFrame,
      k: Int = graft.operators.Relational.HeavyHittersK,
      maxTracked: Int = graft.operators.Relational.HeavyHittersMaxTracked): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "7 days", "1 day"))
      .agg(expr(s"approx_top_k_accumulate(user_id, $maxTracked)").as("st"))
      .select(date_format(date_sub(to_date(col("window.end")), 1), "yyyy-MM-dd").as("day"),
        posexplode(expr(s"approx_top_k_estimate(st, $k)")))
      .select(col("day"), (col("pos") + 1).cast("long").as("rank"),
        col("col.item").as("user_id"), col("col.count").as("n_events"))

  /** Gap-based sessionization. A session closes when the event-time
    * watermark passes its end + gap (EventTimeTimeout), at which point it
    * is emitted and its state evicted. Events inside one micro-batch are
    * sorted per user before folding, so intra-batch order is handled.
    */
  def sessionize(events: Dataset[Event],
                 gapMinutes: Int = DefaultGapMinutes): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fold(userId: Long, evs: Iterator[Event],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
      def emit(s: SessionState): SessionOut =
        SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val sorted = evs.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        for (e <- sorted) {
          val t = e.ts.getTime
          cur = cur match {
            case Some(s) if t - s.endMs <= gapMs =>
              Some(SessionState(s.startMs, math.max(s.endMs, t), s.n + 1))
            case Some(s) =>
              closed ::= emit(s)
              Some(SessionState(t, t, 1))
            case None => Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // Timeout must be beyond the current watermark or Spark rejects it.
          state.setTimeoutTimestamp(
            math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.reverse.iterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
