package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream (same shape as
  * the driver's `events` table: event_id, ts, user_id, event_type,
  * value, props).
  *
  * Scale design: both operators are keyed stateful streams — state
  * lives per (window, event_type) or per user_id and shuffles on that
  * key, so a 1000-executor cluster partitions the state store exactly
  * like the batch shuffles; watermarks bound state growth (late data
  * beyond the watermark is dropped, closed windows/sessions are
  * evicted).
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Internal per-user running-session state (public: the state-store
    * encoder is codegen'd and needs accessible members). */
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Hourly tumbling-window counts per event type with a 2-hour
    * watermark — the streaming twin of the batch hourly rollup
    * (Relational q_events_hourly). Emits once a window is final
    * (Append mode ⇒ only watermark-closed windows). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: keep the FIRST occurrence per content key,
    * suppress duplicates arriving within the watermark horizon. Uses
    * the built-in `dropDuplicatesWithinWatermark` — a keyed state
    * store partitioned by the dedup key, so 1000 executors shard the
    * seen-set exactly like a batch hash aggregate, and state for keys
    * older than the watermark is evicted instead of growing forever
    * (the unbounded-state failure of plain dropDuplicates on streams).
    * Duplicates later than the horizon are late data by definition and
    * are dropped by the watermark before reaching the operator. */
  def dedupFirstSeen(events: DataFrame, keyCols: Seq[String],
      horizon: String = "2 hours"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming twin of the batch band join (q_range_count): every
    * purchase paired with each error event in its trailing
    * `windowMinutes`, as a watermarked stream-stream join.
    *
    * A keyless time-range join gives the symmetric hash join nothing
    * to shard state by, so the same cell trick as the batch operator
    * (graft.operators.TemporalJoins.bandCount) applies: bucket event
    * time into window-width cells, explode each purchase to its two
    * candidate cells, and join on the CELL as the equi key with the
    * exact range as the time-bound condition. State shards by cell,
    * and the two-sided event-time bounds + watermarks let Spark evict
    * both join buffers — bounded state at any stream rate. */
  def recentErrorPairs(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val wUs = windowMinutes * 60L * 1000000L + 1 // cell width, micros
    // exact floor division (see TemporalJoins.floorDiv: decimal path so
    // nothing rounds through a double)
    def cellOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(wUs))).cast("decimal(38,0)") / lit(wUs)).cast("long")
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
      .withColumn("cell", explode(array_distinct(array(
        cellOf(unix_micros(col("p_ts")) - lit(wUs - 1)),
        cellOf(unix_micros(col("p_ts")))))))
    val e = events.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
      .withColumn("cell", cellOf(unix_micros(col("e_ts"))))
    p.join(e,
      p("cell") === e("cell") &&
        col("e_ts") > col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("e_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("error_id"))
  }

  /** Completed view→click→purchase funnel chain for one user. */
  final case class FunnelCompletion(
      user_id: Long, t_view: java.sql.Timestamp,
      t_click: java.sql.Timestamp, t_purchase: java.sql.Timestamp)

  /** Per-user funnel progression (−1 = stage unreached). Public for
    * the codegen'd state-store encoder, like [[SessionState]]. */
  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)

  /** STREAMING conversion funnel — the continuous twin of the batch
    * `q_event_funnel`: per user, an ordered state machine advances
    * view → click (strictly later) → purchase (strictly later), and a
    * completion row is emitted EXACTLY ONCE, in the micro-batch where
    * the chain closes. State is three longs per in-progress user —
    * nothing buffers event timelines — and users idle past the
    * timeout are evicted (completed users immediately, in-progress
    * users after `idleTimeoutHours` of event time), so state size
    * tracks the ACTIVE funnel population, not history.
    *
    * Ordering contract: events are ordered within each micro-batch;
    * across batches the state machine sees watermark-disciplined
    * arrival (a stage event arriving after a later stage already
    * advanced cannot retroactively re-anchor the chain — the bounded
    * state that makes this streamable cannot replay alternatives;
    * the batch query is the exact-anchored form). */
  def funnel(
      events: Dataset[Event], idleTimeoutHours: Int = 24): Dataset[FunnelCompletion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelCompletion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            var completed = List.empty[FunnelCompletion]
            var lastTs = 0L
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              lastTs = math.max(lastTs, t)
              if (s.tPurchase < 0) e.event_type match {
                case "view" if s.tView < 0 => s = s.copy(tView = t)
                case "click" if s.tView >= 0 && s.tClick < 0 && t > s.tView =>
                  s = s.copy(tClick = t)
                case "purchase" if s.tClick >= 0 && t > s.tClick =>
                  s = s.copy(tPurchase = t)
                  completed ::= FunnelCompletion(userId,
                    new java.sql.Timestamp(s.tView), new java.sql.Timestamp(s.tClick),
                    new java.sql.Timestamp(t))
                case _ => ()
              }
            }
            if (s.tPurchase >= 0) state.remove() // chain closed: evict now
            else {
              state.update(s)
              state.setTimeoutTimestamp(lastTs + idleTimeoutHours * 3600000L)
            }
            completed.iterator
          }
      }
  }

  /** One observed (from → to) step in a user's event sequence. */
  final case class Transition(
      user_id: Long, from_event: String, to_event: String)

  /** Per-user last-seen event (public for the codegen'd state-store
    * encoder, like [[SessionState]]). */
  final case class LastEventState(ts: Long, eventId: Long, eventType: String)

  /** STREAMING transition emission — the continuous twin of the batch
    * `q_event_transitions` lag window: per user, every consecutive
    * event pair is emitted as a (from, to) row in the micro-batch
    * where the successor arrives; the consumer folds pairs into the
    * transition matrix with an ordinary (additive, idempotent via
    * batch-id) foreachBatch count — the matrix itself is
    * O(|event_types|²), so the fold is a constant-size upsert.
    *
    * State is ONE (ts, event_id, event_type) triple per active user —
    * the streaming equivalent of the lag buffer — and idle users evict
    * after `idleTimeoutHours` of event time, so state tracks the
    * active population, not history. Ordering contract: in-batch
    * events sort by (event time, event_id) exactly like the batch
    * window; across batches the state carries the last event, so the
    * emitted pairs equal the batch lag pairs whenever arrival respects
    * event-time order across batches (the watermark discipline) —
    * parity is spec-pinned batch-vs-stream on split replays. */
  def transitions(
      events: Dataset[Event], idleTimeoutHours: Int = 24): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEventState, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LastEventState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = List.newBuilder[Transition]
            var prev = state.getOption
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              prev.foreach(p =>
                out += Transition(userId, p.eventType, e.event_type))
              prev = Some(LastEventState(e.ts.getTime, e.event_id, e.event_type))
            }
            prev.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp(p.ts + idleTimeoutHours * 3600000L)
            }
            out.result().iterator
          }
      }
  }

  /** Gap-based sessionization with explicit per-user state
    * (flatMapGroupsWithState + event-time timeout): a session closes
    * when no event arrives within `gapMinutes` of its last event (by
    * watermark) — custom state semantics the built-in window cannot
    * express. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          def summary(s: SessionState): SessionSummary = SessionSummary(
            userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.n, s.total)

          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val out = state.getOption.map(summary).toSeq
            state.remove()
            out.iterator
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            for (e <- events) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= summary(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.last + gapMs)
              case None => state.remove()
            }
            closed.reverse.iterator
          }
      }
  }
}
