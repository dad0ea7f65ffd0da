package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming operators against batch ground truth: the streamed result
  * after the watermark closes must equal the same aggregation run as a
  * batch query over the same events. */
class EventStreamsSpec extends AnyFunSuite {
  import EventStreams._

  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z")
      .plusSeconds(minute * 60L))

  private def evt(id: Long, minute: Int, user: Long, tpe: String, v: Double) =
    Event(id, ts(minute), user, tpe, v)

  test("hourly windowed counts with watermark match the batch rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      val events = Seq(
        evt(1, 5, 1, "view", 1.0), evt(2, 20, 2, "view", 2.0),
        evt(3, 61, 1, "click", 3.0), evt(4, 70, 2, "view", 4.0),
        evt(5, 130, 1, "view", 5.0))
      input.addData(events: _*)
      query.processAllAvailable()
      // advance watermark far enough to close every window
      input.addData(evt(99, 600, 9, "tick", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("hourly")
        .select("hour_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = events.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("tv"))
        .select(col("window.start"), col("event_type"), col("n"), col("tv"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch)
      assert(streamed.size === 4) // (h0: view×2) (h1: click, view) (h2: view)
    } finally query.stop()
  }

  test("stateful sessionization closes sessions on the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0,10,20 (one session), then 120,125 (second)
      // user 2: single event at 15
      input.addData(
        evt(1, 0, 1, "view", 1.0), evt(2, 10, 1, "view", 2.0),
        evt(3, 20, 1, "click", 3.0), evt(4, 15, 2, "view", 10.0))
      query.processAllAvailable()
      input.addData(evt(5, 120, 1, "view", 4.0), evt(6, 125, 1, "view", 5.0))
      query.processAllAvailable()
      // push the watermark beyond every session's gap so all close
      input.addData(evt(99, 600, 9, "tick", 0.0))
      query.processAllAvailable()
      input.addData(evt(100, 1200, 9, "tick", 0.0))
      query.processAllAvailable()

      val out = spark.table("sessions")
        .filter("user_id <> 9") // watermark-tick user closes its own session
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(out === Set(
        (1L, ts(0), ts(20), 3L, 6.0),
        (1L, ts(120), ts(125), 2L, 9.0),
        (2L, ts(15), ts(15), 1L, 10.0)))
    } finally query.stop()
  }

  test("streaming first-seen dedup suppresses within-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = dedupFirstSeen(input.toDF(), Seq("event_type", "value"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(
        evt(1, 0, 1, "view", 1.0), evt(2, 1, 2, "view", 1.0), // dup of (view,1.0)
        evt(3, 2, 1, "click", 2.0))
      query.processAllAvailable()
      // later batch: another duplicate within the horizon + a fresh key
      input.addData(evt(4, 10, 3, "view", 1.0), evt(5, 11, 3, "view", 9.0))
      query.processAllAvailable()

      val kept = spark.table("deduped").select("event_id").as[Long].collect().toSet
      // first arrival per (event_type, value) survives: 1, 3, 5
      assert(kept === Set(1L, 3L, 5L))
    } finally query.stop()
  }

  test("streaming band join pairs match the batch inequality join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = recentErrorPairs(input.toDF(), windowMinutes = 10)
      .writeStream.format("memory").queryName("recent_errors")
      .outputMode("append").start()
    try {
      val events = Seq(
        evt(1, 5, 1, "error", 0.0),
        evt(2, 10, 2, "purchase", 1.0),  // window (0,10]: error@5, error@10
        evt(3, 10, 3, "error", 0.0),     // exactly at the purchase instant
        evt(4, 25, 4, "error", 0.0),
        evt(5, 28, 5, "error", 0.0),
        evt(6, 30, 6, "purchase", 2.0),  // window (20,30]: errors@25,28
        evt(7, 31, 7, "error", 0.0),     // after -> no pair
        evt(8, 55, 8, "purchase", 3.0))  // window (45,55]: empty
      input.addData(events: _*)
      query.processAllAvailable()

      val streamed = spark.table("recent_errors")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val df = events.toDF()
      val p = df.filter("event_type = 'purchase'")
        .selectExpr("event_id as purchase_id", "ts as p_ts")
      val e = df.filter("event_type = 'error'")
        .selectExpr("event_id as error_id", "ts as e_ts")
      val batch = p.join(e,
        col("e_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("p_ts"))
        .select("purchase_id", "error_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed === Set((2L, 1L), (2L, 3L), (6L, 4L), (6L, 5L)))
    } finally query.stop()
  }

  test("streaming funnel emits one completion per closed chain, evicts state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      // user 1 completes in-order; user 2 stalls at click; user 3's
      // purchase PRECEDES its click (ordered semantics: no completion)
      input.addData(
        evt(1, 1, 1, "view", 0), evt(2, 5, 1, "click", 0),
        evt(3, 9, 1, "purchase", 0),
        evt(4, 2, 2, "view", 0), evt(5, 6, 2, "click", 0),
        evt(6, 3, 3, "purchase", 0), evt(7, 4, 3, "view", 0),
        evt(8, 7, 3, "click", 0))
      query.processAllAvailable()
      val first = spark.table("funnel").as[FunnelCompletion].collect()
      assert(first.map(_.user_id).toSeq === Seq(1L))
      assert(first.head.t_view === ts(1) && first.head.t_click === ts(5) &&
        first.head.t_purchase === ts(9))

      // user 2 completes in a later batch; user 1's extra purchase
      // starts a NEW chain, not a duplicate completion
      input.addData(evt(9, 20, 2, "purchase", 0), evt(10, 21, 1, "purchase", 0))
      query.processAllAvailable()
      val second = spark.table("funnel").as[FunnelCompletion].collect()
      assert(second.map(_.user_id).sorted.toSeq === Seq(1L, 2L))
      assert(second.count(_.user_id == 1L) === 1, "no duplicate completion")
      val u2 = second.find(_.user_id == 2L).get
      assert(u2.t_view === ts(2) && u2.t_click === ts(6) && u2.t_purchase === ts(20))
    } finally query.stop()
  }

  test("streaming transitions equal the batch lag pairs across a split replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = transitions(input.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      // two users, interleaved types, a same-minute tie broken by
      // event_id (6 before 7), split across TWO micro-batches at an
      // event-time boundary — the cross-batch pair (user 1: click at
      // 30 → view at 45) must come from carried state
      val first = Seq(
        evt(1, 1, 1, "view", 0), evt(2, 10, 1, "click", 0),
        evt(3, 5, 2, "view", 0), evt(6, 20, 2, "click", 0),
        evt(7, 20, 2, "purchase", 0), evt(4, 30, 1, "click", 0))
      val second = Seq(
        evt(8, 45, 1, "view", 0), evt(9, 50, 2, "view", 0))
      input.addData(first: _*)
      query.processAllAvailable()
      input.addData(second: _*)
      query.processAllAvailable()

      val streamed = spark.table("transitions").as[Transition].collect()
        .map(t => (t.user_id, t.from_event, t.to_event))
        .groupBy(identity).view.mapValues(_.length).toMap
      val all = (first ++ second).toDF()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val batch = all
        .withColumn("to_event", lead(col("event_type"), 1).over(w))
        .where(col("to_event").isNotNull)
        .select(col("user_id"), col("event_type"), col("to_event"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(streamed === batch)
      // the cross-batch carried-state pair specifically
      assert(streamed.contains((1L, "click", "view")))
    } finally query.stop()
  }
}
