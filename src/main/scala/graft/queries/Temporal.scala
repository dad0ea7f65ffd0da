package graft.queries

import graft.Tables.load
import graft.operators.TemporalJoins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-join queries over the events table, backed by the generic
  * [[graft.operators.TemporalJoins]] operators. The DuckDB oracle uses
  * its NATIVE `ASOF JOIN` / inequality-join plans, so these gates prove
  * our shuffle-shaped implementations are value-identical to the
  * textbook semantics — including tie handling (inclusive match at the
  * exact probe instant) and left-join NULL/zero rows.
  *
  * Timestamps are compared in exact integer micros (`unix_micros` /
  * `epoch_us`) — the events table is TIMESTAMP(NANOS) truncated to
  * micros identically by both engines (graft.Tables.load), and integer
  * gaps avoid any interval/rounding dialect drift.
  */
object Temporal {

  /** For every purchase event: the most recent prior (or same-instant)
    * view event of the same user — its value and the gap in micros.
    * Purchases with no earlier view keep NULLs (left as-of semantics).
    *
    * The view side is pre-aggregated to one row per (user, instant)
    * with `max_by(value, event_id)` — as-of over a non-unique reference
    * is underdetermined, and DuckDB's ASOF picks an arbitrary row; the
    * pre-aggregation makes both engines deterministic and identical.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val events = load(s, dir, "events")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value").as("purchase_value"))
    val views = events.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("view_value"))
    TemporalJoins.asofJoinBackward(
      purchases, views,
      keys = Seq("user_id"), probeTime = "ts", refTime = "ts",
      probePayload = Seq("event_id", "purchase_value"),
      refPayload = Seq("view_value"))
      .select(
        col("user_id"), col("event_id"), col("view_value"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val qAsofJoinSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, ts, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts, arg_max(value, event_id) AS view_value
      |  FROM events WHERE event_type = 'view'
      |  GROUP BY user_id, ts)
      |SELECT p.user_id, p.event_id, v.view_value,
      |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  /** For every purchase event: how many error events occurred anywhere
    * in the system (no key!) in the 10 minutes up to and including the
    * purchase instant. A keyless range join — the bucketed bandCount
    * operator replaces the Cartesian product Spark would otherwise
    * plan; the oracle is DuckDB's plain inequality join. */
  def qRangeCount(s: SparkSession, dir: String): DataFrame = {
    val events = load(s, dir, "events")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val errors = events.where(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("e_us"))
    val windowUs = 10L * 60 * 1000000
    TemporalJoins.bandCount(
      purchases, errors,
      probeTimeUs = "t_us", refTimeUs = "e_us",
      loUs = -windowUs + 1, hiUs = 0)
      .select(col("event_id"), col("user_id"), col("n_matches").as("n_errors"))
      .orderBy(col("event_id"))
  }

  val qRangeCountSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |e AS (
      |  SELECT ts FROM events WHERE event_type = 'error')
      |SELECT p.event_id, p.user_id, count(e.ts) AS n_errors
      |FROM p LEFT JOIN e
      |  ON e.ts > p.ts - INTERVAL 10 MINUTE AND e.ts <= p.ts
      |GROUP BY p.event_id, p.user_id
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_range_count" -> (qRangeCount _))

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_range_count" -> qRangeCountSql)
}
