package graft.llm

import graft.Tables.{dsum, load}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature engineering over the events stream: the wide per-entity
  * vectors a downstream model trains on. One keyed aggregation builds
  * the whole vector — conditional counts pivot the event-type axis
  * into columns without a join per feature, min/max micros bound the
  * activity span, and the monetary sum goes through the exact DECIMAL
  * path (graft.Tables.dsum) so the result is bit-identical regardless
  * of partition merge order.
  *
  * Scale: single shuffle on user_id with full map-side partial
  * aggregation (every feature is an algebraic aggregate); output is
  * one row per entity. No window, no self-join, no pivot-by-collect —
  * the event-type domain is declared, not discovered, so the schema is
  * stable and the plan is a straight two-phase hash aggregate at any
  * corpus size.
  */
object Features {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user behavioral feature vector: event-type counts, activity
    * span in micros, and exact total purchase value. */
  def qUserFeatures(s: SparkSession, dir: String): DataFrame = {
    val typed = eventTypes.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    val features = typed ++ Seq(
      (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"),
      dsum(when(col("event_type") === "purchase", col("value"))).as("purchase_total"))
    load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), features: _*)
      .orderBy(col("user_id"))
  }

  val qUserFeaturesSql: String =
    """SELECT user_id,
      |       COUNT(*) AS n_events,
      |       COUNT(*) FILTER (event_type = 'click') AS n_click,
      |       COUNT(*) FILTER (event_type = 'error') AS n_error,
      |       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
      |       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
      |       COUNT(*) FILTER (event_type = 'view') AS n_view,
      |       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase_total
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_user_features" -> (qUserFeatures _))

  val oracleSql: Map[String, String] = Map(
    "q_user_features" -> qUserFeaturesSql)
}
