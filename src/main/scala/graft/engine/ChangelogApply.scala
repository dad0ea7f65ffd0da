package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}

/** The changelog CONSUMER pattern: maintain a derived aggregate from
  * [[GraftTable.changelogScan]] deltas instead of recomputing it from
  * the full table — the incremental-materialization half of CDC
  * (checkpoint a snapshot id, read the changelog forward from it,
  * fold the delta into the materialization, repeat).
  *
  * Scope: ADDITIVE aggregates (count / sum families), where a delete
  * is exactly a negated insert — the class that folds with keyed
  * arithmetic alone. Non-additive aggregates (min/max, distinct
  * counts) need retraction state and are out of scope here.
  *
  * Scale: the update is one keyed aggregation over the CHANGES (sized
  * by churn, not by table) and one keyed outer join against the
  * previous materialization — both map-side-combinable shuffles on
  * the group keys. A 100 TB table with a 1 GB daily delta pays 1 GB,
  * never 100 TB; groups whose counts return to zero drop out so the
  * materialization never accretes tombstones. */
object ChangelogApply {

  /** Fold a changelog frame into a per-key (count, sum) aggregate.
    *
    * @param prev    previous materialization: `keys ++ (n_rows, sum_v)`
    *                (empty frame = cold start)
    * @param changes a [[GraftTable.changelogScan]] result (or any
    *                frame with `_change_type` plus the key/value
    *                columns)
    * @param keys    group-by key columns
    * @param valueCol column summed into `sum_v`
    * @return the updated materialization, same shape as `prev`
    */
  def applyCountSum(
      prev: DataFrame, changes: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    val sign = when(col("_change_type") === lit("insert"), lit(1L))
      .when(col("_change_type") === lit("delete"), lit(-1L))
      .otherwise(lit(0L))
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(keys.map(col): _*)
      .agg(
        expr("sum(__sign)").as("__dn"),
        expr(s"sum(__sign * $valueCol)").as("__dv"))
    val joined = prev.join(delta, keys, "full_outer")
    val updated = joined.select(
      keys.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as("sum_v")): _*)
    updated.filter(col("n_rows") =!= lit(0L))
  }

  /** The full-recompute twin of [[applyCountSum]] — what the
    * incremental path must equal (specs pin the equivalence). */
  def recomputeCountSum(
      table: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    table.groupBy(keys.map(col): _*)
      .agg(expr("count(*)").as("n_rows"), expr(s"sum($valueCol)").as("sum_v"))

  /** Empty materialization with the right shape for a cold start. */
  def emptyCountSum(
      like: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    recomputeCountSum(like, keys, valueCol).limit(0)
}
