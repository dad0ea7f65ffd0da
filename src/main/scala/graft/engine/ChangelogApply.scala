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

  /** Checkpoint property key on the TARGET table: the source snapshot
    * its content reflects. Committed atomically with the content. */
  private[engine] def ckptKey(sourceName: String): String =
    s"graft.materialization.$sourceName.source-snapshot"

  /** ONE maintenance tick of a continuously-maintained aggregate
    * table: fold the source's changes since the target's recorded
    * checkpoint into the target, committing the updated content AND
    * the advanced checkpoint in the SAME snapshot — the exactly-once
    * construct the streaming sink uses for its high-water mark. A
    * retry after any crash is idempotent: either the commit landed
    * (checkpoint == source head → no-op) or it didn't (refold from
    * the same checkpoint); a concurrent writer on the target 409s via
    * the expected-base pin instead of silently losing rows.
    *
    * Cold start (no checkpoint yet) recomputes from the source head
    * pinned by snapshot id, so the recorded checkpoint is exactly
    * what was read. Returns the new checkpoint, or None when there
    * was nothing to fold.
    *
    * Scale: steady-state ticks pay the CHURN (changelog bounded to
    * touched files + keyed fold); only the cold start pays the
    * table. */
  def runOnce(
      spark: org.apache.spark.sql.SparkSession,
      source: GraftTable, sourceName: String,
      target: GraftTable,
      keys: Seq[String], valueCol: String): Option[Long] = {
    val srcHead = source.metadata.currentSnapshotId.getOrElse(return None)
    val tgtMeta = target.metadata
    val key = ckptKey(sourceName)
    tgtMeta.properties.get(key).flatMap(_.toLongOption) match {
      case Some(c) if c == srcHead => None // already current
      case Some(c) =>
        val changes = source.changelogScan(spark, c, Some(srcHead))
        val updated = applyCountSum(
          target.scan(spark), changes, keys, valueCol)
        target.overwriteAll(updated, tgtMeta.currentSnapshotId,
          extraProperties = Map(key -> srcHead.toString))
        Some(srcHead)
      case None =>
        val full = recomputeCountSum(
          source.scan(spark, source.AtSnapshot(srcHead)), keys, valueCol)
        target.overwriteAll(full, tgtMeta.currentSnapshotId,
          extraProperties = Map(key -> srcHead.toString))
        Some(srcHead)
    }
  }
}
