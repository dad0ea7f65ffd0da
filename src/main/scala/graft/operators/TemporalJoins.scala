package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal join operators Spark lacks natively: AS-OF (point-in-time)
  * join and bounded range (band) join. Both are implemented as keyed
  * shuffles — never a per-probe subquery, never a Cartesian/BNLJ —
  * because those are the only shapes that survive 100 TB.
  *
  * AS-OF: the naive plan ("for each probe row, max ref time <= t") is
  * a correlated subquery → O(probe × ref) or a nested-loop join. The
  * scalable plan is the tagged UNION: interleave both streams on the
  * partition keys, sort each partition once by (time, side), and carry
  * the reference payload forward with `last(..., ignoreNulls)` over a
  * running window. ONE shuffle on the keys, window fully partitioned,
  * whole-stage-codegen'd; cost is a sort-merge pass regardless of how
  * many probe rows share a reference row.
  *
  * Band join: with no equi-key at all ("all ref rows within W of each
  * probe row, corpus-wide") Spark's only native plan is a Cartesian
  * product. The scalable plan buckets time into width-W cells: a probe
  * row's window can only intersect its own cell and one neighbour, so
  * an equi-join on the cell id followed by the exact range filter
  * produces the identical pairs with shuffle cost O(probe + ref).
  * Reference rows are pre-aggregated per (cell, instant) so duplicate
  * timestamps never widen the join.
  *
  * The reference server delegates all query execution to engines like
  * Spark (SURVEY.md §2.5); these operators are part of the data-plane
  * surface a user of the engine expects — DuckDB ships ASOF JOIN and
  * range joins natively, and the driver oracle pins our results to
  * exactly those.
  */
object TemporalJoins {

  /** Floor division exact for any sign and magnitude: pmod is always
    * non-negative, so x − pmod(x,b) is the largest multiple of b <= x;
    * the division is carried out in DECIMAL so no value ever rounds
    * through a double (SQL `/` on integers yields DOUBLE, which is
    * only exact below 2^53). */
  private def floorDiv(x: Column, b: Long): Column =
    ((x - pmod(x, lit(b))).cast(DecimalType(38, 0)) / lit(b)).cast("long")

  /** Backward as-of join: for every probe row, attach `refPayload` from
    * the reference row with the greatest `refTime` <= `probeTime`
    * within the same `keys` group (inclusive match; ref rows at the
    * exact probe instant win). Probe rows with no earlier reference
    * keep NULL payloads (left semantics). The matched reference time
    * is returned as `asof_<refTime>`.
    *
    * The caller must ensure the reference is unique per (keys, time) —
    * pre-aggregate with `max_by` if it is not; with duplicates the
    * surviving payload would be partition-order-dependent, which is
    * exactly the nondeterminism this engine bans.
    *
    * Skew: the window is partitioned by `keys`; a pathologically hot
    * key serializes through one task like any keyed window. The usual
    * remedy (range-split the hot key's timeline and carry boundary
    * values, as the shard-pack prefix sum does) costs a second tiny
    * shuffle and is not needed for keyed event data with bounded
    * per-key cardinality.
    */
  def asofJoinBackward(
      probe: DataFrame,
      ref: DataFrame,
      keys: Seq[String],
      probeTime: String,
      refTime: String,
      probePayload: Seq[String],
      refPayload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val refTimeType = ref.schema(refTime).dataType
    // Tagged union: side 0 = reference, side 1 = probe. At equal times
    // the reference sorts FIRST, so `last` sees it -> inclusive match.
    val refSide = ref.select(
      keyCols ++ Seq(
        col(refTime).as("__t"), lit(0).as("__side"), col(refTime).as("__rt")) ++
        probePayload.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
        refPayload.map(col): _*)
    val probeSide = probe.select(
      keyCols ++ Seq(
        col(probeTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(refTimeType).as("__rt")) ++
        probePayload.map(col) ++
        refPayload.map(c => lit(null).cast(ref.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = refSide.unionByName(probeSide)
      .select(
        keyCols ++ Seq(col("__t"), col("__side")) ++ probePayload.map(col) ++
          Seq(last(col("__rt"), ignoreNulls = true).over(w).as("__asof_t")) ++
          refPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.where(col("__side") === 1)
      .select(
        keyCols ++ Seq(
          col("__t").as(probeTime), col("__asof_t").as(s"asof_$refTime")) ++
          probePayload.map(col) ++ refPayload.map(col): _*)
  }

  /** Keyless band join, aggregated: for every probe row, the COUNT of
    * reference instants in `[probeUs + loUs, probeUs + hiUs]` (bounds
    * inclusive, micros). Returns the probe columns plus `n_matches`.
    * Probe rows must be distinct (they become the grouping key).
    *
    * Shape: bucket width B = hi − lo + 1 guarantees the window spans at
    * most two consecutive buckets, so probe rows explode into <= 2
    * candidate cells and equi-join the pre-aggregated reference
    * histogram (one row per distinct reference instant per cell). The
    * exact bounds are applied inside the join condition; unmatched
    * probe rows survive the LEFT join with n_matches = 0.
    *
    * Scale: shuffle volume is O(probe·2 + distinct ref instants); the
    * per-cell reference fan-in is bounded by the event rate within one
    * window width — the same quantity the QUERY's answer is bounded
    * by, so a cell too hot to join is a window too hot to count.
    */
  def bandCount(
      probe: DataFrame,
      ref: DataFrame,
      probeTimeUs: String,
      refTimeUs: String,
      loUs: Long,
      hiUs: Long): DataFrame = {
    require(hiUs >= loUs, s"empty band [$loUs, $hiUs]")
    val width = hiUs - loUs + 1
    // reference histogram: one row per distinct instant, with its cell
    val hist = ref
      .groupBy(
        floorDiv(col(refTimeUs), width).as("__cell"),
        col(refTimeUs).as("__rt"))
      .agg(count(lit(1)).as("__rn"))
    val probeCells = probe.withColumn(
      "__cell",
      explode(array_distinct(array(
        floorDiv(col(probeTimeUs) + lit(loUs), width),
        floorDiv(col(probeTimeUs) + lit(hiUs), width)))))
    val matched = probeCells.join(
      hist,
      probeCells("__cell") === hist("__cell") &&
        col("__rt") >= col(probeTimeUs) + lit(loUs) &&
        col("__rt") <= col(probeTimeUs) + lit(hiUs),
      "left")
    matched
      .groupBy(probe.columns.map(col): _*)
      .agg(coalesce(sum(col("__rn")), lit(0L)).as("n_matches"))
  }
}
