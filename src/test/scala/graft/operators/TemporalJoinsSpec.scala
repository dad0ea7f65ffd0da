package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape invariants for the temporal join operators.
  * The DuckDB oracle (q_asof_join / q_range_count) pins full-table
  * values; these pin the EDGE semantics (ties, left rows, bucket
  * boundaries) on hand-built rows where the expected answer is
  * computable by eye, and the plan shapes that make the operators
  * usable at scale (partitioned windows, no nested-loop joins).
  */
class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def recurse(p: SparkPlan)(f: PartialFunction[SparkPlan, String]): Seq[String] =
    p.collect {
      case a: AdaptiveSparkPlanExec => recurse(a.executedPlan)(f)
      case q: QueryStageExec => recurse(q.plan)(f)
      case r: ReusedExchangeExec => recurse(r.child)(f)
      case n if f.isDefinedAt(n) => Seq(f(n))
    }.flatten

  test("asof: inclusive match, ties, left rows, key isolation") {
    val probe = Seq(
      (1L, 100L, "p1"), // before any ref -> null
      (1L, 200L, "p2"), // exact instant of ref at 200 -> inclusive match
      (1L, 350L, "p3"), // between 300 and 400 -> 300
      (2L, 250L, "p4"), // key 2 has its own timeline
      (3L, 999L, "p5")  // key with no refs at all -> null
    ).toDF("k", "t", "ptag")
    val ref = Seq(
      (1L, 200L, "a"), (1L, 300L, "b"), (1L, 400L, "c"),
      (2L, 100L, "x"), (2L, 250L, "y")
    ).toDF("k", "t", "rv")

    val out = TemporalJoins.asofJoinBackward(
      probe, ref, keys = Seq("k"), probeTime = "t", refTime = "t",
      probePayload = Seq("ptag"), refPayload = Seq("rv"))
      .collect().map(r => r.getString(r.fieldIndex("ptag")) ->
        ((Option(r.get(r.fieldIndex("rv"))),
          Option(r.get(r.fieldIndex("asof_t")))))).toMap

    assert(out("p1") === ((None, None)))
    assert(out("p2") === ((Some("a"), Some(200L)))) // inclusive at equal t
    assert(out("p3") === ((Some("b"), Some(300L))))
    assert(out("p4") === ((Some("y"), Some(250L)))) // key-2 timeline only
    assert(out("p5") === ((None, None)))
  }

  test("asof plan: every window is key-partitioned, no nested-loop join") {
    val df = graft.queries.Temporal.qAsofJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    val bad = recurse(df.queryExecution.executedPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty => "global window"
      case _: CartesianProductExec => "cartesian"
      case _: BroadcastNestedLoopJoinExec => "bnlj"
    }
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("bandCount: boundaries inclusive/exclusive, multiplicity, zeros") {
    // window = [t-9, t] (lo=-9, hi=0), width 10 -> cells of 10 us
    val probe = Seq((1L, 100L), (2L, 105L), (3L, 91L), (4L, 500L)).toDF("id", "t")
    val ref = Seq(91L, 91L, 100L, 101L, 110L).toDF("rt") // two at 91
    val out = TemporalJoins.bandCount(probe, ref, "t", "rt", -9L, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_matches"))).toMap
    // probe 100 covers [91,100]: 91,91,100 -> 3 (cross-cell: 91 is in cell 9, 100 in cell 10)
    assert(out(1L) === 3L)
    // probe 105 covers [96,105]: 100,101 -> 2 (110 outside)
    assert(out(2L) === 2L)
    // probe 91 covers [82,91]: the two 91s exactly at the upper bound
    assert(out(3L) === 2L)
    // probe 500 matches nothing -> present with 0 (left semantics)
    assert(out(4L) === 0L)
  }

  test("band join plan: equi-join on cells — no cartesian, no nested loop") {
    val df = graft.queries.Temporal.qRangeCount(spark, "/root/testdata/sf0.001")
    df.collect()
    val bad = recurse(df.queryExecution.executedPlan) {
      case _: CartesianProductExec => "cartesian"
      case _: BroadcastNestedLoopJoinExec => "bnlj"
    }
    assert(bad.isEmpty,
      s"keyless range join fell back to all-pairs: ${bad.mkString(", ")}")
  }
}
