package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide scale audit over EVERY registered query's EXECUTED plan:
  *
  *  - no global window (a `WindowExec` without PARTITION BY serializes
  *    its whole input through one task — the classic 100 TB killer;
  *    individual specs pinned this per-operator, this spec pins it for
  *    every query that will ever be added);
  *  - no Cartesian product (all-pairs joins must never appear — LSH
  *    bucketing, broadcast hints, and keyed joins are the sanctioned
  *    shapes; `BroadcastNestedLoopJoin` over a broadcast-bounded side
  *    is allowed, a shuffled `CartesianProductExec` is not);
  *  - no interpreted per-row UDF (`ScalaUDF` breaks whole-stage
  *    codegen and serializes every row through a closure — custom
  *    semantics belong in codegen'd Catalyst expressions, which is
  *    how every operator here is built).
  *
  * Runs at sf0.001 so the whole registry executes in one spec; plan
  * shape is scale-independent for these properties (what AQE changes —
  * join strategies, partition coalescing — never INTRODUCES a global
  * window or a Cartesian product).
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def udfsIn(p: SparkPlan): Seq[String] =
    p.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
        s"scala udf: ${u.udfName.getOrElse(u.toString)}"
    })

  private def offenders(p: SparkPlan): Seq[String] = p.collect {
    case w: WindowExec if w.partitionSpec.isEmpty =>
      Seq(s"global window: ${w.simpleStringWithNodeId()}")
    case c: CartesianProductExec =>
      Seq(s"cartesian product: ${c.simpleStringWithNodeId()}")
    case a: AdaptiveSparkPlanExec => udfsIn(a) ++ offenders(a.executedPlan)
    case q: QueryStageExec => udfsIn(q) ++ offenders(q.plan)
    case r: ReusedExchangeExec => udfsIn(r) ++ offenders(r.child)
    case other => udfsIn(other)
  }.flatten

  test("no registered query plans a global window, a cartesian product, or a scala udf") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect() // force execution so AQE finalizes every stage
      offenders(df.queryExecution.executedPlan).map(o => s"$name → $o")
    }
    assert(bad.isEmpty, s"scale-killing plan shapes:\n${bad.mkString("\n")}")
  }
}
