package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Feature-vector invariants (the DuckDB oracle pins exact values). */
class FeaturesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("user features: counts partition n_events, span non-negative") {
    val rows = Features.qUserFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_events"))
      val parts = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(parts.sum === n, s"user ${r.get(0)}: type counts don't partition")
      assert(r.getLong(r.fieldIndex("span_us")) >= 0L)
      // purchase_total is NULL exactly when the user has no purchases
      val total = r.get(r.fieldIndex("purchase_total"))
      assert((total == null) === (r.getLong(r.fieldIndex("n_purchase")) == 0L))
    }
  }

  test("user features plan: one two-phase aggregate, no window or join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}
    val df = Features.qUserFeatures(spark, sf)
    df.collect()
    def bad(p: SparkPlan): Seq[String] = p.collect {
      case _: WindowExec => Seq("window")
      case _: BaseJoinExec => Seq("join")
      case _: CartesianProductExec => Seq("cartesian")
      case a: AdaptiveSparkPlanExec => bad(a.executedPlan)
      case q: QueryStageExec => bad(q.plan)
    }.flatten
    assert(bad(df.queryExecution.executedPlan).isEmpty,
      "feature build must be a single keyed aggregation")
  }
}
