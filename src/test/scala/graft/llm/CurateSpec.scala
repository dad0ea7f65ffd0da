package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline invariants (values are pinned by the
  * DuckDB oracle; these pin the properties that make the composition
  * correct and scale-shaped). */
class CurateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every stage provably fired; output respects all gates at once") {
    val out = Curate.qCurateE2e(spark, sf).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(1)).toSet

    // dedup fired: no derived copy (id >= 1,000,000) can survive — its
    // original always has the lower id for the same content key
    assert(ids.forall(_ < 1000000L), "a copy outlived its original")
    // decontamination fired: no eval-set doc (id % 97 == 0) survives
    assert(ids.forall(_ % 97 != 0), "an eval-set document survived")
    // quality gate: all survivors at or above the threshold
    assert(out.forall(_.getDouble(2) >= Curate.MinQuality))
    // quota cap: at most K per source
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= Curate.CurateK))
    // split gate: the per-row hash, not position, decides membership
    val splits = out.map(r => (r.getLong(1), r.getString(3)))
    assert(splits.forall { case (_, s) => Set("train", "val", "test")(s) })

    // cross-check against the standalone stages on the same corpus:
    // survivors ∩ eval = ∅ was pinned above; survivors must be the
    // TOP-K by quality among ALL clean docs of their source
    val clean = TextAnalysis.qualityScored(spark, sf)
      .filter(s"quality >= ${Curate.MinQuality} and doc_id % 97 != 0")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDecimal(2).doubleValue()))
    for ((src, rows) <- clean.groupBy(_._1); if bySource.contains(src)) {
      val want = rows.sortBy { case (_, id, q) => (-q, id) }
        .take(Curate.CurateK).map(_._2).toSet
      val got = bySource(src).map(_.getLong(1)).toSet
      assert(got === want, s"source $src survivors are not its top-K")
    }
  }

  test("plan shape: eval-set anti-join broadcasts; no per-source window") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Curate.qCurateE2e(spark, sf)
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case r: ReusedExchangeExec => nodes(r.child)
      case other => Seq(other)
    }.flatten
    val ns = nodes(df.queryExecution.executedPlan)
    assert(!ns.exists(_.isInstanceOf[WindowExec]),
      "quota cap must stay the bounded TopK aggregate, not a window")
    val anti = ns.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(anti.nonEmpty, "decontamination must be a broadcast anti-join")
  }
}
