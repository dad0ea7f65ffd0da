package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** SCALING.md names AQE's runtime skew split as the engine's answer to
  * hot join keys ("the" in a token join, a mega-domain in a source
  * join). This spec pins that the session configuration actually
  * delivers it: a join where one key holds ~95% of the left side must
  * execute as a sort-merge join whose skewed partition was SPLIT at
  * runtime (isSkewJoin), with values identical to the unskewed plan.
  * If a future session-config change silently disabled AQE skew
  * handling, every keyed operator's skew story would regress at scale
  * with no local signal — this is that signal. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: allNodes(r.child)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 300k rows, ~95% on key 0 (with a payload wide enough
      // that the hot partition crosses the split threshold);
      // right: 100 dim rows
      // pad must depend on id: a constant would fold into a literal
      // ABOVE the join and a column of identical values compresses to
      // almost nothing in the shuffle — either way the hot partition's
      // on-wire size would dodge the skew threshold
      val left = spark.range(0, 300000).selectExpr(
        "case when id < 285000 then 0 else 1 + id % 99 end as k",
        "md5(cast(id as string)) as pad")
      val right = spark.range(0, 100).selectExpr("id as k", "id * 10 as v")
      // keep the wide pad in the OUTPUT so the hot partition's bytes
      // are real (column pruning would otherwise shrink it), and
      // execute THIS frame — the skew split only exists in the
      // executed plan of the query that actually ran
      val df = left.join(right, "k").selectExpr("k", "pad", "v")
      val rows = df.collect()
      val cnt = rows.groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.length }
      assert(cnt(0L) === 285000)
      assert(cnt.values.sum === 300000)

      val smjs = allNodes(df.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected a sort-merge join")
      assert(smjs.exists(_.isSkewJoin),
        s"no skew split happened:\n${df.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
