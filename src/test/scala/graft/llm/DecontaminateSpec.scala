package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination structural invariants (the DuckDB oracle pins the
  * exact values; these pin detection completeness and the
  * scale-relevant plan shape). */
class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every planted benchmark leak is detected against its source") {
    val df = Decontaminate.qDecontaminate(spark, sf)
    val out = df.collect()
    assert(out.nonEmpty)

    // the derivation plants, for every benchmark doc b (id % 97 = 0),
    // a corpus doc b + 4000000 with b's text minus its last 3 tokens —
    // each must be flagged against exactly its source with high overlap
    val benchIds = graft.Tables.load(spark, sf, "documents")
      .filter("doc_id % 97 = 0")
      .selectExpr("doc_id", s"size(split(lower(text), ' ')) as n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val plantable = benchIds.filter(_._2 >= 6).keySet // enough tokens to leak
    val detected = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    plantable.foreach { b =>
      assert(detected.contains((b + 4000000L, b)),
        s"planted leak of benchmark doc $b not detected")
    }
    // every reported pair passed the overlap gate, against a real
    // benchmark doc, and n_shared never exceeds the benchmark size
    assert(out.forall(_.getDouble(3) >= 0.5))
    assert(out.forall(r => r.getLong(1) % 97 == 0))
    assert(out.forall(r => r.getDouble(3) <= 1.0 + 1e-9))
  }

  test("benchmark index joins broadcast: the corpus never shuffles by shingle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = Decontaminate.qDecontaminate(spark, sf)
    df.collect()
    def joins(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case j: BroadcastHashJoinExec => Seq(j: SparkPlan)
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Seq(j: SparkPlan)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => Seq(j: SparkPlan)
      case a: AdaptiveSparkPlanExec => joins(a.executedPlan)
      case q: QueryStageExec => joins(q.plan)
      case r: ReusedExchangeExec => joins(r.child)
    }.flatten
    val js = joins(df.queryExecution.executedPlan)
    assert(js.nonEmpty, "expected the posting and size joins in the plan")
    js.foreach(j => assert(j.isInstanceOf[BroadcastHashJoinExec],
      s"benchmark-side join must broadcast (corpus-side shingle shuffle " +
        s"would move 100 TB of postings): ${j.getClass.getSimpleName}"))
  }

  test("embedding decontamination flags every planted semantic leak, eval side broadcast") {
    val out = Decontaminate.qDecontaminateEmbedding(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every eval vector's planted perturbation (id + 200000) must be
    // flagged against exactly its source
    val evalIds = graft.Tables.load(spark, sf, "embeddings")
      .filter("vec_id % 97 = 0").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val detected = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    evalIds.foreach { e =>
      assert(detected.contains((e + 200000L, e)),
        s"planted semantic leak of eval vector $e not detected")
    }
    // all flagged pairs clear the gate against a real eval id
    assert(rows.forall(_.getDouble(2) >= 0.95))
    assert(rows.forall(r => r.getLong(1) % 97 == 0))

    // the eval side must BROADCAST: a shuffle there would move the
    // corpus for a bounded benchmark
    val hasBroadcastNL = out.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin")
    assert(hasBroadcastNL, "expected a broadcast nested-loop over the bounded eval set")
  }
}
