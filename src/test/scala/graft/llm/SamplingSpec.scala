package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Sampling / packing structural invariants (the DuckDB oracle pins
  * the exact VALUES; these pin the properties that make the operators
  * usable at scale). */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = Sampling.qSampleStratified(spark, sf).collect()
    val b = Sampling.qSampleStratified(spark, sf).collect()
    // determinism: rerunning selects the SAME sample (hash, not rand)
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(a.nonEmpty)

    // observed per-stratum rate stays in a loose band around the
    // configured permille (50/200/500) — the hash spreads uniformly
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr(
        """case when n_chars < 500 then 'short'
          |     when n_chars < 2000 then 'medium'
          |     else 'long' end as stratum""".stripMargin)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    val rates = Map("short" -> 0.05, "medium" -> 0.20, "long" -> 0.50)
    rates.foreach { case (stratum, rate) =>
      val total = docs.getOrElse(stratum, 0L)
      if (total >= 50) {
        val got = sampled.getOrElse(stratum, 0L).toDouble / total
        assert(math.abs(got - rate) < 0.15,
          s"$stratum: sampled $got of $total, configured $rate")
      }
    }
  }

  test("shard packing covers every document once, budget bounds respected") {
    val shards = Sampling.qShardPack(spark, sf).collect()
    assert(shards.nonEmpty)
    val totalDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(shards.map(_.getLong(1)).sum === totalDocs) // partition of corpus

    // shard ids are contiguous from 0 and id ranges never overlap
    assert(shards.map(_.getInt(0)).toSeq === shards.indices)
    shards.sliding(2).foreach {
      case Array(prev, next) =>
        assert(prev.getLong(4) < next.getLong(3), "overlapping doc ranges")
      case _ =>
    }
    // every shard except possibly the last crosses its budget boundary
    // only via its final document: tokens ≥ budget - max doc size is
    // too strong for synthetic data; assert the robust invariant —
    // a shard STARTS because the running total crossed the boundary,
    // so cumulative tokens through shard k exceed k * budget
    var cum = 0L
    shards.dropRight(1).zipWithIndex.foreach { case (r, k) =>
      cum += r.getLong(2)
      assert(cum >= (k + 1) * 10000L,
        s"shard $k ended at $cum tokens, below its boundary")
    }
  }

  test("shard packing never plans a global (single-partition) window") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Sampling.qShardPack(spark, sf)
    df.collect() // force execution so AQE finalizes the plan
    // AQE wraps finalized stages in leaf nodes — descend through them
    def windowsIn(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windowsIn(a.executedPlan)
      case q: QueryStageExec => windowsIn(q.plan)
      case r: ReusedExchangeExec => windowsIn(r.child)
    }.flatten
    val windows = windowsIn(df.queryExecution.executedPlan)
    assert(windows.nonEmpty, "expected the running-sum window in the plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"global window (no PARTITION BY) would serialize the corpus " +
        s"through one task at 100 TB: $w"))

    // the distributed prefix sum must actually SPAN ranges at test
    // scale, or the partition-spec assertion proves nothing — recompute
    // the query's own bucket cut and count the occupied ranges
    val ranges = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val b = graft.Tables.load(spark, sf, "documents")
      .selectExpr("min(doc_id) as lo", "max(doc_id) as hi").head()
    val width = math.max(1L, (b.getLong(1) - b.getLong(0)) / ranges + 1)
    val nBuckets = graft.Tables.load(spark, sf, "documents")
      .selectExpr(s"floor((doc_id - ${b.getLong(0)}L) / ${width}L) as bucket")
      .distinct().count()
    assert(nBuckets > 1, "test data too small to exercise multiple ranges")

    // bit-identical to the single-window semantics (the oracle's form)
    val single = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks")
      .selectExpr("doc_id", "n_toks",
        "sum(n_toks) over (order by doc_id rows between unbounded preceding and current row) - n_toks as prior_toks")
      .selectExpr("cast(floor(prior_toks / 10000) as int) as shard",
        "doc_id", "n_toks")
      .groupBy("shard")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("sum(n_toks) as shard_tokens"),
        org.apache.spark.sql.functions.expr("min(doc_id) as first_doc"),
        org.apache.spark.sql.functions.expr("max(doc_id) as last_doc"))
      .orderBy("shard")
    assert(df.collect().toSeq === single.collect().toSeq)
  }
}
