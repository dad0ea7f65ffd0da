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
}
