package graft.functions

import graft.SparkTestSession
import graft.llm.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KmvSketchAgg: the k-minimum-values contract, pinned against the
  * exact distinct set.
  *  - the kept array IS the k smallest distinct hashes, sorted — not a
  *    tolerance band (that exactness is what makes the query
  *    oracle-checkable in DuckDB);
  *  - duplicates never occupy slots (the sketch is over the DISTINCT
  *    set, or the estimator is biased by frequency);
  *  - merges are sorted-merge-dedup-truncate, so repartitioning the
  *    input cannot change the kept set;
  *  - under-full groups degrade to the exact distinct count.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val K = 16

  // 300 distinct keys, key k appearing (k % 7) + 1 times — duplicates on purpose
  private def data = {
    import spark.implicits._
    (0 until 300).flatMap(k => Seq.fill(k % 7 + 1)(k.toLong)).toDF("k")
      .selectExpr("k", s"${Portable.hSpark("cast(k as string)")} as h")
  }

  private def exactMins(n: Int): Seq[Long] =
    (0 until 300).map(k => Portable.h(k.toString)).distinct.sorted.take(n)

  test("kept array is exactly the k smallest distinct hashes, sorted") {
    val sk = data.agg(KmvSketch.of(K)(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk == exactMins(K))
  }

  test("repartitioning cannot change the kept set (merge determinism)") {
    for (parts <- Seq(1, 3, 7)) {
      val sk = data.repartition(parts).agg(KmvSketch.of(K)(col("h")).as("sk"))
        .collect()(0).getSeq[Long](0)
      assert(sk == exactMins(K), s"kept set drifted at $parts partitions")
    }
  }

  test("under-full group keeps the whole distinct set (exact fallback)") {
    import spark.implicits._
    val small = (0 until 5).flatMap(k => Seq.fill(3)(k.toLong)).toDF("k")
      .selectExpr("k", s"${Portable.hSpark("cast(k as string)")} as h")
    val sk = small.agg(KmvSketch.of(K)(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk.size == 5)
    assert(sk == (0 until 5).map(k => Portable.h(k.toString)).sorted)
  }

  test("estimate lands within the KMV error envelope on uniform hashes") {
    // 300 distinct, k=16 → std err ~ 1/sqrt(14) ~ 27%; assert a loose 3-sigma band
    val sk = data.agg(KmvSketch.of(K)(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
    val est = (K - 1).toDouble * math.pow(2, 60) / sk.last.toDouble
    assert(est > 300 * 0.2 && est < 300 * 3.0,
      s"estimate $est implausible for 300 distinct keys")
  }

  test("serde round-trip preserves a partial buffer bit-exactly") {
    val agg = KmvSketchAgg(GraftShimsTestBridge.expr(col("h")), K)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 3L, 3L, 7L, 1L).foreach(buf.insert)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == buf.size)
    assert(back.values.take(back.size).toSeq == Seq(1L, 3L, 7L, 9L))
  }
}

/** Column→Expression bridge for direct aggregate construction in tests. */
private object GraftShimsTestBridge {
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftShims.expression(c)
}
