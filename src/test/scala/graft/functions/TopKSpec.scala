package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TopK aggregate vs the reference semantics `ROW_NUMBER() OVER
  * (ORDER BY ord DESC, tie ASC) <= k`, on randomized input with forced
  * ties (fixed seed — deterministic). */
class TopKSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val rowSchema = StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false)))

  private def expected(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortBy { case (ord, tie) => (-ord, tie) }.take(k)

  test("agrees with sort-desc-take-K on random input including ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // heavy tie density: ord drawn from only 7 distinct values
    val data = Seq.tabulate(500) { i =>
      val group = i % 3
      val ord = math.floor(rnd.nextDouble() * 7) / 7.0
      val tie = rnd.nextLong().abs
      (group, ord, tie)
    }
    val df = data.toDF("g", "ord", "tie")

    for (k <- Seq(1, 5, 17)) {
      val got = df.groupBy("g")
        .agg(TopK.topK(k, rowSchema)(col("ord"), col("tie")).as("top"))
        .selectExpr("g", "explode(top) as r")
        .selectExpr("g", "r.ord as ord", "r.tie as tie")
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.map(r => (r.getDouble(1), r.getLong(2))).toSeq).toMap

      for (g <- 0 until 3) {
        val input = data.collect { case (`g`, ord, tie) => (ord, tie) }
        assert(got(g) === expected(input, k), s"group $g, k=$k")
      }
    }
  }

  test("groups smaller than K return all rows, still ordered") {
    import spark.implicits._
    val df = Seq((1, 2.0, 7L), (1, 5.0, 3L), (1, 5.0, 1L)).toDF("g", "ord", "tie")
    val got = df.groupBy("g")
      .agg(TopK.topK(10, rowSchema)(col("ord"), col("tie")).as("top"))
      .selectExpr("explode(top) as r")
      .selectExpr("r.ord as ord", "r.tie as tie")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got === Seq((5.0, 1L), (5.0, 3L), (2.0, 7L)))
  }

  test("merge path: many partitions reduce to the same answer") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(1000)((rnd.nextInt(3).toDouble, rnd.nextLong().abs))
    val df = data.toDF("ord", "tie").repartition(32) // force partial buffers
    val got = df.agg(TopK.topK(8, rowSchema)(col("ord"), col("tie")).as("top"))
      .selectExpr("explode(top) as r")
      .selectExpr("r.ord as ord", "r.tie as tie")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got === expected(data, 8))
  }
}
