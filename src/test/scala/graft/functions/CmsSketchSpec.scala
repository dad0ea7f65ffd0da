package graft.functions

import graft.SparkTestSession
import graft.llm.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CmsSketchAgg: the count-min guarantees, pinned against exact counts
  * on data built to collide.
  *  - estimates NEVER undercount (the one-sided CMS bound), even with
  *    a width forced far below the key cardinality;
  *  - with ample width the estimates ARE the exact counts;
  *  - merges are elementwise sums, so repartitioning the input cannot
  *    change the grid (the determinism that rules out eviction-order
  *    sketches like SpaceSaving).
  */
class CmsSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val P = 1073741789L
  private val depth = 3
  private def aC = (0 until depth).map(r => Portable.h(s"ta$r") % (P - 1) + 1).toArray
  private def bC = (0 until depth).map(r => Portable.h(s"tb$r") % P).toArray

  // 200 distinct keys, key k appearing k+1 times
  private def data = {
    import spark.implicits._
    (0 until 200).flatMap(k => Seq.fill(k + 1)(k.toLong)).toDF("k")
      .selectExpr("k", s"${Portable.hSpark("cast(k as string)")} as h")
  }

  private def estimates(width: Int, df: org.apache.spark.sql.DataFrame) = {
    val sk = df.agg(CmsSketch.of(depth, width, aC, bC, P)(col("h")).as("sk"))
    val est = (0 until depth).map { r =>
      s"element_at(sk, cast(${r * width} + ((${aC(r)}L * (h % ${P}L) + ${bC(r)}L) % ${P}L) % $width as int) + 1)"
    }.mkString("least(", ", ", ")")
    df.groupBy("k", "h").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .selectExpr("k", "n", s"$est as est")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("estimates never undercount, and are exact when the grid is wide enough") {
    // width 16 << 200 keys: collisions guaranteed — still one-sided
    val tight = estimates(16, data)
    assert(tight.nonEmpty)
    tight.foreach { case (k, n, est) =>
      assert(est >= n, s"key $k: CMS undercounted ($est < $n)")
    }
    assert(tight.exists { case (_, n, est) => est > n },
      "width 16 over 200 keys must actually collide or the test proves nothing")
    // width 65536 >> 200 keys: every estimate exact (deterministic
    // constants — if a freak collision ever lands here, it lands every
    // run and this assert is the loud signal to rotate the seeds)
    val wide = estimates(65536, data)
    wide.foreach { case (k, n, est) =>
      assert(est === n, s"key $k: wide grid should be exact ($est != $n)")
    }
  }

  test("the grid is invariant under repartitioning (merge = elementwise sum)") {
    val w = 64
    def grid(parts: Int) = data.repartition(parts)
      .agg(CmsSketch.of(depth, w, aC, bC, P)(col("h")).as("sk"))
      .head.getSeq[Long](0)
    assert(grid(1) === grid(7))
    assert(grid(7).sum === data.count() * depth, "each row increments depth counters")
  }
}
