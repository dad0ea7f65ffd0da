package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the native pair expansion
  * ([[graft.functions.SortedPairExpand]]) — totality + exactness. The
  * capped posting-list shape is `agg(cappedLongs) → filter(size
  * between 2 and cap) → expand pairs`; `InferFiltersFromGenerate`
  * copies the downstream Generate's `size(pairs) > 0` constraint into
  * the SAME Filter node as the size guard, and codegen subexpression
  * elimination evaluates the expansion BEFORE the `size ≥ 2` conjunct
  * can short-circuit — i.e. on the sub-2 arrays the guard was about to
  * drop. The predecessor SQL form (`sequence(1, size-1)`-style) threw
  * INVALID_ARRAY_INDEX there; the native expression must stay total
  * (n ≤ 1 → empty array) under the exact same plan shape. */
class PairExpansionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairs(c: org.apache.spark.sql.Column) =
    graft.functions.TextHashExprs.sortedPairExpand(c)

  test("expansion is total: size-1 groups survive inferred-filter CSE, pairs are exact") {
    import spark.implicits._
    // groups of size 1..20 — size-1 groups MUST flow through the
    // filter+generate shape without erroring, larger groups expand to
    // exactly their n·(n-1)/2 ordered pairs
    val rows = for { g <- 1 to 20; i <- 1 to g } yield (g.toLong, (g * 1000 + i).toLong)
    val df = rows.toDF("sh", "id").repartition(8)
    val expanded = df.groupBy("sh")
      .agg(graft.functions.CappedCollect.longs(50)(col("id")).as("raw"))
      .filter(expr("size(raw) between 2 and 50"))
      .select(pairs(col("raw")).as("prs"))
      .repartition(col("prs"))
      .selectExpr("explode(prs) as p")
      .selectExpr("p.a as id_a", "p.b as id_b")
    val got = expanded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      g <- 2 to 20
      i <- 1 to g; j <- 1 until i
    } yield ((g * 1000 + j).toLong, (g * 1000 + i).toLong)).toSet
    assert(got === want)
    // ordering invariant every consumer relies on
    assert(got.forall { case (a, b) => a < b })
  }

  test("expansion sorts internally: unsorted input yields a<b pairs") {
    import spark.implicits._
    val out = Seq(Seq(9L, 1L, 5L)).toDF("ids")
      .select(pairs(col("ids")).as("prs"))
      .selectExpr("explode(prs) as p").selectExpr("p.a", "p.b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 5L), (1L, 9L), (5L, 9L)))
  }

  test("expansion on degenerate arrays is empty, not an error") {
    import spark.implicits._
    val df = Seq(Seq(7L), Seq(1L, 2L, 3L), Seq.empty[Long]).toDF("ids")
    val out = df.select(pairs(col("ids")).as("prs")).collect()
    assert(out.map(_.getSeq[Any](0).length).sorted.toSeq === Seq(0, 0, 3))
  }
}
