package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r20 optimization internals:
  *  - [[Similarity.seedRanks]] (the lazy broadcast-subtree quantizer
  *    seed ranking) must produce exactly the (vec_id, rank) map the
  *    old driver-collect + zipWithIndex produced — on sparse,
  *    unordered, and shorter-than-K id spaces;
  *  - [[TextAnalysis.scoreQualityWithToks]] must score identically to
  *    the text-only [[TextAnalysis.scoreQuality]] entry (one formula,
  *    two input shapes);
  *  - [[graft.Tables.load]]'s per-session schema memo must hand back
  *    the same schema and the same rows on repeated loads (including
  *    the events nanos branch).
  */
class R20OptimizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def oldSeedRanks(corpus: org.apache.spark.sql.DataFrame,
      k: Int, rankCol: String): Seq[(Long, Int)] =
    corpus.select("vec_id").orderBy("vec_id").limit(k)
      .collect().map(_.getLong(0)).zipWithIndex.toSeq

  test("seedRanks equals the collect+zipWithIndex ranking (sparse unordered ids)") {
    val ids = Seq(907L, 3L, 500L, 42L, 41L, 4000L, 77L)
    val corpus = ids.map(i => (i, Seq(1.0, 2.0))).toDF("vec_id", "e")
    for (k <- Seq(1, 3, 7, 10)) { // 10 > |corpus| exercises the short case
      val got = Similarity.seedRanks(corpus, k, "cell")
        .select("vec_id", "cell").as[(Long, Int)].collect().sortBy(_._1).toSeq
      val want = oldSeedRanks(corpus, k, "cell").sortBy(_._1)
      assert(got == want, s"k=$k")
    }
  }

  test("seedRanks on an empty corpus is empty (old collect form parity)") {
    val corpus = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "e")
    assert(Similarity.seedRanks(corpus, 4, "cell").count() == 0)
  }

  test("scoreQualityWithToks equals scoreQuality") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then some more of it"),
      (2L, "a b"),
      (3L, ("word " * 30).trim),
      (4L, "!!! ??? $$$ %%% ^^^ &&& *** ((( ))) ___"),
      (5L, "of the to and in is it for on a " * 4)
    ).toDF("doc_id", "text")
    val viaText = TextAnalysis.scoreQuality(docs, Seq("doc_id"))
      .selectExpr("doc_id", "cast(quality as double) as q")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val viaToks = TextAnalysis.scoreQualityWithToks(
        docs.selectExpr("doc_id", "text", "split(lower(text), ' ') as toks"),
        Seq("doc_id"))
      .selectExpr("doc_id", "cast(quality as double) as q")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaText == viaToks)
  }

  test("longGroupPositions equals posexplode→groupBy→sort_array(collect_list)") {
    val rows = Seq(
      (1L, Seq(7L, 3L, 7L, 7L, 3L, 9L)),
      (2L, Seq(5L)),
      (3L, Seq.empty[Long]))
    val df = rows.toDF("doc_id", "whs")
    val viaExpr = df.select($"doc_id",
        org.apache.spark.sql.functions.explode(
          graft.functions.TextHashExprs.longGroupPositions($"whs")).as("g"))
      .selectExpr("doc_id", "g.v as wh", "g.is as is")
      .as[(Long, Long, Seq[Int])].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaAgg = df.select($"doc_id",
        org.apache.spark.sql.functions.posexplode($"whs").as(Seq("p0", "wh")))
      .selectExpr("doc_id", "wh", "cast(p0 + 1 as int) as i")
      .groupBy("doc_id", "wh")
      .agg(org.apache.spark.sql.functions.expr("sort_array(collect_list(i)) as is"))
      .as[(Long, Long, Seq[Int])].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaExpr == viaAgg)
    assert(viaExpr.find(r => r._1 == 1L && r._2 == 7L).get._3 == Seq(1, 3, 4))
  }

  test("bestByCosine equals crossJoin→max_by(struct(cos,-id)) incl. ties") {
    // two identical candidate vectors (ids 3 and 1) force the tie-break
    val cands = Seq((3, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)))
    val vecs = Seq((10L, Seq(2.0, 0.1)), (11L, Seq(0.1, 2.0)), (12L, Seq(1.0, 1.0)))
    val cdf = cands.toDF("cell", "c")
    val vdf = vecs.toDF("vec_id", "e")
    val viaAgg = vdf.crossJoin(cdf)
      .select($"vec_id", $"cell",
        graft.functions.VectorExprs.cosine($"e", $"c").as("cos"))
      .groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.expr(
        "max_by(struct(cell, cos), struct(cos, -cell)) as best"))
      .selectExpr("vec_id", "best.cell as cell", "best.cos as cos")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val carr = cdf.agg(org.apache.spark.sql.functions.collect_list(
      org.apache.spark.sql.functions.struct($"cell", $"c")).as("cents"))
    val viaExpr = vdf.crossJoin(carr)
      .select($"vec_id",
        graft.functions.VectorExprs.bestByCosine($"e", $"cents").as("best"))
      .where($"best".isNotNull)
      .selectExpr("vec_id", "best.id as cell", "best.cos as cos")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(viaExpr == viaAgg)
    assert(viaExpr.find(_._1 == 10L).get._2 == 1) // tie broke to the lower id
  }

  test("bestByL2 equals join→min_by(struct(d2,code)) incl. ties") {
    val cands = Seq((5, Seq(0.5, 0.5)), (2, Seq(0.5, 0.5)), (9, Seq(3.0, 3.0)))
    val vecs = Seq((1L, Seq(0.4, 0.6)), (2L, Seq(3.0, 2.9)))
    val cdf = cands.toDF("code", "c")
    val vdf = vecs.toDF("vec_id", "sub")
    import graft.functions.VectorExprs.{dot, normSq}
    val d2 = normSq($"sub") + normSq($"c") -
      org.apache.spark.sql.functions.lit(2.0d) * dot($"sub", $"c")
    val viaAgg = vdf.crossJoin(cdf)
      .select($"vec_id", $"code", d2.as("d2"))
      .groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.expr(
        "min_by(struct(code, d2), struct(d2, code)) as best"))
      .selectExpr("vec_id", "best.code as code", "best.d2 as d2")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val carr = cdf.agg(org.apache.spark.sql.functions.collect_list(
      org.apache.spark.sql.functions.struct($"code", $"c")).as("entries"))
    val viaExpr = vdf.crossJoin(carr)
      .select($"vec_id",
        graft.functions.VectorExprs.bestByL2($"sub", $"entries").as("best"))
      .where($"best".isNotNull)
      .selectExpr("vec_id", "best.id as code", "best.d2 as d2")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(viaExpr == viaAgg)
    assert(viaExpr.head._2 == 2) // equal-distance tie broke to the lower code
  }

  test("bestByCosine/bestByL2 are null on empty candidate arrays") {
    val vdf = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "e")
    val empty = Seq.empty[(Int, Seq[Double])].toDF("cell", "c")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct($"cell", $"c")).as("cents"))
    assert(vdf.crossJoin(empty)
      .select(graft.functions.VectorExprs.bestByCosine($"e", $"cents").as("b"))
      .where($"b".isNotNull).count() == 0)
    assert(vdf.crossJoin(empty)
      .select(graft.functions.VectorExprs.bestByL2($"e", $"cents").as("b"))
      .where($"b".isNotNull).count() == 0)
  }

  test("Tables.load schema memo: repeated loads agree (documents + events nanos branch)") {
    val dir = "/root/testdata/sf0.001"
    val d1 = graft.Tables.load(spark, dir, "documents")
    val d2 = graft.Tables.load(spark, dir, "documents")
    assert(d1.schema == d2.schema)
    assert(d1.count() == d2.count())
    val e1 = graft.Tables.load(spark, dir, "events")
    val e2 = graft.Tables.load(spark, dir, "events")
    assert(e1.schema == e2.schema)
    assert(e1.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(e1.count() == e2.count())
  }
}
