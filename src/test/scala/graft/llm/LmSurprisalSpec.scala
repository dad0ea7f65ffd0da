package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Bigram conditional surprisal ([[CorpusStats.qLmBigramSurprisal]]):
  * hand-computed scores on a tiny corpus, short-doc exclusion, and the
  * head/tail skew-split's equivalence to the unsplit join. */
class LmSurprisalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def score(dir: String) =
    CorpusStats.qLmBigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("hand-computed bit-surprisal on a fixed corpus") {
    // corpus: "a b", "a b", "a c d", "x"
    //   ctx counts: a->3 (bits 2), c->1 (bits 1)
    //   bigrams: (a,b)x2 (bits 2), (a,c)x1 (bits 1), (c,d)x1 (bits 1)
    //   sbits: (a,b) = 2-2 = 0; (a,c) = 2-1 = 1; (c,d) = 1-1 = 0
    // doc scores: 1 -> 0/1, 2 -> 0/1, 3 -> (1+0)/2 = 0.5; doc 4 (1 token) absent
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    import spark.implicits._
    Seq((1L, "a b", "en", "s", 3L), (2L, "a b", "en", "s", 3L),
      (3L, "a c d", "en", "s", 5L), (4L, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = score(dir)
    assert(got === Map(1L -> ((1L, 0.0)), 2L -> ((1L, 0.0)), 3L -> ((2L, 0.5))))
  }

  test("skew split agrees with the plain unsplit join at sf0.001") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = score(dir)
    // independent unsplit computation
    val bg = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where("size(ta) >= 2")
      .selectExpr("doc_id",
        "explode(transform(sequence(2, size(ta)), i -> struct(element_at(ta, i - 1) as w1, element_at(ta, i) as w2))) as g")
      .selectExpr("doc_id", "g.w1 as w1", "g.w2 as w2")
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
    val ctx = bg.groupBy("w1").agg(count(lit(1)).as("ccnt"))
    val want = bg.join(bi, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .selectExpr("doc_id", "length(bin(ccnt)) - length(bin(bcnt)) as sbits")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(col("sbits")).as("sb"))
      .selectExpr("doc_id", "n", "cast(sb as double) / n as s")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
    // the score is a mean of non-negative integers: sanity bounds
    got.values.foreach { case (_, s) => assert(s >= 0.0 && s < 64.0) }
  }
}
