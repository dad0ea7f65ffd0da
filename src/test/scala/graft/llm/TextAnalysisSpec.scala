package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Text-analysis structural invariants (the DuckDB oracle pins exact
  * values; these pin the metric semantics). */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("repetition metrics: bounded, and exact on a hand-checked doc") {
    val out = TextAnalysis.qTextRepetition(spark, sf).collect()
    assert(out.nonEmpty)
    // every doc with >= 2 tokens appears exactly once
    val eligible = graft.Tables.load(spark, sf, "documents")
      .filter("size(split(lower(text), ' ')) >= 2").count()
    assert(out.length.toLong === eligible)
    out.foreach { r =>
      val (dup, top) = (r.getDouble(2), r.getDouble(3))
      assert(dup >= 0.0 && dup < 1.0, s"dup_tok_frac out of range: $r")
      assert(top > 0.0 && top <= 1.0, s"top_bigram_frac out of range: $r")
    }

    // hand-check one row end-to-end against an independent Scala
    // computation over the raw text
    val sample = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").head()
    val toks = sample.getString(1).toLowerCase.split(" ").toSeq
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val expectedDup = (toks.size - toks.distinct.size).toDouble / toks.size
    val expectedTop =
      bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size
    val row = out.find(_.getLong(0) == sample.getLong(0)).get
    assert(row.getLong(1) === toks.size.toLong)
    assert(math.abs(row.getDouble(2) - expectedDup) < 1e-12)
    assert(math.abs(row.getDouble(3) - expectedTop) < 1e-12)
  }
}
