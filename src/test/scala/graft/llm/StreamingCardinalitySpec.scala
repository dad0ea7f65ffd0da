package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** StreamingCardinality: per-source KMV sketches folded across
  * micro-batches.
  *
  *  - the state after N batches EQUALS the batch sketch over
  *    seed ∪ batches (replay-equivalence — the streaming twin can
  *    never drift from [[CorpusStats.qKmvDistinct]]'s derivation);
  *  - replaying a batch is a no-op (KMV union idempotence — the
  *    at-least-once contract needs no bookkeeping here);
  *  - a brand-new source appears in state the batch it first streams.
  */
class StreamingCardinalitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def mkDocs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("source", "text")
  }

  test("streamed sketches equal the batch sketch over the union; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-skmv").toString
    val statePath = s"$dir/state"

    val corpus = mkDocs(
      ("web", "alpha beta gamma delta alpha beta"),
      ("wiki", "epsilon zeta eta theta"))
    StreamingCardinality.seed(corpus, statePath)

    val input = MemoryStream[(String, String)]
    val query = StreamingCardinality.start(
      input.toDF().toDF("source", "text"), statePath, s"$dir/ckpt")
    try {
      val b1 = Seq(
        ("web", "beta gamma NEW tokens flowing in"),
        ("books", "a never seen source arrives"))
      input.addData(b1: _*)
      query.processAllAvailable()
      val b2 = Seq(("wiki", "zeta eta plus fresh bigrams"))
      input.addData(b2: _*)
      query.processAllAvailable()

      // state == batch derivation over everything seen
      val expected = StreamingCardinality
        .sketchOf(corpus.unionByName(mkDocs(b1 ++ b2: _*)))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val got = spark.read.parquet(statePath)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got === expected)
      assert(got.contains("books"), "first-batch source must enter state")

      // replay: re-fold batch 1 directly — state must not move
      StreamingCardinality.processBatch(
        mkDocs(b1: _*), batchId = 0L, statePath)
      val replayed = spark.read.parquet(statePath)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(replayed === expected, "KMV union replay must be a no-op")

      // readout derives the same columns as the gated batch query
      val est = StreamingCardinality.estimates(spark, statePath).collect()
      assert(est.nonEmpty)
      est.foreach { r =>
        assert(r.getLong(1) > 0)
        assert(r.getDouble(3) > 0.0)
      }
    } finally query.stop()
  }
}
