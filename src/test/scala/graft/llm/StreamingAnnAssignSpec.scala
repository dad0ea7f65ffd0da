package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingAnnAssign: each micro-batch assigns against the FROZEN
  * quantizer through the exact batch code path, appends are
  * batch-id-idempotent, and the streamed index rows are bit-identical
  * to the oracle-gated batch query over the same vectors.
  */
class StreamingAnnAssignSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed assignment equals the batch incremental path; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sann").toString
    val (qPath, indexPath, ckpt) = (s"$dir/quantizer", s"$dir/index", s"$dir/ckpt")

    val all = graft.Tables.load(spark, sf, "embeddings").select(col("vec_id"),
      graft.functions.VectorExprs.toDouble(col("embedding")).as("e"))
    val indexCorpus = all.filter("vec_id % 10 != 7")
    StreamingAnnAssign.seed(indexCorpus, qPath, indexPath)
    val seeded = spark.read.parquet(indexPath).count()
    assert(seeded > 0, "day-0 corpus must be coded at seed time")

    // "today's" vectors arrive as two micro-batches
    val batchVecs = all.filter("vec_id % 10 = 7")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(batchVecs.length >= 2)
    val (first, second) = batchVecs.splitAt(batchVecs.length / 2)

    val input = MemoryStream[(Long, Seq[Double])]
    val query = StreamingAnnAssign.start(
      input.toDF().toDF("vec_id", "e"), qPath, indexPath, ckpt)
    try {
      input.addData(first.toSeq: _*)
      query.processAllAvailable()
      input.addData(second.toSeq: _*)
      query.processAllAvailable()
    } finally query.stop()

    // parity: streamed rows (all batches) == the oracle-gated batch
    // query's rows for the same vectors against the same frozen
    // quantizer — streaming and nightly maintenance cannot diverge
    val streamed = spark.read.parquet(indexPath)
      .filter(col("batch_id") >= 0)
      .select("vec_id", "cell", "m", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(r => (r._1, r._3))
    val batch = Similarity.qAnnAssignIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(r => (r._1, r._3))
    assert(streamed.toSeq === batch.toSeq)

    // replay: re-running a committed batch overwrites its own
    // partition — row count and content unchanged
    val before = spark.read.parquet(indexPath).count()
    StreamingAnnAssign.processBatch(
      first.toSeq.toDF("vec_id", "e"), 0L, qPath, indexPath)
    assert(spark.read.parquet(indexPath).count() === before)
    val replayed = spark.read.parquet(indexPath)
      .filter(col("batch_id") >= 0)
      .select("vec_id", "cell", "m", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(r => (r._1, r._3))
    assert(replayed.toSeq === batch.toSeq)
  }
}
