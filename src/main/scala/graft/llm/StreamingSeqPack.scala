package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous sequence packing: a stream of document batches laid into
  * the SAME fixed-length training-sequence stream [[Sampling.qSeqPack]]
  * computes in batch — the online face of the packer, for pipelines
  * that build training sequences as data lands instead of nightly.
  * Reusing [[Sampling.packDocSequences]] per micro-batch means the
  * streaming layout and the batch layout can never diverge: replaying
  * every batch in order reproduces the batch run bit-for-bit (spec
  * pins this).
  *
  * Shape per micro-batch (`foreachBatch`):
  *
  *  1. the PRE-batch global token offset is the largest committed
  *     `end_toks` among strictly-earlier batches — one bounded 1-row
  *     aggregate over the O(batches) offsets table (foreachBatch runs
  *     batches serially, so "max over earlier" IS the previous end);
  *  2. the batch's docs run the batch packing algebra with that offset
  *     as base: the distributed prefix sum + bounded explode, all
  *     batch-sized; assignments land PARTITIONED BY batch id with
  *     dynamic partition overwrite (idempotent-sink contract);
  *  3. the batch commits `(batch_id, end_toks = base + batch tokens)`
  *     to the offsets table, same idempotence.
  *
  * Replay safety: a replayed batch recomputes the SAME pre-batch
  * offset (its own offsets row is excluded by `batch_id < current`)
  * and overwrites its own partitions — the crash-between-writes cases
  * all converge to the same final state.
  *
  * State: NONE in the streaming engine — the running offset lives in a
  * tiny batch-indexed table, inspectable with batch queries, and the
  * per-doc layout is an ordinary parquet table any trainer can read. */
object StreamingSeqPack {

  /** Day-0 seeding: lay out an existing corpus as batch −1 so the
    * stream continues its token stream rather than restarting at 0. */
  def seed(corpusDocs: DataFrame, assignPath: String, offsetsPath: String): Unit = {
    val spark = corpusDocs.sparkSession
    val laid = Sampling.packDocSequences(tokCounts(corpusDocs), 0L)
      .withColumn("batch_id", lit(-1L))
    IncrementalDedup.idempotentAppend(laid, "batch_id", assignPath)
    val total = corpusDocs
      .selectExpr("size(split(lower(text), ' ')) as n").groupBy()
      .sum("n").head.get(0) match {
      case null => 0L // empty day-0 corpus: the stream starts at offset 0
      case n: java.lang.Long => n.longValue()
    }
    import spark.implicits._
    IncrementalDedup.idempotentAppend(
      Seq((-1L, total)).toDF("batch_id", "end_toks"), "batch_id", offsetsPath)
  }

  /** Start the packing stream over `docs` (streaming frame with
    * `doc_id: long, text: string`). Paths must hold the day-0 state
    * ([[seed]]) before the stream starts. */
  def start(
      docs: DataFrame,
      assignPath: String,
      offsetsPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, assignPath, offsetsPath)
      }
      .start()

  /** One micro-batch — package-visible so specs can drive replay
    * scenarios directly (foreachBatch is at-least-once; calling this
    * twice with the same batchId IS the crash-replay case). */
  private[llm] def processBatch(
      batch: DataFrame, batchId: Long,
      assignPath: String, offsetsPath: String): Unit = {
    val spark = batch.sparkSession
    // pre-batch offset: strictly-earlier commits only (replay guard)
    val base = spark.read.parquet(offsetsPath)
      .where(col("batch_id") < lit(batchId))
      .groupBy().max("end_toks").head.getLong(0)
    val counts = tokCounts(batch)
    val laid = Sampling.packDocSequences(counts, base)
      .withColumn("batch_id", lit(batchId))
    IncrementalDedup.idempotentAppend(laid, "batch_id", assignPath)
    val batchToks = counts.groupBy().sum("n_toks").head.get(0) match {
      case null => 0L // empty batch: offset carries forward unchanged
      case n: java.lang.Long => n.longValue()
    }
    import spark.implicits._
    IncrementalDedup.idempotentAppend(
      Seq((batchId, base + batchToks)).toDF("batch_id", "end_toks"),
      "batch_id", offsetsPath)
    ()
  }

  private def tokCounts(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks")
}
