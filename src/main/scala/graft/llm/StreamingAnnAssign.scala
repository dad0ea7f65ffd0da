package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-ingestion ANN index maintenance: a STREAM of embedding
  * batches assigned against the FROZEN IVF + PQ quantizer and appended
  * into the coded index — the streaming face of
  * [[Similarity.qAnnAssignIncremental]], exactly as [[StreamingDedup]]
  * is the streaming face of [[IncrementalDedup]] (the reference has no
  * vector surface at all; this is training-pipeline capability layered
  * on the same engine).
  *
  * Shape per micro-batch (`foreachBatch` — deliberately: assignment is
  * batch × broadcast(constants), and reusing the exact
  * [[Similarity.ivfAssign]] / [[Similarity.pqAssign]] code path means
  * streaming and nightly-batch index maintenance can NEVER diverge
  * semantically):
  *
  *  1. the frozen quantizer (IVF centroids + PQ codebook, trained once
  *     at seed time on the day-0 corpus) is read from its own tiny
  *     tables — K×DIM + M×KS×SUB doubles, broadcast into both joins;
  *  2. each batch vector gets its nearest cell and its M subspace
  *     codes in one pass over the batch — zero corpus reads, nothing
  *     in the batch path scales with the index;
  *  3. coded rows land PARTITIONED BY the micro-batch id with dynamic
  *     partition overwrite — a replayed batch (foreachBatch is
  *     at-least-once under retry) OVERWRITES its own partition instead
  *     of duplicating index rows, the same idempotent-sink contract
  *     every streaming writer here honors. A deployment repartitions
  *     the accumulated appends into the cell-partitioned layout
  *     ([[Similarity.ivfIndex]]'s probe-prunable form) at compaction
  *     time, not per batch.
  *
  * State: NONE in the streaming engine — no watermarks, no state
  * store. The quantizer is a frozen table, the index is an appendable
  * table, and drift is watched by the batch-side
  * [[Similarity.qPqDistortion]] monitor, which triggers retraining as
  * a planned re-seed, never as streaming state.
  */
object StreamingAnnAssign {

  /** Day-0 seeding: train the quantizer on `indexCorpus`
    * (vec_id, e: array<double>) and persist BOTH the frozen constants
    * (`quantizerPath/cents`, `quantizerPath/codebook`) and the fully
    * coded day-0 index under the same batch-id layout the stream
    * appends to (batch_id = -1). */
  def seed(indexCorpus: DataFrame, quantizerPath: String,
      indexPath: String): Unit = {
    val cents = Similarity.ivfCentroids(indexCorpus)
    val cb = Similarity.pqCodebook(indexCorpus)
    cents.write.mode("overwrite").parquet(s"$quantizerPath/cents")
    cb.write.mode("overwrite").parquet(s"$quantizerPath/codebook")
    IncrementalDedup.idempotentAppend(
      codedRows(indexCorpus, cents, cb).withColumn("batch_id", lit(-1L)),
      "batch_id", indexPath)
  }

  /** Start the assignment stream over `vecs` (streaming frame with
    * `vec_id: long, e: array<double>`). `quantizerPath`/`indexPath`
    * must hold the day-0 seed before the stream starts. */
  def start(vecs: DataFrame, quantizerPath: String, indexPath: String,
      checkpoint: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, quantizerPath, indexPath)
      }
      .start()

  /** One micro-batch — package-visible so specs can drive replay
    * scenarios directly (calling this twice with the same batchId IS
    * the crash-replay case). */
  private[llm] def processBatch(batch: DataFrame, batchId: Long,
      quantizerPath: String, indexPath: String): Unit = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(s"$quantizerPath/cents")
    val cb = spark.read.parquet(s"$quantizerPath/codebook")
    IncrementalDedup.idempotentAppend(
      codedRows(batch.select(col("vec_id"), col("e")), cents, cb)
        .withColumn("batch_id", lit(batchId)),
      "batch_id", indexPath)
    ()
  }

  /** (vec_id, e) × frozen quantizer → one row per (vector, subspace):
    * `(vec_id, cell, m, code)` — the exact rows
    * [[Similarity.qAnnAssignIncremental]] gates, produced by the same
    * two broadcast folds. */
  private def codedRows(vecs: DataFrame, cents: DataFrame,
      cb: DataFrame): DataFrame = {
    val cellAsg = Similarity.ivfAssign(vecs, cents).select("vec_id", "cell")
    val codeAsg = Similarity.pqAssign(Similarity.pqSubvectors(vecs), cb)
      .select("vec_id", "m", "code")
    cellAsg.join(codeAsg, "vec_id").select("vec_id", "cell", "m", "code")
  }
}
