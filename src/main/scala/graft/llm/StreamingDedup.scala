package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-ingestion near-dedup: a STREAM of document batches probed
  * against the materialized LSH band index — the streaming face of
  * [[IncrementalDedup]] (reference has no dedup surface at all; this is
  * the training-pipeline capability layered on the same engine).
  *
  * Shape per micro-batch (`foreachBatch` — deliberately: the probe is
  * a batch join against TABLES, and reusing the exact
  * [[IncrementalDedup.dedupAgainstIndex]] code path means streaming
  * and nightly-batch dedup can NEVER diverge semantically):
  *
  *  1. the batch's band keys probe the cold-bucket index — an
  *     equi-join where the batch side is micro-batch-sized and the
  *     index side is a partition-prunable table scan (a deployment
  *     stores the index `PARTITIONED BY (bucket(N, k))`, so each probe
  *     plans only the touched band-key partitions);
  *  2. verified matches land in `matchesPath`, PARTITIONED BY the
  *     micro-batch id and written with dynamic partition overwrite —
  *     a replayed batch (foreachBatch is at-least-once under retry)
  *     OVERWRITES its own partition instead of duplicating rows, which
  *     is the standard idempotent-sink contract;
  *  3. the batch's own band rows and tokens self-append (same
  *     batch-id-partitioned idempotent writes), so batch N+1 dedups
  *     against batches 1..N as well as the original corpus. Hot-bucket
  *     growth from appends is handled the same way a growing batch
  *     index handles it — periodic [[IncrementalDedup.compactIndex]],
  *     not per-batch rewrites.
  *
  * In-batch duplicates are out of scope here by construction (the
  * index is strictly "everything before this batch"); a deployment
  * that needs them runs the batch through [[Dedup.qDedupExact]]-style
  * keying first or relies on the next compaction.
  *
  * State: NONE in the streaming engine — no watermarks, no state
  * store. All dedup state lives in the index/corpus TABLES, which is
  * what makes the stream restartable from any checkpoint and the
  * state inspectable/compactable with plain batch queries. That is
  * the 100 TB design: a billion-document seen-set cannot live in a
  * streaming state store, but it partitions fine as a bucketed table.
  */
object StreamingDedup {

  /** Day-0 seeding: write the initial index
    * ([[IncrementalDedup.indexRows]]) and corpus tokens under the SAME
    * batch-id partition layout the stream appends to (batch_id = -1),
    * so partition discovery sees one uniform table from the first
    * probe on. */
  def seed(
      index: DataFrame,
      corpusToks: DataFrame,
      indexPath: String,
      corpusPath: String): Unit = {
    idempotentAppend(
      index.withColumn("batch_id", lit(-1L)), "batch_id", indexPath)
    idempotentAppend(
      corpusToks.withColumn("batch_id", lit(-1L)), "batch_id", corpusPath)
  }

  /** Start the dedup stream over `docs` (streaming frame with
    * `id: long, toks: array<string>`). Paths are plain table
    * directories (parquet here; the engine's Iceberg tables in a
    * catalog deployment). `indexPath`/`corpusPath` must hold the
    * day-0 index ([[IncrementalDedup.indexRows]]) and corpus tokens
    * before the stream starts. */
  def start(
      docs: DataFrame,
      indexPath: String,
      corpusPath: String,
      matchesPath: String,
      checkpoint: String,
      threshold: Double = 0.5): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, corpusPath, matchesPath, threshold)
      }
      .start()
  }

  /** One micro-batch — package-visible so specs can drive replay
    * scenarios directly (foreachBatch is at-least-once; calling this
    * twice with the same batchId IS the crash-replay case). */
  private[llm] def processBatch(
      batch: DataFrame, batchId: Long,
      indexPath: String, corpusPath: String, matchesPath: String,
      threshold: Double): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("id"), col("toks"))
    // REPLAY GUARD: the index must be strictly "everything before
    // this batch". Without the filter, a batch replayed after its
    // own self-append (crash between step 3 and the checkpoint
    // commit) would find its own rows and match every doc to
    // itself — the partition filter restores the exactly-once
    // contract the dynamic overwrite promises.
    val index = spark.read.parquet(indexPath)
      .where(col("batch_id") < lit(batchId))
      .select("id", "b", "k")
    val corpus = spark.read.parquet(corpusPath)
      .where(col("batch_id") < lit(batchId))
      .select("id", "toks")
    val matches = IncrementalDedup
      .dedupAgainstIndex(b, index, corpus, threshold)
      .withColumn("batch_id", lit(batchId))
    idempotentAppend(matches, "batch_id", matchesPath)
    // self-append AFTER the probe: this batch's bands join the
    // index for every LATER batch (partition pruning keeps old
    // probes from rescanning them)
    idempotentAppend(
      Dedup.bandsOf(b).withColumn("batch_id", lit(batchId)),
      "batch_id", indexPath)
    idempotentAppend(
      b.withColumn("batch_id", lit(batchId)), "batch_id", corpusPath)
    ()
  }

  private def idempotentAppend(
      df: DataFrame, partCol: String, path: String): Unit =
    IncrementalDedup.idempotentAppend(df, partCol, path)
}
