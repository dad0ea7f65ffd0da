package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous lexical-index maintenance: a stream of document batches
  * keeps the BM25 postings index current — the streaming face of
  * [[Retrieval.qBm25Incremental]], completing the retrieval family's
  * tier symmetry (batch build ↔ incremental batch-vs-frozen-index ↔
  * continuous maintenance), the same trio the dedup and ANN families
  * carry ([[StreamingExactDedup]], [[StreamingAnnAssign]]).
  *
  * Shape per micro-batch (`foreachBatch`):
  *
  *  1. the batch's postings `(doc_id, dl, token, tf)` via the SAME
  *     tokenization + aggregation the gated queries use
  *     ([[Retrieval.bigramToksOf]] / [[Retrieval.postingsOf]]) — the
  *     streaming and batch index can't diverge semantically;
  *  2. written to a batch-addressed directory (`batch_<id>`) with
  *     mode=overwrite — a replayed at-least-once batch overwrites its
  *     OWN partition with identical bytes, so replay cannot double-
  *     count (the batch-id-idempotence pattern the table-format
  *     streaming sinks use). Documents are assumed batch-unique (an
  *     id-partitioned ingest), the same contract the incremental
  *     dedup probes state.
  *
  * State: NONE in the streaming engine — no watermark, no state store.
  * The index is the postings table itself, which a deployment stores
  * bucketed by token; per-batch work is O(batch tokens), and the
  * index grows with the CORPUS, never with replay count.
  *
  * Scoring is [[Retrieval.bm25Against]] over the union of batch
  * partitions — incoming queries see every document ingested so far,
  * with df/avgdl always computed at the index's current state (a real
  * inverted index's behavior after a refresh cycle). */
object StreamingLexicalIndex {

  /** Day-0 seeding: the existing corpus's postings as batch_seed. */
  def seed(corpusDocs: DataFrame, statePath: String): Unit =
    Retrieval.postingsOf(Retrieval.bigramToksOf(corpusDocs))
      .write.mode("overwrite").parquet(s"$statePath/batch_seed")

  /** Start continuous index maintenance over `docs` (streaming frame
    * with `doc_id: bigint, text: string`). */
  def start(
      docs: DataFrame,
      statePath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath)
      }
      .start()

  /** One micro-batch — package-visible so specs can drive replay
    * directly. Overwrites its own batch directory: idempotent under
    * at-least-once replay by construction. */
  private[llm] def processBatch(
      batch: DataFrame, batchId: Long, statePath: String): Unit =
    Retrieval.postingsOf(Retrieval.bigramToksOf(batch))
      .write.mode("overwrite").parquet(s"$statePath/batch_$batchId")

  /** The index as of now: every ingested batch's postings. */
  def indexPostings(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(s"$statePath/batch_*")

  /** Score query docs (doc_id, text) against the index as of now —
    * exactly [[Retrieval.bm25Against]], so answers match the gated
    * incremental query whenever the ingested state matches its
    * frozen-corpus split. */
  def scoreAgainstIndex(
      spark: SparkSession, queryDocs: DataFrame, statePath: String): DataFrame =
    Retrieval.bm25Against(
      indexPostings(spark, statePath),
      Retrieval.bigramToksOf(queryDocs)
        .selectExpr("doc_id as query_id", "token").distinct())
}
