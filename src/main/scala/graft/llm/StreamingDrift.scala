package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus-mixture monitoring: each micro-batch of documents
  * scores its token distribution against a FROZEN reference — the
  * streaming face of [[CorpusStats.qSourceTokenDrift]]. A scraper
  * change, spam-template flood, or language flip shows up as a rising
  * per-batch drift score while the data is still arriving, not after a
  * nightly recompute.
  *
  * Bounded by construction: tokens hash into [[CorpusStats.DsirBuckets]]
  * buckets (the same fixed feature space the DSIR scorer uses), so the
  * reference is a ≤4096-row table that BROADCASTS at any corpus size —
  * the open-vocabulary histogram the batch operator meets with a keyed
  * join cannot live in a stream, the hashed projection can. Drift per
  * batch is the same bitlen-quantized KL the batch operator computes
  * (integer arithmetic until one division), over buckets instead of
  * tokens.
  *
  * Shape per micro-batch (`foreachBatch`):
  *  1. bucket-count the batch's tokens (one map-side-combined keyed
  *     aggregation, ≤4096 groups);
  *  2. join the broadcast reference, fold the quantized divergence;
  *  3. append one (batch_id, n_tokens, drift_bits) row to the monitor
  *     log, batch-id-partitioned (idempotent under replay).
  */
object StreamingDrift {

  /** Per-bucket token shares of a frame — the one derivation seed and
    * per-batch scoring share. Expects (text: string). */
  def bucketCounts(docs: DataFrame): DataFrame =
    docs
      .selectExpr("explode(filter(split(text, ' '), t -> length(t) > 0)) as token")
      .selectExpr(
        s"pmod(${Portable.hSpark("token")}, ${CorpusStats.DsirBuckets}) as bucket")
      .groupBy(col("bucket"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))

  /** Day-0 seeding: the reference corpus's bucket distribution. */
  def seed(referenceDocs: DataFrame, refPath: String): Unit =
    bucketCounts(referenceDocs).write.mode("overwrite").parquet(refPath)

  /** Start the drift monitor over `docs` (streaming frame with
    * `text: string`). One (batch_id, n_tokens, drift_bits) row lands in
    * `monitorPath` per micro-batch. */
  def start(
      docs: DataFrame,
      refPath: String,
      monitorPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, refPath, monitorPath)
      }
      .start()

  private[llm] def processBatch(
      batch: DataFrame, batchId: Long,
      refPath: String, monitorPath: String): Unit = {
    val spark = batch.sparkSession
    val score = driftOf(spark, bucketCounts(batch), refPath)
      .selectExpr(s"${batchId}L as batch_id", "n_tokens", "drift_bits")
    IncrementalDedup.idempotentAppend(score, "batch_id", monitorPath)
    ()
  }

  /** Quantized KL(batch‖reference) in bits over the hashed buckets —
    * the [[CorpusStats.qSourceTokenDrift]] arithmetic with the batch as
    * the "source" and the frozen reference as the corpus. Buckets the
    * batch has but the reference lacks carry the reference's MINIMUM
    * observed probability (bitlen of n_ref vs count 1) — loud, not
    * dropped: unseen-token floods are exactly the drift to catch. */
  private[llm] def driftOf(
      spark: SparkSession, batchCounts: DataFrame, refPath: String): DataFrame = {
    val ref = spark.read.parquet(refPath)
      .selectExpr("bucket", "cnt as ref_cnt")
    val joined = batchCounts.join(
      org.apache.spark.sql.functions.broadcast(ref), Seq("bucket"), "left")
    joined
      .selectExpr("bucket", "cnt", "coalesce(ref_cnt, 1L) as ref_cnt")
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        ref.selectExpr("sum(ref_cnt) as n_ref")))
      .selectExpr("cnt", "ref_cnt", "n_ref")
      .selectExpr("cnt",
        // dbits folds in the batch total later (constant per batch):
        // here keep the per-bucket reference surprisal only
        "length(bin(n_ref)) - length(bin(ref_cnt)) as ref_sbits")
      .selectExpr("cnt", "ref_sbits")
      .groupBy()
      .agg(
        org.apache.spark.sql.functions.expr("sum(cnt) as n_tokens"),
        org.apache.spark.sql.functions.expr("sum(cnt * ref_sbits) as ref_num"))
      // KL(batch||ref) = Σ p_b · (sbits_ref − sbits_batch); the batch
      // side needs the batch total, resolved in this final projection
      .selectExpr("n_tokens", "ref_num")
      .crossJoin(batchEntropy(batchCounts))
      .selectExpr("n_tokens",
        "cast(ref_num - batch_num as double) / n_tokens as drift_bits")
  }

  /** Σ cnt · sbits_batch for the batch's own distribution. */
  private def batchEntropy(batchCounts: DataFrame): DataFrame =
    batchCounts
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        batchCounts.selectExpr("sum(cnt) as n_b")))
      .selectExpr("cnt", "length(bin(n_b)) - length(bin(cnt)) as b_sbits")
      .groupBy()
      .agg(org.apache.spark.sql.functions.expr("sum(cnt * b_sbits) as batch_num"))
}
