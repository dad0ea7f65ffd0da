package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-ingestion EXACT dedup: a stream of document batches
  * decided against the materialized exact-hash index + its bloom — the
  * streaming face of [[IncrementalDedup.exactProbe]], completing the
  * symmetry with [[StreamingDedup]] (the near-dup face). Reusing the
  * batch code path per micro-batch means streaming and nightly-batch
  * decisions can never diverge semantically.
  *
  * Shape per micro-batch (`foreachBatch`):
  *
  *  1. [[IncrementalDedup.exactProbe]] decides the batch against the
  *     index table + the stored one-row bloom: bloom-rejected rows are
  *     decided MAP-SIDE (zero index I/O — the overwhelming majority of
  *     a healthy stream), might-contain rows pay the confirm join,
  *     in-batch firsts resolve inside the probe;
  *  2. decisions land PARTITIONED BY micro-batch id with dynamic
  *     partition overwrite — a replayed batch overwrites its own
  *     partition (the idempotent-sink contract);
  *  3. the batch's SURVIVORS append their `(h, canonical id)` rows to
  *     the index (batch-id-partitioned, same idempotence), and the
  *     stored bloom is OR-MERGED with the survivors' bloom — Spark's
  *     sketch merge, two conf-bounded binaries on the driver (the same
  *     bounded-by-configuration justification as materializing the
  *     scalar subquery itself). Merging only survivors is sufficient:
  *     a corpus dup's hash is already in the bloom, an in-batch dup's
  *     hash IS its surviving twin's. Replay-safe: re-OR-ing the same
  *     elements is a no-op.
  *
  * State: NONE in the streaming engine — no watermark, no state store.
  * The seen-set lives in the index TABLE (16 bytes per distinct doc,
  * bucketable by hash) and its bloom summary; a billion-document
  * seen-set cannot live in a streaming state store, but it partitions
  * fine as a table, stays inspectable with batch queries, and the
  * bloom keeps steady-state batches from touching it at all. */
object StreamingExactDedup {

  /** Day-0 seeding: the corpus's exact-hash index under the stream's
    * batch-id partition layout (batch_id = -1) and its bloom as a
    * one-row table. `expectedItems` is PERSISTED NEXT TO the sketch:
    * Spark's `BloomFilter.mergeInPlace` throws on any sizing mismatch,
    * so the per-batch survivor blooms must be built with exactly the
    * seed-time sizing — reading it back from the bloom row (instead of
    * re-supplying it at start()) makes a mismatched restart
    * impossible, not merely documented. */
  def seed(
      corpusDocs: DataFrame,
      expectedItems: Long,
      indexPath: String,
      bloomPath: String): Unit = {
    val idx = IncrementalDedup.exactHashIndex(corpusDocs)
    idempotentAppend(idx.withColumn("batch_id", lit(-1L)), "batch_id", indexPath)
    IncrementalDedup.hashBloom(idx, expectedItems)
      .withColumn("expected_items", lit(expectedItems))
      .write.mode("overwrite").parquet(bloomPath)
  }

  /** Start the exact-dedup stream over `docs` (streaming frame with
    * `new_id: long, t: string`). `indexPath`/`bloomPath` must hold the
    * day-0 state ([[seed]]) before the stream starts; the bloom's
    * sizing travels WITH the bloom (see [[seed]]). */
  def start(
      docs: DataFrame,
      indexPath: String,
      bloomPath: String,
      decisionsPath: String,
      checkpoint: String): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, bloomPath, decisionsPath)
      }
      .start()
  }

  /** One micro-batch — package-visible so specs can drive replay
    * scenarios directly (foreachBatch is at-least-once; calling this
    * twice with the same batchId IS the crash-replay case). */
  private[llm] def processBatch(
      batch: DataFrame, batchId: Long,
      indexPath: String, bloomPath: String, decisionsPath: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("new_id"), col("t"))
    // REPLAY GUARD: strictly pre-batch index only — a replayed
    // batch must not find its own survivors (crash between the
    // survivor append and the checkpoint commit) or it would flip
    // their decisions to dup-of-self. The bloom may already carry
    // this batch's hashes after such a crash; that only routes
    // those rows through the confirm join, where the filtered
    // index decides them correctly.
    val index = spark.read.parquet(indexPath)
      .where(col("batch_id") < lit(batchId))
      .select("h", "dup_of")
    val bloom = readBloom(spark, bloomPath)
    val decisions = IncrementalDedup.exactProbe(b, index, bloom.select("bf"))
      .withColumn("batch_id", lit(batchId))
    idempotentAppend(decisions, "batch_id", decisionsPath)
    // survivors extend the seen-set for every later batch
    val survivors = spark.read.parquet(decisionsPath)
      .where(col("batch_id") === batchId && col("keep"))
      .select(col("new_id"))
      .join(b, "new_id")
      .selectExpr("xxhash64(lower(t)) as h", "new_id as dup_of")
    idempotentAppend(
      survivors.withColumn("batch_id", lit(batchId)), "batch_id", indexPath)
    mergeBloom(spark, survivors, bloomPath)
    ()
  }

  /** Read the stored bloom, REPAIRING an interrupted swap first: if a
    * crash landed between `delete(dst)` and `rename(tmp, dst)` in
    * [[mergeBloom]], the completed tmp directory is promoted — the
    * stable path always resolves, the stream never poisons on a
    * half-finished swap. */
  private def readBloom(
      spark: org.apache.spark.sql.SparkSession, bloomPath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(bloomPath)
    val tmp = new org.apache.hadoop.fs.Path(bloomPath + ".tmp")
    if (!fs.exists(dst) && fs.exists(tmp)) fs.rename(tmp, dst)
    spark.read.parquet(bloomPath)
  }

  /** OR-merge the survivors' bloom into the stored one — two
    * conf-bounded binaries on the driver, written back as the one-row
    * bloom table. The survivors' sketch is built with the
    * `expected_items` stored NEXT TO the bloom (seed-time sizing), so
    * `mergeInPlace`'s identical-sizing precondition holds by
    * construction — a caller can't crash the stream mid-run with a
    * mismatched size. Idempotent under replay (OR of already-present
    * elements); a survivor-less batch (every row was a dup) is a
    * no-op, not a null sketch. */
  private def mergeBloom(
      spark: org.apache.spark.sql.SparkSession,
      survivorsIdx: DataFrame,
      bloomPath: String): Unit = {
    import org.apache.spark.util.sketch.BloomFilter
    val stored = readBloom(spark, bloomPath).head()
    val storedBytes = stored.getAs[Array[Byte]]("bf")
    val expectedItems = stored.getAs[Long]("expected_items")
    val addBytes = IncrementalDedup.hashBloom(survivorsIdx, expectedItems)
      .head().getAs[Array[Byte]](0)
    if (addBytes == null) return // zero survivors: nothing to merge
    val merged = BloomFilter.readFrom(new java.io.ByteArrayInputStream(storedBytes))
    merged.mergeInPlace(
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(addBytes)))
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    import spark.implicits._
    Seq((out.toByteArray, expectedItems)).toDF("bf", "expected_items")
      .write.mode("overwrite").parquet(bloomPath + ".tmp")
    // parquet has no atomic single-file swap; the read side repairs a
    // crash between these two calls ([[readBloom]] promotes tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(bloomPath)
    val tmp = new org.apache.hadoop.fs.Path(bloomPath + ".tmp")
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  private def idempotentAppend(
      df: DataFrame, partCol: String, path: String): Unit =
    IncrementalDedup.idempotentAppend(df, partCol, path)
}
