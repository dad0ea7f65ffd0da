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
    * one-row table. */
  def seed(
      corpusDocs: DataFrame,
      expectedItems: Long,
      indexPath: String,
      bloomPath: String): Unit = {
    val idx = IncrementalDedup.exactHashIndex(corpusDocs)
    idempotentAppend(idx.withColumn("batch_id", lit(-1L)), "batch_id", indexPath)
    IncrementalDedup.hashBloom(idx, expectedItems)
      .write.mode("overwrite").parquet(bloomPath)
  }

  /** Start the exact-dedup stream over `docs` (streaming frame with
    * `new_id: long, t: string`). `indexPath`/`bloomPath` must hold the
    * day-0 state ([[seed]]) before the stream starts. */
  def start(
      docs: DataFrame,
      indexPath: String,
      bloomPath: String,
      decisionsPath: String,
      checkpoint: String,
      expectedItems: Long): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(col("new_id"), col("t"))
        val index = spark.read.parquet(indexPath).select("h", "dup_of")
        val bloom = spark.read.parquet(bloomPath)
        val decisions = IncrementalDedup.exactProbe(b, index, bloom)
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
        mergeBloom(spark, survivors, bloomPath, expectedItems)
        ()
      }
      .start()
  }

  /** OR-merge the survivors' bloom into the stored one — two
    * conf-bounded binaries on the driver, written back as the one-row
    * bloom table. Idempotent under replay (OR of already-present
    * elements). */
  private def mergeBloom(
      spark: org.apache.spark.sql.SparkSession,
      survivorsIdx: DataFrame,
      bloomPath: String,
      expectedItems: Long): Unit = {
    import org.apache.spark.util.sketch.BloomFilter
    val storedBytes = spark.read.parquet(bloomPath)
      .head().getAs[Array[Byte]](0)
    val addBytes = IncrementalDedup.hashBloom(survivorsIdx, expectedItems)
      .head().getAs[Array[Byte]](0)
    val merged = BloomFilter.readFrom(new java.io.ByteArrayInputStream(storedBytes))
    merged.mergeInPlace(
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(addBytes)))
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    import spark.implicits._
    Seq(out.toByteArray).toDF("bf")
      .write.mode("overwrite").parquet(bloomPath + ".tmp")
    // parquet has no atomic single-file swap here; rewrite via a tmp
    // dir then point reads at the stable path by moving files
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(bloomPath)
    val tmp = new org.apache.hadoop.fs.Path(bloomPath + ".tmp")
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  private def idempotentAppend(
      df: DataFrame, partCol: String, path: String): Unit =
    df.write
      .partitionBy(partCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
}
