package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous distinct-cardinality tracking: a stream of document
  * batches folds into per-source KMV sketches — the streaming face of
  * [[CorpusStats.qKmvDistinct]], completing the sketch family's twin
  * symmetry ([[StreamingExactDedup]] ↔ exact probe, [[StreamingDedup]]
  * ↔ near-dup probe). "How many distinct n-grams has each source
  * contributed so far" stays answerable at any moment without ever
  * re-scanning the corpus.
  *
  * Shape per micro-batch (`foreachBatch`):
  *
  *  1. the batch's per-source KMV sketch via the SAME native aggregate
  *     the batch query uses ([[graft.functions.KmvSketchAgg]]) — the
  *     streaming and batch answers can't diverge semantically;
  *  2. full-outer-join with the stored state and merge per source with
  *     `slice(array_sort(array_distinct(concat(...))), 1, k)` — the KMV
  *     union IS set-union-then-truncate, expressible in codegen'd
  *     builtins, no UDF;
  *  3. swap the state table (tmp + rename, read-side repair), exactly
  *     the bloom-swap pattern [[StreamingExactDedup]] uses.
  *
  * State: NONE in the streaming engine — no watermark, no state store.
  * The sketch table is O(sources · k) longs BY CONSTRUCTION (the whole
  * point of KMV), so reading and rewriting it per batch is bounded by
  * configuration, never by stream volume. Replay-safe without any
  * guard: KMV union is idempotent — re-merging a batch's sketch is a
  * set-union no-op, so an at-least-once foreachBatch replay cannot
  * drift the state (unlike counters, which is why the exact twin needs
  * its batch-id partition dance and this one doesn't). */
object StreamingCardinality {

  /** Keep-size shared with the gated batch query. */
  val K: Int = CorpusStats.KmvK

  /** Per-source KMV sketch of the frame's bigrams — the one derivation
    * both the seed, the per-batch fold, and the batch oracle share.
    * Expects (source: string, text: string). */
  def sketchOf(docs: DataFrame): DataFrame =
    docs
      .selectExpr("source", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where("size(ta) >= 2")
      .selectExpr("source",
        """explode(transform(sequence(2, size(ta)),
          |  i -> concat(element_at(ta, i - 1), ' ', element_at(ta, i)))) as bigram""".stripMargin)
      .selectExpr("source", s"${Portable.hSpark("bigram")} as h")
      .groupBy(col("source"))
      .agg(graft.functions.KmvSketch.of(K)(col("h")).as("sk"))

  /** Day-0 seeding: the corpus's per-source sketches as the state table. */
  def seed(corpusDocs: DataFrame, statePath: String): Unit =
    sketchOf(corpusDocs).write.mode("overwrite").parquet(statePath)

  /** Start the cardinality stream over `docs` (streaming frame with
    * `source: string, text: string`). `statePath` must hold day-0
    * state ([[seed]]) before the stream starts. */
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
    * directly. `batchId` is unused on purpose: the merge is idempotent,
    * so replay needs no bookkeeping. */
  private[llm] def processBatch(
      batch: DataFrame, batchId: Long, statePath: String): Unit = {
    val spark = batch.sparkSession
    val stored = readState(spark, statePath)
    val merged = stored.as("a")
      .join(sketchOf(batch).as("b"), Seq("source"), "full_outer")
      .selectExpr("source",
        s"""slice(array_sort(array_distinct(concat(
           |  coalesce(a.sk, array()), coalesce(b.sk, array())))), 1, $K) as sk""".stripMargin)
    // tmp + swap with read-side repair (the bloom pattern): parquet has
    // no atomic overwrite-while-reading
    merged.write.mode("overwrite").parquet(statePath + ".tmp")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(statePath)
    val tmp = new org.apache.hadoop.fs.Path(statePath + ".tmp")
    fs.delete(dst, true)
    fs.rename(tmp, dst)
    ()
  }

  private def readState(spark: SparkSession, statePath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(statePath)
    val tmp = new org.apache.hadoop.fs.Path(statePath + ".tmp")
    if (!fs.exists(dst) && fs.exists(tmp)) fs.rename(tmp, dst)
    spark.read.parquet(statePath)
  }

  /** Current readout: (source, n_kept, kth_min, est_distinct) — same
    * derivation as the gated batch query. */
  def estimates(spark: SparkSession, statePath: String): DataFrame =
    readState(spark, statePath).selectExpr(
      "source",
      "cast(size(sk) as bigint) as n_kept",
      "element_at(sk, size(sk)) as kth_min",
      s"""case when size(sk) < $K then cast(size(sk) as double)
         |else ${K - 1}.0 * 1152921504606846976.0 / cast(element_at(sk, $K) as double)
         |end as est_distinct""".stripMargin)
      .orderBy(col("source"))
}
