package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

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
  * Small-files control: one directory per micro-batch is a listing
  * bomb at production batch counts, so [[compact]] periodically folds
  * every live directory into a single token-bucketed
  * `compacted_upto_<id>` generation; reads always take the highest
  * watermark plus only the batches past it, so compaction is safe to
  * replay and safe to crash mid-way (covered dirs are garbage, not
  * state).
  *
  * Scoring is [[Retrieval.bm25Against]] over the union of batch
  * partitions — incoming queries see every document ingested so far,
  * with df/avgdl always computed at the index's current state (a real
  * inverted index's behavior after a refresh cycle). */
object StreamingLexicalIndex {

  /** Outcome of one [[compact]] call (r17: the degraded no-GC path is
    * a distinct, observable result rather than a success look-alike). */
  sealed trait CompactResult
  object CompactResult {
    /** Nothing past the current watermark — no generation minted. */
    case object NoNewBatches extends CompactResult
    /** New generation committed (`_SUCCESS` present), covered dirs
      * swept; reads now resolve to `watermark`. */
    final case class Compacted(watermark: Long) extends CompactResult
    /** The generation write left NO `_SUCCESS` marker (committer
      * configured `marksuccessfuljobs=false`): GC skipped, reads STILL
      * resolve to the previous watermark, the uncommitted directory is
      * garbage the next properly-configured compact sweeps. Data-safe,
      * but NOT a compaction — monitor this. */
    final case class MarkerMissing(attemptedWatermark: Long) extends CompactResult
  }

  /** Day-0 seeding: the existing corpus's postings as batch_seed. */
  def seed(corpusDocs: DataFrame, statePath: String): Unit =
    Retrieval.postingsOf(Retrieval.bigramToksOf(corpusDocs))
      .write.mode("overwrite").parquet(s"$statePath/batch_seed")

  /** Start continuous index maintenance over `docs` (streaming frame
    * with `doc_id: bigint, text: string`). `compactEvery` folds the
    * per-batch directories into one consolidated generation every N
    * micro-batches (0 disables) — the small-files bound holds without
    * an external scheduler, and a replayed batch that re-triggers
    * compaction is harmless (compaction is idempotent and watermark-
    * addressed). */
  def start(
      docs: DataFrame,
      statePath: String,
      checkpoint: String,
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          compact(batch.sparkSession, statePath)
        ()
      }
      .start()

  /** One micro-batch — package-visible so specs can drive replay
    * directly. Overwrites its own batch directory: idempotent under
    * at-least-once replay by construction. */
  private[llm] def processBatch(
      batch: DataFrame, batchId: Long, statePath: String): Unit =
    Retrieval.postingsOf(Retrieval.bigramToksOf(batch))
      .write.mode("overwrite").parquet(s"$statePath/batch_$batchId")

  /** Postings schema pinned for the empty-index case (exactly what
    * [[Retrieval.postingsOf]] produces). */
  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("dl", IntegerType, nullable = true),
    StructField("token", StringType, nullable = true),
    StructField("tf", LongType, nullable = false)))

  private def fs(spark: SparkSession, statePath: String) =
    new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A compacted generation is STATE only once its job committed —
    * Spark's file committer writes `_SUCCESS` at job commit, after
    * every task file is in place. Without this gate a reader racing
    * the compaction write (or arriving after a mid-write crash) would
    * adopt the half-written generation as the highest watermark and
    * silently serve an index missing every batch it claims to cover.
    * Uncommitted generations are garbage: ignored by reads, swept by
    * the next successful [[compact]]. */
  private def committed(f: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    f.exists(new Path(p, "_SUCCESS"))

  /** The live state directories: (compaction watermark if any, batch
    * dirs NOT covered by it). A `compacted_upto_<W>` directory holds
    * the merged postings of batch_seed and every batch_<id> with
    * id <= W; reads take the HIGHEST watermark plus only the batch
    * dirs beyond it, so deleting covered dirs is pure garbage
    * collection — correctness never depends on the delete having
    * happened (a crash between compaction-write and cleanup cannot
    * double-count). */
  private def liveDirs(
      spark: SparkSession, statePath: String): (Option[Long], Seq[Path]) = {
    val root = new Path(statePath)
    val f = fs(spark, statePath)
    if (!f.exists(root)) return (None, Seq.empty)
    val dirs = f.listStatus(root).filter(_.isDirectory).map(_.getPath).toSeq
    // only COMMITTED generations may carry the watermark (see
    // [[committed]]); a malformed foreign name parses to None rather
    // than throwing, matching every other parse in this file
    val watermark = dirs.flatMap { p =>
      p.getName match {
        case s if s.startsWith("compacted_upto_") && committed(f, p) =>
          scala.util.Try(s.stripPrefix("compacted_upto_").toLong).toOption
        case _ => None
      }
    }.sorted.lastOption
    val live = dirs.filter { p =>
      p.getName match {
        case "batch_seed" => watermark.isEmpty // seed is covered by any compaction
        case s if s.startsWith("compacted_upto_") =>
          scala.util.Try(s.stripPrefix("compacted_upto_").toLong).toOption
            .exists(watermark.contains) && committed(f, p)
        case s if s.startsWith("batch_") =>
          scala.util.Try(s.stripPrefix("batch_").toLong).toOption
            .exists(id => watermark.forall(id > _))
        case _ => false
      }
    }
    (watermark, live)
  }

  /** The index as of now: the latest compacted generation plus every
    * batch ingested past it. An index with no state yet (no seed, no
    * micro-batch) is EMPTY, not an error — scoring against it returns
    * zero rows, the behavior a freshly-started serving index needs. */
  def indexPostings(spark: SparkSession, statePath: String): DataFrame = {
    val (_, live) = liveDirs(spark, statePath)
    if (live.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], postingsSchema)
    else spark.read.schema(postingsSchema).parquet(live.map(_.toString): _*)
  }

  /** Token buckets of a compacted generation — fixed fan-in so the
    * consolidated index is a bounded number of files regardless of how
    * many micro-batches it absorbed. */
  private val CompactBuckets = 8

  /** Merge every live directory into ONE consolidated token-bucketed
    * generation, `compacted_upto_<maxBatchId>`. Idempotent by the same
    * batch-addressing discipline as ingest: the target directory name
    * is a pure function of the covered inputs and is written
    * mode=overwrite, so a replayed/crashed compaction rewrites the
    * same generation with identical content; reads adopt a generation
    * only once its `_SUCCESS` marker exists (job commit), so the
    * switch to the new watermark is atomic — a racing reader and a
    * mid-write crash both resolve to the previous watermark plus the
    * still-live batch dirs, never to a partial generation. Covered
    * dirs are then deleted as garbage collection. Returns
    * [[CompactResult.Compacted]] with the new watermark,
    * [[CompactResult.NoNewBatches]] when there is nothing new to
    * compact (replaying a no-op compaction must not mint a new
    * generation), or [[CompactResult.MarkerMissing]] when the write
    * left no `_SUCCESS` marker (r17: the degraded no-GC path is now
    * OBSERVABLE — reads still resolve to the OLD watermark, so a
    * caller must not report the tick as compacted). Postings rows are
    * merged verbatim (documents are batch-unique, the ingest
    * contract), so scoring before and after compaction is
    * byte-identical. */
  def compact(spark: SparkSession, statePath: String): CompactResult = {
    val (watermark, live) = liveDirs(spark, statePath)
    val batchIds = live.flatMap(p =>
      scala.util.Try(p.getName.stripPrefix("batch_").toLong).toOption)
    if (batchIds.isEmpty) // nothing beyond the watermark (or only seed)
      return CompactResult.NoNewBatches
    val newW = (batchIds ++ watermark).max
    val newGenPath = new Path(s"$statePath/compacted_upto_$newW")
    spark.read.schema(postingsSchema).parquet(live.map(_.toString): _*)
      .repartition(CompactBuckets, org.apache.spark.sql.functions.col("token"))
      .write.mode("overwrite").parquet(newGenPath.toString)
    val f = fs(spark, statePath)
    // GC GATE (r16): reads adopt a generation only behind its
    // `_SUCCESS` job-commit marker — so before sweeping the covered
    // inputs, assert the marker the write SHOULD have left actually
    // exists. If the committer is configured not to write markers
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false),
    // liveDirs would ignore the fresh generation while its inputs
    // vanished — silent loss of every covered posting. Skipping GC
    // degrades that config to a no-GC compaction (the next properly
    // configured compact() sweeps the leftovers); data loss never.
    // r17: the degraded path returns a DISTINCT result — reads still
    // resolve to the old watermark, and a dashboard treating this as
    // "compacted to newW" would show success forever while the
    // directory count grows.
    if (!committed(f, newGenPath)) {
      System.err.println(
        s"[graft-slex] compact: no _SUCCESS marker at $newGenPath " +
          "(committer configured marksuccessfuljobs=false?); GC skipped, " +
          "reads stay on the previous watermark")
      return CompactResult.MarkerMissing(newW)
    }
    // GC — best-effort, reads are already on newW: sweep EVERY covered
    // dir (inputs, superseded generations, and any replayed batch a
    // prior crash left behind), never a batch past the new watermark
    f.listStatus(new Path(statePath)).filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName match {
          case "batch_seed" => true
          case s if s.startsWith("compacted_upto_") =>
            scala.util.Try(s.stripPrefix("compacted_upto_").toLong).toOption
              .exists(_ < newW)
          case s if s.startsWith("batch_") =>
            scala.util.Try(s.stripPrefix("batch_").toLong).toOption
              .exists(_ <= newW)
          case _ => false
        }
      }
      .foreach(p => f.delete(p, true))
    CompactResult.Compacted(newW)
  }

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
