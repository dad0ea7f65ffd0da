package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingExactDedup: per micro-batch the EXACT batch code path
  * ([[IncrementalDedup.exactProbe]]) decides against the growing
  * index + bloom.
  *
  *  - batch 1's verbatim corpus re-submission is a dup; its fresh doc
  *    and the first of its in-batch twins survive;
  *  - batch 2's re-submission of a BATCH-1 survivor is a dup — which
  *    proves both the index self-append AND the bloom merge (a stale
  *    bloom would answer might-contain=false and wrongly keep it);
  *  - decisions agree with running the same batch through the batch
  *    probe against the same pre-batch state.
  */
class StreamingExactDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("stream-of-batches exact dedup with growing index and merged bloom") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sxdedup").toString
    val (indexPath, bloomPath, decisionsPath, ckpt) =
      (s"$dir/index", s"$dir/bloom", s"$dir/decisions", s"$dir/ckpt")
    val items = 10000L

    val corpus = Seq(
      (1L, "the catalyst optimizer rewrites logical plans"),
      (2L, "snapshots commit through optimistic metadata swaps"))
      .toDF("doc_id", "text")
    StreamingExactDedup.seed(corpus, items, indexPath, bloomPath)

    val input = MemoryStream[(Long, String)]
    // note: NO sizing parameter — the stream reads the bloom's
    // expected_items back from the bloom row seed() wrote, so a
    // restart can never supply a mismatched size (mergeInPlace would
    // throw IncompatibleMergeException mid-stream)
    val query = StreamingExactDedup.start(
      input.toDF().toDF("new_id", "t"),
      indexPath, bloomPath, decisionsPath, ckpt)
    try {
      // batch 1: corpus dup, fresh survivor, in-batch twins
      input.addData(
        (101L, "THE CATALYST OPTIMIZER REWRITES LOGICAL PLANS"), // corpus dup of 1
        (102L, "a genuinely new document about stream state"),   // survivor
        (103L, "twin text appearing twice in one batch"),        // first twin: keep
        (104L, "twin text appearing twice in one batch"))        // second twin: drop
      query.processAllAvailable()

      // batch 2: re-submit batch-1's survivor + one new doc
      input.addData(
        (201L, "a genuinely new document about stream state"),   // dup of 102
        (202L, "another new document that should survive"))
      query.processAllAvailable()

      val d = spark.read.parquet(decisionsPath).collect()
        .map(r => r.getAs[Long]("new_id") ->
          ((Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]),
            r.getAs[Boolean]("keep"), r.getAs[Long]("batch_id"))))
        .toMap
      assert(d(101L)._1 === Some(1L) && !d(101L)._2)
      assert(d(102L)._1 === None && d(102L)._2)
      assert(d(103L)._1 === None && d(103L)._2)
      assert(d(104L)._1 === None && !d(104L)._2)
      // the load-bearing cross-batch case: only possible if batch 1's
      // survivors reached BOTH the index and the bloom
      assert(d(201L)._1 === Some(102L) && !d(201L)._2,
        s"batch-2 re-submission not matched: ${d(201L)} — bloom/index not grown")
      assert(d(202L)._1 === None && d(202L)._2)

      // index now holds corpus + survivors of both batches, h-unique
      val idx = spark.read.parquet(indexPath)
      assert(idx.groupBy("h").count().where("count > 1").count() === 0)
      assert(idx.count() === 2 + 2 + 1) // corpus 2, batch1 keeps 102+103, batch2 keeps 202

      // CRASH-REPLAY: rerun batch 0 after its survivor append + bloom
      // merge landed — decisions must be unchanged (the replay guard
      // hides the batch's own index rows; bloom false-positives only
      // route rows through the confirm join)
      StreamingExactDedup.processBatch(
        Seq((101L, "THE CATALYST OPTIMIZER REWRITES LOGICAL PLANS"),
          (102L, "a genuinely new document about stream state"),
          (103L, "twin text appearing twice in one batch"),
          (104L, "twin text appearing twice in one batch")).toDF("new_id", "t"),
        0L, indexPath, bloomPath, decisionsPath)
      val d2 = spark.read.parquet(decisionsPath)
        .where(col("batch_id").cast("long") === 0L).collect()
        .map(r => r.getAs[Long]("new_id") ->
          ((Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]),
            r.getAs[Boolean]("keep"))))
        .toMap
      assert(d2(101L) === ((Some(1L), false)) && d2(102L) === ((None, true)) &&
        d2(103L) === ((None, true)) && d2(104L) === ((None, false)),
        s"replay changed decisions: $d2")
      assert(spark.read.parquet(indexPath)
        .groupBy("h").count().where("count > 1").count() === 0,
        "replay must not duplicate index rows")

      // ALL-DUP batch: zero survivors must be a no-op, not a null
      // sketch NPE (the poison-batch case)
      StreamingExactDedup.processBatch(
        Seq((301L, "the catalyst optimizer rewrites logical plans")).toDF("new_id", "t"),
        5L, indexPath, bloomPath, decisionsPath)
      val d3 = spark.read.parquet(decisionsPath)
        .where(col("batch_id").cast("long") === 5L).collect()
      assert(d3.length === 1 && !d3.head.getAs[Boolean]("keep"))
    } finally query.stop()
  }
}
