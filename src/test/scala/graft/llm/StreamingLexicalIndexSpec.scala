package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** StreamingLexicalIndex: continuous BM25 postings maintenance.
  *
  *  - the index after N batches EQUALS the batch postings derivation
  *    over seed ∪ batches (the streaming twin can never drift from
  *    [[Retrieval]]'s tokenization/aggregation);
  *  - replaying a batch overwrites its own partition with identical
  *    bytes — the index must not move (at-least-once safety);
  *  - scoring against the streamed state equals the gated
  *    `q_bm25_incremental` when the ingested state matches its
  *    frozen-corpus split — tier parity, same contract as
  *    StreamingAnnAssign ↔ q_ann_assign_incremental.
  */
class StreamingLexicalIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def mkDocs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("streamed index equals the batch derivation; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-slex").toString
    val statePath = s"$dir/state"

    val corpus = mkDocs(
      (1L, "spark query plan spark query join"),
      (2L, "filter scan shuffle filter scan"))
    StreamingLexicalIndex.seed(corpus, statePath)

    val input = MemoryStream[(Long, String)]
    val query = StreamingLexicalIndex.start(
      input.toDF().toDF("doc_id", "text"), statePath, s"$dir/ckpt")
    try {
      val b1 = Seq((10L, "spark query window sort merge"),
        (11L, "broadcast join shuffle hash"))
      input.addData(b1: _*)
      query.processAllAvailable()
      val b2 = Seq((20L, "scan filter scan filter project"))
      input.addData(b2: _*)
      query.processAllAvailable()

      def postingsSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      val expected = postingsSet(Retrieval.postingsOf(
        Retrieval.bigramToksOf(corpus.unionByName(mkDocs(b1 ++ b2: _*)))))
      val got = postingsSet(StreamingLexicalIndex.indexPostings(spark, statePath))
      assert(got === expected)

      // replay batch 0 (same docs, same id): identical bytes, no drift
      StreamingLexicalIndex.processBatch(mkDocs(b1: _*), batchId = 0L, statePath)
      assert(postingsSet(
        StreamingLexicalIndex.indexPostings(spark, statePath)) === expected)
    } finally query.stop()
  }

  test("a freshly-started index is empty, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slex0").toString
    // no seed, no batches — scoring must return zero rows, not throw
    val scored = StreamingLexicalIndex.scoreAgainstIndex(
      spark, mkDocs((1L, "spark query plan")), s"$dir/state")
    assert(scored.collect().isEmpty)
    assert(StreamingLexicalIndex.indexPostings(spark, s"$dir/state").isEmpty)
  }

  test("compaction: scoring identical before/after, dirs bounded, replay no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slex3").toString
    val statePath = s"$dir/state"
    val queries = mkDocs((100L, "spark query filter scan"))
    StreamingLexicalIndex.seed(mkDocs(
      (1L, "spark query plan spark query join"),
      (2L, "filter scan shuffle filter scan")), statePath)
    (0L to 4L).foreach { id =>
      StreamingLexicalIndex.processBatch(
        mkDocs((10L + id, s"spark query window sort batch$id")), id, statePath)
    }
    def dirNames = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(statePath))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith(".")).toSet
      finally s.close()
    }
    assert(dirNames.count(_.startsWith("batch_")) === 6) // seed + 5 batches
    val before = StreamingLexicalIndex.scoreAgainstIndex(spark, queries, statePath)
      .collect().map(_.toSeq).toSeq
    val postingsBefore = StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet

    assert(StreamingLexicalIndex.compact(spark, statePath) ===
      StreamingLexicalIndex.CompactResult.Compacted(4L))
    // consolidated: exactly one live generation, the small-files bound
    assert(dirNames === Set("compacted_upto_4"))
    assert(StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet === postingsBefore)
    assert(StreamingLexicalIndex.scoreAgainstIndex(spark, queries, statePath)
      .collect().map(_.toSeq).toSeq === before)
    // replaying a no-op compaction mints no new generation
    assert(StreamingLexicalIndex.compact(spark, statePath) ===
      StreamingLexicalIndex.CompactResult.NoNewBatches)
    assert(dirNames === Set("compacted_upto_4"))

    // crash-window safety: a covered batch dir whose GC delete never
    // ran must be IGNORED by reads (highest watermark wins), not
    // double-counted
    StreamingLexicalIndex.processBatch(
      mkDocs((12L, "spark query window sort batch2")), 2L, statePath)
    assert(StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet === postingsBefore)

    // ingest continues past the watermark; the next compaction absorbs it
    StreamingLexicalIndex.processBatch(
      mkDocs((20L, "scan filter scan filter project")), 7L, statePath)
    val withNew = StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet
    assert(withNew.size > postingsBefore.size)
    assert(StreamingLexicalIndex.compact(spark, statePath) ===
      StreamingLexicalIndex.CompactResult.Compacted(7L))
    assert(dirNames === Set("compacted_upto_7"))
    assert(StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet === withNew)
  }

  test("marker-disabled committer: compact reports MarkerMissing, no GC, " +
    "reads stay on the old watermark, next proper compact sweeps") {
    val statePath =
      java.nio.file.Files.createTempDirectory("graft-slex5").toString + "/state"
    val queries = mkDocs((100L, "spark query filter scan"))
    StreamingLexicalIndex.seed(mkDocs(
      (1L, "spark query plan spark query join"),
      (2L, "filter scan shuffle filter scan")), statePath)
    (0L to 2L).foreach { id =>
      StreamingLexicalIndex.processBatch(
        mkDocs((10L + id, s"spark query window sort batch$id")), id, statePath)
    }
    val before = StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet
    val scoresBefore = StreamingLexicalIndex.scoreAgainstIndex(
      spark, queries, statePath).collect().map(_.toSeq).toSeq
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    hc.set(key, "false")
    try {
      // degraded config: the result is DISTINCT (not a success
      // look-alike), inputs survive, and reads resolve to the OLD
      // watermark — identical postings, identical scores
      assert(StreamingLexicalIndex.compact(spark, statePath) ===
        StreamingLexicalIndex.CompactResult.MarkerMissing(2L))
      def dirNames = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(statePath))
        try s.iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".")).toSet
        finally s.close()
      }
      assert(dirNames === Set(
        "batch_seed", "batch_0", "batch_1", "batch_2", "compacted_upto_2"))
      assert(StreamingLexicalIndex.indexPostings(spark, statePath)
        .collect().map(_.toSeq).toSet === before)
      // replaying under the same config stays degraded, mints nothing new
      assert(StreamingLexicalIndex.compact(spark, statePath) ===
        StreamingLexicalIndex.CompactResult.MarkerMissing(2L))
    } finally hc.set(key, "true")
    // the next properly-configured compact commits and sweeps the
    // leftovers, including the previously-uncommitted generation
    assert(StreamingLexicalIndex.compact(spark, statePath) ===
      StreamingLexicalIndex.CompactResult.Compacted(2L))
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(statePath))
    val names = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith(".")).toSet
    } finally s.close()
    assert(names === Set("compacted_upto_2"))
    assert(StreamingLexicalIndex.indexPostings(spark, statePath)
      .collect().map(_.toSeq).toSet === before)
    // scoring is a pure function of the postings — identical through
    // the degraded tick and the recovery compact (tiny corpora score
    // empty under the stopword df-cap; equality is the contract)
    assert(StreamingLexicalIndex.scoreAgainstIndex(spark, queries, statePath)
      .collect().map(_.toSeq).toSeq === scoresBefore)
  }

  test("in-stream auto-compaction keeps the directory count bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-slex4").toString
    val statePath = s"$dir/state"
    val input = MemoryStream[(Long, String)]
    val query = StreamingLexicalIndex.start(
      input.toDF().toDF("doc_id", "text"), statePath, s"$dir/ckpt",
      compactEvery = 2)
    try {
      (0 until 5).foreach { i =>
        input.addData((100L + i, s"spark query stream batch$i"))
        query.processAllAvailable()
      }
      def dirNames = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(statePath))
        try s.iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".")).toSet
        finally s.close()
      }
      // batches 0..4, compactions after 1 and 3: live dirs are the
      // latest generation + at most compactEvery uncompacted batches
      assert(dirNames === Set("compacted_upto_3", "batch_4"), dirNames)
      val got = StreamingLexicalIndex.indexPostings(spark, statePath).collect()
        .map(_.toSeq).toSet
      val expected = Retrieval.postingsOf(Retrieval.bigramToksOf(
        (0 until 5).map(i => (100L + i, s"spark query stream batch$i"))
          .toDF("doc_id", "text"))).collect().map(_.toSeq).toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("scoring the streamed state matches the gated incremental query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slex2").toString
    val statePath = s"$dir/state"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text")
    // ingest the incremental query's frozen corpus as the seed + one
    // streamed batch (split by parity, exercising multi-partition reads)
    StreamingLexicalIndex.seed(
      docs.where("doc_id % 10 != 7 and doc_id % 2 = 0"), statePath)
    StreamingLexicalIndex.processBatch(
      docs.where("doc_id % 10 != 7 and doc_id % 2 = 1"), batchId = 5L, statePath)
    val streamed = StreamingLexicalIndex.scoreAgainstIndex(
      spark, docs.where("doc_id % 10 = 7"), statePath).collect()
    val gated = Retrieval.qBm25Incremental(spark, sf).collect()
    assert(streamed.length === gated.length && streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq === gated.map(_.toSeq).toSeq)
  }
}
