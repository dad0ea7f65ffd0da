package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingDedup: each micro-batch probes the MATERIALIZED index via
  * the exact batch code path (IncrementalDedup.dedupAgainstIndex), the
  * batch self-appends, and replays overwrite their own partition.
  *
  *  - batch 1's planted near-copy of a CORPUS doc is matched;
  *  - batch 2's planted near-copy of a BATCH-1 doc is matched (the
  *    self-append grew the index between batches);
  *  - fresh docs match nothing;
  *  - matches agree with running the same batch through the batch
  *    incremental path against the same pre-batch index state.
  */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def doc(id: Long, text: String): (Long, Seq[String]) =
    id -> text.toLowerCase.split(' ').toSeq

  test("stream-of-batches dedup against a growing materialized index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val (indexPath, corpusPath, matchesPath, ckpt) =
      (s"$dir/index", s"$dir/corpus", s"$dir/matches", s"$dir/ckpt")

    // day-0 corpus: distinct docs, long enough to shingle
    val corpusDocs = Seq(
      doc(1, "catalyst optimizes logical plans into efficient physical plans with codegen stages"),
      doc(2, "spark shuffles data between stages using hash partitioning and sort based exchange"),
      doc(3, "iceberg tables commit snapshots through an optimistic metadata swap protocol"))
      .toDF("id", "toks")
    StreamingDedup.seed(
      IncrementalDedup.indexRows(corpusDocs), corpusDocs, indexPath, corpusPath)

    val input = MemoryStream[(Long, Seq[String])]
    val query = StreamingDedup.start(
      input.toDF().toDF("id", "toks"), indexPath, corpusPath, matchesPath, ckpt)
    try {
      // batch 1: near-copy of corpus doc 1 (last token dropped), one fresh doc
      val b1near = doc(101,
        "catalyst optimizes logical plans into efficient physical plans with codegen")
      val b1fresh = doc(102,
        "completely unrelated text about gardening tomatoes in late summer sunshine weather")
      input.addData(b1near, b1fresh)
      query.processAllAvailable()

      // batch 2: near-copy of BATCH-1's fresh doc — provable only if
      // batch 1 self-appended into the index
      val b2near = doc(201,
        "completely unrelated text about gardening tomatoes in late summer sunshine")
      input.addData(b2near)
      query.processAllAvailable()

      val matches = spark.read.parquet(matchesPath)
        // partition-column values come back type-inferred (int)
        .select(col("batch_id").cast("long"), col("new_id"), col("dup_of"), col("jaccard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val byNew = matches.groupBy(_._2)
      assert(byNew.keySet === Set(101L, 201L), s"got ${matches.toSeq}")
      assert(byNew(101L).forall(m => m._3 === 1L && m._1 === 0L))
      assert(byNew(201L).forall(m => m._3 === 102L && m._1 === 1L),
        "batch-2 near-dup must match the batch-1 doc via the self-appended index")
      assert(matches.forall(_._4 >= 0.5))

      // parity with the batch incremental path: replay batch 2 against
      // the index state it actually saw (batches -1 and 0)
      val preB2Index = spark.read.parquet(indexPath)
        .filter(col("batch_id") < 1).select("id", "b", "k")
      val preB2Corpus = spark.read.parquet(corpusPath)
        .filter(col("batch_id") < 1).select("id", "toks")
      val batchPath = IncrementalDedup
        .dedupAgainstIndex(Seq(b2near).toDF("id", "toks"), preB2Index, preB2Corpus)
        .select("new_id", "dup_of", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val streamB2 = matches.filter(_._1 == 1L).map(m => (m._2, m._3, m._4)).toSet
      assert(streamB2 === batchPath,
        "streaming micro-batch must equal the batch incremental path bit for bit")

      // the corpus/index tables grew by exactly the streamed batches
      val corpusIds = spark.read.parquet(corpusPath)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(corpusIds === Set(1L, 2L, 3L, 101L, 102L, 201L))

      // CRASH-REPLAY: rerun batch 1 AFTER its self-append already
      // landed (the at-least-once case) — decisions must be identical,
      // never dup-of-self matches against its own index rows
      val before = spark.read.parquet(matchesPath)
        .select(col("batch_id").cast("long"), col("new_id"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      StreamingDedup.processBatch(
        Seq(b1near, b1fresh).toDF("id", "toks"), 0L,
        indexPath, corpusPath, matchesPath, 0.5)
      val after = spark.read.parquet(matchesPath)
        .select(col("batch_id").cast("long"), col("new_id"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(after === before,
        "replaying a batch over its own self-appended state must be a no-op")
    } finally query.stop()
  }
}
