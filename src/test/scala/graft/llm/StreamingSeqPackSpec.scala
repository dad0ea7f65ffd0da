package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingSeqPack: micro-batches lay documents into the SAME
  * fixed-length sequence stream the batch packer computes.
  *
  *  - seeding a corpus then streaming two batches in doc_id order
  *    reproduces the batch layout of the concatenated corpus exactly
  *    (the equivalence that makes the operator trustworthy);
  *  - a document straddling a MICRO-BATCH boundary continues the
  *    in-flight sequence rather than opening a fresh one;
  *  - replaying a batch (the at-least-once crash case) converges to
  *    the same final state.
  */
class StreamingSeqPackSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // per-sequence rollup of the doc-level assignment table, the shape
  // qSeqPack emits (minus the ordering)
  private def rollup(assignPath: String) =
    spark.read.parquet(assignPath)
      .groupBy("seq")
      .agg(
        expr("count(*) as n_docs"),
        expr("sum(seq_toks) as seq_tokens"),
        expr("sum(case when prior_toks < seq * 2048 then 1 else 0 end) as n_carried"),
        expr("min(doc_id) as first_doc"),
        expr("max(doc_id) as last_doc"))
      .orderBy("seq")

  test("streamed batches reproduce the batch packer's layout, across batch seams and replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sseqpack").toString
    val (assignPath, offsetsPath, ckpt) = (s"$dir/assign", s"$dir/offsets", s"$dir/ckpt")

    // corpus of 3 docs, 1500 tokens total: the stream must CONTINUE
    // mid-sequence-0 (offset 1500 < 2048), not restart at 0
    def doc(id: Long, n: Int): (Long, String) = (id, Seq.fill(n)("w").mkString(" "))
    val corpus = Seq(doc(1, 500), doc(2, 400), doc(3, 600)).toDF("doc_id", "text")
    StreamingSeqPack.seed(corpus, assignPath, offsetsPath)

    val input = MemoryStream[(Long, String)]
    val query = StreamingSeqPack.start(
      input.toDF().toDF("doc_id", "text"), assignPath, offsetsPath, ckpt)
    try {
      // batch 0: doc 10 fills past the seq-0 boundary (1500+3000 toks
      // spans seqs 0..2); doc 11 rides behind it
      input.addData(doc(10, 3000), doc(11, 100))
      query.processAllAvailable()
      // batch 1: more docs, one long enough to span again
      input.addData(doc(20, 48), doc(21, 2500), doc(22, 7))
      query.processAllAvailable()
    } finally query.stop()

    // equivalence: the streamed layout == the batch packer over the
    // concatenated corpus (same doc_id order)
    val all = (Seq(doc(1, 500), doc(2, 400), doc(3, 600), doc(10, 3000),
      doc(11, 100), doc(20, 48), doc(21, 2500), doc(22, 7)))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks")
    val batchLayout = Sampling.packSequences(all).collect().toSeq
    assert(rollup(assignPath).collect().toSeq === batchLayout)

    // the seam doc really straddles batches: doc 10 begins in the
    // sequence the CORPUS left open (offset 1500 lands in seq 0)
    val d10 = spark.read.parquet(assignPath).where("doc_id = 10")
      .select("seq").collect().map(_.getLong(0)).sorted
    assert(d10.toSeq === Seq(0L, 1L, 2L))

    // replay batch 1 (at-least-once): same batchId, same inputs —
    // state must converge, not double-append
    val replay = Seq(doc(20, 48), doc(21, 2500), doc(22, 7)).toDF("doc_id", "text")
    StreamingSeqPack.processBatch(replay, 1L, assignPath, offsetsPath)
    assert(rollup(assignPath).collect().toSeq === batchLayout)
    // offsets converged too: one end_toks per batch, strictly increasing
    val offs = spark.read.parquet(offsetsPath)
      .selectExpr("cast(batch_id as bigint) as batch_id", "end_toks")
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(offs.map(_._1).toSeq === offs.map(_._1).distinct.sorted.toSeq,
      "one offsets row per batch")
    assert(offs.map(_._2).toSeq === offs.map(_._2).sorted.toSeq,
      "end offsets must be non-decreasing across batches")
    assert(offs.last._2 === 1500L + 3100L + 2555L, "final offset = total tokens")
  }
}
