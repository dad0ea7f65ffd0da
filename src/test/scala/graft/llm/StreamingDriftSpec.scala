package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** StreamingDrift: per-batch quantized KL against a frozen bucketed
  * reference.
  *  - an in-distribution batch (verbatim reference text) scores ~0;
  *  - an out-of-distribution flood (tokens the reference never saw)
  *    scores strictly and substantially higher;
  *  - the monitor log is batch-id-partitioned and replay-idempotent.
  */
class StreamingDriftSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("OOD batches score above in-distribution batches; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sdrift").toString
    val (refPath, monPath, ckpt) = (s"$dir/ref", s"$dir/monitor", s"$dir/ckpt")

    // the reference must carry real mass per bucket (counts ≫ 1) or the
    // unseen-bucket floor (count 1) is indistinguishable at 1-bit
    // quantization — 32 copies give seen buckets ~5 bits of headroom
    // over unseen ones, which is the regime a real corpus is always in
    val reference = Seq.fill(32)(Seq(
      "the catalyst optimizer rewrites logical plans",
      "snapshots commit through optimistic metadata swaps",
      "the optimizer prunes partitions before scans")).flatten
      .toDF("text")
    StreamingDrift.seed(reference, refPath)

    val input = MemoryStream[String]
    val query = StreamingDrift.start(
      input.toDF().toDF("text"), refPath, monPath, ckpt)
    try {
      // batch 0: verbatim in-distribution text
      input.addData("the catalyst optimizer rewrites logical plans")
      query.processAllAvailable()
      // batch 1: an unseen-token flood — the drift the monitor exists for
      input.addData("zzqx wvut kjhg zzqx wvut kjhg zzqx wvut kjhg plm okn")
      query.processAllAvailable()

      val rows = spark.read.parquet(monPath)
        .collect().map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Double]("drift_bits"))).toMap
      assert(rows.keySet === Set(0L, 1L))
      val inDist = rows(0L)._2
      val ood = rows(1L)._2
      assert(ood > inDist + 2.0,
        s"OOD drift $ood must clearly exceed in-distribution $inDist")

      // replay batch 1 directly: the partitioned append overwrites its
      // own partition — the log cannot double-count
      StreamingDrift.processBatch(
        Seq("zzqx wvut kjhg zzqx wvut kjhg zzqx wvut kjhg plm okn").toDF("text"),
        1L, refPath, monPath)
      val replayed = spark.read.parquet(monPath).collect()
      assert(replayed.length === 2)
    } finally query.stop()
  }
}
