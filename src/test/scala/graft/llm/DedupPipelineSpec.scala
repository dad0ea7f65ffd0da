package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The materialized-intermediate dedup chain: signatures → pairs →
  * clusters → keep-best over WRITTEN tables, with the two contracts
  * that make it the 100 TB composition story:
  *  1. the raw corpus text is scanned exactly once per stage that
  *     needs it (stage 1 signatures; stage 4 quality) and NEVER by
  *     pairs/clusters — pinned by walking each stage's plan leaves
  *     for the documents file;
  *  2. the chain's survivors are bit-identical to the self-contained
  *     [[Dedup.qDedupKeepBest]] (one oracle gates both). */
class DedupPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Root paths of every file relation in the frame's logical plan. */
  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }.toSeq

  private def docScans(df: DataFrame): Int =
    scannedPaths(df).count(_.contains("documents.parquet"))

  test("written-table chain: corpus scanned once per stage, survivors match the twin") {
    val tmp = Files.createTempDirectory("graft-dedup-pipeline").toString
    val base = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id as id", "split(lower(text), ' ') as toks")
    val variants = base.filter("id % 7 = 0")
      .selectExpr(s"id + ${Dedup.VariantIdOffset} as id",
        "slice(toks, 1, greatest(size(toks) - 4, 0)) as toks")
    val corpus = base.unionAll(variants)

    // stage 1 — signatures: the ONLY stage that reads document text
    val sigDf = DedupPipeline.signatureRows(corpus)
    assert(docScans(sigDf) >= 1)
    sigDf.write.parquet(s"$tmp/signatures")
    val sig = spark.read.parquet(s"$tmp/signatures")

    // stage 2 — pairs: derives everything (bands, cap, verify) from
    // the signature table; the documents file must appear NOWHERE in
    // its plan
    val pairsDf = DedupPipeline.pairsFromSignatures(sig)
    assert(docScans(pairsDf) === 0,
      s"pairs stage rescans the corpus: ${scannedPaths(pairsDf)}")
    pairsDf.write.parquet(s"$tmp/pairs")
    val pairs = spark.read.parquet(s"$tmp/pairs")

    // the materialized pairs are the self-contained LSH twin's pairs
    val twinPairs = Dedup.qDedupMinhashLsh(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val chainPairs = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(chainPairs === twinPairs)

    // stage 3 — clusters off the written pairs (no corpus access by
    // construction: the input frame IS the pairs table)
    val clustersDf = DedupPipeline.clustersFromPairs(pairs)
    clustersDf.write.parquet(s"$tmp/clusters")
    val clusters = spark.read.parquet(s"$tmp/clusters")

    // stage 4 — keep-best: exactly ONE corpus scan (the quality pass)
    val bestDf = DedupPipeline.keepBestFromClusters(
      clusters, Dedup.keepBestQuality(spark, sf))
    assert(docScans(bestDf) === 1,
      s"keep-best stage should scan the corpus exactly once (quality): ${scannedPaths(bestDf)}")

    val chain = bestDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val twin = Dedup.qDedupKeepBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(chain.nonEmpty)
    assert(chain.toSeq === twin.toSeq)
  }

  test("gated indexed variant equals the self-contained twin") {
    val indexed = DedupPipeline.qDedupKeepBestIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val twin = Dedup.qDedupKeepBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(indexed.nonEmpty)
    assert(indexed.toSeq === twin.toSeq)
  }

  test("indexed report and leak-free split equal their self-contained twins") {
    val repIdx = DedupPipeline.qDedupReportIndexed(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val repTwin = Dedup.qDedupReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(repIdx.nonEmpty && repIdx.exists(_._3 > 0),
      "report fixture must show real duplication traffic")
    assert(repIdx.toSeq === repTwin.toSeq)

    val splitIdx = DedupPipeline.qSplitLeakfreeIndexed(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val splitTwin = Sampling.qSplitLeakfree(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(splitIdx.nonEmpty)
    assert(splitIdx.toSeq === splitTwin.toSeq)
  }

  test("signature rows: null signature for shingle-less docs, hashes kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("only", "two")),            // < 3 toks → no 3-gram
      (2L, Seq("a", "b", "c", "d")))       // 2 shingles
      .toDF("id", "toks")
    val rows = DedupPipeline.signatureRows(docs).orderBy("id").collect()
    assert(rows(0).isNullAt(1), "no 3-grams → null MinHash signature")
    assert(rows(1).getSeq[Long](1).size === Dedup.NumHashes)
    assert(rows(1).getSeq[Long](2).size === 2, "two distinct 3-gram hashes")
  }
}
