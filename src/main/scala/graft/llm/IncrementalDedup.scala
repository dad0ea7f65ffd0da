package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (batch-vs-corpus) near-dup detection — the operating
  * mode a 100 TB corpus actually runs: the full corpus is deduped
  * ONCE, its LSH band keys are materialized as a table, and every
  * daily increment probes that index instead of re-deduping the
  * world. Cost per increment is O(batch) band keys + one keyed join
  * against the index + O(candidates) verification — the corpus-sized
  * side is only ever SCANNED along the join's key grouping, never
  * re-signatured and (with the index bucket-partitioned by band key,
  * see IncrementalDedupSpec) never SHUFFLED: storage-partitioned
  * joins collocate each index bucket with the batch's matching keys.
  *
  * The signature machinery is [[Dedup]]'s (same portable MinHash,
  * same band layout), so an index built today verifies batches
  * signatured tomorrow.
  */
object IncrementalDedup {

  /** Index CONTENT for a corpus of `(id, toks)`: one row per
    * (id, band, band-key) with hot buckets dropped AT BUILD TIME.
    * Boilerplate mega-buckets carry near-zero dedup signal and would
    * otherwise make every future probe quadratic in the bucket, so
    * the cap is part of the index's definition, not a probe-time
    * filter (a growing index re-applies it on compaction). A
    * deployment writes this frame as a table
    * `PARTITIONED BY (bucket(N, k))` — appends route by band key and
    * probes join storage-partitioned. */
  def indexRows(docs: DataFrame, maxBucket: Int = Dedup.MaxBucket): DataFrame =
    compactIndex(Dedup.bandsOf(docs), maxBucket)

  /** Re-apply the hot-bucket cap to an EXISTING index — the periodic
    * maintenance pass a growing index runs: buckets that were cold at
    * build time but turned hot as increments appended (new boilerplate
    * entering the corpus) are dropped wholesale. One keyed streaming
    * window count over the index — O(1) state per bucket, no join. A
    * deployment runs this as the index table's compaction criterion
    * and rewrites only the partitions whose buckets changed. */
  def compactIndex(index: DataFrame, maxBucket: Int = Dedup.MaxBucket): DataFrame =
    Dedup.capHotBuckets(index, maxBucket)

  /** Probe a new batch `(id, toks)` against a materialized index
    * `(id, b, k)` (cold buckets only — see [[indexRows]]) plus the
    * corpus token table `(id, toks)` for verification. Returns
    * `(new_id, dup_of, n_shared_bands, jaccard)` for every verified
    * near-dup at or above `threshold`.
    *
    * Shape: band keys for the batch (narrow, O(batch)), an equi-join
    * on (b, k) against the index, a keyed pair aggregation, then the
    * exact-Jaccard verify joins token arrays back by id — two keyed
    * shuffles of O(candidates). Nothing is ever batch × corpus. */
  def dedupAgainstIndex(
      newDocs: DataFrame,
      index: DataFrame,
      corpusToks: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val probe = Dedup.bandsOf(newDocs).selectExpr("id as new_id", "b", "k")
    val cand = probe
      .join(index.selectExpr("id as dup_of", "b", "k"), Seq("b", "k"))
      .groupBy("new_id", "dup_of")
      .agg(count(lit(1)).as("n_shared_bands"))
    cand
      .join(newDocs.selectExpr("id as new_id", "toks as toks_a"), "new_id")
      .join(corpusToks.selectExpr("id as dup_of", "toks as toks_b"), "dup_of")
      .select(col("new_id"), col("dup_of"), col("n_shared_bands"),
        graft.functions.TextHashExprs.shingleStats(
          col("toks_a"), col("toks_b")).as("st"))
      .selectExpr("new_id", "dup_of", "n_shared_bands",
        "cast(st.inter as double) / (st.na + st.nb - st.inter) as jaccard")
      .filter(s"jaccard >= $threshold")
  }
}
