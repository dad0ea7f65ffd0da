package graft.llm

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * entering the corpus) are dropped wholesale. ONE bounded
    * capped-collect aggregate over the index (see
    * [[Dedup.capHotBuckets]] — single pass, no sort, state ≤ cap+1
    * rows per bucket per mapper). A deployment runs this as the index
    * table's compaction criterion and rewrites only the partitions
    * whose buckets changed. */
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

  // --------------------------------------------------- gated query
  /** Id offset for the derived "day-2" near-copy batch (every 13th
    * doc, one token truncated) — shared by the query, the spec's
    * fixture, and the DuckDB oracle. */
  private[llm] val IncBatchIdOffset = 5000000L
  /** Id offset for the derived genuinely-new batch docs (synthetic
    * unique vocabularies — nothing to find in the corpus). */
  private[llm] val IncFreshIdOffset = 6000000L

  /** The incremental operating mode as a driver-gated query: the full
    * corpus is indexed ("day 1"), a derived batch of planted
    * near-copies plus genuinely-new docs probes it ("day 2"), and each
    * batch doc gets its dedup DECISION row — its best verified match
    * `(dup_of, jaccard)`, or NULLs if it survives as new. Best =
    * highest jaccard, ties to the lowest corpus id.
    *
    * Scale shape is [[dedupAgainstIndex]]'s: O(batch) band keys, one
    * keyed join against the (capped) index, O(candidates) verify —
    * never batch × corpus; the decision pick is a keyed `max_by`
    * (O(1) state per batch doc) and the survivor fill-in is a keyed
    * left join. */
  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = load(s, dir, "documents")
      .selectExpr("doc_id as id", "split(lower(text), ' ') as toks")
    val planted = corpus.where("id % 13 = 0 and size(toks) >= 12")
      .selectExpr(s"id + $IncBatchIdOffset as id",
        "slice(toks, 1, size(toks) - 1) as toks")
    val fresh = s.range(0, 20)
      .selectExpr(s"id + $IncFreshIdOffset as id")
      .selectExpr("id",
        "transform(sequence(0, 9), i -> concat('zzz', cast(id as string), 'w', cast(i as string))) as toks")
    val batch = planted.unionAll(fresh)
    val best = dedupAgainstIndex(batch, indexRows(corpus), corpus)
      .groupBy(col("new_id"))
      .agg(expr(
        "max_by(named_struct('d', dup_of, 'j', jaccard), named_struct('j', jaccard, 'd', -dup_of)) as bm"))
      .selectExpr("new_id", "bm.d as dup_of", "bm.j as jaccard")
    batch.select(col("id").as("new_id"))
      .join(best, Seq("new_id"), "left")
      .select("new_id", "dup_of", "jaccard")
      .orderBy("new_id")
  }

  val qDedupIncrementalSql: String =
    s"""WITH base AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS toks FROM documents),
       |batch AS (
       |  SELECT id + $IncBatchIdOffset AS id, toks[1:len(toks)-1] AS toks
       |  FROM base WHERE id % 13 = 0 AND len(toks) >= 12
       |  UNION ALL
       |  SELECT i + $IncFreshIdOffset,
       |         list_transform(range(0, 10),
       |           j -> 'zzz' || CAST(i + $IncFreshIdOffset AS VARCHAR) || 'w' || CAST(j AS VARCHAR))
       |  FROM (SELECT unnest(range(0, 20)) AS i)),
       |${Dedup.sigBandSqlCtes("base", "c")},
       |${Dedup.sigBandSqlCtes("batch", "p")},
       |coldc AS (SELECT b, k FROM bandc GROUP BY b, k HAVING COUNT(*) <= ${Dedup.MaxBucket}),
       |idx AS (SELECT bandc.* FROM bandc JOIN coldc USING (b, k)),
       |cand AS (
       |  SELECT p.id AS new_id, i.id AS dup_of
       |  FROM bandp p JOIN idx i ON p.b = i.b AND p.k = i.k
       |  GROUP BY p.id, i.id),
       |verified AS (
       |  SELECT c.new_id, c.dup_of,
       |         len(list_filter(a.sh, q -> list_contains(b2.sh, q))) AS inter,
       |         len(a.sh) + len(b2.sh) AS tot
       |  FROM cand c JOIN shp a ON c.new_id = a.id JOIN shc b2 ON c.dup_of = b2.id),
       |matched AS (
       |  SELECT new_id, dup_of,
       |         CAST(inter AS DOUBLE) / (tot - inter) AS jaccard,
       |         ROW_NUMBER() OVER (PARTITION BY new_id
       |                            ORDER BY CAST(inter AS DOUBLE) / (tot - inter) DESC, dup_of) AS rk
       |  FROM verified
       |  WHERE CAST(inter AS DOUBLE) / (tot - inter) >= 0.5)
       |SELECT b.id AS new_id, m.dup_of, m.jaccard
       |FROM batch b LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m ON b.id = m.new_id
       |ORDER BY new_id""".stripMargin

  // ------------------------------------------- exact-hash incremental
  /** Expected item count for [[hashBloom]] (session conf). A
    * deployment sets this to the corpus cardinality it probes against
    * (the filter ships with every probe task, so size it deliberately
    * — Spark's own runtime-filter ceiling,
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` = 4M, is a
    * sensible upper bound); the default covers the test corpora.
    * UNDERSIZING NEVER BREAKS CORRECTNESS — it only raises the FP
    * fraction that pays the confirm join (ExactIncrementalSpec pins
    * this). Beyond driver-comfortable bloom sizes the right tool is
    * the partitioned anti-join against the materialized
    * [[exactHashIndex]] table — the bloom is a PREFILTER, never the
    * source of truth. */
  val BloomExpectedItemsConf = "spark.graft.bloom.expectedItems"
  private val BLOOM_EXPECTED_ITEMS = 100000L

  private def bloomExpectedItems(s: SparkSession): Long = {
    val raw = s.conf.get(BloomExpectedItemsConf, BLOOM_EXPECTED_ITEMS.toString)
    val n = try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$BloomExpectedItemsConf must be a positive long, got '$raw'")
    }
    require(n > 0, s"$BloomExpectedItemsConf must be positive, got $n")
    n
  }

  /** Exact-content hash index of a corpus `(new-style: doc_id, text)`:
    * one row per distinct normalized text, carrying the canonical
    * (minimum) doc id — `(h, dup_of)`. A deployment materializes this
    * once (tiny: 16 bytes/distinct doc) sorted by `h`, and appends to
    * it as increments commit. */
  def exactHashIndex(docs: DataFrame): DataFrame =
    docs.selectExpr("xxhash64(lower(text)) as h", "doc_id")
      .groupBy("h").agg(min(col("doc_id")).as("dup_of"))

  /** ONE-row bloom frame over an [[exactHashIndex]]'s hash column,
    * built with Spark's native `BloomFilterAggregate` (the same sketch
    * the optimizer's runtime row-level filtering injects): corpus
    * scanned once, partial sketches OR-merge map-side, result is a
    * single binary value a deployment stores next to the index. */
  def hashBloom(index: DataFrame, expectedItems: Long): DataFrame =
    index.agg(org.apache.spark.sql.GraftShims.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftShims.expression(col("h")),
        expectedItems).toAggregateExpression()).as("bf"))

  /** Exact incremental dedup decisions for a batch `(new_id, t)`
    * against a corpus hash index + its bloom: `(new_id, dup_of, keep)`
    * where `dup_of` is the canonical corpus id of an exact-content
    * match (NULL if none) and `keep` marks the batch's surviving
    * first occurrences (no corpus match AND first of its content
    * within the batch).
    *
    * Scale shape — the reason this exists: the bloom rides in as a
    * SCALAR SUBQUERY (`Dataset.scalar()`, evaluated once, shipped
    * with the plan like Spark's own runtime filters), so batch rows
    * whose hash the bloom rejects are decided MAP-SIDE with zero
    * shuffle and zero corpus I/O — for a daily increment that is the
    * overwhelming majority. Only might-contain rows (true dups +
    * the bloom's FP fraction) reach the confirm join against the
    * index, which makes the result EXACT regardless of FP rate; the
    * in-batch first-occurrence pass is one keyed aggregate over the
    * (small) batch. Nothing ever scans batch × corpus, and the
    * corpus-sized side is only the pre-built index. */
  def exactProbe(batch: DataFrame, index: DataFrame, bloom: DataFrame): DataFrame = {
    val hashed = batch.selectExpr("new_id", "xxhash64(lower(t)) as h")
    val mc = org.apache.spark.sql.GraftShims.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.GraftShims.expression(bloom.scalar()),
        org.apache.spark.sql.GraftShims.expression(col("h"))))
    val hits = hashed.filter(mc)
      .join(index, Seq("h"), "left")
      .select(col("new_id"), col("h"), col("dup_of"))
    val misses = hashed.filter(!mc)
      .select(col("new_id"), col("h"), lit(null).cast("long").as("dup_of"))
    val decided = hits.unionByName(misses)
    val batchFirst = hashed.groupBy("h").agg(min(col("new_id")).as("batch_first"))
    decided.join(batchFirst, "h")
      .selectExpr("new_id", "dup_of",
        "dup_of is null and new_id = batch_first as keep")
  }

  /** Id offsets for the derived exact-dedup "day-2" batch — shared by
    * the query, the spec fixtures, and the DuckDB oracle. Spaced 10M
    * apart: corpus ids provably stay below 2M
    * ([[graft.ScalingRehearsal.derive]]'s reserved-range guard +
    * [[Dedup.VariantIdOffset]]), so the three derived ranges can never
    * collide. The first cut spaced them 500k apart and the 10× scale
    * rehearsal caught the collision (a 10× corpus id plus the
    * resubmit offset landed inside the modified range, yielding two
    * contradictory decision rows for one new_id). */
  private[llm] val ExactResubmitOffset = 10000000L
  private[llm] val ExactModifiedOffset = 20000000L
  private[llm] val ExactFreshOffset = 30000000L

  /** Exact-hash incremental dedup as a driver-gated query: the corpus
    * is the day-1 index, the day-2 batch is derived as verbatim
    * re-submissions (every 9th doc — corpus dups), modified docs
    * (every 9th+4, one token appended — exact-new), and 30 synthetic
    * fresh docs over 15 distinct texts (in-batch dups). Each batch row
    * gets its decision `(new_id, dup_of, keep)`. The bloom prefilter
    * affects the PLAN only, never the answer — the oracle is the plain
    * exact-match join algebra. */
  def qDedupIncrementalExact(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val base = docs.selectExpr("doc_id", "lower(text) as t")
    val batch = base.where("doc_id % 9 = 0")
      .selectExpr(s"doc_id + $ExactResubmitOffset as new_id", "t")
      .unionAll(base.where("doc_id % 9 = 4")
        .selectExpr(s"doc_id + $ExactModifiedOffset as new_id",
          "concat(t, ' graftnew') as t"))
      .unionAll(s.range(0, 30)
        .selectExpr(s"id + $ExactFreshOffset as new_id",
          "concat('graft fresh doc ', cast(id % 15 as string)) as t"))
    val idx = exactHashIndex(docs)
    exactProbe(batch, idx, hashBloom(idx, bloomExpectedItems(s)))
      .select("new_id", "dup_of", "keep")
      .orderBy("new_id")
  }

  val qDedupIncrementalExactSql: String =
    s"""WITH base AS (SELECT doc_id, lower(text) AS t FROM documents),
       |batch AS (
       |  SELECT doc_id + $ExactResubmitOffset AS new_id, t FROM base WHERE doc_id % 9 = 0
       |  UNION ALL
       |  SELECT doc_id + $ExactModifiedOffset, t || ' graftnew' FROM base WHERE doc_id % 9 = 4
       |  UNION ALL
       |  SELECT i + $ExactFreshOffset, 'graft fresh doc ' || CAST(i % 15 AS VARCHAR)
       |  FROM (SELECT unnest(range(0, 30)) AS i)),
       |idx AS (SELECT t, min(doc_id) AS dup_of FROM base GROUP BY t),
       |bfirst AS (SELECT t, min(new_id) AS batch_first FROM batch GROUP BY t)
       |SELECT b.new_id, i.dup_of,
       |       (i.dup_of IS NULL AND b.new_id = f.batch_first) AS keep
       |FROM batch b
       |LEFT JOIN idx i USING (t)
       |JOIN bfirst f USING (t)
       |ORDER BY new_id""".stripMargin

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_dedup_incremental_exact" -> (qDedupIncrementalExact _))

  val oracleSql: Map[String, String] = Map(
    "q_dedup_incremental" -> qDedupIncrementalSql,
    "q_dedup_incremental_exact" -> qDedupIncrementalExactSql)

  /** Batch-id-partitioned dynamic overwrite — the ONE idempotent-sink
    * contract both streaming dedup faces share: replaying a batch
    * replaces exactly its own partition, turning foreachBatch's
    * at-least-once into effective exactly-once for deterministic
    * batches. (Shared here so a change to the sink contract cannot
    * drift between the near-dup and exact streams.) */
  private[llm] def idempotentAppend(
      df: org.apache.spark.sql.DataFrame, partCol: String, path: String): Unit =
    df.write
      .partitionBy(partCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
}
