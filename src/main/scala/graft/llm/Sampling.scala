package graft.llm

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-sampling operators for a training-data pipeline: the steps
  * between "filtered corpus" and "training shards". Like the rest of
  * the llm layer these have no counterpart in the reference (it
  * delegates data processing to Spark, SURVEY.md §2.5); every query
  * has a value-identical DuckDB oracle.
  *
  * Scale notes:
  *  - Stratified sampling is a pure per-row filter (a multiplicative
  *    hash of the key against a per-stratum threshold) — zero shuffle,
  *    fully codegen'd, and DETERMINISTIC: re-running over 100 TB
  *    selects the same sample, so downstream stages can re-derive
  *    membership instead of materializing it. No `rand()` — a seeded
  *    rng is partition-order-dependent under retries; the hash is not.
  *  - Shard packing is a running token sum over an explicit total
  *    order — inherently sequential in VALUE, but not in EXECUTION:
  *    it runs as the classic distributed prefix sum (running sums
  *    within contiguous id ranges + broadcast per-range prefix
  *    offsets), so no stage ever moves the corpus to one task. The
  *    DuckDB oracle pins the boundaries to the exact single-window
  *    semantics.
  */
object Sampling {

  /** Knuth multiplicative hash of the doc id into [0, 1000) — exact
    * 64-bit integer arithmetic, identical in Spark and DuckDB. The id
    * is reduced mod a prime FIRST so the product stays below 2^63
    * for any Int64 id (max ≈ 1e9 · 2.65e9 ≈ 2.7e18): Spark would
    * silently wrap the overflow while DuckDB errors, which would break
    * the oracle contract exactly at scale. Ids below the prime hash
    * identically to the unreduced form. */
  private def hashPermille(col: String) =
    s"pmod(pmod($col, 1000000007) * 2654435761, 4294967296) % 1000"

  /** Per-stratum deterministic sampling: length bands get different
    * rates (long documents are scarcer and kept at a higher rate — the
    * usual quality-vs-volume reweighting). Output is the sample itself
    * (stratum, doc_id), so the gate pins exact membership. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr(
        "doc_id",
        """case when n_chars < 500 then 'short'
          |     when n_chars < 2000 then 'medium'
          |     else 'long' end as stratum""".stripMargin,
        s"${hashPermille("doc_id")} as h")
      .selectExpr("stratum", "doc_id",
        """case stratum when 'short' then 50
          |             when 'medium' then 200
          |             else 500 end as rate""".stripMargin, "h")
      .where("h < rate")
      .selectExpr("stratum", "doc_id")
      .orderBy("stratum", "doc_id")

  val qSampleStratifiedSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN n_chars < 500 THEN 'short'
       |              WHEN n_chars < 2000 THEN 'medium'
       |              ELSE 'long' END AS stratum,
       |         ((doc_id % 1000000007) * 2654435761) % 4294967296 % 1000 AS h
       |  FROM documents)
       |SELECT stratum, doc_id
       |FROM d
       |WHERE h < CASE stratum WHEN 'short' THEN 50
       |                       WHEN 'medium' THEN 200
       |                       ELSE 500 END
       |ORDER BY stratum, doc_id""".stripMargin

  /** Mixing hash — same overflow-safe multiplicative form as
    * [[hashPermille]] but with a different odd multiplier, so mixture
    * membership is DECORRELATED from stratified-sample membership (a
    * doc's fate in one operator says nothing about the other). */
  private def mixPermille(col: String) =
    s"pmod(pmod($col, 1000000007) * 2246822519, 4294967296) % 1000"

  /** Corpus mixing: per-source upsampling/downsampling into training
    * epochs — the data-mixture step of an LLM pipeline ("2.5 passes
    * over wiki, 0.4 of web"). A weight w yields floor(w) full copies
    * of every document plus one more for the deterministic hash-gated
    * w−floor(w) fraction; each copy carries an epoch number so
    * downstream shuffling/packing can keep epochs separated.
    *
    * Scale: a pure per-row expansion — the explode child is an integer
    * sequence bounded by the max weight, there is NO shuffle except
    * the output sort, and membership is hash-deterministic: re-running
    * over 100 TB (or recovering a lost partition) reproduces the exact
    * same mixture, copy for copy, epoch for epoch. Weights here derive
    * from the source id (suffix mod 4 → 2.5 / 1.0 / 0.4 / 1.5) so the
    * oracle can replay them; a production caller would pass a weight
    * table and broadcast-join it instead. */
  def qMixEpochs(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("doc_id", "source",
        """case (cast(substring(source, 4) as int) % 4)
          |  when 0 then 2500 when 1 then 1000 when 2 then 400
          |  else 1500 end as w_permille""".stripMargin,
        s"${mixPermille("doc_id")} as h")
      .selectExpr("doc_id", "source",
        "cast(floor(w_permille / 1000) as int) + (case when h < w_permille % 1000 then 1 else 0 end) as copies")
      .filter("copies > 0")
      .selectExpr("source", "doc_id", "explode(sequence(0, copies - 1)) as epoch")
      .selectExpr("source", "doc_id", "cast(epoch as bigint) as epoch")
      .orderBy("source", "doc_id", "epoch")

  val qMixEpochsSql: String =
    """WITH w AS (
      |  SELECT doc_id, source,
      |         CASE (CAST(substr(source, 4) AS INT) % 4)
      |           WHEN 0 THEN 2500 WHEN 1 THEN 1000 WHEN 2 THEN 400
      |           ELSE 1500 END AS w_permille,
      |         ((doc_id % 1000000007) * 2246822519) % 4294967296 % 1000 AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |         CAST(floor(w_permille / 1000) AS INT) +
      |           (CASE WHEN h < w_permille % 1000 THEN 1 ELSE 0 END) AS copies
      |  FROM w)
      |SELECT source, doc_id,
      |       unnest(generate_series(0, copies - 1)) AS epoch
      |FROM c WHERE copies > 0
      |ORDER BY source, doc_id, epoch""".stripMargin

  /** Token budget per training shard (whitespace tokens). */
  private val ShardBudget = 10000L

  /** Cut points chosen by the latest [[packShards]] call (strictly
    * increasing doc_id upper-exclusive boundaries; empty = one range).
    * Observability for specs/run logs — tells whether pathological id
    * clustering was actually split across ranges. */
  @volatile var lastPackCuts: Seq[Long] = Nil

  /** Greedy shard packing: documents in doc_id order accumulate into
    * shards of ≈ [[ShardBudget]] tokens (a document starts a new shard
    * when the running total BEFORE it crosses a budget boundary).
    * Output: per-shard document count, token total, id range.
    *
    * Executes as a DISTRIBUTED prefix sum — never a global window:
    *  1. QUANTILE-SAMPLED id cuts (approxQuantile over the doc_id
    *     column only) slice the corpus into O(shuffle-partitions)
    *     contiguous ranges with ≈equal ROW counts — balanced by
    *     construction even under pathological id clustering (a dense
    *     band + far outliers lands every cut inside the band), where
    *     the earlier equal-WIDTH cuts collapsed to one occupied range.
    *     Same pass cost as the min/max bounds scan they replace: one
    *     column-pruned scan into a tiny distributed sketch;
    *  2. ONE corpus shuffle clusters rows by range; Spark reuses that
    *     exchange for both consumers below (ReusedExchange);
    *  3. per-range token totals (map-side-combined agg) turn into
    *     per-range prefix offsets via a triangular self-join over the
    *     O(ranges) totals — tiny, and warning-free where a 1-row-
    *     partition window would not be;
    *  4. the running sum runs `over (partition by bucket order by
    *     doc_id)` — parallel across ranges — and the broadcast offset
    *     lifts it to the exact global prior_toks.
    * Shard ids depend only on the global running total, so the result
    * is bit-identical to the single-window form for ANY contiguous
    * cuts — cut placement is a performance choice, never a semantics
    * one. */
  def qShardPack(s: SparkSession, dir: String): DataFrame =
    packShards(load(s, dir, "documents")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks"))

  /** The distributed global prefix sum under both packers: returns
    * (doc_id, n_toks, prior_toks) where prior_toks is the exact sum of
    * n_toks over all strictly-smaller doc_ids — bit-identical to a
    * single global window, executed as range-local windows plus a
    * broadcast of O(ranges) prefix offsets (steps documented at
    * [[qShardPack]]). */
  private[llm] def withPriorToks(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, expr, lit, sum}
    val s = docs.sparkSession
    val ranges = math.max(1, s.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    // pass 0: sampled range bounds — a doc_id-only scan (parquet reads
    // one column) into a distributed quantile sketch, eager and tiny
    // (same shape as the min/max bounds pass it replaces)
    val cuts =
      if (ranges <= 1) Array.empty[Double]
      else docs.stat.approxQuantile(
        "doc_id", (1 until ranges).map(_.toDouble / ranges).toArray, 0.001)
    val cutIds = cuts.map(math.ceil(_).toLong).distinct.sorted.toSeq
    lastPackCuts = cutIds
    // bucket = #cuts ≤ doc_id: a codegen'd indicator sum over ≤31
    // literals, monotone in doc_id so every bucket is one contiguous
    // id range
    val bucketExpr =
      if (cutIds.isEmpty) "cast(0 as bigint)"
      else cutIds.map(c => s"(case when doc_id >= ${c}L then 1 else 0 end)")
        .mkString("cast(", " + ", " as bigint)")

    val bucketed = docs
      .selectExpr(s"$bucketExpr as bucket", "doc_id", "n_toks")
      .repartition(col("bucket")) // the ONE corpus shuffle, reused below

    val totals = bucketed.groupBy("bucket").agg(sum("n_toks").as("btoks"))
    // prefix offsets: sum of strictly-earlier ranges' totals. Triangular
    // self-join over O(ranges) rows — bounded by parallelism, not data.
    val offsets = totals.as("a")
      .join(totals.as("b"), expr("b.bucket < a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.btoks")), lit(0L)).as("bucket_offset"))

    bucketed.join(broadcast(offsets), "bucket")
      .selectExpr("doc_id", "n_toks",
        "bucket_offset + sum(n_toks) over (partition by bucket order by doc_id rows between unbounded preceding and current row) - n_toks as prior_toks")
  }

  /** The packing algebra over an explicit (doc_id, n_toks) frame — the
    * seam that lets specs drive pathological id distributions. */
  def packShards(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    withPriorToks(docs)
      .selectExpr(s"cast(floor(prior_toks / $ShardBudget) as int) as shard",
        "doc_id", "n_toks")
      .groupBy("shard")
      .agg(
        expr("count(*) as n_docs"),
        expr("sum(n_toks) as shard_tokens"),
        expr("min(doc_id) as first_doc"),
        expr("max(doc_id) as last_doc"))
      .orderBy("shard")
  }

  val qShardPackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_toks,
       |         SUM(n_toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks
       |           AS prior_toks
       |  FROM t)
       |SELECT CAST(FLOOR(prior_toks / $ShardBudget) AS INT) AS shard,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(n_toks) AS BIGINT) AS shard_tokens,
       |       MIN(doc_id) AS first_doc,
       |       MAX(doc_id) AS last_doc
       |FROM c GROUP BY shard
       |ORDER BY shard""".stripMargin

  /** Fixed training-sequence length (whitespace tokens). */
  private[llm] val SeqLen = 2048L

  /** Sequence packing: the step AFTER shard packing in a pretraining
    * pipeline — documents concatenate in doc_id order and the token
    * stream is cut into fixed-length training sequences of [[SeqLen]]
    * tokens, so a document CAN straddle a sequence boundary (attention
    * masking handles the seam; what the pipeline needs is the exact
    * doc→sequence layout). Output per sequence: how many documents
    * contribute, total tokens (= SeqLen except the tail), how many of
    * its documents carried over from the previous sequence, and the
    * contributing doc-id range — the manifest a sequence-loader reads.
    *
    * Scale shape: the same distributed prefix sum as [[qShardPack]]
    * (one corpus shuffle + broadcast offsets — never a global window),
    * then a PER-DOC bounded explode: a document touches
    * `(first..last spanned sequence)` — at most `n_toks/SeqLen + 1`
    * rows, so the expansion is ≤ (corpus tokens)/SeqLen + corpus docs
    * regardless of skew, and a pathological 10⁹-token document expands
    * to its own token count / SeqLen rows on its own partition, never
    * through a hot key. Integer-exact throughout (`div`, no doubles),
    * so the oracle pins boundaries bit-for-bit. */
  def qSeqPack(s: SparkSession, dir: String): DataFrame =
    packSequences(load(s, dir, "documents")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks"))

  /** Doc-level sequence assignment with the token stream starting at
    * `base` (a prior stream's running total): one row per
    * (doc, spanned sequence) with the exact token split — the form a
    * sequence-builder consumes, and the seam [[graft.llm.StreamingSeqPack]]
    * continues batch-over-batch. */
  private[llm] def packDocSequences(docs: DataFrame, base: Long): DataFrame =
    withPriorToks(docs)
      // 0-token docs occupy no sequence (and Spark's sequence(a, a-1)
      // would count DOWN, not come back empty — guard, don't assume)
      .where("n_toks > 0")
      .selectExpr("doc_id", "n_toks", s"prior_toks + ${base}L as prior_toks")
      // a doc occupies sequences floor(prior/L) .. floor((prior+n-1)/L);
      // bounded explode (≤ n/L + 1 rows per doc)
      .selectExpr("doc_id", "n_toks", "prior_toks",
        s"explode(sequence(prior_toks div $SeqLen, (prior_toks + n_toks - 1) div $SeqLen)) as seq")
      .selectExpr("seq", "doc_id", "prior_toks", "n_toks",
        // tokens this doc contributes to THIS sequence: overlap of
        // [prior, prior+n) with [seq*L, (seq+1)*L)
        s"least((seq + 1) * $SeqLen, prior_toks + n_toks) - greatest(seq * $SeqLen, prior_toks) as seq_toks")

  /** The sequence-packing algebra over an explicit (doc_id, n_toks)
    * frame — spec seam, mirroring [[packShards]]. */
  def packSequences(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    packDocSequences(docs, 0L)
      .groupBy("seq")
      .agg(
        expr("count(*) as n_docs"),
        expr("sum(seq_toks) as seq_tokens"),
        // docs whose text began before this sequence (carried over the seam)
        expr(s"sum(case when prior_toks < seq * $SeqLen then 1 else 0 end) as n_carried"),
        expr("min(doc_id) as first_doc"),
        expr("max(doc_id) as last_doc"))
      .orderBy("seq")
  }

  val qSeqPackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_toks,
       |         CAST(SUM(n_toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks
       |           AS BIGINT) AS prior_toks
       |  FROM t),
       |e AS (
       |  SELECT doc_id, prior_toks,
       |         unnest(generate_series(prior_toks // $SeqLen,
       |                                (prior_toks + n_toks - 1) // $SeqLen)) AS seq,
       |         n_toks
       |  FROM c)
       |SELECT seq,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(LEAST((seq + 1) * $SeqLen, prior_toks + n_toks)
       |              - GREATEST(seq * $SeqLen, prior_toks)) AS BIGINT) AS seq_tokens,
       |       CAST(SUM(CASE WHEN prior_toks < seq * $SeqLen THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
       |       MIN(doc_id) AS first_doc,
       |       MAX(doc_id) AS last_doc
       |FROM e GROUP BY seq
       |ORDER BY seq""".stripMargin

  /** Per-source cap hash — third decorrelated odd multiplier (golden
    * ratio), same overflow-safe reduce-then-multiply form. */
  private def capHash(col: String) =
    s"pmod(pmod($col, 1000000007) * 2654435769, 4294967296)"

  /** Per-source quota sampling: at most K documents from every source —
    * the per-domain cap every crawl pipeline applies so one boilerplate
    * domain cannot dominate the mixture. Selection order within a
    * source is the multiplicative hash (then doc_id), so the quota is a
    * deterministic uniform draw, not "first K by ingest order" (which
    * would bias toward whatever the crawler fetched first).
    *
    * Scale: the bounded [[graft.functions.TopK]] aggregate, not a
    * ranking window — a two-phase hash aggregate with O(K) state per
    * source, so every input partition reduces locally to ≤K candidates
    * and only those survivors shuffle. A pathologically hot domain
    * costs its mappers K slots each; nothing ever funnels the domain
    * through one ranking task. (TopK orders descending, so the
    * ascending hash draw rides in negated — exact: h < 2^32 fits a
    * double.) Result is bit-identical to the
    * `row_number() over (partition by source order by h, doc_id)`
    * form the DuckDB oracle pins. */
  def qSamplePerSource(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    val rowSchema = StructType(Seq(
      StructField("negh", DoubleType), StructField("doc_id", LongType)))
    load(s, dir, "documents")
      .selectExpr("source", "doc_id", s"${capHash("doc_id")} as h")
      .groupBy("source")
      .agg(graft.functions.TopK.topK(10, rowSchema)(
        expr("cast(-h as double)"), col("doc_id")).as("top"))
      .selectExpr("source", "posexplode(top) as (i, r)")
      .selectExpr("source", "r.doc_id as doc_id", "cast(i + 1 as int) as rk")
      .orderBy("source", "rk")
  }

  val qSamplePerSourceSql: String =
    """WITH h AS (
      |  SELECT source, doc_id,
      |         ((doc_id % 1000000007) * 2654435769) % 4294967296 AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      |  FROM h)
      |SELECT source, doc_id, rk FROM r
      |WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  /** Quality-quota curation: keep the K best documents PER SOURCE by
    * the heuristic quality score (ties to the lowest doc_id) — the
    * FineWeb/Dolma-style "cap each domain, keep its best" stage.
    *
    * Scale: where [[qSamplePerSource]]'s ranking window funnels each
    * source through one task (its documented hot-domain caveat), this
    * runs the bounded [[graft.functions.TopK]] aggregate — a regular
    * two-phase hash aggregate whose per-group state is O(K): every
    * input partition reduces locally to ≤K candidates per source and
    * only those survivors shuffle. A source with a billion documents
    * costs its mappers K slots each, never one task sorting the
    * domain. */
  def qSourceCap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val rowSchema = StructType(Seq(
      StructField("quality", DoubleType), StructField("doc_id", LongType)))
    TextAnalysis.qualityScored(s, dir)
      .groupBy("source")
      .agg(graft.functions.TopK.topK(SourceCapK, rowSchema)(
        col("quality").cast("double"), col("doc_id")).as("top"))
      .selectExpr("source", "posexplode(top) as (i, r)")
      .selectExpr("source", "r.doc_id as doc_id", "r.quality as quality",
        "cast(i + 1 as bigint) as rank")
      .orderBy("source", "rank")
  }

  val SourceCapK = 25

  val qSourceCapSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         len(string_split(lower(text), ' ')) AS n_tok,
      |         len(list_filter(string_split(lower(text), ' '),
      |             x -> x IN ('the','a','of','to','and','in','is','it','for','on'))) AS n_stop,
      |         length(text) AS n_char,
      |         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS n_clean,
      |         length(replace(text, ' ', '')) AS n_nospace
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, source,
      |         CAST(n_tok BETWEEN 20 AND 1000 AS INT) * 0.25
      |       + CAST((CAST(n_stop AS DOUBLE) / n_tok) BETWEEN 0.01 AND 0.5 AS INT) * 0.25
      |       + CAST((CAST(n_nospace AS DOUBLE) / n_tok) BETWEEN 3.0 AND 10.0 AS INT) * 0.25
      |       + CAST((CAST(n_char - n_clean AS DOUBLE) / n_char) <= 0.2 AS INT) * 0.25
      |         AS quality
      |  FROM d),
      |r AS (
      |  SELECT source, doc_id, CAST(quality AS DOUBLE) AS quality,
      |         ROW_NUMBER() OVER (PARTITION BY source
      |                            ORDER BY quality DESC, doc_id) AS rank
      |  FROM q)
      |SELECT source, doc_id, quality, rank FROM r
      |WHERE rank <= 25
      |ORDER BY source, rank""".stripMargin

  // ----------------------------------------------------------- registry
  /** Split hash — third decorrelated odd multiplier (see
    * [[mixPermille]]'s rationale): a document's split assignment is
    * independent of its sample/mixture fate. */
  private[llm] def splitPermille(col: String) =
    s"pmod(pmod($col, 1000000007) * 3267000013L, 4294967296) % 1000"

  /** Deterministic train/val/test split (98/1/1): assignment is a pure
    * per-row hash gate — no shuffle, no state, stable under retries,
    * re-runs, and table growth (a document's split never changes when
    * other documents arrive, unlike any rank- or random-based split).
    * Output pins exact per-split membership counts per source, so the
    * gate catches both hash drift and boundary-condition drift.
    *
    * Scale: one projection + one small keyed two-phase aggregate over
    * (source, split) — O(strata) output at any corpus size. */
  def qSplitAssign(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr(
        "source",
        s"""case when ${splitPermille("doc_id")} < 980 then 'train'
           |     when ${splitPermille("doc_id")} < 990 then 'val'
           |     else 'test' end as split""".stripMargin,
        "doc_id", "n_chars")
      .groupBy("source", "split")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("sum(n_chars) as n_chars_total"),
        org.apache.spark.sql.functions.expr("min(doc_id) as first_doc")
        )
      .orderBy("source", "split")

  val qSplitAssignSql: String =
    """WITH d AS (
      |  SELECT source, doc_id, n_chars,
      |         ((doc_id % 1000000007) * 3267000013) % 4294967296 % 1000 AS h
      |  FROM documents)
      |SELECT source,
      |       CASE WHEN h < 980 THEN 'train'
      |            WHEN h < 990 THEN 'val'
      |            ELSE 'test' END AS split,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
      |       MIN(doc_id) AS first_doc
      |FROM d
      |GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin

  /** Temperature-mixing hash — fourth decorrelated odd multiplier,
    * into [0, 1e6) (finer than permille: the derived per-source rates
    * live on a much finer grid than hand-picked mixture weights). */
  private[llm] def tempPpmHash(col: String) =
    s"pmod(pmod($col, 1000000007) * 2971215073L, 4294967296) % 1000000"

  /** Total document budget the temperature mixture targets. */
  private[llm] val TempBudgetDocs = 10000L
  /** Quantization for sqrt(n) source weights (milli-units). */
  private[llm] val TempQuant = 1000L

  /** TEMPERATURE-weighted source mixing (the data-mixture policy used
    * when weights are not hand-picked): a source's share of the
    * training budget is proportional to n_s^α with α = 0.5 — large
    * sources are DOWN-weighted relative to their size, small sources
    * up-weighted, the standard smoothing between "proportional" (α=1)
    * and "uniform" (α=0). Unlike [[qMixEpochs]] (fixed caller-supplied
    * weights), the rates here are DERIVED from corpus statistics:
    * keep-probability p_s = min(1, B·w_s / n_s) with
    * w_s = √n_s / Σ√n_s and B = [[TempBudgetDocs]].
    *
    * Cross-engine exactness: √n is a single correctly-rounded IEEE op
    * (identical everywhere), then quantizes to integer milli-units so
    * the SUM over sources is exact integer arithmetic — never an
    * order-dependent float sum. The final rate is one double division
    * chain with an IDENTICAL expression tree in both engines (each op
    * correctly rounded ⇒ bit-identical), floored onto a ppm grid.
    *
    * Scale: one map-side-combined count per source (O(sources) rows),
    * a single-row exact total, a broadcast of the O(sources) rate
    * table back onto the corpus, and a per-row hash gate — the corpus
    * is scanned once and never shuffled. Output pins per-source kept
    * counts and the derived ppm thresholds. */
  def qMixTemperature(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val docs = load(s, dir, "documents").select(col("doc_id"), col("source"))
    val counts = docs.groupBy("source")
      .agg(org.apache.spark.sql.functions.expr("count(*) as n_docs"))
      .selectExpr("source", "n_docs",
        s"cast(floor(sqrt(cast(n_docs as double)) * $TempQuant) as bigint) as w_q")
    val total = counts.agg(
      org.apache.spark.sql.functions.expr("sum(w_q) as z_q"))
    val rates = counts.crossJoin(broadcast(total))
      .selectExpr("source", "n_docs",
        s"""least(1000000L, cast(floor(
           |  (cast($TempBudgetDocs as double) * cast(w_q as double) * 1000000.0d)
           |  / (cast(z_q as double) * cast(n_docs as double))) as bigint)) as t_ppm""".stripMargin)
    docs.join(broadcast(rates), "source")
      .selectExpr("source", "n_docs", "t_ppm", "doc_id",
        s"${tempPpmHash("doc_id")} as h")
      .where("h < t_ppm")
      .groupBy("source", "n_docs", "t_ppm")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_kept"),
        org.apache.spark.sql.functions.expr("min(doc_id) as first_kept"))
      .orderBy("source")
  }

  val qMixTemperatureSql: String =
    s"""WITH c AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * $TempQuant) AS BIGINT) AS w_q
       |  FROM documents GROUP BY source),
       |z AS (SELECT CAST(SUM(w_q) AS BIGINT) AS z_q FROM c),
       |r AS (
       |  SELECT source, n_docs,
       |         least(1000000, CAST(floor(
       |           (CAST($TempBudgetDocs AS DOUBLE) * CAST(w_q AS DOUBLE) * 1000000.0)
       |           / (CAST(z_q AS DOUBLE) * CAST(n_docs AS DOUBLE))) AS BIGINT)) AS t_ppm
       |  FROM c CROSS JOIN z),
       |g AS (
       |  SELECT d.source, r.n_docs, r.t_ppm, d.doc_id,
       |         ((d.doc_id % 1000000007) * 2971215073) % 4294967296 % 1000000 AS h
       |  FROM documents d JOIN r USING (source))
       |SELECT source, n_docs, t_ppm,
       |       COUNT(*) AS n_kept, MIN(doc_id) AS first_kept
       |FROM g WHERE h < t_ppm
       |GROUP BY source, n_docs, t_ppm
       |ORDER BY source""".stripMargin

  /** LEAKAGE-FREE train/val/test split: near-duplicate documents must
    * land in the SAME split, or evaluation on the held-out set scores
    * memorization (the test doc's near-copy was trained on). The split
    * key is therefore the document's near-dup CLUSTER root — from the
    * same verified MinHash-LSH pair graph + connected components as
    * [[Dedup.qDedupClusters]] — for clustered docs, and the doc's own
    * id for singletons; the hash gate then runs on the GROUP key, so a
    * whole cluster moves between splits as one unit. By construction
    * no cluster can span splits (pinned in SamplingSpec). Corpus =
    * documents ∪ the MinHash near-copy derivation, so real cluster
    * traffic exists at every scale factor.
    *
    * Scale: the pair graph is banded/capped LSH (never all-pairs), CC
    * is the log-rounds loop, and the split itself is one left join of
    * the corpus against the O(dup-docs) label table plus a per-row
    * hash — re-running over a grown corpus never moves an untouched
    * singleton (its key is its own id), and only merges clusters
    * forward. Output pins per-split doc/group counts and id bounds. */
  def qSplitLeakfree(s: SparkSession, dir: String): DataFrame =
    splitLeakfreeFromLabels(s, dir,
      Dedup.clusterLabels(s, dir).selectExpr("id", "cluster"))

  /** [[qSplitLeakfree]]'s body over ANY `(id, cluster)` label frame —
    * shared with the indexed twin
    * ([[DedupPipeline.qSplitLeakfreeIndexed]]) so the split algebra
    * (group key, permille gate, per-split aggregate) cannot drift
    * between the self-contained and materialized-signature plans. */
  private[llm] def splitLeakfreeFromLabels(
      s: SparkSession, dir: String,
      labels: org.apache.spark.sql.DataFrame): DataFrame = {
    val base = load(s, dir, "documents").selectExpr("doc_id as id")
    val variants = base.filter(s"id % 7 = 0")
      .selectExpr(s"id + ${Dedup.VariantIdOffset} as id")
    val corpus = base.unionAll(variants)
    corpus.join(labels, Seq("id"), "left")
      .selectExpr("id", "coalesce(cluster, id) as skey")
      .selectExpr("id", "skey",
        s"""case when ${splitPermille("skey")} < 980 then 'train'
           |     when ${splitPermille("skey")} < 990 then 'val'
           |     else 'test' end as split""".stripMargin)
      .groupBy("split")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("count(distinct skey) as n_groups"),
        org.apache.spark.sql.functions.expr("min(id) as min_id"),
        org.apache.spark.sql.functions.expr("max(id) as max_id"))
      .orderBy("split")
  }

  val qSplitLeakfreeSql: String =
    s"""WITH RECURSIVE p AS (SELECT id_a, id_b FROM (${Dedup.qDedupMinhashLshSql}) mh),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |          UNION ALL SELECT id_b, id_a FROM p),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
       |allr AS (SELECT id, r FROM reach UNION SELECT src, src FROM edges),
       |lab AS (SELECT id, MIN(r) AS cl FROM allr GROUP BY id),
       |ids AS (
       |  SELECT doc_id AS id FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${Dedup.VariantIdOffset} FROM documents WHERE doc_id % 7 = 0),
       |keyed AS (
       |  SELECT ids.id, COALESCE(lab.cl, ids.id) AS skey
       |  FROM ids LEFT JOIN lab ON ids.id = lab.id),
       |sp AS (
       |  SELECT id, skey,
       |         ((skey % 1000000007) * 3267000013) % 4294967296 % 1000 AS h
       |  FROM keyed)
       |SELECT CASE WHEN h < 980 THEN 'train'
       |            WHEN h < 990 THEN 'val'
       |            ELSE 'test' END AS split,
       |       COUNT(*) AS n_docs, COUNT(DISTINCT skey) AS n_groups,
       |       MIN(id) AS min_id, MAX(id) AS max_id
       |FROM sp GROUP BY 1
       |ORDER BY split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_assign" -> (qSplitAssign _),
    "q_split_leakfree" -> (qSplitLeakfree _),
    "q_mix_temperature" -> (qMixTemperature _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_shard_pack" -> (qShardPack _),
    "q_seq_pack" -> (qSeqPack _),
    "q_mix_epochs" -> (qMixEpochs _),
    "q_sample_per_source" -> (qSamplePerSource _),
    "q_source_cap" -> (qSourceCap _))

  val oracleSql: Map[String, String] = Map(
    "q_split_assign" -> qSplitAssignSql,
    "q_split_leakfree" -> qSplitLeakfreeSql,
    "q_mix_temperature" -> qMixTemperatureSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_shard_pack" -> qShardPackSql,
    "q_seq_pack" -> qSeqPackSql,
    "q_mix_epochs" -> qMixEpochsSql,
    "q_sample_per_source" -> qSamplePerSourceSql,
    "q_source_cap" -> qSourceCapSql)
}
