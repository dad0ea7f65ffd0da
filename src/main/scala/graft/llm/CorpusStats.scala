package graft.llm

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics a training-data pipeline runs before and
  * after filtering: global vocabulary, per-document keywords, cross-
  * stratum overlap, and per-class embedding centroids. All outputs are
  * integer-exact (or a single final IEEE division), so every query has
  * a value-identical DuckDB oracle.
  *
  * Scale notes:
  *  - Vocabulary and TF are explode→partial-agg pipelines: the token
  *    explosion never shuffles raw text, only (token, count) pairs
  *    after map-side combine, and the global top-k is a TakeOrdered
  *    (no global window, no full sort materialization).
  *  - TF-IDF ranks with integers only (tf desc, df asc, term) — no
  *    log(), so no cross-engine libm drift — and the ranking window is
  *    partitioned by document.
  *  - Source overlap works on the distinct (source, token) index; the
  *    per-token pair fan-out is bounded by (#sources choose 2), which
  *    is the OUTPUT size — this operator is for bounded strata
  *    (sources/shards/epochs, <= ~10^3), not open-ended domains; for
  *    web-scale domain pairs use the MinHash operators instead.
  *  - Centroids quantize each float component to integer micro-units
  *    (one IEEE double multiply + floor, identical in both engines)
  *    and sum exact BIGINTs — associative, so map-side combine and
  *    any merge order give bit-identical sums at any scale.
  */
object CorpusStats {

  private def tokens(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)

  /** Global vocabulary: top 50 tokens by frequency (ties broken by
    * token text). */
  def qVocabTopk(s: SparkSession, dir: String): DataFrame =
    tokens(s, dir)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  val qVocabTopkSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE len(token) > 0
      |GROUP BY token
      |ORDER BY n DESC, token
      |LIMIT 50""".stripMargin

  /** Per-document keywords: top 3 terms ranked by (tf desc, rarity asc,
    * term) — an integer-deterministic TF-IDF (log(N/df) is monotone in
    * df, so ranking by df ascending IS the idf ranking without the
    * cross-engine float). */
  def qTfidfKeywords(s: SparkSession, dir: String): DataFrame = {
    val tf = tokens(s, dir)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df"), col("token"))
    tf.join(df, "token")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("token"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val qTfidfKeywordsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
      |  WHERE len(token) > 0 GROUP BY doc_id, token),
      |dfreq AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |ranked AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
      |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |                            ORDER BY tf.tf DESC, dfreq.df, tf.token) AS rnk
      |  FROM tf JOIN dfreq USING (token))
      |SELECT doc_id, rnk, token, tf, df
      |FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  /** Ceiling on distinct sources [[qSourceOverlap]] will accept
    * (session conf). The operator's output — and its per-token join
    * fan-out — is O(sources²); that is the DESIGN for bounded strata
    * and a planning accident for open domain sets, so the bound is
    * enforced, not just documented. */
  val OverlapMaxSourcesConf = "spark.graft.overlap.maxSources"
  private val OVERLAP_MAX_SOURCES = 2000

  /** (distinct sources, configured ceiling) — the shared pre-flight of
    * every O(sources²) overlap operator (exact AND sketch: the KMV
    * pair algebra is cheap PER PAIR but still quadratic in pairs). One
    * cheap single-column job, run eagerly so the guard refuses to even
    * PLAN the quadratic. */
  private def overlapMaxSources(s: SparkSession): Int = {
    val rawMax = s.conf.get(OverlapMaxSourcesConf, OVERLAP_MAX_SOURCES.toString)
    try rawMax.toInt
    catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$OverlapMaxSourcesConf must be an integer source-count bound, got '$rawMax'")
    }
  }

  private def sourceBound(s: SparkSession, dir: String): (Long, Int) =
    (load(s, dir, "documents").select(col("source")).distinct().count(),
      overlapMaxSources(s))

  /** Pairwise source overlap: exact token-set Jaccard for every source
    * pair, via the distinct (source, token) inverted index — never a
    * source × source cross join over documents.
    *
    * GUARDRAILED: counts distinct sources first (one cheap
    * single-column job) and refuses to plan the quadratic above
    * [[OverlapMaxSourcesConf]] — a misuse at 10⁵ web domains would
    * otherwise fan out ~5·10⁹ pairs per shared token. The error names
    * the scalable alternative (MinHash, [[Dedup.qDedupMinhashLsh]]'s
    * machinery over source-level shingle sets). */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // NOTE (registry contract): unlike most of the registry, the two
    // overlap builders run one bounded Spark job at DataFrame-
    // CONSTRUCTION time because the guard must refuse to even RUN the
    // quadratic: here a single-column distinct-source count; in the
    // KMV twin the (persisted) sketch aggregation itself, whose row
    // count doubles as the guard. Every other registry builder is lazy.
    val (nSources, maxSources) = sourceBound(s, dir)
    if (nSources > maxSources) throw new IllegalStateException(
      s"q_source_overlap is scoped to bounded strata: $nSources distinct sources " +
        s"exceeds $OverlapMaxSourcesConf=$maxSources. Exact pairwise Jaccard plans " +
        "an O(sources²) fan-out; for open-ended domain sets use the MinHash " +
        "path (q_source_overlap_minhash) instead, or raise the conf deliberately.")
    val st = tokens(s, dir).select(col("source"), col("token")).distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val a = st.select(col("source").as("src_a"), col("token"))
    val b = st.select(col("source").as("src_b"), col("token"))
    val inter = a.join(b, "token")
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("sz").as("sz_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("sz").as("sz_b")), "src_b")
      .select(
        col("src_a"), col("src_b"), col("inter"),
        (col("sz_a") + col("sz_b") - col("inter")).as("uni"),
        (col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val qSourceOverlapSql: String =
    """WITH st AS (
      |  SELECT DISTINCT source, token
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE len(token) > 0),
      |sizes AS (
      |  SELECT source, COUNT(*) AS sz FROM st GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
      |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT i.src_a, i.src_b, i.inter,
      |       sa.sz + sb.sz - i.inter AS uni,
      |       CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON sa.source = i.src_a
      |JOIN sizes sb ON sb.source = i.src_b
      |ORDER BY i.src_a, i.src_b""".stripMargin

  /** Source overlap for OPEN domain sets — the scalable path the
    * [[qSourceOverlap]] guardrail routes to. Instead of the exact
    * inverted-index quadratic, each source gets a MinHash signature
    * over its distinct token set (a streaming min-aggregation — the
    * token set is never materialized as an array, so a billion-token
    * source costs O(1) agg state), signatures pair through banded LSH
    * with the same hot-band occupancy cap as document dedup, and each
    * surviving pair reports its signature-agreement Jaccard estimate.
    * Pair count is driven by true similarity density, never
    * (#sources choose 2). Estimates are k-of-8 fractions — exact
    * binary doubles, hash-identical across engines. */
  def qSourceOverlapMinhash(s: SparkSession, dir: String): DataFrame = {
    // genuinely THE SAME layout as document dedup: signature length,
    // band count, permutation coefficients, and the hot-bucket cap all
    // come from Dedup — retuning the doc pipeline retunes this one
    val nh = Dedup.NumHashes
    val nBands = Dedup.NumBands
    val rowsPerBand = nh / nBands
    val st = tokens(s, dir).select(col("source"), col("token")).distinct()
      .selectExpr("source", s"${Portable.hSpark("token")} % ${Dedup.P} as x")
    val minExprs = (0 until nh).map(i =>
      s"min((${Dedup.aCoefs(i)} * x + ${Dedup.bCoefs(i)}) % ${Dedup.P}) as m$i")
    // cached leaf: sig (one narrow row per source) feeds the band
    // derivation AND both sides of the estimate join below — without
    // the cache the distinct+min token aggregation would run 3×
    val (sig, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      st.groupBy(col("source"))
        .agg(expr(minExprs.head), minExprs.tail.map(expr): _*))
    val bands = Dedup.capHotBuckets(
      sig.selectExpr("source",
        s"""explode(array(${(0 until nBands).map(b =>
          s"named_struct('b', $b, 'k', concat(${(0 until rowsPerBand).map(r =>
            s"cast(m${rowsPerBand * b + r} as string)").mkString(", ',', ")}))")
          .mkString(", ")})) as band""")
        .selectExpr("source", "band.b as b", "band.k as k"),
      Dedup.MaxBucket)
    val cand = bands.select(col("source").as("src_a"), col("b"), col("k"))
      .join(bands.select(col("source").as("src_b"), col("b"), col("k")), Seq("b", "k"))
      .where(col("src_a") < col("src_b"))
      .select("src_a", "src_b").distinct()
    val est = (0 until nh).map(i => s"cast(a.m$i = bb.m$i as int)").mkString(" + ")
    cand.alias("c")
      .join(sig.alias("a"), col("c.src_a") === col("a.source"))
      .join(sig.alias("bb"), col("c.src_b") === col("bb.source"))
      .selectExpr("c.src_a as src_a", "c.src_b as src_b",
        s"cast($est as double) / $nh as est_jaccard")
      .orderBy("src_a", "src_b")
  }

  val qSourceOverlapMinhashSql: String = {
    val nh = Dedup.NumHashes
    val rowsPerBand = nh / Dedup.NumBands
    val minCols = (0 until nh).map(i =>
      s"MIN((${Dedup.aCoefs(i)} * x + ${Dedup.bCoefs(i)}) % ${Dedup.P}) AS m$i")
      .mkString(",\n      |         ")
    val mhList = (0 until nh).map("m" + _).mkString("[", ",", "]")
    val bandKey = (0 until rowsPerBand).map(r =>
      s"($mhList)[$rowsPerBand*b+${r + 1}]::VARCHAR").mkString(" || ',' || ")
    val est = (0 until nh).map(i => s"CAST(a.m$i = b.m$i AS INT)").mkString(" + ")
    s"""WITH st AS (
       |  SELECT DISTINCT source, token
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE len(token) > 0),
       |hx AS (SELECT source, ${Portable.hDuck("token")} % ${Dedup.P} AS x FROM st),
       |sig AS (SELECT source, $minCols
       |        FROM hx GROUP BY source),
       |bands AS (
       |  SELECT source, b, $bandKey AS k
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, ${Dedup.NumBands})) AS b) bs),
       |cold AS (SELECT b, k FROM bands GROUP BY b, k
       |         HAVING COUNT(*) <= ${Dedup.MaxBucket}),
       |kept AS (SELECT bands.* FROM bands JOIN cold USING (b, k)),
       |cand AS (
       |  SELECT DISTINCT x.source AS src_a, y.source AS src_b
       |  FROM kept x JOIN kept y ON x.b = y.b AND x.k = y.k AND x.source < y.source)
       |SELECT c.src_a, c.src_b, ($est) / $nh.0 AS est_jaccard
       |FROM cand c
       |JOIN sig a ON c.src_a = a.source
       |JOIN sig b ON c.src_b = b.source
       |ORDER BY c.src_a, c.src_b""".stripMargin
  }

  /** Per-label embedding centroids in exact integer micro-units: each
    * float component widens to double (exact), scales by 1e6 (one IEEE
    * multiply, identical everywhere), floors to BIGINT, and sums. The
    * caller divides sum_q / (1e6 · n) for the float centroid; the gate
    * pins the exact integer form. */
  def qEmbCentroids(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(
        sum(floor(col("v").cast("double") * lit(1000000.0)).cast("long")).as("sum_q"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))

  val qEmbCentroidsSql: String =
    """SELECT label, CAST(idx - 1 AS INT) AS dim,
      |       CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_q,
      |       COUNT(*) AS n
      |FROM (SELECT label, unnest(embedding) AS v,
      |             generate_subscripts(embedding, 1) AS idx
      |      FROM embeddings)
      |GROUP BY label, idx
      |ORDER BY label, dim""".stripMargin

  /** How many hottest tokens join broadcast in [[qTokenRarity]] —
    * bounded by construction (a TakeOrdered of this many rows). */
  val RarityHeadK = 256

  /** Document rarity score — the CCNet-style perplexity proxy without
    * a model: each token occurrence contributes the BIT LENGTH of its
    * corpus document frequency (= floor(log2 df), computed as
    * `length(bin(df)) - 1` — exact integer arithmetic, no libm, so
    * both engines agree to the bit), and a document's score is the
    * mean over its occurrences. Boilerplate-heavy documents score
    * high, rare-vocabulary documents low — the usual bucket signal
    * for rarity-aware filtering and sampling.
    *
    * Scale: joining occurrences to the df table is the classic skew
    * join — "the" funnels a constant fraction of the corpus onto one
    * key. The plan SPLITS it: the [[RarityHeadK]] hottest tokens by
    * (df desc, token) collect to the driver (bounded TakeOrdered, the
    * IVF-seed pattern) and join BROADCAST — the hot keys never
    * shuffle; everything else anti-filters against the same broadcast
    * head and joins keyed, where per-key fan-in is bounded above by
    * the head cutoff's df. Union, then one map-side-combinable
    * per-document mean. */
  def qTokenRarity(s: SparkSession, dir: String): DataFrame = {
    // per-doc token ARRAYS ride a cached leaf (r19): the occurrence
    // stream feeds the df aggregate and BOTH skew-split branches —
    // three split() passes over every document without it (exchange
    // reuse only unifies the df subtree). Same rows as tokens():
    // filter-then-explode ≡ explode-then-filter.
    val (ta, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      load(s, dir, "documents").selectExpr("doc_id",
        "filter(split(text, ' '), t -> length(t) > 0) as ta"))
    val toks = ta.selectExpr("doc_id", "explode(ta) as token")
    val dfTab = toks.dropDuplicates("token", "doc_id")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val head = dfTab.orderBy(col("df").desc, col("token")).limit(RarityHeadK)
    // the anti join broadcasts the SAME head frame (extra columns are
    // inert under left_anti): identical broadcast subtrees canonicalize
    // equal, so ReuseExchange builds the TakeOrdered head ONCE instead
    // of once per projection — one fewer head-subtree execution per
    // query, same rows (applies to all six head/tail skew-split sites)
    val headToks = toks.join(broadcast(head), "token")
    val tailToks = toks
      .join(broadcast(head), Seq("token"), "left_anti")
      .join(dfTab, "token")
    headToks.select(col("doc_id"), col("df"))
      .unionByName(tailToks.select(col("doc_id"), col("df")))
      .selectExpr("doc_id", "length(bin(df)) - 1 as bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), avg(col("bucket")).as("rarity"))
      .orderBy(col("doc_id"))
  }

  val qTokenRaritySql: String =
    """WITH toks AS (
      |  SELECT doc_id, t AS token
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
      |  WHERE len(t) > 0),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
      |j AS (SELECT t.doc_id, length(printf('%b', d.df)) - 1 AS bucket
      |      FROM toks t JOIN df d USING (token))
      |SELECT doc_id, COUNT(*) AS n_toks, AVG(bucket) AS rarity
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-document BIGRAM conditional surprisal — the language-model
    * quality score one step past [[qTokenRarity]]'s unigram proxy:
    * each bigram occurrence (w1, w2) contributes
    * `floor(log2 cnt(w1·)) - floor(log2 cnt(w1,w2))` — the quantized
    * `-log2 p(w2 | w1)` of the corpus's own bigram model — and a
    * document's score is the mean over its bigrams (docs with < 2
    * tokens have no bigrams and no row). The real CCNet-style
    * filtering signal: template/boilerplate text (predictable
    * continuations) scores low, incoherent or rare text scores high.
    * All arithmetic is integer bit-lengths (`length(bin(x)) - 1`
    * deltas — no libm, both engines agree to the bit) with ONE final
    * IEEE division.
    *
    * Scale: bigram derivation is a per-row array transform (no
    * shuffle); the model tables are two map-side-combinable keyed
    * aggregations; scoring joins occurrences to the per-bigram score
    * table — the classic skew join ("of the" funnels a constant
    * corpus fraction onto one key), SPLIT exactly like
    * [[qTokenRarity]]: the [[RarityHeadK]] hottest bigrams broadcast,
    * the tail joins keyed with per-key fan-in bounded by the head
    * cutoff's count. The bi⋈ctx join underneath is on DISTINCT
    * bigrams (vocabulary-scale, fan-out = distinct successors per
    * context), never occurrence-scale. */
  def qLmBigramSurprisal(s: SparkSession, dir: String): DataFrame =
    docSurprisalRaw(s, dir)
      .selectExpr("doc_id", "n_bigrams",
        "cast(sb as double) / n_bigrams as surprisal")
      .orderBy(col("doc_id"))

  /** Per-doc integer surprisal totals `(doc_id, n_bigrams, sb)` — the
    * derivation [[qLmBigramSurprisal]] and [[qLmPplBand]] share (one
    * final IEEE division each; everything before it integer-exact). */
  private def docSurprisalRaw(s: SparkSession, dir: String): DataFrame = {
    // token-array CACHED LEAF (r19, the qLmTrigramBackoff construct):
    // the bigram stream is consumed by the model aggregate and both
    // skew-split branches — three parquet scans + split passes without
    // it. Ownership: the returned frame owns the blocks.
    val (ta, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      load(s, dir, "documents")
        .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta"))
    val bg = ta
      .where("size(ta) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(2, size(ta)),
          |  i -> named_struct('w1', element_at(ta, i - 1),
          |                    'w2', element_at(ta, i)))) as g""".stripMargin)
      .selectExpr("doc_id", "g.w1 as w1", "g.w2 as w2")
    val bi = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bcnt"))
    // ctx counts roll up from the (distinct-bigram-sized) bi table —
    // one partial-agg over vocabulary-scale rows, not a third
    // occurrence-scale explode+shuffle of the corpus
    val ctx = bi.groupBy(col("w1")).agg(sum(col("bcnt")).as("ccnt"))
    val scored = bi.join(ctx, "w1")
      .selectExpr("w1", "w2", "bcnt",
        "length(bin(ccnt)) - length(bin(bcnt)) as sbits")
    val head = scored.orderBy(col("bcnt").desc, col("w1"), col("w2"))
      .limit(RarityHeadK)
    val headRows = bg.join(broadcast(head), Seq("w1", "w2"))
    val tailRows = bg // same-frame broadcast: see qTokenRarity
      .join(broadcast(head), Seq("w1", "w2"), "left_anti")
      .join(scored, Seq("w1", "w2"))
    headRows.select(col("doc_id"), col("sbits"))
      .unionByName(tailRows.select(col("doc_id"), col("sbits")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sbits")).as("sb"))
  }

  /** Backoff penalty in quantized bits (≈ −log2 of stupid backoff's
    * 0.4 discount, floored to keep every term integer-exact). */
  private val BackoffPenaltyBits = 1

  /** Per-document TRIGRAM surprisal with STUPID BACKOFF (Brants et
    * al.) — the model tier above [[qLmBigramSurprisal]]: a trigram
    * occurrence scores from the trigram model when its count is
    * trustworthy (≥ 2 — singletons are Zipf noise, the standard
    * min-count cut), otherwise it BACKS OFF to the bigram estimate
    * `p(w3 | w2)` plus a fixed [[BackoffPenaltyBits]] discount. Scores
    * are quantized integer bit-lengths end to end (`floor(log2)`
    * deltas, no libm) with ONE final IEEE division; `n_backoff` is
    * reported per doc — itself a quality signal (the fraction of a
    * doc's trigrams that are corpus singletons).
    *
    * Scale: the trigram model is distinct-trigram scale (sub-
    * occurrence); its context table rolls up FROM it; the bigram
    * fallback tables are the [[qLmBigramSurprisal]] shapes. Each
    * distinct trigram precomputes both paths' bits in one
    * vocabulary-scale join chain (every join keyed, fan-out 1), and
    * the occurrence→score join SPLITs on the [[RarityHeadK]] hottest
    * trigrams exactly like the bigram scorer — broadcast head, keyed
    * tail, fan-in bounded by the head cutoff. */
  def qLmTrigramBackoff(s: SparkSession, dir: String): DataFrame = {
    // the token-array frame is a CACHED LEAF (r19): FOUR consumers —
    // the trigram stream is evaluated for the model aggregate and both
    // skew-split branches, plus the bigram fallback stream — each
    // otherwise re-scanning the parquet and re-running split+filter
    // over every document. The leaf stores one array column per doc
    // (compact); the explodes stay cheap re-evaluations over the
    // stored column. Ownership: the returned frame owns the blocks.
    val (ta, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      load(s, dir, "documents")
        .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta"))
    val tg = ta
      .where("size(ta) >= 3")
      .selectExpr("doc_id",
        """explode(transform(sequence(3, size(ta)),
          |  i -> named_struct('w1', element_at(ta, i - 2),
          |                    'w2', element_at(ta, i - 1),
          |                    'w3', element_at(ta, i)))) as g""".stripMargin)
      .selectExpr("doc_id", "g.w1 as w1", "g.w2 as w2", "g.w3 as w3")
    val tri = tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("tcnt"))
    val ctx2 = tri.groupBy(col("w1"), col("w2")).agg(sum(col("tcnt")).as("c2cnt"))
    // bigram fallback model over the full bigram derivation (docs ≥ 2
    // tokens) — the same model the bigram scorer uses, so the two
    // tiers are comparable
    val bg = ta
      .where("size(ta) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(2, size(ta)),
          |  i -> named_struct('w2', element_at(ta, i - 1),
          |                    'w3', element_at(ta, i)))) as g""".stripMargin)
      .selectExpr("g.w2 as w2", "g.w3 as w3")
    val bi = bg.groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("bcnt"))
    val ctx1 = bi.groupBy(col("w2")).agg(sum(col("bcnt")).as("c1cnt"))
    // per DISTINCT trigram: the chosen path's bits + the backoff flag
    val scored = tri.join(ctx2, Seq("w1", "w2"))
      .join(bi, Seq("w2", "w3"))
      .join(ctx1, Seq("w2"))
      .selectExpr("w1", "w2", "w3", "tcnt",
        s"""case when tcnt >= 2
           |  then length(bin(c2cnt)) - length(bin(tcnt))
           |  else length(bin(c1cnt)) - length(bin(bcnt)) + $BackoffPenaltyBits
           |end as sbits""".stripMargin,
        "case when tcnt >= 2 then 0L else 1L end as backed")
    val head = scored.orderBy(col("tcnt").desc, col("w1"), col("w2"), col("w3"))
      .limit(RarityHeadK)
    val keys = Seq("w1", "w2", "w3")
    val headRows = tg.join(broadcast(head), keys)
    val tailRows = tg // same-frame broadcast: see qTokenRarity
      .join(broadcast(head), keys, "left_anti")
      .join(scored, keys)
    headRows.select(col("doc_id"), col("sbits"), col("backed"))
      .unionByName(tailRows.select(col("doc_id"), col("sbits"), col("backed")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("backed")).as("n_backoff"),
        sum(col("sbits")).as("sb"))
      .selectExpr("doc_id", "n_trigrams", "cast(n_backoff as bigint) as n_backoff",
        "cast(sb as double) / n_trigrams as surprisal")
      .orderBy(col("doc_id"))
  }

  val qLmTrigramBackoffSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |t3 AS (SELECT doc_id, ta FROM d WHERE len(ta) >= 3),
       |tg AS (SELECT doc_id, ta[i - 2] AS w1, ta[i - 1] AS w2, ta[i] AS w3
       |       FROM t3, UNNEST(range(3, len(ta) + 1)) AS u(i)),
       |tri AS (SELECT w1, w2, w3, COUNT(*) AS tcnt FROM tg GROUP BY w1, w2, w3),
       |ctx2 AS (SELECT w1, w2, CAST(SUM(tcnt) AS BIGINT) AS c2cnt FROM tri GROUP BY w1, w2),
       |d2 AS (SELECT doc_id, ta FROM d WHERE len(ta) >= 2),
       |bg AS (SELECT ta[i - 1] AS w2, ta[i] AS w3
       |       FROM d2, UNNEST(range(2, len(ta) + 1)) AS u(i)),
       |bi AS (SELECT w2, w3, COUNT(*) AS bcnt FROM bg GROUP BY w2, w3),
       |ctx1 AS (SELECT w2, CAST(SUM(bcnt) AS BIGINT) AS c1cnt FROM bi GROUP BY w2),
       |sc AS (
       |  SELECT t.w1, t.w2, t.w3,
       |         CASE WHEN t.tcnt >= 2
       |           THEN length(printf('%b', c2.c2cnt)) - length(printf('%b', t.tcnt))
       |           ELSE length(printf('%b', c1.c1cnt)) - length(printf('%b', b.bcnt)) + $BackoffPenaltyBits
       |         END AS sbits,
       |         CASE WHEN t.tcnt >= 2 THEN 0 ELSE 1 END AS backed
       |  FROM tri t
       |  JOIN ctx2 c2 ON t.w1 = c2.w1 AND t.w2 = c2.w2
       |  JOIN bi b ON t.w2 = b.w2 AND t.w3 = b.w3
       |  JOIN ctx1 c1 ON t.w2 = c1.w2)
       |SELECT g.doc_id, COUNT(*) AS n_trigrams,
       |       CAST(SUM(s.backed) AS BIGINT) AS n_backoff,
       |       CAST(SUM(s.sbits) AS DOUBLE) / COUNT(*) AS surprisal
       |FROM tg g JOIN sc s ON g.w1 = s.w1 AND g.w2 = s.w2 AND g.w3 = s.w3
       |GROUP BY g.doc_id
       |ORDER BY doc_id""".stripMargin

  /** CCNet-style perplexity banding: bucket each SOURCE's documents
    * into head / middle / tail terciles of the corpus-LM surprisal
    * (band 1 = most predictable — the "head" CCNet keeps; band 3 =
    * least). Banding is PER SOURCE on purpose: a global cut would
    * simply rank whole domains against each other (code always "odd",
    * news always "fluent") instead of ranking documents within their
    * own register — the published CCNet design.
    *
    * Scale: the ntile window partitions by source, so the only
    * ordered structure is each source's own doc list — a keyed sort,
    * never a global one (PlanAuditSpec's machine line). A deployment
    * with one source holding a corpus-scale majority would pre-split
    * that source by hash into subshards first (same skew answer as
    * the hot-token split above). */
  def qLmPplBand(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = docSurprisalRaw(s, dir)
      .selectExpr("doc_id", "cast(sb as double) / n_bigrams as surprisal")
    val src = load(s, dir, "documents").select(col("doc_id"), col("source"))
    sc.join(src, "doc_id")
      .withColumn("band", org.apache.spark.sql.functions.ntile(3).over(
        Window.partitionBy("source").orderBy(col("surprisal"), col("doc_id"))))
      .selectExpr("doc_id", "source", "surprisal", "cast(band as int) as band")
      .orderBy(col("doc_id"))
  }

  val qLmPplBandSql: String =
    """WITH d AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
      |  FROM documents),
      |d2 AS (SELECT doc_id, ta FROM d WHERE len(ta) >= 2),
      |bg AS (SELECT doc_id, ta[i - 1] AS w1, ta[i] AS w2
      |       FROM d2, UNNEST(range(2, len(ta) + 1)) AS u(i)),
      |bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, COUNT(*) AS ccnt FROM bg GROUP BY w1),
      |sc AS (SELECT b.w1, b.w2,
      |              length(printf('%b', c.ccnt)) - length(printf('%b', b.bcnt)) AS sbits
      |       FROM bi b JOIN ctx c USING (w1)),
      |ds AS (SELECT g.doc_id,
      |              CAST(SUM(s.sbits) AS DOUBLE) / COUNT(*) AS surprisal
      |       FROM bg g JOIN sc s ON g.w1 = s.w1 AND g.w2 = s.w2
      |       GROUP BY g.doc_id)
      |SELECT ds.doc_id, doc.source, ds.surprisal,
      |       CAST(NTILE(3) OVER (PARTITION BY doc.source
      |                           ORDER BY ds.surprisal, ds.doc_id) AS INT) AS band
      |FROM ds JOIN documents doc ON ds.doc_id = doc.doc_id
      |ORDER BY ds.doc_id""".stripMargin

  val qLmBigramSurprisalSql: String =
    """WITH d AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
      |  FROM documents),
      |d2 AS (SELECT doc_id, ta FROM d WHERE len(ta) >= 2),
      |bg AS (SELECT doc_id, ta[i - 1] AS w1, ta[i] AS w2
      |       FROM d2, UNNEST(range(2, len(ta) + 1)) AS u(i)),
      |bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, COUNT(*) AS ccnt FROM bg GROUP BY w1),
      |sc AS (SELECT b.w1, b.w2,
      |              length(printf('%b', c.ccnt)) - length(printf('%b', b.bcnt)) AS sbits
      |       FROM bi b JOIN ctx c USING (w1))
      |SELECT g.doc_id, COUNT(*) AS n_bigrams,
      |       CAST(SUM(s.sbits) AS DOUBLE) / COUNT(*) AS surprisal
      |FROM bg g JOIN sc s ON g.w1 = s.w1 AND g.w2 = s.w2
      |GROUP BY g.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Hashed feature buckets in the DSIR importance model — the fixed
    * model dimension that makes the score table broadcastable at ANY
    * corpus size (DSIR's own trick: hashed n-gram features, Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"). */
  val DsirBuckets = 4096L

  /** Importance-weight quantization: 1/1024 units of the per-bucket
    * target-vs-raw ratio. */
  val DsirWeightScale = 1024L

  /** DSIR-style importance score: how much each document's tokens lean
    * toward a TARGET distribution (here: the `lang = 'en'` slice)
    * relative to the raw-corpus distribution — the
    * importance-resampling signal for "select web data that looks like
    * the curated target". Each token occurrence hashes into one of
    * [[DsirBuckets]] buckets; bucket b carries the importance WEIGHT
    * `(ct+1)/(cr+1)` (Laplace +1) — the very quantity DSIR samples
    * proportionally to — quantized to integer [[DsirWeightScale]]ths
    * via one exact integer division, and a document's score is the
    * mean weight over its occurrences with ONE final IEEE division.
    * (The textbook log-ratio form quantized to whole bits collapses
    * mild ratios — anything in (0.5, 1] floors to the same bucket —
    * so the linear weight is both the more faithful DSIR quantity and
    * the one that survives integer-exact cross-engine arithmetic. The
    * dropped `T_raw/T_target` normalizer is a per-corpus constant
    * factor, so ranking and thresholding are unaffected.)
    *
    * Scale: the model is a ≤[[DsirBuckets]]-row aggregate (map-side
    * combine collapses every partition to ≤4096 keys) and joins back
    * BROADCAST — unlike vocabulary-keyed scoring there is no skew join
    * to split, because the feature space is bounded by construction.
    * Everything else is per-row: explode, hash, per-doc mean. The
    * scaled numerator `(ct+1)·1024` stays under 2^63 for any bucket
    * count below ~9·10^15 tokens — headroom past 100 TB corpora. */
  def qDsirImportance(s: SparkSession, dir: String): DataFrame = {
    // per-doc bucket ARRAYS ride a cached leaf (r19, the bigramToks
    // construct): the occurrence stream feeds the model aggregate AND
    // the scoring join — two subtrees exchange reuse cannot unify — so
    // split + md5-hash ran twice per document. The leaf stores one
    // compact long array per doc; both consumers re-explode it.
    val (ta, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      load(s, dir, "documents").selectExpr("doc_id", "lang",
        s"""transform(filter(split(text, ' '), t -> length(t) > 0),
           |  t -> pmod(${Portable.hSpark("t")}, $DsirBuckets)) as buckets""".stripMargin))
    val toks = ta.selectExpr("doc_id", "lang", "explode(buckets) as bucket")
    val model = toks.groupBy(col("bucket"))
      .agg(
        sum(expr("cast(lang = 'en' as int)")).as("ct"),
        count(lit(1)).as("cr"))
      .selectExpr("bucket",
        s"((ct + 1) * $DsirWeightScale) div (cr + 1) as wq")
    toks.join(broadcast(model), "bucket")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wq")).as("sw"))
      .selectExpr("doc_id", "lang", "n_toks",
        "cast(sw as double) / n_toks as dsir")
      .orderBy(col("doc_id"))
  }

  val qDsirImportanceSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${Portable.hDuck("token")} % $DsirBuckets AS bucket
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
       |        FROM documents)
       |  WHERE len(token) > 0),
       |m AS (
       |  SELECT bucket,
       |         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
       |         COUNT(*) AS cr
       |  FROM toks GROUP BY bucket),
       |sc AS (
       |  SELECT bucket,
       |         CAST((ct + 1) * $DsirWeightScale AS BIGINT) // CAST(cr + 1 AS BIGINT) AS wq
       |  FROM m)
       |SELECT t.doc_id, t.lang AS lang, COUNT(*) AS n_toks,
       |       CAST(SUM(wq) AS DOUBLE) / COUNT(*) AS dsir
       |FROM toks t JOIN sc USING (bucket)
       |GROUP BY t.doc_id, t.lang
       |ORDER BY doc_id""".stripMargin

  /** Per-source token-distribution DRIFT against the whole corpus — a
    * quantized KL(source‖corpus) in bits: for each token,
    * `sbits_g − sbits_s` where `sbits = bitlen(total) − bitlen(count)`
    * (the integer −log2 p quantization the surprisal family uses),
    * count-weighted and normalized by the source's token mass. The
    * corpus-mixture monitoring view: a source whose language drifts
    * from the blend (new spam template, scraper change, language flip)
    * shows up as rising bits before any downstream metric moves.
    *
    * Scale: per-source token counts are ONE keyed map-side-combined
    * aggregation (vocabulary × sources rows out, raw text never
    * shuffles twice); the global distribution ROLLS UP from that table
    * (vocabulary-sized, never a second corpus pass); the meeting join
    * is keyed on token with per-token fanout bounded by the source
    * count. All arithmetic is integer bit-lengths until one final
    * division, so both engines emit the identical double. */
  def qSourceTokenDrift(s: SparkSession, dir: String): DataFrame = {
    val st = tokens(s, dir)
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val totals = st.groupBy(col("source")).agg(sum(col("cnt")).as("n_s"))
    val g = st.groupBy(col("token")).agg(sum(col("cnt")).as("gcnt"))
    val gTotal = g.agg(sum(col("gcnt")).as("n_g"))
    st.join(totals, "source")
      .join(g, "token")
      .crossJoin(broadcast(gTotal))
      .selectExpr("source", "n_s", "cnt",
        // KL(source‖corpus): corpus surprisal − source surprisal, so a
        // token the source over-represents (rarer globally than locally)
        // contributes POSITIVE bits — drift rises, matching
        // [[graft.llm.StreamingDrift.driftOf]]'s ref−batch convention.
        "(length(bin(n_g)) - length(bin(gcnt))) - (length(bin(n_s)) - length(bin(cnt))) as dbits")
      .groupBy(col("source"))
      .agg(
        expr("max(n_s) as n_tokens"),
        expr("sum(cnt * dbits) as drift_num"))
      .selectExpr("source", "n_tokens",
        "cast(drift_num as double) / n_tokens as drift_bits")
      .orderBy(col("source"))
  }

  val qSourceTokenDriftSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |st AS (SELECT source, token, COUNT(*) AS cnt FROM toks
      |       WHERE len(token) > 0 GROUP BY source, token),
      |totals AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_s FROM st GROUP BY source),
      |g AS (SELECT token, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM st GROUP BY token),
      |gt AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS n_g FROM g),
      |d AS (
      |  SELECT st.source, totals.n_s, st.cnt,
      |         (length(printf('%b', gt.n_g)) - length(printf('%b', g.gcnt)))
      |           - (length(printf('%b', totals.n_s)) - length(printf('%b', st.cnt))) AS dbits
      |  FROM st JOIN totals USING (source) JOIN g USING (token) CROSS JOIN gt)
      |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
      |       CAST(SUM(cnt * dbits) AS DOUBLE) / MAX(n_s) AS drift_bits
      |FROM d GROUP BY source
      |ORDER BY source""".stripMargin

  /** KMV keep-size: 64 longs of state per group. Standard error of the
    * distinct estimate ≈ 1/√(k−2) ≈ 12.7% — the scale knob is k, not
    * the corpus. */
  val KmvK = 64
  private val TwoPow60 = "1152921504606846976.0" // 2^60, the hash range

  /** Per-source distinct-BIGRAM cardinality via the KMV sketch
    * ([[graft.functions.KmvSketchAgg]]): keep the k smallest DISTINCT
    * 60-bit hashes per source; the k-th smallest estimates the
    * cardinality as (k−1)·2^60/kth. Bigrams, not unigrams, so the
    * per-group cardinality (~700 per source at sf0.01) actually FILLS
    * the sketch and the estimator path is what the gate exercises.
    *
    * Why this exists at 100 TB: per-source COUNT(DISTINCT ngram) is a
    * vocabulary-scale shuffle — billions of keys move so a
    * sources-count answer can come back. The sketch state is ≤ k longs
    * per source, merges by sorted-merge-dedup (commutative/associative
    * ⇒ bit-deterministic under any partitioning), and — unlike
    * engine-native HLL — is EXACTLY reproducible cross-engine: the
    * oracle recomputes the same k minimum md5-hashes in SQL, so the
    * gate pins the kept set itself (n_kept + kth_min), not a tolerance
    * band around an estimate. The estimate column divides two exactly
    * representable doubles, identical IEEE result in both engines. */
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val bg = load(s, dir, "documents")
      .selectExpr("source", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where("size(ta) >= 2")
      .selectExpr("source",
        """explode(transform(sequence(2, size(ta)),
          |  i -> concat(element_at(ta, i - 1), ' ', element_at(ta, i)))) as bigram""".stripMargin)
      .selectExpr("source", s"${Portable.hSpark("bigram")} as h")
    bg.groupBy(col("source"))
      .agg(graft.functions.KmvSketch.of(KmvK)(col("h")).as("sk"))
      .selectExpr(
        "source",
        "cast(size(sk) as bigint) as n_kept",
        "element_at(sk, size(sk)) as kth_min",
        s"case when size(sk) < $KmvK then cast(size(sk) as double) " +
          s"else ${KmvK - 1}.0 * $TwoPow60 / cast(element_at(sk, $KmvK) as double) end " +
          "as est_distinct")
      .orderBy(col("source"))
  }

  val qKmvDistinctSql: String =
    s"""WITH d AS (
       |  SELECT source, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |d2 AS (SELECT source, ta FROM d WHERE len(ta) >= 2),
       |h AS (
       |  SELECT DISTINCT source,
       |         ${Portable.hDuck("ta[i - 1] || ' ' || ta[i]")} AS h
       |  FROM d2, UNNEST(range(2, len(ta) + 1)) AS u(i)),
       |r AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
       |         count(*) OVER (PARTITION BY source) AS nd
       |  FROM h)
       |SELECT source,
       |       count(*) AS n_kept,
       |       max(h) AS kth_min,
       |       CASE WHEN max(nd) < $KmvK THEN CAST(max(nd) AS DOUBLE)
       |            ELSE ${KmvK - 1}.0 * $TwoPow60 / CAST(max(h) AS DOUBLE) END
       |         AS est_distinct
       |FROM r WHERE rn <= $KmvK
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Pairwise source OVERLAP from the same per-source KMV sketches
    * [[qKmvDistinct]] keeps — the sketch-algebra readout HLL can't do:
    * union = sorted-merge of two kept sets (a KMV sketch of the union
    * by construction), and the Jaccard estimate is the INCLUSION rule
    * (Beyer et al., "On synopses for distinct-value estimation under
    * multiset operations", SIGMOD 2007): of the k smallest union
    * hashes, the fraction present in BOTH sketches estimates
    * |A∩B|/|A∪B|; times the union estimate gives the intersection
    * size. Every step is integer/array arithmetic on ≤ k longs, so the
    * oracle rebuilds the identical numbers in SQL and the gate pins
    * them exactly — no tolerance band.
    *
    * Why this exists at 100 TB: "which sources duplicate each other's
    * n-gram space" as an exact computation is a vocabulary-scale
    * self-join (distinct bigrams × sources against itself). Here the
    * corpus is scanned ONCE into |sources| sketches of k longs; the
    * pairwise algebra runs on |sources|² sketch pairs — driver-trivial
    * at any corpus size, and the estimate error is the standard
    * KMV 1/√(k−2), tunable by k alone. */
  def qKmvSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // same guardrail as the exact twin: the sketches are k longs each,
    // but the pair ALGEBRA is still |sources|² — designed for bounded
    // strata, a planning accident for open-ended domain sets.
    // GUARD WITHOUT A SECOND CORPUS SCAN (r15): the r14 pre-flight ran
    // a separate distinct-source count — one full documents pass —
    // before the sketch build paid the same pass again. Instead the
    // sketch aggregation runs EAGERLY: its row count IS the
    // distinct-source count, so ONE corpus scan funds both the guard
    // and the state the pair algebra consumes, and the quadratic join
    // below the throw is never executed above the bound.
    // REGISTRY-CONTRACT NOTE: the one-scan design prices a REFUSAL at
    // the full tokenize+sketch pass (r14 refused after a cheap
    // single-column distinct, then charged the accepted path the scan
    // twice); refusals are config mistakes, the accepted path is the
    // steady state — pricing the mistake is the right trade.
    // NO CACHE OUTLIVES THE CALL (r16): r15 persisted the sketches and
    // only unpersisted on the refusal path, so repeated registry
    // invocations accumulated cached partitions for the session
    // lifetime. The guard already bounds the post-scan state at
    // maxSources × k longs (2000 × 64 × 8 B ≈ 1 MB default), so the
    // one eager action is a bounded COLLECT (limit maxSources+1): the
    // sketches land on the driver, the corpus scan's lineage is cut,
    // and the pair algebra runs over a LOCAL relation — exactly the
    // "driver-trivial at any corpus size" shape the Scaladoc claims,
    // with nothing left persisted after the call returns.
    val maxSources = overlapMaxSources(s)
    val sketchRows = load(s, dir, "documents")
      .selectExpr("source", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where("size(ta) >= 2")
      .selectExpr("source",
        """explode(transform(sequence(2, size(ta)),
          |  i -> concat(element_at(ta, i - 1), ' ', element_at(ta, i)))) as bigram""".stripMargin)
      .selectExpr("source", s"${Portable.hSpark("bigram")} as h")
      .groupBy(col("source"))
      .agg(graft.functions.KmvSketch.of(KmvK)(col("h")).as("sk"))
      .limit(maxSources + 1)
      .collect()
    if (sketchRows.length > maxSources) {
      throw new IllegalStateException(
        s"q_kmv_source_overlap is scoped to bounded strata: more than " +
          s"$OverlapMaxSourcesConf=$maxSources distinct sources. The KMV pair " +
          "algebra is O(sources\u00b2) sketch pairs; for open-ended domain sets " +
          "use the MinHash path (q_source_overlap_minhash) instead, or raise " +
          "the conf deliberately.")
    }
    val sketches = s.createDataFrame(
      java.util.Arrays.asList(sketchRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sk",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)))))
    val pairs = sketches.selectExpr("source as source_a", "sk as sk_a")
      .join(broadcast(sketches.selectExpr("source as source_b", "sk as sk_b")),
        col("source_a") < col("source_b"))
    def estOf(sk: String): String =
      s"case when size($sk) < $KmvK then cast(size($sk) as double) " +
        s"else ${KmvK - 1}.0 * $TwoPow60 / cast(element_at($sk, $KmvK) as double) end"
    pairs
      .selectExpr("source_a", "source_b", "sk_a", "sk_b",
        s"slice(array_sort(array_distinct(concat(sk_a, sk_b))), 1, $KmvK) as merged")
      .selectExpr("source_a", "source_b",
        "cast(size(merged) as bigint) as n_merged",
        "cast(size(array_intersect(array_intersect(merged, sk_a), sk_b)) as bigint) as n_both",
        s"case when size(merged) < $KmvK then cast(size(merged) as double) " +
          s"else ${KmvK - 1}.0 * $TwoPow60 / cast(element_at(merged, $KmvK) as double) end " +
          "as est_union",
        s"${estOf("sk_a")} as est_a",
        s"${estOf("sk_b")} as est_b")
      .selectExpr("source_a", "source_b", "n_merged", "n_both",
        "cast(n_both as double) / n_merged as jaccard_kmv",
        "est_union",
        "(cast(n_both as double) / n_merged) * est_union as est_intersect",
        "est_a", "est_b")
      // asymmetric CONTAINMENT readout from the same algebra: how much
      // of A's n-gram space lives inside B (and vice versa) — the
      // source-granularity dual of q_dedup_containment; estimation
      // noise can push a ratio slightly past 1, left raw (deterministic)
      .selectExpr("source_a", "source_b", "n_merged", "n_both",
        "jaccard_kmv", "est_union", "est_intersect",
        "est_intersect / est_a as contain_a_in_b",
        "est_intersect / est_b as contain_b_in_a")
      .orderBy(col("source_a"), col("source_b"))
  }

  val qKmvSourceOverlapSql: String =
    s"""WITH d AS (
       |  SELECT source, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |d2 AS (SELECT source, ta FROM d WHERE len(ta) >= 2),
       |h AS (
       |  SELECT DISTINCT source,
       |         ${Portable.hDuck("ta[i - 1] || ' ' || ta[i]")} AS h
       |  FROM d2, UNNEST(range(2, len(ta) + 1)) AS u(i)),
       |r AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM h),
       |sk AS (
       |  SELECT source, list_sort(list(h ORDER BY h)) AS sk
       |  FROM r WHERE rn <= $KmvK GROUP BY source),
       |p AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |         a.sk AS sk_a, b.sk AS sk_b,
       |         list_slice(list_sort(list_distinct(list_concat(a.sk, b.sk))),
       |                    1, $KmvK) AS merged
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |m AS (
       |  SELECT source_a, source_b,
       |         CAST(len(merged) AS BIGINT) AS n_merged,
       |         CAST(len(list_intersect(list_intersect(merged, sk_a), sk_b))
       |              AS BIGINT) AS n_both,
       |         CASE WHEN len(merged) < $KmvK THEN CAST(len(merged) AS DOUBLE)
       |              ELSE ${KmvK - 1}.0 * $TwoPow60 / CAST(merged[$KmvK] AS DOUBLE) END
       |           AS est_union,
       |         CASE WHEN len(sk_a) < $KmvK THEN CAST(len(sk_a) AS DOUBLE)
       |              ELSE ${KmvK - 1}.0 * $TwoPow60 / CAST(sk_a[$KmvK] AS DOUBLE) END
       |           AS est_a,
       |         CASE WHEN len(sk_b) < $KmvK THEN CAST(len(sk_b) AS DOUBLE)
       |              ELSE ${KmvK - 1}.0 * $TwoPow60 / CAST(sk_b[$KmvK] AS DOUBLE) END
       |           AS est_b
       |  FROM p),
       |m2 AS (
       |  SELECT source_a, source_b, n_merged, n_both,
       |         CAST(n_both AS DOUBLE) / n_merged AS jaccard_kmv,
       |         est_union,
       |         (CAST(n_both AS DOUBLE) / n_merged) * est_union AS est_intersect,
       |         est_a, est_b
       |  FROM m)
       |SELECT source_a, source_b, n_merged, n_both,
       |       jaccard_kmv, est_union, est_intersect,
       |       est_intersect / est_a AS contain_a_in_b,
       |       est_intersect / est_b AS contain_b_in_a
       |FROM m2
       |ORDER BY source_a, source_b""".stripMargin

  /** CMS grid: 4 rows × 8192 counters ≈ 256 KB of state — fixed at any
    * corpus size. Error bound: est − exact ≤ e·N/width with probability
    * 1 − e^−depth (standard CMS), N = total occurrences. */
  val CmsDepth = 4
  val CmsWidth = 8192
  private def cmsA: Array[Long] =
    (0 until CmsDepth).map(r => Portable.h(s"cmsa$r") % (Dedup.P - 1) + 1).toArray
  private def cmsB: Array[Long] =
    (0 until CmsDepth).map(r => Portable.h(s"cmsb$r") % Dedup.P).toArray

  /** Watchlist term counts through a count-min sketch
    * ([[graft.functions.CmsSketchAgg]]), demoed against the exact
    * counts of the corpus's top-20 tokens: output is (token, exact,
    * estimate) — the estimate can only overcount, and the gate pins
    * both columns, so any drift between the native grid and the
    * oracle's SQL-rebuilt grid fails loudly.
    *
    * Why this exists at 100 TB: "how often do these K watchlist terms
    * appear" must not pay a vocabulary-scale aggregation (billions of
    * distinct tokens shuffle for a K-row answer). The sketch's state
    * is a FIXED 256 KB grid whose partials merge by elementwise sum —
    * commutative and associative, so the answer is bit-deterministic
    * under any partitioning or retry order — and the shuffle carries
    * one grid per mapper, bounded by parallelism, never by data. The
    * exact half of this demo is the gate's ground truth; a production
    * watchlist query runs ONLY the sketch side (one scan, zero
    * vocabulary shuffle). */
  def qCmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(s, dir)
      .selectExpr("token", s"${Portable.hSpark("token")} as h")
    val sketch = toks.agg(
      graft.functions.CmsSketch.of(CmsDepth, CmsWidth, cmsA, cmsB, Dedup.P)(col("h"))
        .as("sk"))
    // exact top-20 (h rides along: constant per token, so max == the value)
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_exact"), max(col("h")).as("h"))
      .orderBy(col("n_exact").desc, col("token")).limit(20)
    val est = (0 until CmsDepth).map { r =>
      s"element_at(sk, cast(${r * CmsWidth} + ((${cmsA(r)}L * (h % ${Dedup.P}L) + ${cmsB(r)}L) % ${Dedup.P}L) % $CmsWidth as int) + 1)"
    }.mkString("least(", ", ", ")")
    top.crossJoin(broadcast(sketch))
      .selectExpr("token", "n_exact", s"$est as n_est")
      .orderBy(col("n_exact").desc, col("token"))
  }

  val qCmsHeavyHittersSql: String = {
    val consts = (0 until CmsDepth)
      .map(r => s"($r, ${cmsA(r)}, ${cmsB(r)})").mkString(", ")
    s"""WITH toks AS (
       |  SELECT token, ${Portable.hDuck("token")} AS h
       |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE len(token) > 0),
       |c(r, a, b) AS (VALUES $consts),
       |grid AS (
       |  SELECT c.r AS r, ((c.a * (t.h % ${Dedup.P}) + c.b) % ${Dedup.P}) % $CmsWidth AS bkt,
       |         COUNT(*) AS cnt
       |  FROM toks t CROSS JOIN c
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT token, COUNT(*) AS n_exact, MAX(h) AS h
       |  FROM toks GROUP BY token
       |  ORDER BY n_exact DESC, token LIMIT 20)
       |SELECT t.token, t.n_exact, MIN(g.cnt) AS n_est
       |FROM top t
       |CROSS JOIN c
       |JOIN grid g
       |  ON g.r = c.r AND g.bkt = ((c.a * (t.h % ${Dedup.P}) + c.b) % ${Dedup.P}) % $CmsWidth
       |GROUP BY t.token, t.n_exact
       |ORDER BY t.n_exact DESC, t.token""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cms_heavy_hitters" -> (qCmsHeavyHitters _),
    "q_kmv_distinct" -> (qKmvDistinct _),
    "q_kmv_source_overlap" -> (qKmvSourceOverlap _),
    "q_source_token_drift" -> (qSourceTokenDrift _),
    "q_dsir_importance" -> (qDsirImportance _),
    "q_vocab_topk" -> (qVocabTopk _),
    "q_tfidf_keywords" -> (qTfidfKeywords _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_source_overlap_minhash" -> (qSourceOverlapMinhash _),
    "q_emb_centroids" -> (qEmbCentroids _),
    "q_token_rarity" -> (qTokenRarity _),
    "q_lm_bigram_surprisal" -> (qLmBigramSurprisal _),
    "q_lm_trigram_backoff" -> (qLmTrigramBackoff _),
    "q_lm_ppl_band" -> (qLmPplBand _))

  val oracleSql: Map[String, String] = Map(
    "q_cms_heavy_hitters" -> qCmsHeavyHittersSql,
    "q_kmv_distinct" -> qKmvDistinctSql,
    "q_kmv_source_overlap" -> qKmvSourceOverlapSql,
    "q_source_token_drift" -> qSourceTokenDriftSql,
    "q_dsir_importance" -> qDsirImportanceSql,
    "q_vocab_topk" -> qVocabTopkSql,
    "q_tfidf_keywords" -> qTfidfKeywordsSql,
    "q_source_overlap" -> qSourceOverlapSql,
    "q_source_overlap_minhash" -> qSourceOverlapMinhashSql,
    "q_emb_centroids" -> qEmbCentroidsSql,
    "q_token_rarity" -> qTokenRaritySql,
    "q_lm_bigram_surprisal" -> qLmBigramSurprisalSql,
    "q_lm_trigram_backoff" -> qLmTrigramBackoffSql,
    "q_lm_ppl_band" -> qLmPplBandSql)
}
