package graft.llm

import graft.Tables.load
import graft.llm.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, min, substring}

/** Deduplication operators over the `documents` table: exact
  * (hash-groupBy), MinHash+LSH near-dup (shingle → signature → band →
  * bucket-join → within-bucket Jaccard verify), and SimHash signatures.
  *
  * Scale design (the whole point — 100 TB corpora):
  *  - NOTHING is all-pairs. Candidate generation is an equi-join on
  *    (band, band_key): only documents sharing an LSH bucket ever meet,
  *    so the shuffle is keyed and the join output is proportional to
  *    true near-dup density, not n².
  *  - HOT BUCKETS ARE CAPPED: boilerplate/templated text puts thousands
  *    of documents into one band bucket, turning the bucket self-join
  *    quadratic in one task. Buckets above [[MaxBucket]] occupancy are
  *    dropped before pairing (they carry near-zero dedup signal and
  *    unbounded cost); the cap is an occupancy count + semi-join, both
  *    keyed aggregations.
  *  - Signature pipelines are explode → codegen'd hash aggregates (md5
  *    ONCE per token/shingle, MinHash family derived by universal
  *    hashing (a_i·x + b_i) mod P), not nested interpreted lambdas.
  *  - The exact-Jaccard verify joins shingle sets back by id — two
  *    keyed shuffles, each O(candidates).
  *
  * Test corpora derive duplicates deterministically FROM the driver's
  * own documents table (exact copies of doc_id ≡ 0 (mod 10); truncated
  * near-copies of doc_id ≡ 0 (mod 7)) so dedup has real work to do and
  * the DuckDB oracle replays the identical derivation.
  *
  * Every pseudo-random hash is the portable md5-based [[Portable]] hash,
  * so MinHash signatures, band keys, and SimHash bits agree bit-for-bit
  * with the DuckDB oracle.
  */
object Dedup {

  private val NUM_HASHES = 8 // MinHash signature length
  private val NUM_BANDS = 4 // LSH bands (2 rows per band)

  /** Rounds the last [[connectedComponents]] run took — observability
    * for the O(log n) convergence contract (spec'd in DedupSpec). */
  @volatile var lastCcRounds: Int = 0

  // Spark-side shared snippets.
  private val toksS = "split(lower(text), ' ')"

  // DuckDB-side twins (the oracle keeps the list-valued derivation —
  // DuckDB's list HOFs are vectorized and the values are identical to
  // the relational shingle-row pipeline on the Spark side).
  private[llm] val shingleD: String =
    """list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
      |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))""".stripMargin

  /** DuckDB oracle twin of [[bandsOf]] as a reusable TAGGED CTE chain
    * `sh{tag} → hx{tag} → mh{tag} → band{tag}` over an `(id, toks)`
    * CTE named `src` — one emitter shared by the MinHash-LSH oracle
    * and the incremental-dedup oracle, so the SQL twins can never
    * drift from each other (the Spark side already shares
    * bandsOf/bandsOfSig the same way). */
  private[llm] def sigBandSqlCtes(src: String, tag: String): String = {
    val minCols = (0 until NUM_HASHES).map(i =>
      s"MIN((${aCoef(i)} * x + ${bCoef(i)}) % $P) AS m$i")
      .mkString(",\n             ")
    val mhList = (0 until NUM_HASHES).map("m" + _).mkString("[", ",", "]")
    s"""sh$tag AS (SELECT id, $shingleD AS sh FROM $src),
       |hx$tag AS (SELECT id, ${hDuck("s")} % $P AS x
       |       FROM (SELECT id, unnest(sh) AS s FROM sh$tag)),
       |mh$tag AS (SELECT id, $minCols
       |        FROM hx$tag GROUP BY id),
       |band$tag AS (
       |  SELECT id, b, ($mhList)[2*b+1]::VARCHAR || ',' || ($mhList)[2*b+2]::VARCHAR AS k
       |  FROM mh$tag CROSS JOIN (SELECT unnest(range(0, $NUM_BANDS)) AS b) bs)""".stripMargin
  }

  // ------------------------------------------------------------- exact
  /** Exact dedup: group by content hash, keep the smallest id per group.
    * Corpus = documents ∪ exact copies of every 10th doc. Output is the
    * surviving (kept) id per content group with its multiplicity —
    * i.e. the dedup result, not just a count.
    */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents").selectExpr("doc_id as id", "text")
    val copies = base.filter("id % 10 = 0").selectExpr("id + 1000000 as id", "text")
    base.unionAll(copies)
      .selectExpr("id", s"${hSpark("lower(text)")} as content_key")
      .groupBy("content_key")
      .agg(min(col("id")).as("kept_id"), count(expr("*")).as("n_copies"))
      .select("kept_id", "n_copies")
      .orderBy("kept_id")
  }

  val qDedupExactSql: String =
    s"""WITH base AS (SELECT doc_id AS id, text FROM documents),
       |corpus AS (
       |  SELECT id, text FROM base
       |  UNION ALL
       |  SELECT id + 1000000, text FROM base WHERE id % 10 = 0),
       |keyed AS (SELECT id, ${hDuck("lower(text)")} AS content_key FROM corpus)
       |SELECT MIN(id) AS kept_id, COUNT(*) AS n_copies
       |FROM keyed GROUP BY content_key
       |ORDER BY kept_id""".stripMargin

  // ----------------------------------------------------- MinHash + LSH
  /** Near-dup detection: MinHash signatures (8 portable hash functions
    * over distinct word-3-gram shingles), 4 LSH bands of 2 rows each,
    * candidate pairs via bucket equi-join, exact Jaccard verify on the
    * shingle sets, threshold 0.5.
    *
    * Corpus = documents ∪ near-copies (every 7th doc with its last 4
    * tokens dropped), so true near-dups exist at every scale factor.
    */
  // Universal-hash MinHash family: h_i(s) = (a_i·(H(s) mod P) + b_i)
  // mod P over prime P < 2^30 (products stay < 2^60, inside bigint).
  // ONE md5 per shingle instead of NUM_HASHES; a_i/b_i derive from the
  // same portable hash on the driver and are inlined as literals.
  private[llm] val P = 1073741789L
  private def aCoef(i: Int): Long = Portable.h(s"mina$i") % (P - 1) + 1
  private def bCoef(i: Int): Long = Portable.h(s"minb$i") % P

  private[llm] def aCoefs: Array[Long] = (0 until NUM_HASHES).map(aCoef).toArray
  private[llm] def bCoefs: Array[Long] = (0 until NUM_HASHES).map(bCoef).toArray

  /** (id, toks) docs → (id, b, k): MinHash signature → one (band,
    * band-key) row per band. Exact duplicates (same shingle set) share
    * the key in ALL bands; the invariant is pinned in DedupSpec. The
    * signature is ONE codegen'd pass per document
    * ([[graft.functions.MinhashSig]]: shingle → md5 → k running mins —
    * no shingle rows, no window, no wide aggregate); the explode child
    * is a 4-struct array over the materialized signature column (cheap
    * to re-evaluate). Docs with no 3-grams drop out (null signature). */
  private[llm] def bandsOf(docs: DataFrame): DataFrame =
    bandsOfSig(docs.select(col("id"), graft.functions.TextHashExprs.minhashSig(
      col("toks"), aCoefs, bCoefs, P).as("mh")))

  /** Band rows from an ALREADY-COMPUTED signature frame `(id, mh)` —
    * the entry point for materialized-signature pipelines
    * ([[DedupPipeline]]): bands are pure arithmetic over the stored
    * signature, so deriving them never touches document text. */
  private[llm] def bandsOfSig(sig: DataFrame): DataFrame =
    sig
      .filter(col("mh").isNotNull)
      .selectExpr(
        "id",
        s"""explode(${(0 until NUM_BANDS).map(b =>
             s"named_struct('b', $b, 'k', concat(cast(element_at(mh, ${2 * b + 1}) as string), ',', cast(element_at(mh, ${2 * b + 2}) as string)))")
             .mkString("array(", ", ", ")")}) as band""")
      .selectExpr("id", "band.b as b", "band.k as k")

  private[llm] val NumBands: Int = NUM_BANDS
  private[llm] val NumHashes: Int = NUM_HASHES
  /** Id offset for corpus-derived near-copy variants (the MinHash
    * fixture derivation: every 7th doc, truncated). ONE constant shared
    * by the derivation, the keep-best inverse mapping, its reserved-id
    * guard, the DuckDB oracle SQL, and the scale-rehearsal derivation
    * guard ([[graft.ScalingRehearsal]]) — the ranges can never drift
    * apart. Ids at or above this value are RESERVED for variants. */
  private[graft] val VariantIdOffset = 2000000L
  /** Hot-bucket occupancy cap (What's-wrong r2 #5): buckets holding
    * more rows than this are dropped before the pair join. */
  private[llm] val MaxBucket = 100

  /** THE hot-bucket cap: drop every row of a `(…, b, k)` bucket whose
    * occupancy exceeds `maxBucket` — one fused capped-collect
    * aggregate, then re-explode to the input shape. Replaces the
    * earlier `count(*) over (partition by b, k)` form, which funneled
    * every row of a hot bucket into one buffering window task before
    * the count existed to drop it — at corpus scale a billion-row
    * boilerplate bucket became one spilling task. Here a hot bucket
    * ships at most (cap+1)×mappers payloads through the shuffle and
    * dies in the hash aggregate ([[graft.functions.CappedCollectAgg]],
    * ≤ cap+1 values of state per bucket per mapper; the single-long
    * payload case — every dedup call site — takes the primitive
    * [[graft.functions.CappedCollectLongsAgg]]) — ONE pass over the
    * input, NO sort at any scale. The count-prefilter + keep-join
    * alternative was measured and rejected (SCALING.md "Why fused,
    * with numbers"): its keep side is "all cold bucket keys", which
    * grows with the corpus — unbroadcastable beyond toy scale — and
    * the join shuffles the input a second time. Count+join remains
    * correct ONLY where the keep side is bounded by definition — the
    * benchmark eval set in [[Decontaminate.qDecontaminate]]. Shared by
    * [[candidatePairs]], [[IncrementalDedup.compactIndex]], and
    * [[CorpusStats.qSourceOverlapMinhash]] so the cap's semantics can
    * never drift between the dedup paths. */
  private[llm] def capHotBuckets(rows: DataFrame, maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.functions.{explode, size => asize, struct}
    import org.apache.spark.sql.types.LongType
    val payload = rows.columns.toSeq.filterNot(n => n == "b" || n == "k")
    // single-long payloads (the (id, b, k) band/index shape — every
    // dedup call site today) take the primitive-state aggregate; the
    // struct form stays for any future multi-column payload
    val singleLong = payload.size == 1 &&
      rows.schema(payload.head).dataType == LongType
    if (singleLong) {
      rows.groupBy("b", "k")
        .agg(graft.functions.CappedCollect.longs(maxBucket)(
          col(payload.head)).as("rws"))
        .filter(asize(col("rws")) <= maxBucket)
        .select(col("b"), col("k"), explode(col("rws")).as(payload.head))
        .select(rows.columns.toSeq.map(col): _*)
    } else {
      rows.groupBy("b", "k")
        .agg(graft.functions.CappedCollect.of(maxBucket)(
          struct(payload.map(col): _*)).as("rws"))
        .filter(asize(col("rws")) <= maxBucket)
        .select(col("b"), col("k"), explode(col("rws")).as("r"))
        .select(rows.columns.toSeq.map {
          case n @ ("b" | "k") => col(n)
          case n               => col(s"r.$n").as(n)
        }: _*)
    }
  }

  /** Candidate pairs from banded LSH with the hot-bucket cap applied:
    * (id_a < id_b, n_shared_bands).
    *
    * Single pass over the bands — no self-join, no window: ONE
    * capped-collect hash aggregate on the bucket key gathers each
    * bucket's posting list with state ≤ cap+1 ids per mapper
    * ([[graft.functions.CappedCollect.longs]]); lists at cap+1 are the
    * over-cap sentinel (hot boilerplate bucket, dropped wholesale —
    * the flood never funnels into one task), surviving lists
    * (2 ≤ size ≤ cap) expand to in-list pairs via a codegen'd
    * combination transform and re-aggregate by pair. Every stage is
    * keyed; per-bucket cost is ≤ cap²/2 by construction. */
  private[llm] def candidatePairs(docs: DataFrame, maxBucket: Int): DataFrame =
    candidatePairsFromBands(bandsOf(docs), maxBucket)

  // In-list pair expansion is the native
  // [[graft.functions.SortedPairExpand]] (one primitive loop inside
  // codegen). Its predecessor — a nested transform/flatten SQL form —
  // ran INTERPRETED (Spark higher-order functions are CodegenFallback)
  // and cost ~2× the expansion's work in lambda contexts and per-pair
  // named_struct eval. The totality contract it carried (n ≤ 1 →
  // empty, because InferFiltersFromGenerate evaluates the expansion
  // before the size-guard conjunct can short-circuit) moved to the
  // native expression and stays pinned in PairExpansionSpec.

  /** [[candidatePairs]] over pre-derived band rows `(id, b, k)` — lets
    * materialized-signature pipelines reuse the exact single-exchange
    * cap+pair shape without re-signaturing. */
  private[llm] def candidatePairsFromBands(bands: DataFrame, maxBucket: Int): DataFrame = {
    bands.groupBy("b", "k")
      .agg(graft.functions.CappedCollect.longs(maxBucket)(col("id")).as("raw"))
      .filter(expr(s"size(raw) between 2 and $maxBucket"))
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextHashExprs.sortedPairExpand(col("raw"))).as("p"))
      .selectExpr("p.a as id_a", "p.b as id_b")
      .groupBy("id_a", "id_b")
      .agg(count(expr("*")).as("n_shared_bands"))
  }

  def qDedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents").selectExpr("doc_id as id", s"$toksS as toks")
    val variants = base.filter("id % 7 = 0")
      .selectExpr(s"id + $VariantIdOffset as id",
        "slice(toks, 1, greatest(size(toks) - 4, 0)) as toks")
    // the tokenized corpus is a CACHED LEAF (r19; the qDedupNgramJaccard
    // hash-frame construct): three consumers — the signature pass and
    // BOTH verify joins — otherwise each re-scan the parquet and re-run
    // split(lower(text)), so the corpus was tokenized three times per
    // query (and this query is the core under the clusters / report /
    // keep-best / split-leakfree family, which pays it too). Ownership:
    // the returned frame owns the blocks; ContextCleaner reclaims them
    // when the consumer drops the frame. MEMORY_AND_DISK spills at
    // corpus scale, same as the ngram/dup-spans leaves.
    val (corpus, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      base.unionAll(variants))
    verifiedLshPairs(corpus).orderBy("id_a", "id_b")
  }

  /** The banded-LSH candidate + exact-Jaccard verify core over a
    * (cached-leaf) `(id, toks, …)` corpus — extracted (r20) so
    * [[qDedupKeepBest]] can run it over a WIDER shared leaf (toks +
    * text) and pay one corpus scan for both the LSH core and the
    * quality pass; extra columns are inert (bandsOf and the verify
    * joins project id/toks explicitly). */
  private[llm] def verifiedLshPairs(corpus: DataFrame): DataFrame = {
    val pairs = candidatePairs(corpus, MaxBucket)
    // exact-Jaccard verify: join the candidate pair back to the two
    // token arrays (keyed joins, O(candidates)) and compute
    // (|A∩B|, |A|, |B|) in one codegen'd pass per pair — the shingle
    // sets never materialize as rows
    pairs
      .join(corpus.selectExpr("id as id_a", "toks as toks_a"), "id_a")
      .join(corpus.selectExpr("id as id_b", "toks as toks_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared_bands"),
        graft.functions.TextHashExprs.shingleStats(col("toks_a"), col("toks_b")).as("st"))
      .selectExpr(
        "id_a", "id_b", "n_shared_bands",
        "cast(st.inter as double) / (st.na + st.nb - st.inter) as jaccard")
      .filter("jaccard >= 0.5")
  }

  val qDedupMinhashLshSql: String =
    s"""WITH base AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS toks FROM documents),
       |corpus AS (
       |  SELECT id, toks FROM base
       |  UNION ALL
       |  SELECT id + $VariantIdOffset, toks[1:greatest(len(toks) - 4, 0)] FROM base WHERE id % 7 = 0),
       |${sigBandSqlCtes("corpus", "")},
       |cold AS (SELECT b, k FROM band GROUP BY b, k HAVING COUNT(*) <= $MaxBucket),
       |kept AS (SELECT band.* FROM band JOIN cold USING (b, k)),
       |pairs AS (
       |  SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_shared_bands
       |  FROM kept x JOIN kept y ON x.b = y.b AND x.k = y.k AND x.id < y.id
       |  GROUP BY x.id, y.id),
       |verified AS (
       |  SELECT p.id_a, p.id_b, p.n_shared_bands,
       |         len(list_filter(a.sh, q -> list_contains(b.sh, q))) AS inter,
       |         len(a.sh) + len(b.sh) AS tot
       |  FROM pairs p JOIN sh a ON p.id_a = a.id JOIN sh b ON p.id_b = b.id)
       |SELECT id_a, id_b, n_shared_bands,
       |       CAST(inter AS DOUBLE) / (tot - inter) AS jaccard
       |FROM verified
       |WHERE CAST(inter AS DOUBLE) / (tot - inter) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  // ----------------------------------------------------------- SimHash
  /** 60-bit SimHash signature per document from distinct unigram token
    * hashes: bit j is set iff the sum over tokens of ±1 (sign of bit j
    * of the token hash) is positive. Near-dups differ in few bits; a
    * banded hamming join on signature chunks is the scale path (the
    * banding reuses the LSH machinery above).
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    // bit j set ⇔ Σ_tokens(2·bit_j(h)−1) > 0 ⇔ 2·Σ bit_j(h) > n_tokens,
    // over DISTINCT tokens — one codegen'd pass per document
    // ([[graft.functions.SimHash60]]), no explode/distinct/wide-agg
    // shuffles in the data plane.
    load(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextHashExprs.simHash60(
          org.apache.spark.sql.functions.expr(toksS)).as("simhash"))
      .orderBy("doc_id")

  val qDedupSimhashSql: String =
    s"""WITH d AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks FROM documents),
       |h AS (SELECT doc_id, list_transform(toks, t -> ${hDuck("t")}) AS hs FROM d)
       |SELECT doc_id,
       |       CAST(list_sum(list_transform(range(0, 60),
       |         j -> CASE WHEN list_sum(list_transform(hs, h -> 2 * ((h >> j) & 1) - 1)) > 0
       |                   THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
       |FROM h
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- n-gram Jaccard
  /** Document frequency cap for the inverted-index candidate generator:
    * shingles appearing in more documents than this are boilerplate —
    * near-zero dedup signal, unbounded (df²) pair fanout — and generate
    * no candidates (the prefix-filtering insight). */
  private[llm] val DfCap = 50
  /** Candidate gate: a pair must share at least this many RARE shingles
    * before the exact verify — one shared shingle is overwhelmingly
    * coincidence on templated text and would make the verify join the
    * bottleneck (measured at sf0.1: 1.3M one-shingle pairs vs ~10⁵ real
    * candidates). Pairs of tiny docs (≤1 shingle) are out of near-dup
    * scope by definition of this operator. */
  private[llm] val MinSharedShingles = 2

  /** Near-dup detection by DIRECT n-gram Jaccard (no sketching — the
    * exact counterpart to MinHash+LSH): distinct word-3-gram shingles
    * per doc, candidate pairs from a df-capped inverted index (only
    * documents sharing a RARE shingle ever meet), exact Jaccard verify
    * at ≥ 0.6. Corpus = documents ∪ near-copies (every 11th doc minus
    * its last 2 tokens).
    *
    * Scale: per-shingle pair fanout is bounded by df ≤ [[DfCap]]; every
    * stage is a keyed join/aggregation, nothing all-pairs. The shingle
    * index keys are 60-bit portable HASHES computed by ONE codegen'd
    * pass per document ([[graft.functions.ShingleHashes]]) — no window
    * n-gram assembly, no string shuffle keys; the explode child is the
    * materialized hash-array column (cheap to re-evaluate). */
  def qDedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.explode
    val base = load(s, dir, "documents").selectExpr("doc_id as id", s"$toksS as toks")
    val variants = base.filter("id % 11 = 0")
      .selectExpr("id + 3000000 as id", "slice(toks, 1, greatest(size(toks) - 2, 0)) as toks")
    val corpus = base.unionAll(variants)

    // (id, shingle-hash) rows — hashes are distinct per doc already.
    // ONE capped-collect hash aggregate on the shingle key serves
    // df-capping AND posting-list collection (the capHotBuckets /
    // candidatePairsFromBands shape): boilerplate shingles cap at
    // DfCap+1 ids of state per mapper and die in the aggregate, rare
    // lists (2 ≤ df ≤ DfCap) expand to in-list pairs, and the pair
    // re-aggregation applies the shared-shingle gate. The shingle
    // stream crosses the shuffle ONCE with map-side-capped payloads —
    // the count-prefilter + keep-join alternatives shuffle it twice
    // or lean on broadcasting a keep side that grows with the corpus;
    // the measured three-way comparison (1× and 10×) and the
    // shuffle-volume argument live in SCALING.md ("Why fused, with
    // numbers").
    // the hash table is a CACHED LEAF (same construct as the CC
    // rounds): the candidate-index explode AND the two verify joins all
    // consume it, so the corpus is tokenized+hashed ONCE instead of
    // three times — and as a leaf, each explode/join child is a plain
    // stored attribute, which also kills the CollapseProject trap
    // (folding the hash expression INTO a Generate child re-evaluates
    // it per OUTPUT row). Cache ownership: the returned frame owns the
    // blocks; the ContextCleaner reclaims them when the consumer drops
    // the frame (lineage stays intact for lost-executor recompute).
    val (hashed, _) = org.apache.spark.sql.GraftShims.cachedLeaf(corpus
      .select(col("id"), graft.functions.TextHashExprs.shingleHashes(col("toks")).as("shs")))
    // exact-Jaccard verify on the HASH sets (no re-hashing per pair —
    // array_intersect over longs; 60-bit hashes make collisions
    // negligible, so values equal the string-set Jaccard the oracle
    // computes)
    verifiedPairSets(hashed)
      .selectExpr("id_a", "id_b",
        "cast(inter as double) / (tot - inter) as jaccard")
      .filter("jaccard >= 0.6")
      .orderBy("id_a", "id_b")
  }

  /** The fused rare-shingle candidate core + set-overlap verify, shared
    * by the Jaccard and containment near-dup queries: from a cached
    * `(id, shs)` hash frame, candidate pairs via ONE capped-collect
    * aggregate on the shingle key (df-cap + posting list in one
    * exchange), the [[MinSharedShingles]] gate, then both hash sets
    * joined back by id. Returns `(id_a, id_b, shs_a, shs_b, inter,
    * tot)` — each caller derives its own overlap metric (Jaccard:
    * inter/(tot−inter); containment: inter/|side|) so the candidate
    * machinery can never drift between the metrics. */
  private def verifiedPairSets(hashed: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.explode
    val shingles = hashed
      .select(col("id"), explode(col("shs")).as("sh"))
    // the posting-list rows feeding the pair EXPANSION are re-spread
    // to the session's full shuffle width with an explicit count (an
    // explicit repartition count opts this one exchange out of AQE
    // coalescing): the lists are tiny in BYTES — df-capped, collapsed,
    // vocabulary-scale — so byte-targeted coalescing funnels them into
    // 1-4 partitions, and then the ~C(df,2)-per-list pair expansion
    // plus the pair partial-aggregation (the measured r12 bottleneck)
    // run nearly serial. Bytes are the wrong proxy for a stage whose
    // cost is its expansion factor. Hash on the shingle key (rare keys
    // are many, so the spread is even) — round-robin would pay the
    // determinism sort. Cost: one extra exchange of the CAPPED lists,
    // proportional to the candidate index, never the corpus. Measured
    // at sf0.1/32 cores: q_dedup_ngram_jaccard 2.9 → 1.8 s median.
    val pairs = shingles.groupBy("sh")
      .agg(graft.functions.CappedCollect.longs(DfCap)(col("id")).as("raw"))
      .filter(expr(s"size(raw) between 2 and $DfCap"))
      .repartition(org.apache.spark.sql.GraftShims
        .numShufflePartitions(hashed.sparkSession), col("sh"))
      .select(explode(
        graft.functions.TextHashExprs.sortedPairExpand(col("raw"))).as("p"))
      .selectExpr("p.a as id_a", "p.b as id_b")
      .groupBy("id_a", "id_b")
      .agg(count(expr("*")).as("n_shared"))
      .filter(col("n_shared") >= MinSharedShingles)
      .select("id_a", "id_b")
    pairs
      .join(hashed.selectExpr("id as id_a", "shs as shs_a"), "id_a")
      .join(hashed.selectExpr("id as id_b", "shs as shs_b"), "id_b")
      .selectExpr("id_a", "id_b", "shs_a", "shs_b",
        "size(array_intersect(shs_a, shs_b)) as inter",
        "size(shs_a) + size(shs_b) as tot")
  }

  val qDedupNgramJaccardSql: String =
    s"""WITH base AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS toks FROM documents),
       |corpus AS (
       |  SELECT id, toks FROM base
       |  UNION ALL
       |  SELECT id + 3000000, toks[1:greatest(len(toks) - 2, 0)] FROM base WHERE id % 11 = 0),
       |sh AS (SELECT id, $shingleD AS sh FROM corpus),
       |shrows AS (SELECT id, unnest(sh) AS s FROM sh),
       |rare AS (SELECT s FROM shrows GROUP BY s HAVING COUNT(*) BETWEEN 2 AND $DfCap),
       |cand AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM (SELECT * FROM shrows JOIN rare USING (s)) a
       |  JOIN (SELECT * FROM shrows JOIN rare USING (s)) b
       |    ON a.s = b.s AND a.id < b.id
       |  GROUP BY a.id, b.id HAVING COUNT(*) >= $MinSharedShingles),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |         len(list_filter(x.sh, q -> list_contains(y.sh, q))) AS inter,
       |         len(x.sh) + len(y.sh) AS tot
       |  FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id)
       |SELECT id_a, id_b, CAST(inter AS DOUBLE) / (tot - inter) AS jaccard
       |FROM verified
       |WHERE CAST(inter AS DOUBLE) / (tot - inter) >= 0.6
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------- containment (asymmetric)
  /** Containment threshold: a pair reports when either side's shingle
    * set is ≥ this fraction inside the other. */
  private[llm] val ContainThreshold = 0.8
  /** Id offset for the excerpt variants (first-half prefixes) the
    * containment fixture derives — above [[VariantIdOffset]]'s band and
    * the ngram fixture's 3000000 band so the three derivations can
    * never collide. */
  private[llm] val ExcerptIdOffset = 4000000L

  /** Asymmetric near-dup detection by n-gram CONTAINMENT — the overlap
    * metric Jaccard dedup is blind to: an excerpt (a quote, a lead
    * paragraph, a chunk re-crawled on its own) has containment ≈ 1.0 in
    * its source but Jaccard ≈ |excerpt|/|source| — half-length excerpts
    * sit at ~0.5, under every symmetric near-dup threshold, yet are
    * exactly the contained-duplication a curation pipeline must see
    * (training on source + excerpt double-weights the excerpt's text).
    * Corpus = documents ∪ first-half excerpts of every 13th doc; pairs
    * report when either side is ≥ [[ContainThreshold]] contained in the
    * other, with both directed containments and the Jaccard for
    * contrast.
    *
    * Scale: identical candidate discipline to [[qDedupNgramJaccard]] —
    * the shared [[verifiedPairSets]] core (ONE capped-collect exchange,
    * df-capped posting lists, shared-shingle gate, keyed verify joins);
    * the only new work is two integer divisions per verified pair. A
    * fully-contained excerpt shares ALL its shingles with its source,
    * so the rare-shingle candidate generator finds these pairs whenever
    * the excerpt carries any sub-[[DfCap]] shingle — the same
    * signal-not-boilerplate contract as the Jaccard query. */
  def qDedupContainment(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents").selectExpr("doc_id as id", s"$toksS as toks")
    val excerpts = base.filter("id % 13 = 0")
      .selectExpr(s"id + $ExcerptIdOffset as id",
        "slice(toks, 1, greatest(cast(floor(size(toks) / 2) as int), 3)) as toks")
    val corpus = base.unionAll(excerpts)
    val (hashed, _) = org.apache.spark.sql.GraftShims.cachedLeaf(corpus
      .select(col("id"), graft.functions.TextHashExprs.shingleHashes(col("toks")).as("shs")))
    verifiedPairSets(hashed)
      .selectExpr("id_a", "id_b",
        "cast(inter as double) / size(shs_a) as contain_a",
        "cast(inter as double) / size(shs_b) as contain_b",
        "cast(inter as double) / (tot - inter) as jaccard")
      .filter(s"greatest(contain_a, contain_b) >= $ContainThreshold")
      .orderBy("id_a", "id_b")
  }

  val qDedupContainmentSql: String =
    s"""WITH base AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS toks FROM documents),
       |corpus AS (
       |  SELECT id, toks FROM base
       |  UNION ALL
       |  SELECT id + $ExcerptIdOffset, toks[1:greatest(CAST(floor(len(toks) / 2) AS INT), 3)]
       |  FROM base WHERE id % 13 = 0),
       |sh AS (SELECT id, $shingleD AS sh FROM corpus),
       |shrows AS (SELECT id, unnest(sh) AS s FROM sh),
       |rare AS (SELECT s FROM shrows GROUP BY s HAVING COUNT(*) BETWEEN 2 AND $DfCap),
       |cand AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM (SELECT * FROM shrows JOIN rare USING (s)) a
       |  JOIN (SELECT * FROM shrows JOIN rare USING (s)) b
       |    ON a.s = b.s AND a.id < b.id
       |  GROUP BY a.id, b.id HAVING COUNT(*) >= $MinSharedShingles),
       |verified AS (
       |  SELECT c.id_a, c.id_b,
       |         len(list_filter(x.sh, q -> list_contains(y.sh, q))) AS inter,
       |         len(x.sh) AS n_a, len(y.sh) AS n_b
       |  FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id)
       |SELECT id_a, id_b,
       |       CAST(inter AS DOUBLE) / n_a AS contain_a,
       |       CAST(inter AS DOUBLE) / n_b AS contain_b,
       |       CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
       |FROM verified
       |WHERE greatest(CAST(inter AS DOUBLE) / n_a, CAST(inter AS DOUBLE) / n_b) >= $ContainThreshold
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------- clustering
  /** Connected components over an undirected pair graph `(id_a, id_b)`:
    * every node labeled with its component's MINIMUM id.
    *
    * Each round does min-label PROPAGATION (a node takes the least of
    * its own and its neighbors' labels — one keyed aggregation + one
    * keyed join) followed by a POINTER JUMP (`l(v) ← l(l(v))`, one more
    * keyed self-join): label chains halve every round, so convergence
    * is O(log longest-chain) rounds, not O(diameter) — a 1000-node
    * path converges in ~10 rounds where pure propagation needs 999
    * (pinned in DedupSpec). Nothing is ever all-pairs; each round's
    * labels are rebuilt as a LEAF DataFrame over the round's RDD
    * (persist alone caches DATA but leaves the logical plan growing —
    * the jump's self-reference would double plan size per round and
    * blow up plan rendering), and the ONLY action per round both
    * materializes the cache AND probes convergence of the round's
    * OUTPUT: an edge-consistency aggregate (`∃ edge whose endpoints
    * carry different labels`). Edge-constant labels are already the
    * component minima — a constant label c per component satisfies
    * `l(m) ≤ m` for the component minimum m (labels start at
    * `min(v, neighbors)` and only ever decrease) while c is itself a
    * node id of the component, forcing c = m — so the round that
    * PRODUCES stable labels also detects it, with no trailing confirm
    * round and no baseline: neither the init aggregation nor the edges
    * leaf gets a job of its own (round 1's single job computes edges,
    * init, propagation, and the probe together; clique-heavy LSH
    * graphs converge in ONE job where the r8 shape took three). `max`
    * over zero rows is SQL NULL: an empty pair graph converges
    * immediately instead of NPE-ing.
    *
    * CACHE OWNERSHIP: the result is the final round's persisted leaf,
    * already materialized by that round's probe. Each call's result is
    * independent (concurrent pipelines can't evict each other's
    * labels), storage is reclaimed by the ContextCleaner when the
    * consumer drops the frame, and RDD lineage stays intact — a lost
    * executor's blocks recompute instead of failing the job — so there
    * is no process-lifetime retention and no global slot. */
  private[llm] def connectedComponents(pairs: DataFrame): DataFrame = {
    // edges = a persisted LEAF over the symmetrized pair list. The cut
    // matters as much as the cache: with df.persist() alone every
    // round's plan embeds the full upstream pair pipeline and the
    // CacheManager structurally re-compares that tree at each planning
    // pass — measured ~0.5-0.9 s/round of pure DRIVER time against the
    // LSH pipeline. As a leaf, round planning is O(round plan). The
    // union's branches still share the upstream exchange inside the
    // one materializing job.
    val (edges, edgesRdd) = org.apache.spark.sql.GraftShims.cachedLeaf(
      pairs.toDF("src", "dst")
        .unionAll(pairs.toDF("dst", "src").select(col("src"), col("dst"))))
    // init = the FIRST propagation, fused into the materializing
    // aggregation: l0(v) = min(v, min neighbor) — one keyed agg, same
    // cost as a distinct-nodes init, one whole round cheaper. NOT
    // probed (or even materialized) by a job of its own: round 1's
    // single job computes the edges leaf, this aggregation, and the
    // round-1 propagation together (the persist just keeps later
    // rounds from recomputing it). A separate edges pre-warm job
    // would ADD a scheduling point, not remove one — the union's two
    // branches already share the upstream exchange inside that job.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(org.apache.spark.sql.functions.least(
        col("id"), org.apache.spark.sql.functions.min(col("dst"))).as("cluster"))
      .persist()
    var changed = true
    var rounds = 0
    // the previous round's leaf RDD cache — unpersisted EXPLICITLY once
    // superseded (Dataset.unpersist is a no-op for RDD-level caches, so
    // relying on it would retain every round's blocks until driver GC)
    var labelsRdd: org.apache.spark.rdd.RDD[_] = null
    val maxRounds = 64
    while (changed && rounds < maxRounds) {
      val nbr = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid"))
        .agg(org.apache.spark.sql.functions.min("cluster").as("nbmin"))
      // NOT persisted: the jump's self-join consumes prop twice, but
      // the recompute (keyed join+agg over cached labels/edges) was
      // MEASURED faster than paying a cache materialization per round
      // — and the shuffles feeding both sides are shared via exchange
      // reuse
      val prop = labels.join(nbr, labels("id") === nbr("nid"), "left")
        .select(labels("id"),
          org.apache.spark.sql.functions.least(
            labels("cluster"),
            org.apache.spark.sql.functions.coalesce(col("nbmin"), labels("cluster")))
            .as("cluster"))
      // pointer jump: follow the label one hop (labels are node ids, so
      // l(v) always has a row) — this is what makes rounds logarithmic.
      // Round 1 runs propagation ONLY: the fused init already gave
      // every node its distance-1 minimum, so the first jump can only
      // reach distance-2 labels — exactly what round-1 propagation
      // itself delivers on the near-clique graphs LSH emits (cliques
      // and 2-paths converge with no jump join ever executed). Chains
      // still get jumps from round 2, keeping convergence O(log n)
      // (the 1000-node-path bound is pinned in DedupSpec).
      val jumpPlan =
        if (rounds == 0) prop
        else {
          val jumped = prop.select(col("id").as("jid"), col("cluster").as("jcluster"))
          prop.join(jumped, col("cluster") === col("jid"), "left")
            .select(col("id"),
              org.apache.spark.sql.functions.least(
                col("cluster"),
                org.apache.spark.sql.functions.coalesce(col("jcluster"), col("cluster")))
                .as("cluster"))
        }
      // lineage CUT + cache in one construct: next is a persisted LEAF
      // over this round's InternalRow RDD (no external-Row round trip;
      // the probe below materializes the cache). NOT localCheckpoint —
      // that truncates RDD lineage, so one lost executor would kill the
      // whole job on a real cluster; the leaf keeps the logical plan
      // constant-size while lost blocks stay recomputable through the
      // RDD chain (upstream caches, then the pair pipeline).
      val (next, nextRdd) = org.apache.spark.sql.GraftShims.cachedLeaf(jumpPlan)
      // One job: materializes the round's cache AND probes convergence
      // of the round's OUTPUT — an edge-consistency check (∃ edge whose
      // endpoints carry different labels). Checking the output (not the
      // prop delta) saves the whole trailing confirm round: a round
      // that produces edge-constant labels has already converged (see
      // scaladoc), so clique-heavy LSH graphs finish in ONE round. The
      // two `next` scans shuffle on the same key over the same leaf, so
      // ReuseExchange computes the leaf once inside the job.
      val aEnd = next.select(col("id").as("aid"), col("cluster").as("acl"))
      val bEnd = next.select(col("id").as("bid"), col("cluster").as("bcl"))
      val v = edges.join(aEnd, col("src") === col("aid"))
        .join(bEnd, col("dst") === col("bid"))
        .agg(org.apache.spark.sql.functions.max(col("acl") =!= col("bcl")))
        .head().get(0)
      changed = v != null && v.asInstanceOf[Boolean]
      labels.unpersist(blocking = false) // round-0 init (DF-level cache)
      if (labelsRdd != null) labelsRdd.unpersist(blocking = false)
      labels = next
      labelsRdd = nextRdd
      rounds += 1
    }
    Dedup.lastCcRounds = rounds
    // pointer jumping makes >64 rounds ~impossible (2^64 chain); keep
    // the loud warning as a safety net rather than silent wrong labels
    if (changed) System.err.println(
      s"[graft-dedup] connected components did NOT converge in $maxRounds rounds; " +
        "labels may not be component minima")
    edgesRdd.unpersist(blocking = false)
    // CACHE OWNERSHIP: the returned frame owns the final round's RDD
    // cache — no global slot, concurrent calls are independent, and the
    // blocks are reclaimed by the ContextCleaner once the consumer
    // drops the frame (or recomputed through lineage if evicted first).
    labels
  }

  /** Near-duplicate CLUSTERS: components of the verified MinHash-LSH
    * pair graph, each member labeled with the component's minimum doc
    * id — the canonical-survivor assignment a dedup pipeline acts on
    * ("keep cluster == doc_id, drop the rest"). */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)
      .selectExpr("cluster", "id as doc_id")
      .orderBy("cluster", "doc_id")

  /** The `(id, cluster)` label table over the verified MinHash-LSH
    * pair graph — the common core [[qDedupClusters]] and
    * [[Sampling.qSplitLeakfree]] share (only CLUSTERED docs appear;
    * singletons are absent by construction). */
  private[llm] def clusterLabels(s: SparkSession, dir: String): DataFrame =
    connectedComponents(qDedupMinhashLsh(s, dir).select("id_a", "id_b"))

  /** Per-source DUPLICATION REPORT — the profiling view a curation run
    * starts from ("which sources are internally duplicated, and how
    * badly"): for each source, its corpus size, how many of its
    * documents sit in a near-dup cluster (derived variant ids map back
    * to their base doc), and the rate on an exact ppm grid (integer
    * division — no float in the gate).
    *
    * Scale: clusters come from the capped-LSH + log-rounds CC core;
    * the report itself is one distinct over O(clustered docs), a keyed
    * left join, and a per-source two-phase aggregate. */
  def qDedupReport(s: SparkSession, dir: String): DataFrame =
    reportFromLabels(s, dir, clusterLabels(s, dir))

  /** [[qDedupReport]]'s body over ANY `(id, cluster)` label frame —
    * the label source is the only difference between the
    * self-contained query (recomputes the LSH+CC core) and the
    * indexed twin ([[DedupPipeline.qDedupReportIndexed]], reads the
    * materialized signature leaf); one body means the report algebra
    * can never drift between them. */
  private[llm] def reportFromLabels(
      s: SparkSession, dir: String, labels: DataFrame): DataFrame = {
    val docs = load(s, dir, "documents").select(col("doc_id"), col("source"))
    val members = labels
      .selectExpr(
        s"if(id >= $VariantIdOffset, id - $VariantIdOffset, id) as doc_id")
      .distinct()
    // two aggregates meeting at O(sources): per-source totals are one
    // column-pruned scan, dup counts join only the O(clustered) member
    // ids against the corpus — the corpus never rides through a
    // corpus-wide outer join just to carry a 0/1 flag
    val totals = docs.groupBy("source")
      .agg(count(expr("*")).as("n_docs"))
    val dups = members.join(docs, "doc_id")
      .groupBy("source")
      .agg(count(expr("*")).as("n_dup_docs"))
    totals.join(dups, Seq("source"), "left")
      .selectExpr("source", "n_docs",
        "coalesce(n_dup_docs, 0L) as n_dup_docs",
        "(coalesce(n_dup_docs, 0L) * 1000000L) div n_docs as dup_rate_ppm")
      .orderBy("source")
  }

  val qDedupReportSql: String =
    s"""WITH RECURSIVE p AS (SELECT id_a, id_b FROM ($qDedupMinhashLshSql) mh),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |          UNION ALL SELECT id_b, id_a FROM p),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
       |allr AS (SELECT id, r FROM reach UNION SELECT src, src FROM edges),
       |mem AS (
       |  SELECT DISTINCT CASE WHEN id >= $VariantIdOffset
       |                       THEN id - $VariantIdOffset ELSE id END AS doc_id
       |  FROM allr),
       |j AS (
       |  SELECT d.source, d.doc_id,
       |         CASE WHEN m.doc_id IS NULL THEN 0 ELSE 1 END AS dup
       |  FROM documents d LEFT JOIN mem m ON d.doc_id = m.doc_id)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(dup) AS BIGINT) AS n_dup_docs,
       |       CAST((SUM(dup) * 1000000) // COUNT(*) AS BIGINT) AS dup_rate_ppm
       |FROM j GROUP BY source
       |ORDER BY source""".stripMargin

  val qDedupClustersSql: String =
    s"""WITH RECURSIVE p AS (SELECT id_a, id_b FROM ($qDedupMinhashLshSql) mh),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |          UNION ALL SELECT id_b, id_a FROM p),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
       |allr AS (SELECT id, r FROM reach UNION SELECT src, src FROM edges)
       |SELECT cl AS cluster, id AS doc_id
       |FROM (SELECT id, MIN(r) AS cl FROM allr GROUP BY id)
       |ORDER BY cluster, doc_id""".stripMargin

  /** Survivor selection over the near-dup clusters: instead of the
    * min-id convention ([[qDedupClusters]]), each cluster keeps its
    * HIGHEST-QUALITY member — the policy real pipelines want ("of the
    * N crawls of this page, keep the cleanest"), ties to the lowest
    * member id. A member's quality is its underlying document's
    * heuristic score ([[TextAnalysis.qualityScored]]); derived corpus
    * variants (id + [[VariantIdOffset]], the MinHash derivation) map
    * back with the derivation's own inverse (subtract the offset for
    * ids in the variant range). The convention RESERVES ids ≥ the
    * offset for variants, so the query fails loudly if the base corpus
    * itself crosses that line — a silent wrong-quality join may pick a
    * wrong survivor with no signal. The guard runs INSIDE the quality
    * pass (a short-circuit `raise_error` on the reserved range), so
    * keep-best launches exactly one Spark job chain — no eager
    * plan-build-time scan.
    *
    * Scale: clusters come from the log-rounds CC (never all-pairs),
    * quality is one narrow codegen'd pass, and the selection is a
    * keyed `max_by` aggregation — map-side combinable, O(members)
    * shuffle, O(1) state per cluster. */
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan for BOTH consumers (r20): the LSH core and the
    // quality pass used to scan the documents parquet independently
    // (and the quality pass re-tokenized every doc for its
    // n_tok/n_stop criteria). Here the shared cached leaf carries the
    // token arrays (LSH) AND the raw text (quality) — variants store a
    // null text and an is_base=false flag, so the quality side is the
    // exact base-corpus row set the old scan produced. Extra columns
    // are inert through the LSH core (bandsOf / the verify joins
    // project id/toks explicitly).
    // The reserved-id guard sits on the BASE rows feeding the leaf
    // (not on the quality projection): the leaf always materializes —
    // inside the CC job chain — so a colliding corpus raises on every
    // run, where a guard on the quality side could be skipped
    // entirely when runtime empty-relation propagation prunes the
    // survivor join (e.g. a corpus with no near-dup clusters).
    val base = load(s, dir, "documents")
      .selectExpr("doc_id as id", s"$toksS as toks", "text", "true as is_base")
      .where(expr(
        s"""id < $VariantIdOffset or raise_error(concat(
           |  'q_dedup_keep_best reserves doc ids >= $VariantIdOffset for derived variants; ',
           |  'base corpus doc_id ', cast(id as string),
           |  ' collides - remap the corpus or the offset')) is null""".stripMargin))
    val variants = base.filter("id % 7 = 0")
      .selectExpr(s"id + $VariantIdOffset as id",
        "slice(toks, 1, greatest(size(toks) - 4, 0)) as toks",
        "cast(null as string) as text", "false as is_base")
    val (corpus, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      base.unionAll(variants))
    val quality = TextAnalysis.scoreQualityWithToks(
        corpus.where(col("is_base")), Seq("id"))
      .selectExpr("id as qid", "quality")
    DedupPipeline.keepBestFromClusters(
      connectedComponents(verifiedLshPairs(corpus).select("id_a", "id_b")),
      quality)
  }

  /** Quality frame for survivor selection, with the reserved-id
    * invariant asserted IN the job: every base doc id must sit below
    * [[VariantIdOffset]], enforced by a short-circuiting `raise_error`
    * predicate evaluated per row (true rows pass untouched; a
    * violating row aborts the job with the remap message instead of
    * silently mis-joining a variant's quality). Used by the indexed
    * twin ([[DedupPipeline.qDedupKeepBestIndexed]]); the self-contained
    * [[qDedupKeepBest]] scores quality off its shared corpus leaf with
    * the same guard inlined. */
  private[llm] def keepBestQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScored(s, dir)
      .selectExpr("doc_id as qid", "quality")
      .where(expr(
        s"""qid < $VariantIdOffset or raise_error(concat(
           |  'q_dedup_keep_best reserves doc ids >= $VariantIdOffset for derived variants; ',
           |  'base corpus doc_id ', cast(qid as string),
           |  ' collides - remap the corpus or the offset')) is null""".stripMargin))

  val qDedupKeepBestSql: String =
    s"""WITH members AS (SELECT cluster, doc_id AS id FROM ($qDedupClustersSql) c),
       |qd AS (
       |  SELECT doc_id, source,
       |         len(string_split(lower(text), ' ')) AS n_tok,
       |         len(list_filter(string_split(lower(text), ' '),
       |             x -> x IN ('the','a','of','to','and','in','is','it','for','on'))) AS n_stop,
       |         length(text) AS n_char,
       |         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS n_clean,
       |         length(replace(text, ' ', '')) AS n_nospace
       |  FROM documents),
       |qual AS (
       |  SELECT doc_id,
       |         CAST(n_tok BETWEEN 20 AND 1000 AS INT) * 0.25
       |       + CAST((CAST(n_stop AS DOUBLE) / n_tok) BETWEEN 0.01 AND 0.5 AS INT) * 0.25
       |       + CAST((CAST(n_nospace AS DOUBLE) / n_tok) BETWEEN 3.0 AND 10.0 AS INT) * 0.25
       |       + CAST((CAST(n_char - n_clean AS DOUBLE) / n_char) <= 0.2 AS INT) * 0.25
       |         AS quality
       |  FROM qd),
       |scored AS (
       |  SELECT m.cluster, m.id, CAST(q.quality AS DOUBLE) AS quality,
       |         ROW_NUMBER() OVER (PARTITION BY m.cluster
       |                            ORDER BY q.quality DESC, m.id) AS rk
       |  FROM members m JOIN qual q
       |    ON (CASE WHEN m.id >= $VariantIdOffset THEN m.id - $VariantIdOffset ELSE m.id END) = q.doc_id)
       |SELECT s.cluster, n.n_members, s.id AS best_id, s.quality
       |FROM scored s
       |JOIN (SELECT cluster, COUNT(*) AS n_members FROM scored GROUP BY cluster) n
       |  USING (cluster)
       |WHERE s.rk = 1
       |ORDER BY s.cluster""".stripMargin

  /** Prefix-containment dedup: pairs (contained, container) where one
    * document's full text is a prefix of another's — the truncation
    * artifact family (same page crawled twice, one fetch cut short)
    * that exact-hash dedup misses because the bytes differ.
    *
    * Shape: candidates are generated by an equi-join on the first
    * 32 chars — a document can only be a prefix of documents sharing
    * its 32-char head (every corpus doc is longer than that; shorter
    * corpora would route short docs through a dedicated small bucket).
    * The exact `startswith` check runs inside the join, so the
    * all-pairs comparison the oracle spells out never materializes:
    * shuffle cost is O(corpus), per-bucket fan-out is the true
    * candidate-family size. A hot boilerplate prefix concentrates its
    * bucket — at web scale, extend the key adaptively (longer prefix
    * for over-occupied buckets, same two-pass occupancy pattern as the
    * LSH caps); the 32-char key is the right constant for this corpus.
    */
  def qPrefixDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("text"), substring(col("text"), 1, 32).as("k32"))
    val a = docs.select(col("doc_id").as("contained"), col("text").as("text_a"), col("k32"))
    val b = docs.select(col("doc_id").as("container"), col("text").as("text_b"), col("k32"))
    a.join(b, "k32")
      .where(col("contained") =!= col("container") &&
        col("text_b").startsWith(col("text_a")))
      .select(col("contained"), col("container"))
      .orderBy(col("contained"), col("container"))
  }

  val qPrefixDedupSql: String =
    """SELECT a.doc_id AS contained, b.doc_id AS container
      |FROM documents a JOIN documents b
      |  ON a.doc_id <> b.doc_id AND starts_with(b.text, a.text)
      |ORDER BY contained, container""".stripMargin

  /** Exact block-level dedup (the C4 three-sentence-span family): doc
    * pairs sharing at least one full 20-token block at the same block
    * alignment grid. Catches long verbatim spans embedded in otherwise
    * different documents — between exact dedup (whole doc) and MinHash
    * (approximate global similarity) in the dedup ladder.
    *
    * Shape: per-doc block extraction explodes a cheap integer sequence
    * (never a computed array — Generate re-evaluates its child per
    * output row), builds each block with slice+concat over the
    * materialized token array, and dedups to the DISTINCT (doc, block)
    * inverted index. Boilerplate blocks are df-capped (blocks in > 20
    * docs are dropped — same bound as the n-gram index), so per-block
    * pair fan-out is ≤ C(20,2) and the join never quadratics on a hot
    * span. One corpus pass, keyed joins only. */
  def qDedupBlocks(s: SparkSession, dir: String): DataFrame =
    blockPairs(load(s, dir, "documents"))

  /** Core of [[qDedupBlocks]] over any (doc_id, text) frame; blockDf is
    * the boilerplate document-frequency cap. */
  def blockPairs(docs: DataFrame, blockDf: Int = 20): DataFrame = {
    val blocks = docs
      .selectExpr("doc_id", "split(text, ' ') as toks")
      .where(expr("size(toks) >= 20"))
      .selectExpr("doc_id", "toks",
        "explode(sequence(0, cast(size(toks) div 20 as int) - 1)) as bi")
      .selectExpr("doc_id", "concat_ws(' ', slice(toks, bi * 20 + 1, 20)) as block")
      .distinct()
    val kept = blocks.groupBy(col("block"))
      .agg(count(lit(1)).as("bdf"))
      .where(col("bdf") <= blockDf)
      .select(col("block"))
    val indexed = blocks.join(kept, "block")
    val a = indexed.select(col("doc_id").as("doc_a"), col("block"))
    val b = indexed.select(col("doc_id").as("doc_b"), col("block"))
    a.join(b, "block")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qDedupBlocksSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |blocks AS (
      |  SELECT DISTINCT doc_id,
      |         array_to_string(w[i * 20 + 1 : i * 20 + 20], ' ') AS block
      |  FROM (SELECT doc_id, w,
      |               unnest(generate_series(0, CAST(len(w) // 20 AS INT) - 1)) AS i
      |        FROM toks WHERE len(w) >= 20)),
      |kept AS (
      |  SELECT block FROM blocks GROUP BY block HAVING COUNT(*) <= 20)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      |FROM blocks a
      |JOIN kept USING (block)
      |JOIN blocks b ON a.block = b.block AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Window width for [[qDupSpans]] — the Lee-et-al.-style duplicated
    * span unit, shared by the query, spec fixtures, and the oracle. */
  private[llm] val DupSpanW = 8

  /** Duplicated-span profile — the memorization-risk signal doc-level
    * dedup cannot see: for every doc, the fraction of its token-window
    * positions whose [[DupSpanW]]-gram occurs ≥ 2 times ANYWHERE in
    * the corpus (another doc or the same one). A doc can be globally
    * unique yet 60% built from corpus-duplicated spans — exactly the
    * text span-level dedup (Lee et al.'s exact-substring family)
    * targets; this query is the profile a pipeline ranks/filters on.
    *
    * Scale: window keys are per-position 60-bit hashes from ONE native
    * codegen'd pass per doc ([[graft.functions.WindowHashes]] — no
    * HOF-array under the explode, no window-string shuffle); the
    * explode child is a CACHED-LEAF column (the Generate
    * re-evaluation trap, see [[qDedupNgramJaccard]]). In-doc counts
    * collapse occurrences map-side to one (doc, window) row; global
    * counts roll up from those (distinct-window scale). The
    * occurrence→count join is the classic skew join — a boilerplate
    * window is in everything — SPLIT like [[CorpusStats.qTokenRarity]]:
    * hottest windows broadcast from a bounded TakeOrdered, the tail
    * joins keyed with fan-in bounded by the head cutoff. Only longs
    * ever shuffle. */
  def qDupSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, explode, sum}
    val base = load(s, dir, "documents")
      .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where(s"size(ta) >= $DupSpanW")
    // per-(doc, window) counts. The group key embeds doc_id, so the
    // groups never cross rows: the r19 shape (explode → corpus-wide
    // groupBy(doc_id, wh)) paid an occurrence-scale exchange + hash
    // aggregate for what is row-local array work — now ONE codegen'd
    // pass per doc ([[graft.functions.LongGroupPositions]], guide
    // §2.4 "remove shuffles outright") whose grouped rows ARE the
    // cached leaf (the old shape cached the hash arrays and re-derived
    // the groups through the exchange). Same-JVM interleaved A/B at
    // sf0.1/32 cores (5 reps): 1.96 → 1.26 s median; plan Exchange
    // count 11 → 6.
    val (k, _) = org.apache.spark.sql.GraftShims.cachedLeaf(base
      .select(col("doc_id"), explode(
        graft.functions.TextHashExprs.longGroupPositions(
          graft.functions.TextHashExprs.windowHashes(col("ta"), DupSpanW))).as("g"))
      .selectExpr("doc_id", "g.v as wh", "cast(size(g.is) as bigint) as k"))
    val cnt = k.groupBy("wh").agg(sum(col("k")).as("cnt"))
    val head = cnt.orderBy(col("cnt").desc, col("wh"))
      .limit(CorpusStats.RarityHeadK)
    val headRows = k.join(broadcast(head), "wh")
    val tailRows = k // same-frame broadcast: see CorpusStats.qTokenRarity
      .join(broadcast(head), Seq("wh"), "left_anti")
      .join(cnt, "wh")
    headRows.select(col("doc_id"), col("k"), col("cnt"))
      .unionByName(tailRows.select(col("doc_id"), col("k"), col("cnt")))
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_windows"),
        sum(expr("case when cnt >= 2 then k else 0 end")).as("n_dup"))
      .selectExpr("doc_id", "n_windows", "n_dup",
        "cast(n_dup as double) / n_windows as dup_fraction")
      .orderBy("doc_id")
  }

  val qDupSpansSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |d2 AS (SELECT doc_id, ta FROM d WHERE len(ta) >= $DupSpanW),
       |wo AS (SELECT doc_id, array_to_string(ta[i:i + ${DupSpanW - 1}], ' ') AS w
       |       FROM d2, UNNEST(range(1, len(ta) - ${DupSpanW - 2})) AS u(i)),
       |k AS (SELECT doc_id, w, COUNT(*) AS k FROM wo GROUP BY doc_id, w),
       |c AS (SELECT w, SUM(k) AS cnt FROM k GROUP BY w)
       |SELECT doc_id,
       |       CAST(SUM(k) AS BIGINT) AS n_windows,
       |       CAST(SUM(CASE WHEN cnt >= 2 THEN k ELSE 0 END) AS BIGINT) AS n_dup,
       |       CAST(SUM(CASE WHEN cnt >= 2 THEN k ELSE 0 END) AS DOUBLE) / SUM(k) AS dup_fraction
       |FROM k JOIN c USING (w)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Per-document NOVELTY — the curation-ordering signal dual to
    * [[qDupSpans]]'s duplication profile: for each doc, the fraction of
    * its DISTINCT [[DupSpanW]]-token windows whose corpus-wide first
    * occurrence (minimum doc_id) is this document. A doc full of
    * content that earlier documents already carry scores near 0; a doc
    * contributing fresh spans scores near 1 — the rank a
    * dedup-prioritized ingestion keeps/drops/reweights on, and the
    * per-increment "how much is actually new" metric an incremental
    * corpus build reports.
    *
    * Scale: identical key discipline to [[qDupSpans]] — one native
    * codegen'd window-hash pass per doc, cached-leaf explode child,
    * per-(doc, window) distinct collapses map-side, window stats at
    * distinct-window scale, and the stats→occurrence join skew-SPLIT
    * (hottest windows broadcast from a bounded TakeOrdered, tail joins
    * keyed). Only longs shuffle; the attribution aggregate is O(1)
    * state per doc. */
  def qDocNovelty(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, explode, sum}
    val base = load(s, dir, "documents")
      .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where(s"size(ta) >= $DupSpanW")
    // per-doc DISTINCT windows: the distinct key embeds doc_id, so the
    // r19 corpus-wide `.distinct()` exchange was row-local work —
    // `array_distinct` inside the row (guide §2.4), grouped rows AS
    // the leaf. Same-JVM A/B at sf0.1/32 cores (5 reps): 1.96 → 1.35 s
    // median; plan Exchange count 10 → 6.
    val (docWin, _) = org.apache.spark.sql.GraftShims.cachedLeaf(base
      .select(col("doc_id"), explode(org.apache.spark.sql.functions.array_distinct(
        graft.functions.TextHashExprs.windowHashes(col("ta"), DupSpanW))).as("wh")))
    val stats = docWin.groupBy("wh")
      .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("cnt"))
    val head = stats.orderBy(col("cnt").desc, col("wh"))
      .limit(CorpusStats.RarityHeadK)
    val headRows = docWin.join(broadcast(head), "wh")
    val tailRows = docWin // same-frame broadcast: see CorpusStats.qTokenRarity
      .join(broadcast(head), Seq("wh"), "left_anti")
      .join(stats, "wh")
    headRows.select(col("doc_id"), col("first_doc"))
      .unionByName(tailRows.select(col("doc_id"), col("first_doc")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(expr("case when first_doc = doc_id then 1 else 0 end")).as("n_novel"))
      .selectExpr("doc_id", "n_windows", "cast(n_novel as bigint) as n_novel",
        "cast(n_novel as double) / n_windows as novelty_fraction")
      .orderBy("doc_id")
  }

  val qDocNoveltySql: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |d2 AS (SELECT doc_id, ta FROM d WHERE len(ta) >= $DupSpanW),
       |wo AS (SELECT DISTINCT doc_id, array_to_string(ta[i:i + ${DupSpanW - 1}], ' ') AS w
       |       FROM d2, UNNEST(range(1, len(ta) - ${DupSpanW - 2})) AS u(i)),
       |f AS (SELECT w, MIN(doc_id) AS first_doc FROM wo GROUP BY w)
       |SELECT doc_id,
       |       COUNT(*) AS n_windows,
       |       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty_fraction
       |FROM wo JOIN f USING (w)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Position-key encoding for [[qDupSpansClean]]'s keeper choice:
    * `doc_id * PosKeyBase + position` must be collision-free, so docs
    * are bounded at PosKeyBase tokens (far above any real document
    * after normalization; the derivation guard in ScalingRehearsal
    * keeps ids < 2M, so the product stays well inside a long). */
  private[llm] val PosKeyBase = 1000000L

  /** Duplicated-span REMOVAL — the intervention [[qDupSpans]] is the
    * profile for (Lee et al.'s "deduplicating training data" applied
    * at span granularity): every duplicated [[DupSpanW]]-token window
    * keeps its FIRST occurrence corpus-wide (minimum (doc_id, pos))
    * and every other occurrence's token range is cut; each document
    * comes back as its kept tokens re-joined (`n_kept`, `clean_text`).
    * Documents shorter than the window pass through unchanged.
    *
    * Scale: same key discipline as [[qDupSpans]] — window hashes from
    * the native one-pass expression, explode children are CACHED-LEAF
    * columns. The occurrence stream pre-aggregates to one row per
    * (doc, window) carrying its position list (state bounded by the
    * DOCUMENT's own length — the same bound as the doc row itself),
    * so the skew join against per-window stats runs at
    * doc-distinct-window scale with the hot side's fan-in bounded by
    * document count, never raw occurrence count. Interval cover and
    * text rebuild are per-document array work (bounded by doc
    * length); nothing global ever sorts. */
  def qDupSpansClean(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, explode}
    // one row per (doc, window value): its ASCENDING 1-based start
    // positions. The group key embeds doc_id — row-local work: the r19
    // shape posexploded every occurrence into a corpus-wide
    // groupBy(doc_id, wh) + sort_array(collect_list) (an
    // occurrence-scale exchange + the suite's second object
    // aggregate), where ONE codegen'd pass per doc emits the same
    // grouped rows ([[graft.functions.LongGroupPositions]], guide §2.4
    // "remove shuffles outright"); those rows are their own cached
    // leaf (three consumers: winStats + both skew-split branches), and
    // the rebuild-side leaf slims to (doc_id, ta). Same-JVM A/B at
    // sf0.1/32 cores (5 reps): 3.06 → 1.61 s median; plan Exchange
    // count 12 → 7, ObjectHashAggregate instances 12 → 2 (the
    // remaining pair is the per-doc covered-position collect_set,
    // which genuinely crosses rows after the wh-keyed joins).
    val (docs, _) = org.apache.spark.sql.GraftShims.cachedLeaf(
      load(s, dir, "documents")
        .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta"))
    val (byDocWin, _) = org.apache.spark.sql.GraftShims.cachedLeaf(docs
      .select(col("doc_id"), explode(
        graft.functions.TextHashExprs.longGroupPositions(
          graft.functions.TextHashExprs.windowHashes(col("ta"), DupSpanW))).as("g"))
      .selectExpr("doc_id", "g.v as wh", "g.is as is"))
    val winStats = byDocWin
      .groupBy("wh")
      .agg(expr("sum(size(is)) as cnt"),
        expr(s"min(doc_id * $PosKeyBase + is[0]) as keep_key"))
    val head = winStats.orderBy(col("cnt").desc, col("wh"))
      .limit(CorpusStats.RarityHeadK)
    val headRows = byDocWin.join(broadcast(head), "wh")
    val tailRows = byDocWin // same-frame broadcast: see CorpusStats.qTokenRarity
      .join(broadcast(head), Seq("wh"), "left_anti")
      .join(winStats, "wh")
    // removed-position SETS stay per-document arrays end to end (r19):
    // the old tail exploded EVERY token of EVERY document, anti-joined
    // the occurrence-scale stream against the covered positions, and
    // re-assembled each document with a corpus-wide
    // collect_list+sort_array object aggregate — two occurrence-scale
    // shuffles and the suite's heaviest object agg, for what is
    // per-document array work. Now: covered positions aggregate to one
    // array per TOUCHED doc (state bounded by the doc's own length,
    // the same bound the doc row itself carries), one keyed join
    // attaches them to the corpus, and the rebuild is a codegen'd
    // array_except over position indices (hash-set lookup, O(len +
    // |rm|) per row) — token order never leaves the row, so nothing
    // re-sorts. One-JVM conf-gated A/B at sf0.1/32 cores (5 interleaved
    // reps): old 2.97 s median / 2.89 min → new 2.60 / 2.54; the scale
    // claim is the removed occurrence-scale shuffles, not the local %.
    val covered = headRows.unionByName(tailRows)
      .where("cnt >= 2")
      .selectExpr("doc_id",
        s"filter(is, i -> doc_id * $PosKeyBase + i != keep_key) as rm")
      .where("size(rm) > 0")
      .selectExpr("doc_id",
        s"explode(flatten(transform(rm, i -> sequence(i, i + ${DupSpanW - 1})))) as p")
      .groupBy("doc_id")
      .agg(expr("collect_set(p) as rm"))
    docs.join(covered, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        """case when rm is null then ta
          |     else transform(array_except(sequence(1, size(ta)), rm),
          |                    i -> element_at(ta, i)) end as kept""".stripMargin)
      .where("size(kept) > 0") // fully-cut docs vanish, as the oracle's
      // GROUP BY over zero kept rows does (and empty docs never appear)
      .selectExpr("doc_id", "cast(size(kept) as bigint) as n_kept",
        "array_join(kept, ' ') as clean_text")
      .orderBy("doc_id")
  }

  val qDupSpansCleanSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |w AS (SELECT doc_id, i, array_to_string(ta[i:i + ${DupSpanW - 1}], ' ') AS wv
       |      FROM d, UNNEST(range(1, len(ta) - ${DupSpanW - 2})) AS u(i)),
       |stats AS (SELECT wv, COUNT(*) AS cnt,
       |                 MIN(doc_id * $PosKeyBase + i) AS keep_key
       |          FROM w GROUP BY wv),
       |removed AS (
       |  SELECT w.doc_id, w.i FROM w JOIN stats USING (wv)
       |  WHERE cnt >= 2 AND w.doc_id * $PosKeyBase + w.i <> keep_key),
       |cov AS (SELECT DISTINCT doc_id, i + o AS p
       |        FROM removed, UNNEST(range(0, $DupSpanW)) AS v(o)),
       |toks AS (SELECT doc_id, p, ta[p] AS t
       |         FROM d, UNNEST(range(1, len(ta) + 1)) AS u(p)),
       |kept AS (SELECT t.doc_id, t.p, t.t
       |         FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
       |         WHERE c.doc_id IS NULL)
       |SELECT doc_id, COUNT(*) AS n_kept,
       |       array_to_string(list(t ORDER BY p), ' ') AS clean_text
       |FROM kept GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_spans" -> (qDupSpans _),
    "q_dup_spans_clean" -> (qDupSpansClean _),
    "q_dedup_blocks" -> (qDedupBlocks _),
    "q_dedup_prefix" -> (qPrefixDedup _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_minhash_lsh" -> (qDedupMinhashLsh _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_report" -> (qDedupReport _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_dedup_ngram_jaccard" -> (qDedupNgramJaccard _),
    "q_dedup_containment" -> (qDedupContainment _),
    "q_doc_novelty" -> (qDocNovelty _),
    "q_dedup_simhash" -> (qDedupSimhash _))

  val oracleSql: Map[String, String] = Map(
    "q_dup_spans" -> qDupSpansSql,
    "q_dup_spans_clean" -> qDupSpansCleanSql,
    "q_dedup_blocks" -> qDedupBlocksSql,
    "q_dedup_prefix" -> qPrefixDedupSql,
    "q_dedup_exact" -> qDedupExactSql,
    "q_dedup_minhash_lsh" -> qDedupMinhashLshSql,
    "q_dedup_clusters" -> qDedupClustersSql,
    "q_dedup_report" -> qDedupReportSql,
    "q_dedup_keep_best" -> qDedupKeepBestSql,
    "q_dedup_ngram_jaccard" -> qDedupNgramJaccardSql,
    "q_dedup_containment" -> qDedupContainmentSql,
    "q_doc_novelty" -> qDocNoveltySql,
    "q_dedup_simhash" -> qDedupSimhashSql)
}
