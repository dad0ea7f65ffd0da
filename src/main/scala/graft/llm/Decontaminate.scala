package graft.llm

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, explode, expr, lit}

/** Benchmark decontamination: find corpus documents whose content
  * overlaps an evaluation ("benchmark") set — the training-data
  * hygiene step that keeps eval questions out of the training corpus.
  * Like the rest of the llm layer this has no counterpart in the
  * reference (it delegates data processing to Spark, SURVEY.md §2.5);
  * the DuckDB oracle replays the identical derivation.
  *
  * Semantics: a corpus document is CONTAMINATED by a benchmark
  * document when it shares ≥ half of the benchmark document's distinct
  * word-3-gram shingles (overlap is measured against the BENCHMARK
  * side — "most of this eval item appears in the training doc" — the
  * direction real decontamination pipelines gate on). Shingles that
  * appear in more than [[Dedup.DfCap]] benchmark documents are dropped
  * from matching (boilerplate carries no contamination signal), the
  * same df-cap discipline as the n-gram dedup family.
  *
  * Scale design (100 TB corpora):
  *  - The benchmark side is BOUNDED (eval sets are finite — thousands
  *    of documents, not corpus-scale), so its shingle index and sizes
  *    BROADCAST: the corpus side is one pass — shingle-hash postings
  *    (one native pass per doc, [[graft.functions.TextHashExprs
  *    .shingleHashes]]) map-side-joined against the broadcast index,
  *    then ONE keyed aggregation on (doc, bench). Nothing is all-pairs
  *    and the corpus never shuffles by shingle.
  *  - Join fanout per corpus posting is bounded by the benchmark df
  *    cap; per-doc output is bounded by the benchmark count.
  *  - Matching is on 60-bit portable md5 shingle hashes (collisions
  *    negligible; cross-engine parity with DuckDB's string-set counts
  *    is the same contract the n-gram Jaccard family pins at 48/48).
  *
  * Test corpus derives true positives deterministically: benchmark =
  * every 97th doc; each benchmark doc plants a "leak" (id + 4000000,
  * text minus its last 3 tokens) in the corpus.
  */
object Decontaminate {

  private val toksS = "split(lower(text), ' ')"

  def qDecontaminate(s: SparkSession, dir: String): DataFrame =
    contaminationPairs(s, dir)
      .select("doc_id", "bench_id", "n_shared", "overlap")
      .orderBy("doc_id", "bench_id")

  /** The shared contamination pipeline: `(doc_id, bench_id, n_shared,
    * overlap)` rows at overlap ≥ 0.5 — consumed by the pair listing
    * ([[qDecontaminate]]) and the per-source report
    * ([[qDecontaminateReport]]), so the derivation and df-cap
    * semantics can never drift between them. */
  private def contaminationPairs(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents").selectExpr("doc_id as id", s"$toksS as toks")
    val bench = base.filter("id % 97 = 0")
    val leaked = bench.selectExpr(
      "id + 4000000 as id", "slice(toks, 1, greatest(size(toks) - 3, 0)) as toks")
    val corpus = base.filter("id % 97 != 0").unionAll(leaked)

    // the repartitions are EXCHANGE BARRIERS: they materialize the
    // computed hash arrays so each explode's child is a plain
    // attribute (the Generate re-evaluation trap, see Dedup)
    val bsh = bench
      .select(col("id").as("bench_id"),
        graft.functions.TextHashExprs.shingleHashes(col("toks")).as("sh"))
      .repartition(col("bench_id"))
    val bsz = bsh.filter("size(sh) > 0")
      .selectExpr("bench_id", "cast(size(sh) as bigint) as bsize")
    // benchmark-side df cap: shingles shared by many benchmark docs
    // are boilerplate, not signal (and bound the join fanout) — the
    // same codegen'd count-prefilter + keep-join shape as
    // Dedup.capHotBuckets, no window buffering
    val brows = bsh.select(col("bench_id"), explode(col("sh")).as("s"))
    val bcold = brows.groupBy("s")
      .agg(count(expr("*")).as("bdf"))
      .filter(col("bdf") <= Dedup.DfCap)
      .select("s")
    val bkept = brows.join(bcold, "s").select("bench_id", "s")

    val cpost = corpus
      .select(col("id").as("doc_id"),
        graft.functions.TextHashExprs.shingleHashes(col("toks")).as("sh"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(col("sh")).as("s"))

    cpost.join(broadcast(bkept), "s")
      .groupBy("doc_id", "bench_id")
      .agg(count(expr("*")).as("n_shared"))
      .join(broadcast(bsz), "bench_id")
      .selectExpr("doc_id", "bench_id", "n_shared",
        "cast(n_shared as double) / bsize as overlap")
      .filter("overlap >= 0.5")
      .select("doc_id", "bench_id", "n_shared", "overlap")
  }

  /** Per-source contamination report — the go/no-go summary a corpus
    * release gates on: for every source, how many corpus docs exist,
    * how many are contaminated by ≥1 benchmark doc, and the rate.
    * Leaked variants attribute to the source of their base benchmark
    * doc (their text came from it).
    *
    * Scale: rides the shared [[contaminationPairs]] pipeline (bounded
    * broadcast benchmark index, one corpus pass); the report itself is
    * a distinct-doc collapse plus one O(sources) aggregate joined
    * against an O(sources) corpus census — the meeting point is source
    * cardinality, never corpus rows. */
  def qDecontaminateReport(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    // corpus census with the SAME derivation as the pipeline: non-bench
    // originals keep their source; each leak inherits its bench doc's
    val corpusSrc = docs.filter("doc_id % 97 != 0").selectExpr("doc_id as id", "source")
      .unionAll(docs.filter("doc_id % 97 = 0")
        .selectExpr("doc_id + 4000000 as id", "source"))
    val contaminated = contaminationPairs(s, dir)
      .select("doc_id").distinct()
      .withColumn("is_cont", lit(1L))
    corpusSrc
      .join(contaminated, col("id") === col("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("cast(sum(coalesce(is_cont, 0)) as bigint) as n_contaminated"))
      .selectExpr("source", "n_docs", "n_contaminated",
        "cast(n_contaminated as double) / n_docs as contamination_rate")
      .orderBy("source")
  }

  // lazy: textually precedes the qDecontaminateSql val it embeds
  lazy val qDecontaminateReportSql: String =
    s"""WITH pairs AS (${qDecontaminateSql.replace("ORDER BY doc_id, bench_id", "")}),
       |cont AS (SELECT DISTINCT doc_id FROM pairs),
       |census AS (
       |  SELECT doc_id AS id, source FROM documents WHERE doc_id % 97 != 0
       |  UNION ALL
       |  SELECT doc_id + 4000000 AS id, source FROM documents WHERE doc_id % 97 = 0)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |       CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS contamination_rate
       |FROM census LEFT JOIN cont ON census.id = cont.doc_id
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** DuckDB twin — string-valued shingle sets, identical derivation,
    * posting-join shape mirrored so the df-cap semantics match
    * exactly. */
  val qDecontaminateSql: String = {
    // the ONE 3-gram shingle derivation every oracle shares
    val shingleD = Dedup.shingleD
    s"""WITH base AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS toks FROM documents),
       |bench AS (SELECT id, toks FROM base WHERE id % 97 = 0),
       |leaked AS (SELECT id + 4000000 AS id, toks[1:greatest(len(toks) - 3, 0)] AS toks FROM bench),
       |corpus AS (
       |  SELECT id, toks FROM base WHERE id % 97 != 0
       |  UNION ALL
       |  SELECT id, toks FROM leaked),
       |bsh AS (SELECT id AS bench_id, $shingleD AS sh FROM bench),
       |bsz AS (SELECT bench_id, len(sh) AS bsize FROM bsh WHERE len(sh) > 0),
       |bpost AS (SELECT bench_id, unnest(sh) AS s FROM bsh),
       |bkept AS (
       |  SELECT bench_id, s FROM bpost
       |  WHERE s IN (SELECT s FROM bpost GROUP BY s HAVING COUNT(*) <= ${Dedup.DfCap})),
       |csh AS (SELECT id AS doc_id, $shingleD AS sh FROM corpus),
       |cpost AS (SELECT doc_id, unnest(sh) AS s FROM csh),
       |shared AS (
       |  SELECT doc_id, bench_id, COUNT(*) AS n_shared
       |  FROM cpost JOIN bkept USING (s)
       |  GROUP BY doc_id, bench_id)
       |SELECT doc_id, bench_id, n_shared,
       |       CAST(n_shared AS DOUBLE) / bsize AS overlap
       |FROM shared JOIN bsz USING (bench_id)
       |WHERE CAST(n_shared AS DOUBLE) / bsize >= 0.5
       |ORDER BY doc_id, bench_id""".stripMargin
  }

  // ------------------------------------- embedding-level contamination
  /** Cosine threshold for semantic contamination: paraphrased leaks
    * don't share n-grams but stay near the eval vector; the ±10%
    * deterministic perturbation lands ≈0.995, random synthetic pairs
    * far below. */
  private val EmbThreshold = 0.95
  private val LeakIdOffset = 200000L

  /** SEMANTIC decontamination — the embedding-space twin of the n-gram
    * [[qDecontaminate]]: flag corpus vectors whose cosine against ANY
    * eval-set vector clears the threshold. Catches the leak class the
    * n-gram gate misses (paraphrases, translations, re-tokenizations —
    * text changed, meaning intact).
    *
    * Scale design, same story as the n-gram side: the eval set is
    * BOUNDED (thousands of items, never corpus-scale), so its vectors
    * + norms BROADCAST and the corpus side is ONE pass — corpus ×
    * |eval| scored map-side with zero shuffles and no all-pairs
    * anywhere. At 100 TB the cost is the corpus scan times a bounded
    * constant; if the eval set ever outgrew the broadcast the LSH
    * candidate route ([[Similarity.qDedupEmbedding]]'s shape) is the
    * documented fallback.
    *
    * Test corpus derives true positives deterministically: eval =
    * every 97th vector; each eval vector plants a leak (id +
    * [[LeakIdOffset]], ±10% per-element deterministic perturbation —
    * the same hash recipe the near-dup family pins cross-engine). */
  def qDecontaminateEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExprs
    val emb = load(s, dir, "embeddings")
    val evalSet = emb.filter("vec_id % 97 = 0")
      .select(col("vec_id").as("eval_id"),
        VectorExprs.toDouble(col("embedding")).as("e"))
    val leaks = emb.filter("vec_id % 97 = 0")
      .select((col("vec_id") + LeakIdOffset).as("vec_id"),
        VectorExprs.perturb(col("vec_id"), col("embedding")).as("embedding"))
    val corpus = emb.filter("vec_id % 97 != 0")
      .select(col("vec_id"), VectorExprs.toDouble(col("embedding")).as("embedding"))
      .unionAll(leaks)
    val corpusN = corpus.select(col("vec_id"), col("embedding"),
      VectorExprs.normSq(col("embedding")).as("cn"))
    val evalN = evalSet.select(col("eval_id"), col("e"),
      VectorExprs.normSq(col("e")).as("en"))
    corpusN.crossJoin(broadcast(evalN))
      .select(col("vec_id"), col("eval_id"),
        (VectorExprs.dot(col("embedding"), col("e")) /
          (org.apache.spark.sql.functions.sqrt(col("cn")) *
            org.apache.spark.sql.functions.sqrt(col("en")))).as("cosine"))
      .filter(s"cosine >= $EmbThreshold")
      .orderBy("vec_id", "eval_id")
  }

  val qDecontaminateEmbeddingSql: String = {
    // same hash recipe as the near-dup family's perturbation oracle
    val h = Portable.hDuck("('n|' || vec_id::VARCHAR || '|' || (i - 1)::VARCHAR)")
    def fold(l: String) = s"list_reduce($l, (acc, p) -> acc + p)"
    val dot = fold(
      "list_transform(range(1, len(c.embedding) + 1), i -> (c.embedding)[i] * (e.e)[i])")
    s"""WITH ev AS (
       |  SELECT vec_id AS eval_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |leaks AS (
       |  SELECT vec_id + $LeakIdOffset AS vec_id,
       |         list_transform(range(1, len(embedding) + 1),
       |           i -> embedding[i]::DOUBLE * (1.0 + ($h % 21 - 10) / 100.0)) AS embedding
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |corpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
       |  FROM embeddings WHERE vec_id % 97 != 0
       |  UNION ALL SELECT * FROM leaks),
       |cn AS (SELECT vec_id, embedding,
       |              ${fold("list_transform(embedding, x -> x * x)")} AS norm
       |       FROM corpus),
       |en AS (SELECT eval_id, e, ${fold("list_transform(e, x -> x * x)")} AS norm
       |       FROM ev)
       |SELECT c.vec_id, e.eval_id,
       |       ($dot / (sqrt(c.norm) * sqrt(e.norm))) AS cosine
       |FROM cn c CROSS JOIN en e
       |WHERE ($dot / (sqrt(c.norm) * sqrt(e.norm))) >= $EmbThreshold
       |ORDER BY vec_id, eval_id""".stripMargin
  }

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> (qDecontaminate _),
    "q_decontaminate_embedding" -> (qDecontaminateEmbedding _),
    "q_decontaminate_report" -> (qDecontaminateReport _))

  val oracleSql: Map[String, String] = Map(
    "q_decontaminate" -> qDecontaminateSql,
    "q_decontaminate_embedding" -> qDecontaminateEmbeddingSql,
    "q_decontaminate_report" -> qDecontaminateReportSql)
}
