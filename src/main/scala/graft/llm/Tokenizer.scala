package graft.llm

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Tokenizer-vocabulary induction — the BPE-style merge loop that
  * turns a corpus into merge rules: each round counts ADJACENT token
  * pairs corpus-wide, picks the most frequent (ties to the
  * lexicographically smallest pair), and rewrites every document with
  * that pair fused into one token. The merge-rule list IS the
  * tokenizer artifact a training pipeline ships.
  *
  * Self-pairs (A == B) are excluded from rule selection: for A ≠ B,
  * adjacent matches can never overlap ((t_i,t_{i+1}) = (A,B) and
  * (t_{i+1},t_{i+2}) = (A,B) would force A = B), so "merge all
  * matches" equals the sequential greedy-leftmost scan and the
  * rewrite stays a PURE per-position expression — no sequential scan
  * state anywhere. (Run-merging self-pairs need exactly that state;
  * real BPE implementations special-case them for the same reason.)
  *
  * Scale: each round is (a) one explode + keyed count over adjacent
  * pairs — map-side combinable, O(corpus tokens) shuffle of tiny
  * (pair, count) rows; (b) a TakeOrdered(1) for the best rule — never
  * a global sort; (c) one broadcast of the 1-row rule cross-joined
  * into a codegen'd per-document rewrite. Rounds are a fixed
  * constant, the whole chain is lazy (the rule frames broadcast at
  * execution, nothing collects to the driver), and per-round state is
  * one rule — the same iterative-refinement shape as
  * [[Similarity.qEmbKmeans]]'s centroid loop.
  */
object Tokenizer {

  private val Rounds = 3

  /** Adjacent-pair counts `(a, b, cnt)` over `(doc_id, ta)`, self-pairs
    * excluded (see scaladoc). */
  private def pairCounts(corpus: DataFrame): DataFrame =
    corpus
      // the ≥2 filter makes the index expression total: Spark's
      // sequence(1, n−1) is the DESCENDING [1, 0] for n = 1 (the
      // same trap PairExpansionSpec pins), indexing past 1-token docs —
      // and such docs carry no pairs by definition anyway
      .where("size(ta) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(ta) - 1),
          |  i -> struct(element_at(ta, i) as a, element_at(ta, i + 1) as b))) as p""".stripMargin)
      .where("p.a != p.b")
      .selectExpr("p.a as a", "p.b as b")
      .groupBy("a", "b")
      .agg(org.apache.spark.sql.functions.expr("count(*) as cnt"))

  /** The round's merge rule: most frequent pair, ties to the smallest
    * (a, b) — a bounded TakeOrdered, not a sort. */
  private def bestRule(pc: DataFrame): DataFrame =
    pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)

  /** Rewrite every document with the (broadcast, 1-row) rule fused:
    * position i emits the merged token on a match, nothing when the
    * previous position matched (it was consumed), its own token
    * otherwise. Total and per-position — no scan state (sound because
    * a ≠ b makes matches non-overlapping). Merged tokens join with a
    * SPACE, which no split-token can contain, so rules over merged
    * tokens in later rounds can never collide with raw text. */
  private def applyRule(corpus: DataFrame, rule: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(rule.select(col("a"), col("b"))))
      // the empty-doc guard keeps sequence(1, 0) (= descending [1, 0])
      // from ever indexing an empty array
      .selectExpr("doc_id",
        """case when size(ta) = 0 then ta else
          |flatten(transform(sequence(1, size(ta)), i ->
          |  case when i < size(ta) and element_at(ta, i) = a
          |            and element_at(ta, i + 1) = b
          |       then array(concat(a, ' ', b))
          |       when i > 1 and element_at(ta, i - 1) = a
          |            and element_at(ta, i) = b
          |       then array()
          |       else array(element_at(ta, i)) end)) end as ta""".stripMargin)

  /** The gated query: [[Rounds]] merge rounds over the documents
    * corpus; one output row per round with the learned rule, its
    * pre-merge frequency, and the corpus token count after applying
    * it — pinning rule selection, tie-breaks, and every rewrite.
    *
    * EAGER like the CC family (a documented registry exception): each
    * round's rule is a bounded 1-row TakeOrdered collect, because the
    * next round's pair count needs it as a literal. Post-merge token
    * counts are ARITHMETIC (`total − cnt` — exact, matches are
    * non-overlapping), so the final rewrite is never materialized at
    * all: the corpus pays one pair-count pass per round plus one
    * rewrite per non-final round (each a cached leaf, evaluated once,
    * unpersisted before return). */
  def qBpeMerges(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val base = graft.Tables.loadWide(s, dir, "documents")
      .selectExpr("doc_id",
        "filter(split(lower(text), ' '), t -> length(t) > 0) as ta")
    val caches = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    try {
      var (corpus, rdd0) = org.apache.spark.sql.GraftShims.cachedLeaf(base)
      caches += rdd0
      var total = corpus
        .agg(org.apache.spark.sql.functions.expr("sum(size(ta))"))
        .head().getLong(0)
      val rows = (1 to Rounds).map { r =>
        val rule = bestRule(pairCounts(corpus)).head()
        val (a, b, cnt) = (rule.getString(0), rule.getString(1), rule.getLong(2))
        total -= cnt
        if (r < Rounds) {
          val (next, rdd) = org.apache.spark.sql.GraftShims.cachedLeaf(
            applyRule(corpus, Seq((a, b)).toDF("a", "b")))
          caches += rdd
          corpus = next
        }
        (r, a, b, cnt, total)
      }
      rows.toDF("round", "a", "b", "cnt", "total_tokens_after")
        .orderBy("round")
    } finally caches.foreach(_.unpersist(blocking = false))
  }

  val qBpeMergesSql: String = {
    def round(r: Int): String = {
      val prev = s"c${r - 1}"
      val rewrite =
        if (r == Rounds) "" // the final rewrite is never needed (totals are arithmetic)
        else s""",
           |c$r AS (
           |  SELECT doc_id,
           |         flatten(list_transform(range(1, len(ta) + 1), i ->
           |           CASE WHEN i < len(ta) AND ta[i] = b$r.a AND ta[i + 1] = b$r.b
           |                THEN [ta[i] || ' ' || ta[i + 1]]
           |                WHEN i > 1 AND ta[i - 1] = b$r.a AND ta[i] = b$r.b
           |                THEN []
           |                ELSE [ta[i]] END)) AS ta
           |  FROM $prev CROSS JOIN b$r)""".stripMargin
      s"""pc$r AS (
         |  SELECT a, b, COUNT(*) AS cnt
         |  FROM (SELECT ta[i] AS a, ta[i + 1] AS b
         |        FROM $prev, UNNEST(range(1, len(ta))) AS u(i))
         |  WHERE a <> b GROUP BY a, b),
         |b$r AS (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1)$rewrite""".stripMargin
    }
    // post-merge totals by subtraction: matches are non-overlapping, so
    // each merge loses exactly one token — same identity the Spark side
    // uses, so no engine ever materializes the final rewrite
    val selects = (1 to Rounds).map { r =>
      val minus = (1 to r).map(i => s" - (SELECT cnt FROM b$i)").mkString
      s"""SELECT CAST($r AS INT) AS round, a, b, cnt,
         |       CAST((SELECT n FROM t0)$minus AS BIGINT) AS total_tokens_after
         |FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH c0 AS (
       |  SELECT doc_id,
       |         list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |t0 AS (SELECT CAST(SUM(len(ta)) AS BIGINT) AS n FROM c0),
       |${(1 to Rounds).map(round).mkString(",\n")}
       |$selects
       |ORDER BY round""".stripMargin
  }

  /** ENCODE — the other half of the tokenizer artifact: apply the
    * induced merge rules to the corpus (the step a training pipeline
    * runs over every document with the shipped rule list). Each rule
    * application is the same pure per-position rewrite as the
    * induction loop ([[applyRule]] — sound because a ≠ b keeps matches
    * non-overlapping, so greedy-leftmost equals merge-all), applied in
    * rule order. Output pins the FULL encoding per document: post-
    * encode token count plus a portable md5 over the token array
    * joined on the 0x1f unit separator (a byte no whitespace-split
    * token can contain) — one changed token anywhere flips the hash,
    * so the gate certifies every document's exact encoded form.
    *
    * Scale: identical per-round shape to [[qBpeMerges]] (keyed
    * pair-count shuffle, 1-row TakeOrdered rule, broadcast rewrite);
    * the final rewrite IS materialized here (it is the product), read
    * straight into a per-row hash — no extra shuffle after the last
    * merge. Intermediate rounds ride cached leaves owned by the
    * returned frame (the [[DedupPipeline.indexedClusterLabels]]
    * ownership contract). */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame =
    encodedCorpus(s, dir)
      .selectExpr("doc_id", "size(ta) as n_toks",
        "md5(concat_ws(chr(31), ta)) as tok_hash")
      .orderBy("doc_id")

  /** The fully encoded corpus `(doc_id, ta)` after [[Rounds]] induced
    * merges — the shared derivation behind [[qBpeEncode]] and
    * [[qBpeFertility]]. */
  private def encodedCorpus(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val base = graft.Tables.loadWide(s, dir, "documents")
      .selectExpr("doc_id",
        "filter(split(lower(text), ' '), t -> length(t) > 0) as ta")
    var (corpus, _) = org.apache.spark.sql.GraftShims.cachedLeaf(base)
    (1 to Rounds).foreach { r =>
      val rule = bestRule(pairCounts(corpus)).head()
      val ruleDf = Seq((rule.getString(0), rule.getString(1))).toDF("a", "b")
      val next = applyRule(corpus, ruleDf)
      // cache every round but the last: rounds 1..R-1 feed two
      // consumers (next rule's pair count + next rewrite); the final
      // rewrite feeds only the output projection
      corpus =
        if (r < Rounds) org.apache.spark.sql.GraftShims.cachedLeaf(next)._1
        else next
    }
    corpus
  }

  /** FERTILITY — the tokenizer-efficiency report: per source, total
    * post-encode pieces over total pre-encode words (merges only fuse,
    * so ≤ 1 here; a subword tokenizer reports the same ratio ≥ 1 —
    * either way it is the per-register compression the vocab-size and
    * per-language token-budget decisions read). Per SOURCE because
    * that is where real corpora diverge: code/markup merges poorly,
    * templated text merges heavily.
    *
    * Scale: both totals are map-side-combinable keyed sums over
    * per-row `size()` projections (no explode, no extra corpus
    * shuffle beyond the encode rounds the product already pays);
    * output is O(sources). */
  def qBpeFertility(s: SparkSession, dir: String): DataFrame = {
    val words = load(s, dir, "documents")
      .selectExpr("doc_id", "source",
        "cast(size(filter(split(lower(text), ' '), t -> length(t) > 0)) as bigint) as w")
    encodedCorpus(s, dir).selectExpr("doc_id", "cast(size(ta) as bigint) as p")
      .join(words, "doc_id")
      .groupBy("source")
      .agg(
        org.apache.spark.sql.functions.expr("sum(w) as n_words"),
        org.apache.spark.sql.functions.expr("sum(p) as n_pieces"))
      .selectExpr("source", "n_words", "n_pieces",
        "cast(n_pieces as double) / n_words as fertility")
      .orderBy("source")
  }

  /** Shared oracle CTE chain `c0 … c$Rounds` — the encode rounds both
    * [[qBpeEncodeSql]] and [[qBpeFertilitySql]] replay. */
  private def encodeRoundsSqlCtes: String = {
    def round(r: Int): String = {
      val prev = s"c${r - 1}"
      s"""pc$r AS (
         |  SELECT a, b, COUNT(*) AS cnt
         |  FROM (SELECT ta[i] AS a, ta[i + 1] AS b
         |        FROM $prev, UNNEST(range(1, len(ta))) AS u(i))
         |  WHERE a <> b GROUP BY a, b),
         |b$r AS (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1),
         |c$r AS (
         |  SELECT doc_id,
         |         flatten(list_transform(range(1, len(ta) + 1), i ->
         |           CASE WHEN i < len(ta) AND ta[i] = b$r.a AND ta[i + 1] = b$r.b
         |                THEN [ta[i] || ' ' || ta[i + 1]]
         |                WHEN i > 1 AND ta[i - 1] = b$r.a AND ta[i] = b$r.b
         |                THEN []
         |                ELSE [ta[i]] END)) AS ta
         |  FROM $prev CROSS JOIN b$r)""".stripMargin
    }
    s"""c0 AS (
       |  SELECT doc_id,
       |         list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |${(1 to Rounds).map(round).mkString(",\n")}""".stripMargin
  }

  val qBpeEncodeSql: String =
    s"""WITH $encodeRoundsSqlCtes
       |SELECT doc_id, CAST(len(ta) AS INT) AS n_toks,
       |       md5(array_to_string(ta, chr(31))) AS tok_hash
       |FROM c$Rounds ORDER BY doc_id""".stripMargin

  val qBpeFertilitySql: String =
    s"""WITH $encodeRoundsSqlCtes,
       |w AS (SELECT doc_id, len(ta) AS w FROM c0),
       |p AS (SELECT doc_id, len(ta) AS p FROM c$Rounds)
       |SELECT d.source,
       |       CAST(SUM(w.w) AS BIGINT) AS n_words,
       |       CAST(SUM(p.p) AS BIGINT) AS n_pieces,
       |       CAST(SUM(p.p) AS DOUBLE) / CAST(SUM(w.w) AS BIGINT) AS fertility
       |FROM w JOIN p ON w.doc_id = p.doc_id
       |     JOIN documents d ON w.doc_id = d.doc_id
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_bpe_fertility" -> (qBpeFertility _))

  val oracleSql: Map[String, String] = Map(
    "q_bpe_merges" -> qBpeMergesSql,
    "q_bpe_encode" -> qBpeEncodeSql,
    "q_bpe_fertility" -> qBpeFertilitySql)
}
