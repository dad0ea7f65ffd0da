package graft.llm

import graft.Tables.load
import graft.llm.Portable.{hDuck, hSpark}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr}

/** End-to-end curation: the composed training-data pipeline every
  * standalone gate in this package is a stage of, run as ONE lazy plan
  * over ONE corpus scan per stage —
  *
  *   exact dedup → exact-match decontamination → quality filter →
  *   per-source quota cap → deterministic split assignment.
  *
  * (The reference delegates all data processing to Spark — this
  * pipeline IS the library's reason to exist at 100 TB: a user chains
  * these stages daily; composing them in one plan is what the
  * standalone per-stage gates cannot show.)
  *
  * Stage shapes (each the scale-correct one proven by its standalone
  * gate):
  *  - exact dedup: `min_by` over the 64-bit content key — one keyed
  *    hash aggregate, survivor row kept in-aggregate (no rejoin);
  *  - decontamination: LEFT ANTI against the eval set's content keys
  *    — eval sets are small by definition, so the bench side
  *    broadcasts and the corpus never shuffles;
  *  - quality: the shared [[TextAnalysis.scoreQuality]] projection —
  *    per-row, no shuffle, same formula as the standalone gates;
  *  - quota cap: the bounded [[graft.functions.TopK]] aggregate — ≤K
  *    candidates per source per mapper, never a per-source window;
  *  - split: pure per-row hash gate — stable under retries and corpus
  *    growth.
  *
  * Corpus = documents ∪ exact copies (every 10th doc, the
  * [[Dedup.qDedupExact]] derivation) so dedup provably fires; the eval
  * set = every 97th original document, so decontamination provably
  * fires (and removes the eval docs themselves — "never train on the
  * benchmark" includes the benchmark).
  */
object Curate {

  /** Keep the K best per source after dedup + decontamination. */
  val CurateK = 20
  /** Minimum heuristic quality a survivor needs. */
  val MinQuality = 0.5

  def qCurateE2e(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val base = load(s, dir, "documents").selectExpr("doc_id as id", "source", "text")
    val copies = base.filter("id % 10 = 0")
      .selectExpr("id + 1000000 as id", "source", "text")
    val corpus = base.unionAll(copies)
      .selectExpr("id", "source", "text", s"${hSpark("lower(text)")} as content_key")

    // exact dedup: one hash aggregate, survivor carried via min_by
    val kept = corpus
      .groupBy("content_key")
      .agg(expr("min_by(named_struct('id', id, 'source', source, 'text', text), id) as r"))
      .selectExpr("content_key", "r.id as id", "r.source as source", "r.text as text")

    // exact-match decontamination vs the eval set (originals only —
    // copies share the key anyway); anti-join on the broadcast keys
    val benchKeys = corpus.filter("id % 97 = 0 and id < 1000000")
      .select("content_key").distinct()
    val clean = kept.join(broadcast(benchKeys), Seq("content_key"), "left_anti")

    val filtered = TextAnalysis.scoreQuality(clean, Seq("id", "source"))
      .filter(s"quality >= $MinQuality")

    val rowSchema = StructType(Seq(
      StructField("quality", DoubleType), StructField("doc_id", LongType)))
    filtered
      .groupBy("source")
      .agg(graft.functions.TopK.topK(CurateK, rowSchema)(
        col("quality").cast("double"), col("id")).as("top"))
      .selectExpr("source", "inline(top)")
      .selectExpr("source", "doc_id", "quality",
        s"""case when ${Sampling.splitPermille("doc_id")} < 980 then 'train'
           |     when ${Sampling.splitPermille("doc_id")} < 990 then 'val'
           |     else 'test' end as split""".stripMargin)
      .orderBy("source", "doc_id")
  }

  val qCurateE2eSql: String =
    s"""WITH base AS (SELECT doc_id AS id, source, text FROM documents),
       |corpus AS (
       |  SELECT id, source, text FROM base
       |  UNION ALL
       |  SELECT id + 1000000, source, text FROM base WHERE id % 10 = 0),
       |keyed AS (SELECT id, source, text, ${hDuck("lower(text)")} AS content_key FROM corpus),
       |kept AS (
       |  SELECT content_key, id, source, text FROM (
       |    SELECT k.*, ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY id) AS rn
       |    FROM keyed k) WHERE rn = 1),
       |bench AS (SELECT DISTINCT content_key FROM keyed WHERE id % 97 = 0 AND id < 1000000),
       |clean AS (SELECT * FROM kept WHERE content_key NOT IN (SELECT content_key FROM bench)),
       |d AS (
       |  SELECT id, source,
       |         len(string_split(lower(text), ' ')) AS n_tok,
       |         len(list_filter(string_split(lower(text), ' '),
       |             x -> x IN ('the','a','of','to','and','in','is','it','for','on'))) AS n_stop,
       |         length(text) AS n_char,
       |         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS n_clean,
       |         length(replace(text, ' ', '')) AS n_nospace
       |  FROM clean),
       |q AS (
       |  SELECT id, source,
       |         CAST(n_tok BETWEEN 20 AND 1000 AS INT) * 0.25
       |       + CAST((CAST(n_stop AS DOUBLE) / n_tok) BETWEEN 0.01 AND 0.5 AS INT) * 0.25
       |       + CAST((CAST(n_nospace AS DOUBLE) / n_tok) BETWEEN 3.0 AND 10.0 AS INT) * 0.25
       |       + CAST((CAST(n_char - n_clean AS DOUBLE) / n_char) <= 0.2 AS INT) * 0.25
       |         AS quality
       |  FROM d),
       |f AS (SELECT * FROM q WHERE quality >= $MinQuality),
       |r AS (
       |  SELECT source, id AS doc_id, CAST(quality AS DOUBLE) AS quality,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |                            ORDER BY quality DESC, id) AS rk
       |  FROM f)
       |SELECT source, doc_id, quality,
       |       CASE WHEN ((doc_id % 1000000007) * 3267000013) % 4294967296 % 1000 < 980 THEN 'train'
       |            WHEN ((doc_id % 1000000007) * 3267000013) % 4294967296 % 1000 < 990 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM r WHERE rk <= $CurateK
       |ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_e2e" -> (qCurateE2e _))

  val oracleSql: Map[String, String] = Map(
    "q_curate_e2e" -> qCurateE2eSql)
}
