package graft.llm

import graft.Tables.load
import graft.llm.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * The reference (hansetag/iceberg-rest-server) has no text operators —
  * it delegates all data processing to Spark (SURVEY.md §2.5); these are
  * the pipeline capabilities the BASELINE north star adds on top. Each
  * query is a pure declarative plan (narrow per-row expressions + one
  * final aggregate), so at 100 TB it is embarrassingly parallel: no
  * shuffle until the final small groupBy, filters/projections reach the
  * parquet scan, everything stays inside whole-stage codegen (no UDFs —
  * only built-in string/array/higher-order functions).
  *
  * Every query has a value-identical DuckDB oracle: see [[Portable]] for
  * the md5-based cross-engine hash.
  */
object TextAnalysis {

  // Shared expression snippets (Spark SQL dialect).
  private[llm] val toksS = "split(lower(text), ' ')"
  private[llm] val stopwords = "('the','a','of','to','and','in','is','it','for','on')"

  // ------------------------------------------------------------- stats
  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation — the pre-tokenizer
    * shape BPE vocabularies use), aggregated per (lang, source).
    */
  def qTextStats(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr(
        "lang", "source",
        s"size($toksS) as n_ws_tokens",
        "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as n_re_tokens",
        "length(text) as len_chars")
      .groupBy("lang", "source")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("sum(n_ws_tokens) as sum_ws_tokens"),
        org.apache.spark.sql.functions.expr("sum(n_re_tokens) as sum_re_tokens"),
        org.apache.spark.sql.functions.expr(
          "cast(sum(len_chars) as double) / count(*) as avg_chars"),
        org.apache.spark.sql.functions.expr("max(len_chars) as max_chars"))
      .orderBy("lang", "source")

  val qTextStatsSql: String =
    """WITH d AS (
      |  SELECT lang, source,
      |         len(string_split(lower(text), ' ')) AS n_ws_tokens,
      |         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens,
      |         length(text) AS len_chars
      |  FROM documents)
      |SELECT lang, source,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_ws_tokens) AS BIGINT) AS sum_ws_tokens,
      |       CAST(SUM(n_re_tokens) AS BIGINT) AS sum_re_tokens,
      |       CAST(SUM(len_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |       MAX(len_chars) AS max_chars
      |FROM d GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  // ----------------------------------------------------------- quality
  /** Per-document heuristic quality score (0.25 per satisfied
    * criterion, exact binary fractions — cross-engine hash-safe) —
    * shared by the per-source aggregate below and the quota cap
    * ([[Sampling.qSourceCap]]). One narrow codegen'd pass. */
  private[llm] def qualityScored(s: SparkSession, dir: String): DataFrame =
    scoreQuality(load(s, dir, "documents"), Seq("doc_id", "source"))

  /** THE quality formula applied to any frame with a `text` column:
    * appends `quality`, keeps `carry`. One narrow codegen'd pass —
    * shared by [[qualityScored]] and the end-to-end curation pipeline
    * ([[Curate.qCurateE2e]]) so the score can never drift between the
    * standalone gates and the composed one. */
  private[llm] def scoreQuality(df: DataFrame, carry: Seq[String]): DataFrame =
    scoreQualityWithToks(
      df.selectExpr((carry ++ Seq("text", s"$toksS as toks")): _*), carry)

  /** [[scoreQuality]] over a frame that ALREADY carries `toks` =
    * `split(lower(text), ' ')` alongside `text` (r20): the two-stage
    * selectExpr form evaluated the split TWICE per row (once under
    * n_tok, once under n_stop), and corpus leaves that already store
    * the tokenized corpus ([[Dedup.qDedupKeepBest]]'s shared leaf)
    * can feed their stored `toks` in directly instead of paying a
    * second documents scan + re-tokenize. Values are identical by
    * construction — same formula text, same token derivation. */
  private[llm] def scoreQualityWithToks(df: DataFrame, carry: Seq[String]): DataFrame =
    df
      .selectExpr(carry ++ Seq(
        "size(toks) as n_tok",
        s"size(filter(toks, x -> x in $stopwords)) as n_stop",
        "length(text) as n_char",
        "length(regexp_replace(lower(text), '[^a-z0-9 ]', '')) as n_clean",
        "length(replace(text, ' ', '')) as n_nospace"): _*)
      .selectExpr(carry :+
        """cast(n_tok between 20 and 1000 as int) * 0.25
          | + cast((cast(n_stop as double) / n_tok) between 0.01 and 0.5 as int) * 0.25
          | + cast((cast(n_nospace as double) / n_tok) between 3.0 and 10.0 as int) * 0.25
          | + cast((cast(n_char - n_clean as double) / n_char) <= 0.2 as int) * 0.25
          | as quality""".stripMargin: _*)

  /** Heuristic quality scoring (the classic pre-LLM-filtering shape:
    * length band, stopword ratio, mean word length, punctuation ratio),
    * 0.25 per satisfied criterion, aggregated per source.
    */
  def qTextQuality(s: SparkSession, dir: String): DataFrame =
    qualityScored(s, dir)
      .groupBy("source")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr(
          "cast(sum(quality) as double) / count(*) as avg_quality"),
        org.apache.spark.sql.functions.expr(
          "sum(cast(quality >= 0.75 as int)) as n_pass"))
      .orderBy("source")

  val qTextQualitySql: String =
    """WITH d AS (
      |  SELECT source,
      |         len(string_split(lower(text), ' ')) AS n_tok,
      |         len(list_filter(string_split(lower(text), ' '),
      |             x -> x IN ('the','a','of','to','and','in','is','it','for','on'))) AS n_stop,
      |         length(text) AS n_char,
      |         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS n_clean,
      |         length(replace(text, ' ', '')) AS n_nospace
      |  FROM documents),
      |q AS (
      |  SELECT source,
      |         CAST(n_tok BETWEEN 20 AND 1000 AS INT) * 0.25
      |       + CAST((CAST(n_stop AS DOUBLE) / n_tok) BETWEEN 0.01 AND 0.5 AS INT) * 0.25
      |       + CAST((CAST(n_nospace AS DOUBLE) / n_tok) BETWEEN 3.0 AND 10.0 AS INT) * 0.25
      |       + CAST((CAST(n_char - n_clean AS DOUBLE) / n_char) <= 0.2 AS INT) * 0.25
      |         AS quality
      |  FROM d)
      |SELECT source, COUNT(*) AS n_docs,
      |       CAST(SUM(quality) AS DOUBLE) / COUNT(*) AS avg_quality,
      |       CAST(SUM(CAST(quality >= 0.75 AS INT)) AS BIGINT) AS n_pass
      |FROM q GROUP BY source
      |ORDER BY source""".stripMargin

  /** Per-source quality-quantile filter (the CCNet-style bucket cut):
    * each source keeps its documents at or above the smallest quality
    * level whose top-down cumulative count reaches 25% of the source —
    * a THRESHOLD filter, so ties at the cut level are all kept (the
    * deterministic, rank-free semantics; an exact 25% head with an id
    * tiebreak is [[Sampling.qSourceCap]]'s job).
    *
    * Scale: the quantile threshold is computed on the per-(source,
    * quality-level) HISTOGRAM — at most 5 rows per source regardless
    * of corpus size — so the only window in the plan runs over that
    * tiny histogram, keyed by source; the documents themselves see two
    * keyed aggregations and one broadcast-sized threshold join, never
    * a per-document sort. That is the 100 TB shape: a quantile cut
    * over N docs costs O(N) plus O(#sources) threshold state. */
  def qQualityQuantile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val scored = qualityScored(s, dir) // doc_id, source, quality
    val hist = scored.groupBy(col("source"), col("quality"))
      .agg(count(lit(1)).as("c"))
    // totals are a THIRD scan on purpose: it column-prunes to the lone
    // dictionary-encoded `source` column (no text, no regex pipeline),
    // so it is near-free at any scale. The tempting alternatives both
    // measured SLOWER at sf0.1: deriving totals from `hist` duplicates
    // the heavy quality subtree in the plan (Catalyst re-expands it —
    // a third FULL scan), and stacking a second window on the
    // histogram cost ~0.5 s of extra stage overhead for nothing.
    val totals = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
    val thr = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("source").orderBy(col("quality").desc)))
      .join(totals, "source")
      .where(col("cum") >= expr("(n + 3) div 4")) // integer ceil(n/4)
      .groupBy(col("source")).agg(max(col("quality")).as("q_thr"))
    scored.join(thr, "source")
      .where(col("quality") >= col("q_thr"))
      .select(col("doc_id"), col("source"),
        col("quality").cast("double").as("quality"))
      .orderBy(col("doc_id"))
  }

  val qQualityQuantileSql: String =
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
      |h AS (SELECT source, quality, COUNT(*) AS c FROM q GROUP BY source, quality),
      |cum AS (
      |  SELECT source, quality,
      |         SUM(c) OVER (PARTITION BY source) AS n,
      |         SUM(c) OVER (PARTITION BY source
      |                      ORDER BY quality DESC) AS cum
      |  FROM h),
      |thr AS (
      |  SELECT source, MAX(quality) AS q_thr
      |  FROM cum WHERE cum >= (n + 3) // 4 GROUP BY source)
      |SELECT q.doc_id, q.source, CAST(q.quality AS DOUBLE) AS quality
      |FROM q JOIN thr USING (source)
      |WHERE q.quality >= thr.q_thr
      |ORDER BY q.doc_id""".stripMargin

  // ------------------------------------------------------------ langid
  /** N-gram-marker language ID: counts language-characteristic function
    * words (padded substring occurrences — a tiny fixed "n-gram profile")
    * and classifies by the max with a deterministic priority order.
    * Output: confusion counts labeled-lang × predicted-lang.
    */
  private def occS(p: String): String =
    s"(length(padded) - length(replace(padded, '$p', ''))) / ${p.length}"

  def qTextLangId(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("lang", "concat(' ', lower(text), ' ') as padded")
      .selectExpr(
        "lang",
        s"${occS(" the ")} + ${occS(" and ")} + ${occS(" is ")} as score_en",
        s"${occS(" el ")} + ${occS(" la ")} + ${occS(" que ")} as score_es",
        s"${occS(" der ")} + ${occS(" und ")} + ${occS(" ist ")} as score_de",
        s"${occS(" le ")} + ${occS(" et ")} + ${occS(" est ")} as score_fr",
        s"${occS(" de ")} + ${occS(" shi ")} as score_zh")
      .selectExpr(
        "lang",
        """case
          | when score_en >= score_es and score_en >= score_de and score_en >= score_fr and score_en >= score_zh then 'en'
          | when score_es >= score_de and score_es >= score_fr and score_es >= score_zh then 'es'
          | when score_de >= score_fr and score_de >= score_zh then 'de'
          | when score_fr >= score_zh then 'fr'
          | else 'zh' end as predicted""".stripMargin)
      .groupBy("lang", "predicted")
      .agg(org.apache.spark.sql.functions.expr("count(*) as n_docs"))
      .orderBy("lang", "predicted")

  private def occD(p: String): String =
    s"(length(padded) - length(replace(padded, '$p', ''))) / ${p.length}"

  val qTextLangIdSql: String =
    s"""WITH p AS (SELECT lang, ' ' || lower(text) || ' ' AS padded FROM documents),
       |sc AS (
       |  SELECT lang,
       |         ${occD(" the ")} + ${occD(" and ")} + ${occD(" is ")} AS score_en,
       |         ${occD(" el ")} + ${occD(" la ")} + ${occD(" que ")} AS score_es,
       |         ${occD(" der ")} + ${occD(" und ")} + ${occD(" ist ")} AS score_de,
       |         ${occD(" le ")} + ${occD(" et ")} + ${occD(" est ")} AS score_fr,
       |         ${occD(" de ")} + ${occD(" shi ")} AS score_zh
       |  FROM p),
       |cls AS (
       |  SELECT lang,
       |         CASE
       |          WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
       |          WHEN score_es >= score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
       |          WHEN score_de >= score_fr AND score_de >= score_zh THEN 'de'
       |          WHEN score_fr >= score_zh THEN 'fr'
       |          ELSE 'zh' END AS predicted
       |  FROM sc)
       |SELECT lang, predicted, COUNT(*) AS n_docs
       |FROM cls GROUP BY lang, predicted
       |ORDER BY lang, predicted""".stripMargin

  // ------------------------------------------------------- fingerprint
  /** Document fingerprinting: a whole-doc content hash plus a bottom-1
    * shingle sketch (min hash over word 3-gram shingles — the building
    * block of the MinHash signatures in [[Dedup]]).
    */
  def qTextFingerprint(s: SparkSession, dir: String): DataFrame =
    // bottom-1 shingle sketch in one codegen'd pass per document
    // ([[graft.functions.ShingleMin]]) riding the same scan as the
    // whole-doc content hash — no join, no shingle rows
    load(s, dir, "documents")
      .selectExpr("doc_id", s"${hSpark("lower(text)")} as fp_full", s"$toksS as toks")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("fp_full"),
        org.apache.spark.sql.functions.coalesce(
          graft.functions.TextHashExprs.shingleMin(
            org.apache.spark.sql.functions.col("toks")),
          org.apache.spark.sql.functions.lit(-1L)).as("fp_min_shingle"))
      .orderBy("doc_id")

  val qTextFingerprintSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks, lower(text) AS ltext FROM documents)
       |SELECT doc_id,
       |       ${hDuck("ltext")} AS fp_full,
       |       COALESCE(list_min(list_transform(
       |         list_transform(range(1, greatest(len(toks) - 1, 1)),
       |                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
       |         s -> ${hDuck("s")})), -1) AS fp_min_shingle
       |FROM d
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- registry
  /** Within-document repetition metrics — the Gopher/MassiveText-style
    * quality filters over token streams: duplicate-token fraction
    * (1 − distinct/total) and top-bigram fraction (occurrences of the
    * most frequent 2-gram over all 2-grams). Highly repetitive
    * documents (template spam, keyword stuffing, decode loops) score
    * high on both and are dropped by quality gates.
    *
    * Scale: the ENTIRE metric is one native codegen'd pass per
    * document ([[graft.functions.TextHashExprs.repetitionStats]]:
    * token count, distinct tokens, top-bigram multiplicity, bigram
    * total from doc-local exact string counting — memory bounded by
    * the doc's own length) — zero data-plane shuffles, only the final
    * output sort. The first formulation (interpreted-HOF bigram
    * transform + explode + two keyed aggs) measured ~6 µs/element and
    * two corpus shuffles; the native pass replaces all of it, the same
    * trade every hashing operator in this layer makes. Docs with <2
    * tokens have no bigrams and drop out (both engines). */
  def qTextRepetition(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextHashExprs.repetitionStats(
          org.apache.spark.sql.functions.expr("split(lower(text), ' ')")).as("r"))
      .filter("r.total_bg > 0")
      .selectExpr(
        "doc_id", "r.n_toks as n_toks",
        "cast(r.n_toks - r.n_distinct as double) / r.n_toks as dup_tok_frac",
        "cast(r.top_bg as double) / r.total_bg as top_bigram_frac")
      .orderBy("doc_id")

  val qTextRepetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |st AS (
      |  SELECT doc_id, len(toks) AS n_toks,
      |         len(list_distinct(toks)) AS n_distinct
      |  FROM t),
      |bg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(toks)),
      |           i -> toks[i] || ' ' || toks[i+1])) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
      |top AS (SELECT doc_id, MAX(c) AS top_bg, SUM(c) AS total_bg
      |        FROM cnt GROUP BY doc_id)
      |SELECT st.doc_id, st.n_toks,
      |       CAST(st.n_toks - st.n_distinct AS DOUBLE) / st.n_toks AS dup_tok_frac,
      |       CAST(top.top_bg AS DOUBLE) / top.total_bg AS top_bigram_frac
      |FROM st JOIN top ON st.doc_id = top.doc_id
      |ORDER BY st.doc_id""".stripMargin

  // ----------------------------------------------------------- pii
  /** PII scrubbing (the standard pre-training redaction pass): emails,
    * IPv4 addresses, then phone-like digit runs are replaced with
    * typed placeholders, staged so each pattern counts only what IT
    * redacted (the phone pattern would otherwise re-match the digits
    * of an IP). Patterns are the Java/RE2 common subset — character
    * classes, bounded repetition, `\b` — so Spark and the DuckDB
    * oracle agree byte-for-byte (RE2 has no lookaround, so a total
    * digit-count gate is not expressible). The phone stage is a
    * HEURISTIC with known false-positive classes inherent to
    * regex-only detection: dash/space-grouped digit strings of
    * phone-like length (ISO dates, ISBNs, long digit runs) are
    * redacted too — the conservative direction for training data
    * (over-redaction loses a token; under-redaction leaks PII).
    * Plain decimals, short numbers, and sentence-spanning digit
    * sequences do NOT match (no `.` in the class, run bounded).
    * On this corpus the pass is a proven no-op; true positives and
    * the FP boundary are pinned in TextAnalysisSpec.
    *
    * Scale: three codegen'd regexp passes per row, no shuffle at all
    * until the final presentation sort. */
  private val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiIp = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private val piiPhone = "\\+?[0-9][0-9()\\- ]{7,14}[0-9]"

  def qPiiRedact(s: SparkSession, dir: String): DataFrame =
    redactPii(load(s, dir, "documents"))

  /** Core of [[qPiiRedact]] over any (doc_id, text) frame. */
  def redactPii(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, regexp_extract_all, regexp_replace, size}
    def pass(df: DataFrame, pat: String, tag: String, n: String): DataFrame = df
      .withColumn(n, size(regexp_extract_all(col("red_text"), lit(pat), lit(0)))
        .cast("long"))
      .withColumn("red_text", regexp_replace(col("red_text"), pat, tag))
    val base = docs.select(col("doc_id"), col("text").as("red_text"))
    pass(pass(pass(base, piiEmail, "<EMAIL>", "n_emails"),
        piiIp, "<IP>", "n_ips"),
        piiPhone, "<PHONE>", "n_phones")
      .select("doc_id", "red_text", "n_emails", "n_ips", "n_phones")
      .orderBy("doc_id")
  }

  val qPiiRedactSql: String =
    """WITH e AS (
      |  SELECT doc_id,
      |         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS red_text
      |  FROM documents),
      |i AS (
      |  SELECT doc_id, n_emails,
      |         len(regexp_extract_all(red_text, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
      |         regexp_replace(red_text, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS red_text
      |  FROM e)
      |SELECT doc_id,
      |       regexp_replace(red_text, '\+?[0-9][0-9()\- ]{7,14}[0-9]', '<PHONE>', 'g') AS red_text,
      |       n_emails, n_ips,
      |       len(regexp_extract_all(red_text, '\+?[0-9][0-9()\- ]{7,14}[0-9]')) AS n_phones
      |FROM i
      |ORDER BY doc_id""".stripMargin

  /** Chunk window / stride in tokens (overlap = W − S). */
  private val ChunkW = 64
  private val ChunkS = 48

  /** Document CHUNKING — the RAG / context-window prep step: each
    * document explodes into fixed-size token windows (W = [[ChunkW]],
    * stride [[ChunkS]], so consecutive chunks overlap by W − S
    * tokens; the final chunk is the remainder, never empty). Output
    * pins chunk boundaries and content via a portable 60-bit hash of
    * each chunk's text — the id a chunk store / embedding pipeline
    * would key on.
    *
    * Scale: a pure per-row explode (fanout n/S per document) with no
    * shuffle except the gate's output sort; chunk membership is a
    * function of the document alone, so re-chunking any partition is
    * deterministic and parallel. */
  def qDocChunks(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("doc_id", s"filter($toksS, t -> length(t) > 0) as ta")
      .selectExpr("doc_id", "ta", "size(ta) as n")
      .where("n > 0")
      .selectExpr("doc_id", "ta",
        s"explode(sequence(0, (greatest(n - $ChunkW, 0) + ${ChunkS - 1}) div $ChunkS)) as chunk_id")
      .selectExpr("doc_id", "chunk_id",
        s"slice(ta, cast(chunk_id * $ChunkS + 1 as int), $ChunkW) as ct")
      .selectExpr("doc_id", "cast(chunk_id as bigint) as chunk_id",
        "cast(size(ct) as bigint) as n_tokens",
        s"${hSpark("array_join(ct, ' ')")} as chunk_hash")
      .orderBy("doc_id", "chunk_id")

  val qDocChunksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS ta
       |  FROM documents),
       |n AS (SELECT doc_id, ta, len(ta) AS n FROM d WHERE len(ta) > 0),
       |c AS (SELECT doc_id, ta,
       |             unnest(range(0, (greatest(n - $ChunkW, 0) + ${ChunkS - 1}) // $ChunkS + 1)) AS cid
       |      FROM n),
       |s AS (SELECT doc_id, cid,
       |             ta[cid * $ChunkS + 1 : cid * $ChunkS + $ChunkW] AS ct
       |      FROM c)
       |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
       |       CAST(len(ct) AS BIGINT) AS n_tokens,
       |       ${hDuck("array_to_string(ct, ' ')")} AS chunk_hash
       |FROM s
       |ORDER BY doc_id, chunk_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_chunks" -> (qDocChunks _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_text_stats" -> (qTextStats _),
    "q_text_quality" -> (qTextQuality _),
    "q_text_langid" -> (qTextLangId _),
    "q_text_fingerprint" -> (qTextFingerprint _),
    "q_text_repetition" -> (qTextRepetition _),
    "q_quality_quantile" -> (qQualityQuantile _))

  val oracleSql: Map[String, String] = Map(
    "q_doc_chunks" -> qDocChunksSql,
    "q_pii_redact" -> qPiiRedactSql,
    "q_text_stats" -> qTextStatsSql,
    "q_text_quality" -> qTextQualitySql,
    "q_text_langid" -> qTextLangIdSql,
    "q_text_fingerprint" -> qTextFingerprintSql,
    "q_text_repetition" -> qTextRepetitionSql,
    "q_quality_quantile" -> qQualityQuantileSql)
}
