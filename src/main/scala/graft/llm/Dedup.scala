package graft.llm

import graft.Tables.load
import graft.llm.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, min}

/** Deduplication operators over the `documents` table: exact
  * (hash-groupBy), MinHash+LSH near-dup (shingle → signature → band →
  * bucket-join → within-bucket Jaccard verify), and SimHash signatures.
  *
  * Scale design (the whole point — 100 TB corpora):
  *  - NOTHING is all-pairs. Candidate generation is an equi-join on
  *    (band, band_key): only documents sharing an LSH bucket ever meet,
  *    so the shuffle is keyed and the join output is proportional to
  *    true near-dup density, not n².
  *  - Signatures are per-row narrow expressions (codegen'd higher-order
  *    functions over the token array; no UDFs, no driver collection).
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

  // Spark-side shared snippets.
  private val toksS = "split(lower(text), ' ')"
  /** Distinct word-3-gram shingles of a `toks` array column. */
  private val shingleS: String =
    s"""array_distinct(
       |  case when size(toks) >= 3
       |       then transform(sequence(1, size(toks) - 2),
       |            i -> concat(element_at(toks, i), ' ', element_at(toks, i+1), ' ', element_at(toks, i+2)))
       |       else cast(array() as array<string>) end)""".stripMargin

  // DuckDB-side twins.
  private val shingleD: String =
    """list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
      |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))""".stripMargin

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
  def qDedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "documents").selectExpr("doc_id as id", s"$toksS as toks")
    val variants = base.filter("id % 7 = 0")
      .selectExpr("id + 2000000 as id", "slice(toks, 1, greatest(size(toks) - 4, 0)) as toks")
    val sh = base.unionAll(variants).selectExpr("id", s"$shingleS as sh")

    val mh = sh.selectExpr(
      "id", "sh",
      s"""transform(sequence(0, ${NUM_HASHES - 1}),
         |  i -> array_min(transform(sh, s -> ${hSparkSeeded("i", "s")}))) as mh""".stripMargin)

    val bands = mh.selectExpr(
      "id",
      s"""explode(transform(sequence(0, ${NUM_BANDS - 1}),
         |  b -> named_struct(
         |    'b', b,
         |    'k', ${hSpark("concat('band', cast(b as string), '|', cast(element_at(mh, 2*b+1) as string), ',', cast(element_at(mh, 2*b+2) as string))")}))) as band""".stripMargin)
      .selectExpr("id", "band.b as b", "band.k as k")

    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(expr("*")).as("n_shared_bands"))

    pairs
      .join(sh.selectExpr("id as id_a", "sh as sh_a"), "id_a")
      .join(sh.selectExpr("id as id_b", "sh as sh_b"), "id_b")
      .selectExpr(
        "id_a", "id_b", "n_shared_bands",
        "size(filter(sh_a, q -> array_contains(sh_b, q))) as inter",
        "size(sh_a) + size(sh_b) as tot")
      .selectExpr(
        "id_a", "id_b", "n_shared_bands",
        "cast(inter as double) / (tot - inter) as jaccard")
      .filter("jaccard >= 0.5")
      .orderBy("id_a", "id_b")
  }

  val qDedupMinhashLshSql: String = {
    val hSeed = hDuckSeeded("i", "s")
    val hBand = hDuck(
      "('band' || b::VARCHAR || '|' || mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR)")
    s"""WITH base AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS toks FROM documents),
       |corpus AS (
       |  SELECT id, toks FROM base
       |  UNION ALL
       |  SELECT id + 2000000, toks[1:greatest(len(toks) - 4, 0)] FROM base WHERE id % 7 = 0),
       |sh AS (SELECT id, $shingleD AS sh FROM corpus),
       |mh AS (SELECT id, sh,
       |         list_transform(range(0, $NUM_HASHES),
       |           i -> list_min(list_transform(sh, s -> $hSeed))) AS mh
       |       FROM sh),
       |bands AS (
       |  SELECT id, b, $hBand AS k
       |  FROM mh CROSS JOIN (SELECT unnest(range(0, $NUM_BANDS)) AS b) bs),
       |pairs AS (
       |  SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_shared_bands
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.k = y.k AND x.id < y.id
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
  }

  // ----------------------------------------------------------- SimHash
  /** 60-bit SimHash signature per document from distinct unigram token
    * hashes: bit j is set iff the sum over tokens of ±1 (sign of bit j
    * of the token hash) is positive. Near-dups differ in few bits; a
    * banded hamming join on signature chunks is the scale path (the
    * banding reuses the LSH machinery above).
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("doc_id", s"array_distinct($toksS) as toks")
      .selectExpr("doc_id", s"transform(toks, t -> ${hSpark("t")}) as hs")
      .selectExpr(
        "doc_id",
        """aggregate(sequence(0, 59), cast(0 as bigint),
          |  (acc, j) -> acc + if(
          |    aggregate(hs, cast(0 as bigint), (a, h) -> a + (2 * (shiftright(h, j) & 1) - 1)) > 0,
          |    shiftleft(cast(1 as bigint), j), cast(0 as bigint))) as simhash""".stripMargin)
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

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_minhash_lsh" -> (qDedupMinhashLsh _),
    "q_dedup_simhash" -> (qDedupSimhash _))

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" -> qDedupExactSql,
    "q_dedup_minhash_lsh" -> qDedupMinhashLshSql,
    "q_dedup_simhash" -> qDedupSimhashSql)
}
