package graft.llm

import graft.Tables.load
import graft.llm.Portable._
import graft.functions.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label).
  *
  * Two tiers, mirroring how a 100 TB vector corpus is actually served:
  *  - [[qKnnBruteForce]]: exact cosine top-k. The query set is tiny and
  *    broadcast; the corpus is scanned once, fully parallel, and the
  *    top-k per query is a bounded [[graft.functions.TopK]] aggregate
  *    (O(k) state map-side), NOT a per-query global sort. This is the
  *    correctness baseline and also the right plan for small query
  *    batches at any corpus size.
  *  - [[qAnnLshBuckets]] / [[qAnnLshTopK]]: random-hyperplane LSH. Each
  *    vector gets a b-bit signature (sign of dot with b pseudo-random
  *    hyperplanes); the bucket id is a shuffle key, so candidate
  *    generation for a query is an equi-join on its bucket — the scan
  *    cost per query drops from O(n) to O(n / 2^b) expected, and an IVF
  *    layout (pre-partition by bucket) makes it a partition-pruned read.
  *
  * All FP math is pinned to a deterministic shape so the DuckDB oracle
  * matches bit-for-bit: elementwise float→double products folded
  * left-to-right (Spark `aggregate`, DuckDB `list_reduce`), IEEE sqrt
  * and division. Hyperplane coefficients derive from the portable md5
  * hash ([[Portable]]): w_j[i] = H("hp"+j+"_"+i) mod 2001 - 1000.
  */
object Similarity {

  private val LSH_BITS = 6 // 64 buckets

  /** Spark: left-fold sum of a double array expression. */
  private def foldSumS(arr: String): String =
    s"aggregate($arr, cast(0 as double), (acc, p) -> acc + p)"

  /** Spark: cosine(a, b) with deterministic evaluation order. */
  private def cosS(a: String, b: String): String = {
    val dot = foldSumS(s"zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double))")
    val na = foldSumS(s"transform($a, x -> cast(x as double) * cast(x as double))")
    val nb = foldSumS(s"transform($b, x -> cast(x as double) * cast(x as double))")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  /** DuckDB: identical cosine (list_reduce folds left like aggregate). */
  private def cosD(a: String, b: String): String = {
    def fold(l: String) = s"list_reduce($l, (acc, p) -> acc + p)"
    val dot = fold(s"list_transform(range(1, len($a) + 1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)")
    val na = fold(s"list_transform($a, x -> x::DOUBLE * x::DOUBLE)")
    val nb = fold(s"list_transform($b, x -> x::DOUBLE * x::DOUBLE)")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  private val knnSchema = StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false)))

  // ------------------------------------------------------- brute force
  /** Exact cosine top-10 for each query vector (vec_id < 5) against the
    * whole corpus (self excluded). */
  def qKnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
    val queries = emb.filter("vec_id < 5")
      .selectExpr("vec_id as query_id", "embedding as q_emb")
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id", s"${cosS("q_emb", "embedding")} as cosine")
      .groupBy("query_id")
      .agg(TopK.topK(10, knnSchema)(col("cosine"), col("vec_id")).as("top"))
      .selectExpr("query_id", "posexplode(top) as (pos, r)")
      .selectExpr("query_id", "cast(pos + 1 as int) as rank",
        "r.tie as vec_id", "r.ord as cosine")
      .orderBy("query_id", "rank")
  }

  val qKnnBruteForceSql: String = {
    val cos = cosD("q.q_emb", "e.embedding")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, $cos AS cosine
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
       |FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  // --------------------------------------------------------- LSH bits
  /** Spark: b-bit random-hyperplane signature of `embedding`. */
  private val sigS: String = {
    val hp = hSpark("concat('hp', cast(j as string), '_', cast(i as string))")
    val dotJ =
      s"""aggregate(sequence(1, size(embedding)), cast(0 as double),
         |  (a, i) -> a + cast(($hp % 2001) - 1000 as double) * cast(element_at(embedding, i) as double))""".stripMargin
    s"""aggregate(sequence(0, ${LSH_BITS - 1}), cast(0 as bigint),
       |  (acc, j) -> acc + if($dotJ >= 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""".stripMargin
  }

  /** DuckDB twin of [[sigS]]. */
  private val sigD: String = {
    val hp = hDuck("('hp' || j::VARCHAR || '_' || i::VARCHAR)")
    val dotJ =
      s"""list_reduce(list_transform(range(1, len(embedding) + 1),
         |  i -> (($hp % 2001) - 1000)::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)""".stripMargin
    s"""CAST(list_sum(list_transform(range(0, $LSH_BITS),
       |  j -> CASE WHEN $dotJ >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin
  }

  /** Bucket occupancy histogram — the data-layout view of the index
    * (bucket id is the IVF partition key at scale). */
  def qAnnLshBuckets(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .selectExpr(s"$sigS as bucket")
      .groupBy("bucket")
      .agg(org.apache.spark.sql.functions.expr("count(*) as n_vectors"))
      .orderBy("bucket")

  val qAnnLshBucketsSql: String =
    s"""SELECT $sigD AS bucket, COUNT(*) AS n_vectors
       |FROM embeddings
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  /** ANN: top-3 by exact cosine among same-bucket candidates for each
    * query vector (vec_id < 5) — bucket equi-join, then the bounded
    * top-k aggregate. The approximate answer; recall vs [[qKnnBruteForce]]
    * is the quality metric (asserted in ScalaTest). */
  def qAnnLshTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings").selectExpr("vec_id", "embedding", s"$sigS as bucket")
    val queries = emb.filter("vec_id < 5")
      .selectExpr("vec_id as query_id", "embedding as q_emb", "bucket")
    emb.join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id", s"${cosS("q_emb", "embedding")} as cosine")
      .groupBy("query_id")
      .agg(TopK.topK(3, knnSchema)(col("cosine"), col("vec_id")).as("top"))
      .selectExpr("query_id", "posexplode(top) as (pos, r)")
      .selectExpr("query_id", "cast(pos + 1 as int) as rank",
        "r.tie as vec_id", "r.ord as cosine")
      .orderBy("query_id", "rank")
  }

  val qAnnLshTopKSql: String = {
    val cos = cosD("q.q_emb", "e.embedding")
    s"""WITH sig AS (SELECT vec_id, embedding, $sigD AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM sig WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, $cos AS cosine
       |  FROM sig e JOIN q USING (bucket)
       |  WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_bruteforce" -> (qKnnBruteForce _),
    "q_ann_lsh_buckets" -> (qAnnLshBuckets _),
    "q_ann_lsh_topk" -> (qAnnLshTopK _))

  val oracleSql: Map[String, String] = Map(
    "q_knn_bruteforce" -> qKnnBruteForceSql,
    "q_ann_lsh_buckets" -> qAnnLshBucketsSql,
    "q_ann_lsh_topk" -> qAnnLshTopKSql)
}
