package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** NULL group keys through the incremental fold: SQL GROUP BY treats
  * NULL as a single group, but plain name joins (and EqualTo) never
  * match NULLs — before the null-safe state joins this corrupted every
  * NULL-key group (the prev state failed to merge with its delta,
  * splitting or losing the group). Regression-pins the `<=>` discipline
  * in ChangelogApply.nullSafeJoin across all fold families AND the
  * churn-sized equality-delete commit (which must retire NULL-key
  * tuples too). */
class NullKeyFoldSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "nkcat"
  private var whId: UUID = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-nk").toUri.toString.stripSuffix("/")
    whId = store.createWarehouse(project, "wh", whLoc)
      .fold(e => fail(e.message), identity).id
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES ('a',1.0),(NULL,5.0),(NULL,7.0)")
  }

  override def afterAll(): Unit = server.stop()

  private def graftCatalog: GraftSparkCatalog =
    org.apache.spark.sql.GraftShims.catalogPlugin(spark, Some(cat))
      .asInstanceOf[GraftSparkCatalog]

  test("NULL group key folds exactly like the recompute") {
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.mv_nk AS
         |SELECT k, count(*) AS n, count(v) AS nv, sum(v) AS s
         |FROM $cat.db.t GROUP BY k""".stripMargin)
    def expect = spark.sql(
      s"SELECT k, count(*) n, count(v) nv, sum(v) s FROM $cat.db.t GROUP BY k")
      .collect().map(_.toSeq).toSet
    def got = spark.sql(s"SELECT k, n, nv, s FROM $cat.db.mv_nk")
      .collect().map(_.toSeq).toSet
    assert(got === expect)
    // churn the NULL-key group on both sides
    spark.sql(s"INSERT INTO $cat.db.t VALUES (NULL, 100.0), ('a', 2.0)")
    assert(GraftMaterializedViews.refresh(spark, graftCatalog,
      TableIdent(Seq("db"), "mv_nk")) === GraftMaterializedViews.Incremental)
    assert(got === expect)
    spark.sql(s"DELETE FROM $cat.db.t WHERE v = 5.0")
    assert(GraftMaterializedViews.refresh(spark, graftCatalog,
      TableIdent(Seq("db"), "mv_nk")) === GraftMaterializedViews.Incremental)
    assert(got === expect)
  }

  test("NULL group key through min/max + count(DISTINCT) recompute-on-touch") {
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.mv_nk_mm AS
         |SELECT k, count(*) AS n, min(v) AS mn, max(v) AS mx
         |FROM $cat.db.t GROUP BY k""".stripMargin)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.mv_nk_cd AS
         |SELECT k, count(*) AS n, count(DISTINCT v) AS nd
         |FROM $cat.db.t GROUP BY k""".stripMargin)
    def expectMm = spark.sql(
      s"SELECT k, count(*) n, min(v) mn, max(v) mx FROM $cat.db.t GROUP BY k")
      .collect().map(_.toSeq).toSet
    def gotMm = spark.sql(s"SELECT k, n, mn, mx FROM $cat.db.mv_nk_mm")
      .collect().map(_.toSeq).toSet
    def expectCd = spark.sql(
      s"SELECT k, count(*) n, count(DISTINCT v) nd FROM $cat.db.t GROUP BY k")
      .collect().map(_.toSeq).toSet
    def gotCd = spark.sql(s"SELECT k, n, nd FROM $cat.db.mv_nk_cd")
      .collect().map(_.toSeq).toSet
    assert(gotMm === expectMm && gotCd === expectCd)
    // NULL-key inserts (pure-arithmetic path) then a NULL-key delete
    // that retracts the group minimum (recompute-on-retract path)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (NULL, 0.5), (NULL, 42.0)")
    assert(GraftMaterializedViews.refresh(spark, graftCatalog,
      TableIdent(Seq("db"), "mv_nk_mm")) === GraftMaterializedViews.Incremental)
    assert(GraftMaterializedViews.refresh(spark, graftCatalog,
      TableIdent(Seq("db"), "mv_nk_cd")) === GraftMaterializedViews.Incremental)
    assert(gotMm === expectMm && gotCd === expectCd)
    spark.sql(s"DELETE FROM $cat.db.t WHERE v = 0.5")
    assert(GraftMaterializedViews.refresh(spark, graftCatalog,
      TableIdent(Seq("db"), "mv_nk_mm")) === GraftMaterializedViews.Incremental)
    assert(GraftMaterializedViews.refresh(spark, graftCatalog,
      TableIdent(Seq("db"), "mv_nk_cd")) === GraftMaterializedViews.Incremental)
    assert(gotMm === expectMm && gotCd === expectCd)
  }
}
