package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** The SQL front door: Spark SQL DDL + queries through the V2 catalog
  * plugin against our REST server — the reference's own usage shape
  * (test_spark.py SQL statements via SparkCatalog). */
class GraftSparkCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftsql"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-sqlcat").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
  }

  override def afterAll(): Unit = server.stop()

  test("SQL DDL + scan round-trip through the catalog") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.db")
    val namespaces = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0))
    assert(namespaces.contains("db"))

    spark.sql(s"CREATE TABLE $cat.db.t (id INT, s STRING) PARTITIONED BY (bucket(4, id))")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect().map(_.getString(1)).toSet === Set("t"))

    // spec landed server-side with the bucket transform bound
    val rec = client.loadTable(prefix, TableIdent(Seq("db"), "t"))
    assert(rec.metadata.defaultSpec.fields.map(f => (f.name, f.transform.wireName)) ===
      Seq(("id_bucket", "bucket[4]")))

    // empty scan via SQL
    assert(spark.sql(s"SELECT * FROM $cat.db.t").count() === 0)

    // write through the engine commit path, read back via SQL
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "t"))
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"))
    val out = spark.sql(s"SELECT id, s FROM $cat.db.t WHERE id > 1 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out === Seq((2, "b"), (3, "c")))

    // predicate reaches the parquet scan
    val plan = spark.sql(s"SELECT id FROM $cat.db.t WHERE id > 1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)

    // SQL writes are refused (no capability): the commit path cannot be
    // bypassed
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.db.t VALUES (9, 'z')"))
    assert(e.getMessage.toLowerCase.contains("does not support") ||
      e.getMessage.toLowerCase.contains("unsupported"))

    // rename + drop via SQL
    spark.sql(s"ALTER TABLE $cat.db.t RENAME TO db.t2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t2").collect().head.getLong(0) === 3)
    spark.sql(s"DROP TABLE $cat.db.t2")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").count() === 0)
    spark.sql(s"DROP NAMESPACE $cat.db")
  }

  test("SQL time travel: VERSION AS OF snapshot id and tag") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.tt")
    spark.sql(s"CREATE TABLE $cat.tt.t (id INT, s STRING)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("tt"), "t"))
    t.append(Seq((1, "v1")).toDF("id", "s"))
    val firstSnap = t.metadata.currentSnapshotId.get
    t.createRef("rel1", graft.core.SnapshotRefType.Tag)
    t.append(Seq((2, "v2")).toDF("id", "s"))

    assert(spark.sql(s"SELECT * FROM $cat.tt.t").count() === 2)
    assert(spark.sql(s"SELECT * FROM $cat.tt.t VERSION AS OF $firstSnap").count() === 1)
    assert(spark.sql(s"SELECT s FROM $cat.tt.t VERSION AS OF 'rel1'")
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
    assertThrows[Exception](
      spark.sql(s"SELECT * FROM $cat.tt.t VERSION AS OF 'ghost'").collect())
  }

  test("table and namespace misses surface as standard analysis errors") {
    import org.apache.spark.sql.AnalysisException
    assertThrows[AnalysisException](spark.sql(s"SELECT * FROM $cat.nope.t").collect())
    assertThrows[AnalysisException](spark.sql(s"SHOW TABLES IN $cat.nope").collect())
  }
}
