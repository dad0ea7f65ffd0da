package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core.{ViewRequirement, ViewUpdate}
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.UUID

/** Iceberg views end-to-end — BEYOND the reference, which serves an
  * empty list and 501s every view mutation (catalog/views.rs:43-189).
  * SQL surface (CREATE/OR REPLACE/IF NOT EXISTS, SELECT through views,
  * nesting, SHOW/DROP/ALTER), the REST contract (404/409, commit CAS),
  * version history, and the metadata-file mirror. */
class ViewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "viewcat"
  private val http = HttpClient.newHttpClient()
  private var whId: UUID = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-views").toUri.toString.stripSuffix("/")
    whId = store.createWarehouse(project, "wh", whLoc)
      .fold(e => fail(e.message), identity).id
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.orders (id BIGINT, status STRING, amount DOUBLE)")
    spark.sql(
      s"INSERT INTO $cat.db.orders VALUES (1,'open',10.0),(2,'open',20.0),(3,'done',30.0)")
  }

  override def afterAll(): Unit = server.stop()

  test("CREATE VIEW + SELECT: the stored SQL is expanded and returns live rows") {
    spark.sql(
      s"CREATE VIEW $cat.db.open_orders AS SELECT id, amount FROM $cat.db.orders WHERE status = 'open'")
    val rows = spark.sql(s"SELECT id, amount FROM $cat.db.open_orders ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0)))

    // views are LIVE over the base table, not snapshots of it
    spark.sql(s"INSERT INTO $cat.db.orders VALUES (4,'open',40.0)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.open_orders").collect()(0).getLong(0) == 3)
    spark.sql(s"DELETE FROM $cat.db.orders WHERE id = 4")
  }

  test("views compose: join a view with a table, nest a view in a view") {
    spark.sql(
      s"CREATE VIEW $cat.db.order_totals AS SELECT status, sum(amount) AS total FROM $cat.db.orders GROUP BY status")
    val joined = spark.sql(
      s"""SELECT o.id, t.total FROM $cat.db.open_orders o
         |JOIN $cat.db.order_totals t ON t.status = 'open' ORDER BY o.id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(joined.toSeq == Seq((1L, 30.0), (2L, 30.0)))

    spark.sql(
      s"CREATE VIEW $cat.db.big_open AS SELECT id FROM $cat.db.open_orders WHERE amount > 15.0")
    assert(spark.sql(s"SELECT id FROM $cat.db.big_open").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("view schema: user column list renames outputs; stored names apply on read") {
    spark.sql(
      s"CREATE VIEW $cat.db.renamed (order_id, val) AS SELECT id, amount FROM $cat.db.orders WHERE id = 1")
    val df = spark.sql(s"SELECT order_id, val FROM $cat.db.renamed")
    assert(df.columns.toSeq == Seq("order_id", "val"))
    assert(df.collect()(0).getLong(0) == 1L)
  }

  test("CREATE OR REPLACE appends a version; history is retained") {
    spark.sql(s"CREATE VIEW $cat.db.evolving AS SELECT id FROM $cat.db.orders")
    spark.sql(
      s"CREATE OR REPLACE VIEW $cat.db.evolving AS SELECT id, status FROM $cat.db.orders WHERE id <= 2")
    assert(spark.sql(s"SELECT * FROM $cat.db.evolving").columns.toSeq == Seq("id", "status"))

    val rec = store.loadView(whId, TableIdent(Seq("db"), "evolving"))
      .fold(e => fail(e.message), identity)
    assert(rec.metadata.versions.size == 2)
    assert(rec.metadata.currentVersionId == 2)
    assert(rec.metadata.versionLog.map(_.versionId) == Seq(1, 2))
    assert(rec.metadata.versions(2).summary("operation") == "replace")
    // both schemas retained (different structure)
    assert(rec.metadata.schemas.size == 2)
  }

  test("IF NOT EXISTS is a no-op on an existing view; plain CREATE conflicts") {
    spark.sql(s"CREATE VIEW $cat.db.once AS SELECT 1 AS one")
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.db.once AS SELECT 2 AS two")
    assert(spark.sql(s"SELECT * FROM $cat.db.once").columns.toSeq == Seq("one"))
    val e = intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.db.once AS SELECT 3 AS three"))
    assert(e.getMessage.toLowerCase.contains("exист") ||
      e.getMessage.toLowerCase.contains("exist"))
  }

  test("SHOW VIEWS lists them; DROP removes; IF EXISTS tolerates absence") {
    spark.sql(s"CREATE VIEW $cat.db.listed AS SELECT 1 AS x")
    val names = spark.sql(s"SHOW VIEWS IN $cat.db").collect().map(_.getString(1)).toSet
    assert(names.contains("listed"))
    spark.sql(s"DROP VIEW $cat.db.listed")
    assert(!spark.sql(s"SHOW VIEWS IN $cat.db").collect().map(_.getString(1)).contains("listed"))
    spark.sql(s"DROP VIEW IF EXISTS $cat.db.listed") // no-op, no error
    intercept[Exception](spark.sql(s"DROP VIEW $cat.db.listed"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES round-trips through commit") {
    spark.sql(s"CREATE VIEW $cat.db.propv AS SELECT 1 AS x")
    spark.sql(s"ALTER VIEW $cat.db.propv SET TBLPROPERTIES ('team'='data','tier'='gold')")
    val rec = store.loadView(whId, TableIdent(Seq("db"), "propv"))
      .fold(e => fail(e.message), identity)
    assert(rec.metadata.properties.get("team").contains("data"))
    spark.sql(s"ALTER VIEW $cat.db.propv UNSET TBLPROPERTIES ('team')")
    val rec2 = store.loadView(whId, TableIdent(Seq("db"), "propv"))
      .fold(e => fail(e.message), identity)
    assert(!rec2.metadata.properties.contains("team"))
    assert(rec2.metadata.properties.get("tier").contains("gold"))
  }

  test("name collisions: table blocks view, view blocks table, both 409 at REST") {
    intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.db.orders AS SELECT 1 AS x"))
    spark.sql(s"CREATE VIEW $cat.db.occupier AS SELECT 1 AS x")
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.db.occupier (id BIGINT)"))
  }

  test("rename via REST: identity moves, definition intact") {
    spark.sql(s"CREATE VIEW $cat.db.before AS SELECT id FROM $cat.db.orders WHERE id = 2")
    val resp = post(s"/catalog/v1/$whId/views/rename",
      """{"source":{"namespace":["db"],"name":"before"},"destination":{"namespace":["db"],"name":"after"}}""")
    // 204 No Content, the same empty-body success the table rename serves
    assert(resp.statusCode() == 204)
    assert(spark.sql(s"SELECT id FROM $cat.db.after").collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[Exception](spark.sql(s"SELECT id FROM $cat.db.before").collect())
  }

  test("REST contract: 404 on missing, HEAD 204/404, commit CAS 409 on stale uuid") {
    val missing = http.send(HttpRequest.newBuilder(
      URI.create(s"${server.baseUri}/catalog/v1/$whId/namespaces/db/views/nope")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(missing.statusCode() == 404)

    spark.sql(s"CREATE VIEW $cat.db.casv AS SELECT 1 AS x")
    val head = http.send(HttpRequest.newBuilder(
      URI.create(s"${server.baseUri}/catalog/v1/$whId/namespaces/db/views/casv"))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(head.statusCode() == 204)

    // stale-uuid commit loses with 409 — the optimistic-concurrency contract
    val stale = store.commitView(whId, TableIdent(Seq("db"), "casv"),
      Seq(ViewRequirement.AssertViewUuid(UUID.randomUUID())),
      Seq(ViewUpdate.SetProperties(Map("k" -> "v"))), 1L)
    assert(stale.left.exists(_.code == 409))
  }

  test("metadata mirror: view-metadata.json on disk parses back byte-identical") {
    spark.sql(s"CREATE VIEW $cat.db.mirrored AS SELECT id, status FROM $cat.db.orders")
    val rec = store.loadView(whId, TableIdent(Seq("db"), "mirrored"))
      .fold(e => fail(e.message), identity)
    val read = ViewMetadataIO.read(rec.metadataLocation)
      .fold(e => fail(s"mirror unreadable: $e"), identity)
    assert(read == rec.metadata)
    assert(read.currentVersion.representations.head.dialect == "spark")
    assert(read.currentVersion.defaultCatalog.contains("spark_catalog") ||
      read.currentVersion.defaultCatalog.nonEmpty)
  }

  test("dropping a namespace with only a view in it is a 409 (NamespaceNotEmpty)") {
    spark.sql(s"CREATE NAMESPACE $cat.vonly")
    spark.sql(s"CREATE VIEW $cat.vonly.v AS SELECT 1 AS x")
    val e = store.dropNamespace(whId, Seq("vonly"))
    assert(e.left.exists(_.code == 409))
    spark.sql(s"DROP VIEW $cat.vonly.v")
    assert(store.dropNamespace(whId, Seq("vonly")).isRight)
  }

  test("SHOW CREATE TABLE on a view reconstructs the definition") {
    spark.sql(
      s"CREATE VIEW $cat.db.showme AS SELECT id, status FROM $cat.db.orders WHERE id = 1")
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.db.showme")
      .collect()(0).getString(0)
    assert(ddl.startsWith("CREATE VIEW"))
    assert(ddl.contains("showme"))
    assert(ddl.contains("id BIGINT"))
    assert(ddl.contains("SELECT id, status FROM"))
    // tables keep Spark's native SHOW CREATE TABLE path
    val tddl = spark.sql(s"SHOW CREATE TABLE $cat.db.orders")
      .collect()(0).getString(0)
    assert(tddl.startsWith("CREATE TABLE"))
  }

  test("ALTER VIEW ... AS preserves properties and comment (only the query changes)") {
    spark.sql(
      s"CREATE VIEW $cat.db.kept AS SELECT id FROM $cat.db.orders")
    spark.sql(
      s"ALTER VIEW $cat.db.kept SET TBLPROPERTIES ('team'='data','comment'='the kept view')")
    spark.sql(
      s"ALTER VIEW $cat.db.kept AS SELECT id, status FROM $cat.db.orders")
    // new query took effect…
    assert(spark.sql(s"SELECT * FROM $cat.db.kept").columns.toSeq ===
      Seq("id", "status"))
    // …and the properties survived (Spark's native ALTER VIEW AS keeps them)
    val rec = store.loadView(whId, TableIdent(Seq("db"), "kept"))
      .fold(e => fail(e.message), identity)
    assert(rec.metadata.properties.get("team").contains("data"))
    assert(rec.metadata.properties.get("comment").contains("the kept view"))
  }

  test("a view cycle fails with a message naming the loop, not analyzer max-iterations") {
    spark.sql(s"CREATE VIEW $cat.db.cyc1 AS SELECT id FROM $cat.db.orders")
    spark.sql(s"CREATE VIEW $cat.db.cyc2 AS SELECT id FROM $cat.db.cyc1")
    // re-pointing cyc1 at cyc2 closes the loop; the ALTER itself is
    // legal (at analysis time cyc2 still expands to the OLD cyc1 body)
    spark.sql(s"ALTER VIEW $cat.db.cyc1 AS SELECT id FROM $cat.db.cyc2")
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.cyc1").collect())
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    val msgs = chain(e).mkString(" | ").toLowerCase
    assert(msgs.contains("cycle"), s"expected a cycle error, got: $msgs")
    assert(msgs.contains("cyc1") && msgs.contains("cyc2"),
      s"the error should name the looping views: $msgs")
  }

  test("deep-but-acyclic nesting expands fine under the depth cap") {
    spark.sql(s"CREATE VIEW $cat.db.deep0 AS SELECT id FROM $cat.db.orders")
    (1 to 5).foreach { i =>
      spark.sql(s"CREATE VIEW $cat.db.deep$i AS SELECT id FROM $cat.db.deep${i - 1}")
    }
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.deep5")
      .collect()(0).getLong(0) >= 3)
    // a diamond is NOT a cycle: two branches sharing a base both expand
    spark.sql(
      s"""CREATE VIEW $cat.db.diamond AS
         |SELECT a.id FROM $cat.db.deep1 a JOIN $cat.db.deep2 b ON a.id = b.id""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.diamond")
      .collect()(0).getLong(0) >= 3)
  }

  test("session-catalog temp views are untouched by the graft rule") {
    spark.range(3).createOrReplaceTempView("plain_temp")
    assert(spark.sql("SELECT count(*) FROM plain_temp").collect()(0).getLong(0) == 3)
    spark.catalog.dropTempView("plain_temp")
  }

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"${server.baseUri}$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
}
