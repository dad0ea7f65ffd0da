package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.UUID

/** POST /register end-to-end, the migration path the reference 501s
  * (catalog/tables.rs:211-225): a table written through the engine is
  * dropped (no purge — files stay), re-registered under a new name
  * from its surviving metadata file, and Spark reads the original rows
  * back through the new identity. Plus the 400/409 contract for
  * malformed, foreign-scheme, duplicate, and overwrite requests. */
class RegisterTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "regtbl_cat"
  private val http = HttpClient.newHttpClient()
  private var whId: String = _
  private var whLoc: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    whLoc = Files.createTempDirectory("graft-register").toUri.toString.stripSuffix("/")
    val wh = store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    whId = wh.id.toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"${server.baseUri}$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("drop + register under a new name: rows survive the move") {
    spark.sql(s"CREATE TABLE $cat.db.src (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.src VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    val rec = store.loadTable(UUID.fromString(whId), TableIdent(Seq("db"), "src"))
      .fold(e => fail(e.message), identity)
    val metaLoc = rec.metadataLocation.get
    val uuid = rec.tableId

    // drop WITHOUT purge: the catalog row goes, the files stay
    spark.sql(s"DROP TABLE $cat.db.src")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.src").collect())

    val resp = post(s"/catalog/v1/$whId/namespaces/db/register",
      s"""{"name":"adopted","metadata-location":"$metaLoc"}""")
    assert(resp.statusCode() === 200, resp.body())
    val body = graft.core.JsonCodecs.parse(resp.body())
    assert(body.get("metadata-location").asText() === metaLoc,
      "register must keep the original metadata file, not rewrite it")
    assert(body.get("metadata").get("table-uuid").asText() === uuid.toString,
      "register must keep the original table uuid")

    val rows = spark.sql(s"SELECT id, s FROM $cat.db.adopted ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // the adopted table is fully alive: commits keep working
    spark.sql(s"INSERT INTO $cat.db.adopted VALUES (4, 'd')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.adopted").head().getLong(0) === 4L)
  }

  test("registering the same metadata twice is a 409 (one tree, one owner)") {
    val rec = store.loadTable(UUID.fromString(whId), TableIdent(Seq("db"), "adopted"))
      .fold(e => fail(e.message), identity)
    val again = post(s"/catalog/v1/$whId/namespaces/db/register",
      s"""{"name":"adopted_twin","metadata-location":"${rec.metadataLocation.get}"}""")
    assert(again.statusCode() === 409, again.body())
    assert(again.body().contains("already registered"))
  }

  test("malformed, outside-warehouse, foreign-scheme, and overwrite requests are 400s") {
    // a file UNDER the warehouse that exists but is not table metadata
    val junk = java.nio.file.Paths.get(java.net.URI.create(s"$whLoc/junk.metadata.json"))
    Files.write(junk, """{"not":"metadata"}""".getBytes("UTF-8"))
    assert(post(s"/catalog/v1/$whId/namespaces/db/register",
      s"""{"name":"j","metadata-location":"$whLoc/junk.metadata.json"}""")
      .statusCode() === 400)

    // CONTAINMENT: a location outside the warehouse is refused WITHOUT
    // being read — register must not be a server-filesystem read oracle
    val probe = post(s"/catalog/v1/$whId/namespaces/db/register",
      """{"name":"p","metadata-location":"file:///etc/hostname"}""")
    assert(probe.statusCode() === 400)
    assert(probe.body().contains("must be under the warehouse location"))

    // a scheme no FileIO backend serves (also fails containment first)
    assert(post(s"/catalog/v1/$whId/namespaces/db/register",
      """{"name":"f","metadata-location":"foo://bucket/x.metadata.json"}""")
      .statusCode() === 400)

    // `..` TRAVERSAL: shares the warehouse prefix as a raw string but
    // resolves outside — must be refused without being read
    val traverse = post(s"/catalog/v1/$whId/namespaces/db/register",
      s"""{"name":"trv","metadata-location":"$whLoc/../../../../etc/hostname"}""")
    assert(traverse.statusCode() === 400, traverse.body())
    assert(traverse.body().contains("must be under the warehouse location"))

    // PERCENT-ENCODED traversal: '%2E%2E' segments survive
    // URI.normalize() (opaque to the string check) but LocalFileIO's
    // Paths.get(URI.create(...)) percent-DECODES them back to '..' —
    // the decoded-path containment check must refuse this too
    val encTraverse = post(s"/catalog/v1/$whId/namespaces/db/register",
      s"""{"name":"etrv","metadata-location":"$whLoc/%2E%2E/%2E%2E/%2E%2E/%2E%2E/etc/hostname"}""")
    assert(encTraverse.statusCode() === 400, encTraverse.body())
    assert(encTraverse.body().contains("must be under the warehouse location"))

    // overwrite is explicitly unsupported
    assert(post(s"/catalog/v1/$whId/namespaces/db/register",
      """{"name":"o","metadata-location":"file:///x","overwrite":true}""")
      .statusCode() === 400)

    // missing fields
    assert(post(s"/catalog/v1/$whId/namespaces/db/register",
      """{"name":"x"}""").statusCode() === 400)
  }

  test("register accepts PLAIN (non-gzip) metadata json — the foreign-writer format") {
    // re-encode an existing table's metadata as plain JSON, the way
    // pyiceberg/Spark-Iceberg write it, and register from that
    val rec = store.loadTable(UUID.fromString(whId), TableIdent(Seq("db"), "adopted"))
      .fold(e => fail(e.message), identity)
    // under the warehouse (containment) but plain-encoded
    val plainLoc = s"$whLoc/plain.metadata.json"
    val plain = java.nio.file.Paths.get(java.net.URI.create(plainLoc))
    // a DIFFERENT uuid so the one-owner guard doesn't 409 this
    val remapped = rec.metadata.copy(tableUuid = UUID.randomUUID())
    Files.write(plain,
      graft.core.JsonCodecs.metadataToJson(remapped).getBytes("UTF-8"))
    val resp = post(s"/catalog/v1/$whId/namespaces/db/register",
      s"""{"name":"plain_adopted","metadata-location":"$plainLoc"}""")
    assert(resp.statusCode() === 200, resp.body())
    val rows = spark.sql(s"SELECT count(*) FROM $cat.db.plain_adopted").head().getLong(0)
    assert(rows >= 3L)
  }
}
