package graft.server

import graft.catalog._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.UUID

/** End-to-end HTTP conformance: the same call sequence Spark's
  * RESTCatalog makes at session start (config → namespace → table CRUD →
  * commit), mirroring the reference's integration flow
  * (tests/python/tests/test_pyiceberg.py + conftest.py:65-98).
  */
class CatalogServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val client = HttpClient.newHttpClient()
  private var base: String = _
  private var prefix: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    base = server.baseUri
    val wh = Files.createTempDirectory("graft-srv").toUri.toString.stripSuffix("/")
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"prod","location":"$wh","project-id":"$project"}""")
    assert(created.statusCode() === 200, created.body())
    prefix = json(created.body()).get("id").asText()
  }

  override def afterAll(): Unit = server.stop()

  private def json(s: String) = graft.core.JsonCodecs.parse(s)

  private def req(method: String, path: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
    val withMethod = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json")
    }
    client.send(withMethod.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def post(path: String, body: String) = req("POST", path, body)
  private def get(path: String) = req("GET", path)

  private val schemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      |{"id":1,"name":"id","required":true,"type":"int"},
      |{"id":2,"name":"s","required":true,"type":"string"}]}""".stripMargin

  test("GET /config resolves warehouse by name, uuid, and project/name") {
    val byName = get(s"/catalog/v1/config?warehouse=prod")
    assert(byName.statusCode() === 200)
    val overrides = json(byName.body()).get("overrides")
    assert(overrides.get("prefix").asText() === prefix)
    assert(overrides.get("uri").asText() === s"$base/catalog")

    assert(get(s"/catalog/v1/config?warehouse=$prefix").statusCode() === 200)
    assert(get(s"/catalog/v1/config?warehouse=$project/prod").statusCode() === 200)
    assert(get(s"/catalog/v1/config?warehouse=ghost").statusCode() === 404)
    assert(get(s"/catalog/v1/config").statusCode() === 400)
  }

  test("namespace CRUD over HTTP") {
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["web"],"properties":{"owner":"alice"}}""").statusCode() === 200)
    // duplicate → 409; reserved → 400
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["web"]}""").statusCode() === 409)
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["system"]}""").statusCode() === 400)

    val listed = get(s"/catalog/v1/$prefix/namespaces")
    assert(listed.statusCode() === 200)
    assert(listed.body().contains("web"))

    val got = get(s"/catalog/v1/$prefix/namespaces/web")
    assert(got.statusCode() === 200)
    assert(json(got.body()).get("properties").get("owner").asText() === "alice")

    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/web").statusCode() === 204)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/ghost").statusCode() === 404)

    val props = post(s"/catalog/v1/$prefix/namespaces/web/properties",
      """{"removals":["ghost"],"updates":{"team":"data"}}""")
    assert(props.statusCode() === 200)
    val pr = json(props.body())
    assert(pr.get("updated").get(0).asText() === "team")
    assert(pr.get("missing").get(0).asText() === "ghost")

    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["scratch"]}""").statusCode() === 200)
    assert(req("DELETE", s"/catalog/v1/$prefix/namespaces/scratch").statusCode() === 204)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/scratch").statusCode() === 404)
  }

  test("table create/load/head/list/commit/rename/drop over HTTP") {
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["db"]}""").statusCode() === 200)

    // create (client-supplied location must be rejected)
    assert(post(s"/catalog/v1/$prefix/namespaces/db/tables",
      s"""{"name":"t","schema":$schemaJson,"location":"file:///evil"}""")
      .statusCode() === 400)
    val created = post(s"/catalog/v1/$prefix/namespaces/db/tables",
      s"""{"name":"t","schema":$schemaJson,
         |"partition-spec":{"fields":[
         |  {"source-id":1,"name":"id_bucket","transform":"bucket[16]"}]},
         |"properties":{"owner":"bob"}}""".stripMargin)
    assert(created.statusCode() === 200, created.body())
    val meta = json(created.body())
    assert(meta.hasNonNull("metadata-location"))
    assert(meta.get("metadata").get("format-version").asInt() === 2)
    val tableUuid = meta.get("metadata").get("table-uuid").asText()

    // duplicate create 409
    assert(post(s"/catalog/v1/$prefix/namespaces/db/tables",
      s"""{"name":"t","schema":$schemaJson}""").statusCode() === 409)

    // load / head / list
    assert(get(s"/catalog/v1/$prefix/namespaces/db/tables/t").statusCode() === 200)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/db/tables/t").statusCode() === 204)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/db/tables/ghost").statusCode() === 404)
    val listed = get(s"/catalog/v1/$prefix/namespaces/db/tables")
    assert(listed.statusCode() === 200)
    assert(listed.body().contains("\"name\":\"t\""))

    // commit: first append with assert-create-style ref requirement
    val commit1 = post(s"/catalog/v1/$prefix/namespaces/db/tables/t",
      s"""{"identifier":{"namespace":["db"],"name":"t"},
         |"requirements":[
         |  {"type":"assert-table-uuid","uuid":"$tableUuid"},
         |  {"type":"assert-ref-snapshot-id","ref":"main"}],
         |"updates":[
         |  {"action":"add-snapshot","snapshot":{"snapshot-id":100,
         |   "sequence-number":1,"timestamp-ms":1700000001000,
         |   "manifest-list":"manifests/100.avro",
         |   "summary":{"operation":"append"},"schema-id":0}},
         |  {"action":"set-snapshot-ref","ref-name":"main",
         |   "snapshot-id":100,"type":"branch"},
         |  {"action":"set-properties","updates":{"fmt":"parquet"}}]}""".stripMargin)
    assert(commit1.statusCode() === 200, commit1.body())
    val committed = json(commit1.body()).get("metadata")
    assert(committed.get("current-snapshot-id").asLong() === 100L)
    assert(committed.get("properties").get("fmt").asText() === "parquet")

    // stale requirement → 409 (optimistic concurrency over the wire)
    val stale = post(s"/catalog/v1/$prefix/namespaces/db/tables/t",
      s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main"}],
         |"updates":[]}""".stripMargin)
    assert(stale.statusCode() === 409)

    // mismatched path/body identifier → 400
    assert(post(s"/catalog/v1/$prefix/namespaces/db/tables/t",
      """{"identifier":{"namespace":["db"],"name":"other"},"updates":[]}""")
      .statusCode() === 400)

    // metrics no-op; register with an unreadable metadata location → 400
    // (register itself is real since r11 — full flow in the dedicated
    // register test below)
    assert(post(s"/catalog/v1/$prefix/namespaces/db/tables/t/metrics",
      """{"report-type":"scan"}""").statusCode() === 204)
    assert(post(s"/catalog/v1/$prefix/namespaces/db/register",
      """{"name":"x","metadata-location":"file:///nonexistent/x.metadata.json"}""")
      .statusCode() === 400)

    // rename then drop
    assert(post(s"/catalog/v1/$prefix/tables/rename",
      """{"source":{"namespace":["db"],"name":"t"},
        |"destination":{"namespace":["db"],"name":"t2"}}""".stripMargin)
      .statusCode() === 204)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/db/tables/t").statusCode() === 404)
    assert(req("DELETE", s"/catalog/v1/$prefix/namespaces/db/tables/t2").statusCode() === 204)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/db/tables/t2").statusCode() === 404)
  }

  test("multi-table transactions commit atomically over HTTP") {
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["txn"]}""").statusCode() === 200)
    for (t <- Seq("a", "b"))
      assert(post(s"/catalog/v1/$prefix/namespaces/txn/tables",
        s"""{"name":"$t","schema":$schemaJson}""").statusCode() === 200)

    // one bad assert fails the whole batch
    val bad = post(s"/catalog/v1/$prefix/transactions/commit",
      """{"table-changes":[
        |{"identifier":{"namespace":["txn"],"name":"a"},
        | "updates":[{"action":"set-properties","updates":{"k":"v"}}]},
        |{"identifier":{"namespace":["txn"],"name":"b"},
        | "requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":9}],
        | "updates":[]}]}""".stripMargin)
    assert(bad.statusCode() === 409)
    val a = get(s"/catalog/v1/$prefix/namespaces/txn/tables/a")
    assert(!json(a.body()).get("metadata").get("properties").has("k"))

    val good = post(s"/catalog/v1/$prefix/transactions/commit",
      """{"table-changes":[
        |{"identifier":{"namespace":["txn"],"name":"a"},
        | "updates":[{"action":"set-properties","updates":{"k":"v"}}]},
        |{"identifier":{"namespace":["txn"],"name":"b"},
        | "updates":[{"action":"set-properties","updates":{"k":"w"}}]}]}""".stripMargin)
    assert(good.statusCode() === 204, good.body())
    val a2 = get(s"/catalog/v1/$prefix/namespaces/txn/tables/a")
    assert(json(a2.body()).get("metadata").get("properties").get("k").asText() === "v")
  }

  test("management API lifecycle: rename, deactivate gates catalog, list") {
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"stage","location":"file:///tmp/stage","project-id":"$project"}""")
    assert(created.statusCode() === 200)
    val whId = json(created.body()).get("id").asText()

    assert(post(s"/management/v1/warehouse/$whId/rename",
      """{"new-name":"staging"}""").statusCode() === 200)
    assert(post(s"/management/v1/warehouse/$whId/deactivate", "").statusCode() === 200)
    // catalog surface is now 404 for this warehouse
    assert(get(s"/catalog/v1/$whId/namespaces").statusCode() === 404)
    assert(get(s"/management/v1/warehouse/$whId").statusCode() === 404)
    assert(post(s"/management/v1/warehouse/$whId/activate", "").statusCode() === 200)
    assert(get(s"/catalog/v1/$whId/namespaces").statusCode() === 200)

    val projects = get("/management/v1/project")
    assert(projects.statusCode() === 200)
    assert(projects.body().contains(project.toString))

    assert(req("DELETE", s"/management/v1/warehouse/$whId").statusCode() === 204)
    assert(get(s"/catalog/v1/$whId/namespaces").statusCode() === 404)
  }

  test("X-Iceberg-Access-Delegation shapes the LoadTableResult config") {
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"dawh","location":"s3://da-bucket/wh",
         |"project-id":"$project",
         |"storage-profile":{"region":"eu-central-1","bucket":"da-bucket"},
         |"storage-credential":{"access-key-id":"AK","secret-access-key":"SK"}}""".stripMargin)
    assert(created.statusCode() === 200, created.body())
    val p = json(created.body()).get("id").asText()
    assert(post(s"/catalog/v1/$p/namespaces", """{"namespace":["ns"]}""").statusCode() === 200)
    assert(post(s"/catalog/v1/$p/namespaces/ns/tables",
      s"""{"name":"t","schema":$schemaJson}""").statusCode() === 200)

    def load(delegation: Option[String]) = {
      val b = HttpRequest.newBuilder(
        URI.create(s"$base/catalog/v1/$p/namespaces/ns/tables/t")).GET()
      delegation.foreach(d => b.header("X-Iceberg-Access-Delegation", d))
      val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 200, r.body())
      json(r.body()).get("config")
    }

    // no header → remote signing (the default mode)
    val bare = load(None)
    assert(bare.get("s3.remote-signing-enabled").asText() === "true")
    assert(bare.get("s3.signer.uri").asText().endsWith(s"/catalog/v1/$p"))
    assert(bare.get("s3.region").asText() === "eu-central-1")
    assert(bare.get("s3.signer") === null)

    // explicit remote-signing → same config, no vended keys
    val remote = load(Some("remote-signing"))
    assert(remote.get("s3.remote-signing-enabled").asText() === "true")
    assert(remote.get("py-io-impl") === null)

    // vended-credentials → signer steering keys appear, remote signing
    // stays forced on (reference storage/s3.rs:349-374 behavior)
    val vended = load(Some("vended-credentials"))
    assert(vended.get("s3.signer").asText() === "S3V4RestSigner")
    assert(vended.get("py-io-impl").asText() === "pyiceberg.io.fsspec.FsspecFileIO")
    assert(vended.get("s3.remote-signing-enabled").asText() === "true")

    // both tokens in one header value
    val both = load(Some("vended-credentials, remote-signing"))
    assert(both.get("s3.signer").asText() === "S3V4RestSigner")
    assert(both.get("s3.remote-signing-enabled").asText() === "true")
  }

  test("S3 sign endpoint: verb/region/URI rules + SigV4 over HTTP") {
    // dedicated warehouse with an s3:// location, storage profile, creds
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"s3wh","location":"s3://data-bucket/wh",
         |"project-id":"$project",
         |"storage-profile":{"region":"eu-central-1","bucket":"data-bucket"},
         |"storage-credential":{"access-key-id":"AK","secret-access-key":"SK"}}""".stripMargin)
    assert(created.statusCode() === 200, created.body())
    val p = json(created.body()).get("id").asText()
    assert(post(s"/catalog/v1/$p/namespaces", """{"namespace":["ns"]}""").statusCode() === 200)
    val t = post(s"/catalog/v1/$p/namespaces/ns/tables",
      s"""{"name":"t","schema":$schemaJson}""")
    assert(t.statusCode() === 200, t.body())
    val tableLocation = json(t.body()).get("metadata").get("location").asText()
    assert(tableLocation.startsWith("s3://data-bucket/wh/"))
    val key = tableLocation.stripPrefix("s3://data-bucket/")

    def sign(method: String, uri: String, region: String = "eu-central-1") =
      post(s"/catalog/v1/$p/v1/aws/s3/sign",
        s"""{"method":"$method","region":"$region","uri":"$uri","headers":{"Content-Length":["42"]}}""")

    // valid write request under the table location (virtual-host style)
    val ok1 = sign("PUT", s"https://data-bucket.s3.eu-central-1.amazonaws.com/$key/data/f.parquet")
    assert(ok1.statusCode() === 200, ok1.body())
    val auth = json(ok1.body()).get("headers").get("authorization").get(0).asText()
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AK/"))
    assert(auth.contains("/eu-central-1/s3/aws4_request"))
    assert(json(ok1.body()).get("headers").has("x-amz-date"))
    // path-style with a DOTTED endpoint host cannot be reverse-parsed
    // to a location (first label would be taken as the bucket) — the
    // reference documents the same limitation for its lookup-by-location
    // path (s3_signer.rs parse_s3_url_to_location doc); must NOT sign
    assert(sign("GET", s"https://s3.eu-central-1.amazonaws.com/data-bucket/$key/data/f.parquet")
      .statusCode() === 404)
    // foreign location → 404 (no owning table) or 403 — must not sign
    assert(sign("PUT", "https://data-bucket.s3.eu-central-1.amazonaws.com/other/key")
      .statusCode() === 404)
    // wrong region → 400
    assert(sign("PUT",
      s"https://data-bucket.s3.eu-central-1.amazonaws.com/$key/f", region = "us-east-1")
      .statusCode() === 400)
    // disallowed verb → 405
    assert(sign("PATCH", s"https://data-bucket.s3.eu-central-1.amazonaws.com/$key/f")
      .statusCode() === 405)
  }

  test("views surface: real CRUD (BEYOND the reference's empty-list/501 parity)") {
    // own namespace: self-sufficient under any test ordering
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["vns"],"properties":{}}""").statusCode() === 200)
    // empty list and 404s before anything exists — same observable
    // starting state as the reference, but live routes behind it
    assert(get(s"/catalog/v1/$prefix/namespaces/vns/views").statusCode() === 200)
    assert(json(get(s"/catalog/v1/$prefix/namespaces/vns/views").body())
      .get("identifiers").size() === 0)
    assert(get(s"/catalog/v1/$prefix/namespaces/vns/views/v").statusCode() === 404)
    assert(req("DELETE", s"/catalog/v1/$prefix/namespaces/vns/views/v").statusCode() === 404)
    // malformed create is a 400 (missing schema/view-version), not a 501
    assert(post(s"/catalog/v1/$prefix/namespaces/vns/views",
      """{"name":"v"}""").statusCode() === 400)

    // create → load → list → head → rename → drop, all live
    val createBody =
      """{"name":"v",
        |"schema":{"schema-id":0,"type":"struct","fields":[
        |  {"id":1,"name":"x","required":true,"type":"long"}]},
        |"view-version":{"version-id":1,"timestamp-ms":0,"schema-id":0,
        |  "summary":{"operation":"create"},
        |  "representations":[{"type":"sql","sql":"SELECT 1 AS x","dialect":"spark"}],
        |  "default-namespace":["vns"]},
        |"properties":{"team":"data"}}""".stripMargin
    val created = post(s"/catalog/v1/$prefix/namespaces/vns/views", createBody)
    assert(created.statusCode() === 200)
    val md = json(created.body()).get("metadata")
    assert(md.get("format-version").asInt() === 1)
    assert(md.get("current-version-id").asInt() === 1)
    assert(json(created.body()).get("metadata-location").asText().nonEmpty)

    assert(get(s"/catalog/v1/$prefix/namespaces/vns/views/v").statusCode() === 200)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/vns/views/v").statusCode() === 204)
    val listed = json(get(s"/catalog/v1/$prefix/namespaces/vns/views").body())
    assert(listed.get("identifiers").get(0).get("name").asText() === "v")
    // duplicate create is a 409
    assert(post(s"/catalog/v1/$prefix/namespaces/vns/views", createBody)
      .statusCode() === 409)

    assert(post(s"/catalog/v1/$prefix/views/rename",
      """{"source":{"namespace":["vns"],"name":"v"},"destination":{"namespace":["vns"],"name":"v2"}}""")
      .statusCode() === 204)
    assert(get(s"/catalog/v1/$prefix/namespaces/vns/views/v").statusCode() === 404)
    assert(req("DELETE", s"/catalog/v1/$prefix/namespaces/vns/views/v2").statusCode() === 204)
    assert(json(get(s"/catalog/v1/$prefix/namespaces/vns/views").body())
      .get("identifiers").size() === 0)
  }

  test("a present but undecodable storage-credential is a 400, not silently dropped") {
    // missing secret-access-key
    val partial = post("/management/v1/warehouse",
      s"""{"warehouse-name":"badcred1","location":"s3://bc/wh","project-id":"$project",
         |"storage-credential":{"access-key-id":"AK"}}""".stripMargin)
    assert(partial.statusCode() === 400, partial.body())
    assert(partial.body().contains("storage-credential"))
    // unrecognized wire names
    val alien = post("/management/v1/warehouse",
      s"""{"warehouse-name":"badcred2","location":"s3://bc/wh","project-id":"$project",
         |"storage-credential":{"client-id":"x","client-secret":"y"}}""".stripMargin)
    assert(alien.statusCode() === 400, alien.body())
    // neither half-creates the warehouse
    val names = get("/management/v1/warehouse").body()
    assert(!names.contains("badcred1") && !names.contains("badcred2"))
    // the aws- prefixed reference shape still decodes
    assert(post("/management/v1/warehouse",
      s"""{"warehouse-name":"goodcred","location":"s3://bc/wh","project-id":"$project",
         |"storage-credential":{"aws-access-key-id":"AK","aws-secret-access-key":"SK"}}""".stripMargin)
      .statusCode() === 200)
  }

  test("storage update: endpoint mutable, bucket/region immutable") {
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"stor","location":"s3://bkt/wh","project-id":"$project",
         |"storage-profile":{"region":"eu-central-1","bucket":"bkt"}}""".stripMargin)
    assert(created.statusCode() === 200)
    val id = json(created.body()).get("id").asText()

    // endpoint change allowed (+ credential rotation piggybacks)
    assert(post(s"/management/v1/warehouse/$id/storage",
      """{"storage-profile":{"region":"eu-central-1","bucket":"bkt",
        |"endpoint":"https://minio.local"},
        |"storage-credential":{"access-key-id":"AK2","secret-access-key":"SK2"}}""".stripMargin)
      .statusCode() === 200)
    // region change rejected
    assert(post(s"/management/v1/warehouse/$id/storage",
      """{"storage-profile":{"region":"us-east-1","bucket":"bkt"}}""")
      .statusCode() === 400)
    // bucket change rejected
    assert(post(s"/management/v1/warehouse/$id/storage",
      """{"storage-profile":{"region":"eu-central-1","bucket":"other"}}""")
      .statusCode() === 400)
  }

  test("branch-probe contract: table.branch as deeper namespace 404s cleanly") {
    // Spark probes `db.t.branch_x` as namespace ["db","t"] + table
    // "branch_x" (reference catalog/tables.rs:237-250) — must be a
    // clean 404, not a 400/500
    val sep = java.net.URLEncoder.encode("db" + 0x1f.toChar + "t", "UTF-8")
    assert(get(s"/catalog/v1/$prefix/namespaces/$sep/tables/branch_x").statusCode() === 404)
    assert(req("HEAD", s"/catalog/v1/$prefix/namespaces/$sep/tables/branch_x")
      .statusCode() === 404)
  }

  test("list pagination: pageSize/pageToken walk the full set exactly once") {
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["pgns"],"properties":{}}""").statusCode() === 200)
    (1 to 7).foreach { i =>
      val r = post(s"/catalog/v1/$prefix/namespaces/pgns/tables",
        s"""{"name":"pt$i","schema":{"type":"struct","schema-id":0,"fields":[
           |{"id":1,"name":"id","required":true,"type":"int"}]}}""".stripMargin)
      assert(r.statusCode() === 200, r.body())
    }
    // walk with pageSize=3: 3 + 3 + 1, token chain terminates
    var token = ""
    var seen = Seq.empty[String]
    var pages = 0
    var done = false
    while (!done) {
      val q = s"pageSize=3" + (if (token.nonEmpty) s"&pageToken=$token" else "")
      val r = get(s"/catalog/v1/$prefix/namespaces/pgns/tables?$q")
      assert(r.statusCode() === 200, r.body())
      val n = json(r.body())
      import scala.jdk.CollectionConverters._
      seen ++= n.get("identifiers").elements().asScala.map(_.get("name").asText()).toSeq
      pages += 1
      Option(n.get("next-page-token")).filter(!_.isNull).map(_.asText()) match {
        case Some(t) => token = t
        case None => done = true
      }
    }
    assert(pages === 3)
    assert(seen === (1 to 7).map(i => s"pt$i").sorted)
    // an unpaginated request still returns everything at once
    val all = json(get(s"/catalog/v1/$prefix/namespaces/pgns/tables").body())
    assert(all.get("identifiers").size() === 7 && all.get("next-page-token") == null)
  }

  test("pagination at 1k tables: complete walk, stable under concurrent creates") {
    import scala.jdk.CollectionConverters._
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["pgbig"],"properties":{}}""").statusCode() === 200)
    def create(name: String): Unit = {
      val r = post(s"/catalog/v1/$prefix/namespaces/pgbig/tables",
        s"""{"name":"$name","schema":{"type":"struct","schema-id":0,"fields":[
           |{"id":1,"name":"id","required":true,"type":"int"}]}}""".stripMargin)
      assert(r.statusCode() === 200, r.body())
    }
    val original = (1 to 1000).map(i => f"t$i%04d")
    original.foreach(create)

    // walk at pageSize=100 with CREATES INTERLEAVED between page
    // fetches — some sorting before the cursor (a keyset token skips
    // them, never re-shuffles the walk), some after (legitimately
    // picked up). The guarantee under test: every ORIGINAL table is
    // seen exactly once — no duplicates, no misses — regardless.
    var token = ""
    var seen = Vector.empty[String]
    var pages = 0
    var done = false
    while (!done) {
      val q = "pageSize=100" + (if (token.nonEmpty) s"&pageToken=$token" else "")
      val r = get(s"/catalog/v1/$prefix/namespaces/pgbig/tables?$q")
      assert(r.statusCode() === 200, r.body())
      val n = json(r.body())
      seen ++= n.get("identifiers").elements().asScala.map(_.get("name").asText()).toSeq
      if (pages == 3) { create("a-before-cursor"); create("zz-after-cursor") }
      pages += 1
      Option(n.get("next-page-token")).filter(!_.isNull).map(_.asText()) match {
        case Some(t) => token = t
        case None => done = true
      }
    }
    assert(pages >= 10, s"walked only $pages pages")
    assert(seen.distinct.length === seen.length, "a page re-served an identifier")
    assert(original.forall(seen.contains), "an original table was skipped mid-walk")
    assert(seen.contains("zz-after-cursor"), "an after-cursor create should be seen")
    assert(!seen.contains("a-before-cursor"), "a before-cursor create must not rewind the walk")
  }

  test("management warehouse list paginates with a keyset token") {
    import scala.jdk.CollectionConverters._
    val pid = java.util.UUID.randomUUID()
    (1 to 7).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory(s"pgwh$i").toUri.toString.stripSuffix("/")
      val r = post("/management/v1/warehouse",
        s"""{"warehouse-name":"pgwh$i","location":"$dir","project-id":"$pid"}""")
      assert(r.statusCode() === 200, r.body())
    }
    var token = ""
    var seen = Vector.empty[String]
    var done = false
    while (!done) {
      val q = s"project-id=$pid&pageSize=3" + (if (token.nonEmpty) s"&pageToken=$token" else "")
      val r = get(s"/management/v1/warehouse?$q")
      assert(r.statusCode() === 200, r.body())
      val n = json(r.body())
      seen ++= n.get("warehouses").elements().asScala.map(_.get("name").asText()).toSeq
      Option(n.get("next-page-token")).filter(!_.isNull).map(_.asText()) match {
        case Some(t) => token = t
        case None => done = true
      }
    }
    assert(seen === (1 to 7).map(i => s"pgwh$i").sorted)
    // unpaginated parity default: full list, no token
    val all = json(get(s"/management/v1/warehouse?project-id=$pid").body())
    assert(all.get("warehouses").size() === 7 && all.get("next-page-token") == null)
  }

  test("uniform error envelope carries message/type/code") {
    val err = get(s"/catalog/v1/$prefix/namespaces/ghost")
    assert(err.statusCode() === 404)
    val e = json(err.body()).get("error")
    assert(e.get("type").asText() === "NamespaceNotFound")
    assert(e.get("code").asInt() === 404)
    assert(e.get("message").asText().nonEmpty)
  }
}
