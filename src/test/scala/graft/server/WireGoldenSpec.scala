package graft.server

import graft.catalog._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.UUID

/** Wire-format goldens: the VERBATIM JSON payloads embedded in the
  * reference's own unit tests, replayed against our endpoints — so our
  * codecs are pinned to bytes real clients sent, not to our own
  * serializer's output. Sources (payloads transcribed, no code):
  *  - create table: iceberg-ext/src/catalog/rest/table.rs:332-358
  *  - create warehouse (kebab-case, aws-prefixed credential):
  *    api/management/v1/warehouse.rs:474-507
  *  - captured S3 sign request (aws-sdk-java client, multi-object
  *    delete): iceberg-ext/src/catalog/rest/s3_signer.rs:85-110
  *  - namespace create / properties update:
  *    iceberg-ext/src/catalog/rest/namespace.rs:128-146
  *  - catalog config shape: iceberg-ext/src/catalog/rest/catalog_config.rs:20-28
  */
class WireGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val project = UUID.fromString("f47ac10b-58cc-4372-a567-0e02b2c3d479")
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val client = HttpClient.newHttpClient()
  private var base: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    base = server.baseUri
  }
  override def afterAll(): Unit = server.stop()

  private def json(s: String) = graft.core.JsonCodecs.parse(s)
  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  /** warehouse.rs:474-507 — kebab-case fields, NO location (the base
    * derives from the profile), `aws-`-prefixed credential names. */
  private val createWarehouseGolden =
    """{
      |    "warehouse-name": "test_warehouse",
      |    "project-id": "f47ac10b-58cc-4372-a567-0e02b2c3d479",
      |    "storage-profile": {
      |        "type": "s3",
      |        "bucket": "test",
      |        "region": "dummy",
      |        "path-style-access": true,
      |        "endpoint": "http://localhost:9000"
      |    },
      |    "storage-credential": {
      |        "type": "s3",
      |        "credential-type": "access-key",
      |        "aws-access-key-id": "test-access-key-id",
      |        "aws-secret-access-key": "test-secret-access-key"
      |    }
      |}""".stripMargin

  test("reference create-warehouse request decodes: profile, derived location, aws credential") {
    val r = post("/management/v1/warehouse", createWarehouseGolden)
    assert(r.statusCode() === 200, r.body())
    val id = UUID.fromString(json(r.body()).get("id").asText())
    val w = store.getWarehouse(id).toOption.get
    assert(w.name === "test_warehouse")
    assert(w.location === "s3://test") // derived: s3://{bucket}
    assert(w.properties.get("s3.bucket") === Some("test"))
    assert(w.properties.get("s3.region") === Some("dummy"))
    assert(w.properties.get("s3.endpoint") === Some("http://localhost:9000"))
    assert(w.properties.get("s3.path-style-access") === Some("true"))
  }

  /** table.rs:332-358 — minimal create with nested Iceberg schema
    * (doc'd optional int field + date field, schema-id 1). */
  private val createTableGolden =
    """{
      |    "name": "tbl_name",
      |    "schema": {
      |        "schema-id": 1,
      |        "type" : "struct",
      |        "fields" : [ {
      |          "id" : 1,
      |          "name" : "event_count",
      |          "required" : false,
      |          "type" : "int",
      |          "doc" : "Count of events"
      |        }, {
      |          "id" : 2,
      |          "name" : "event_date",
      |          "required" : false,
      |          "type" : "date"
      |        } ]
      |      }
      |}""".stripMargin

  test("reference create-table request round-trips: ids, types, required flags, doc") {
    val wh = java.nio.file.Files.createTempDirectory("graft-golden")
      .toUri.toString.stripSuffix("/")
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"golden_wh","location":"$wh","project-id":"$project"}""")
    assert(created.statusCode() === 200, created.body())
    val prefix = json(created.body()).get("id").asText()

    // namespace.rs:128-136 golden: the multipart request DECODES (both
    // parts seen) and is rejected on reference-parity depth-1 policy —
    // a semantic error, not a parse failure
    val multi = post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["ns1","ns2"],"properties":{"owner":"Hank Bendickson"}}""")
    assert(multi.statusCode() === 400, multi.body())
    assert(multi.body().contains("depth"))

    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["ns1"],"properties":{"owner":"Hank Bendickson"}}""")
      .statusCode() === 200)
    val r = post(s"/catalog/v1/$prefix/namespaces/ns1/tables", createTableGolden)
    assert(r.statusCode() === 200, r.body())
    val schema = json(r.body()).get("metadata").get("schemas").get(0)
    assert(schema.get("schema-id").asInt() === 1)
    val fields = schema.get("fields")
    assert(fields.get(0).get("id").asInt() === 1)
    assert(fields.get(0).get("name").asText() === "event_count")
    assert(fields.get(0).get("required").asBoolean() === false)
    assert(fields.get(0).get("type").asText() === "int")
    assert(fields.get(1).get("id").asInt() === 2)
    assert(fields.get(1).get("type").asText() === "date")

    // namespace.rs:139-146 golden: update-properties with removals
    val up = post(s"/catalog/v1/$prefix/namespaces/ns1/properties",
      """{"removals":["department","access_group"],"updates":{"owner":"Hank Bendickson"}}""")
    assert(up.statusCode() === 200, up.body())
    assert(json(up.body()).has("updated"))

    // catalog_config.rs:20-28 shape: overrides + defaults objects
    val cfg = get(s"/catalog/v1/config?warehouse=golden_wh")
    assert(cfg.statusCode() === 200)
    assert(json(cfg.body()).get("overrides").isObject)
    assert(json(cfg.body()).get("defaults").isObject)
  }

  /** s3_signer.rs:85-110 — a sign request CAPTURED from aws-sdk-java
    * (multi-object delete POST at the bucket root, array-valued
    * headers, XML body). */
  private val signRequestGolden =
    """{
      |    "region": "eu-central-1",
      |    "uri": "https://demo-catalog-iceberg.s3.eu-central-1.amazonaws.com?delete",
      |    "method": "POST",
      |    "headers": {
      |        "Content-Length": ["295"],
      |        "Content-MD5": ["+hmWjZ/juo1mqRvDC1F5AQ=="],
      |        "Content-Type": ["application/xml"],
      |        "User-Agent": ["aws-sdk-java/2.24.5 Mac_OS_X/14.4.1 OpenJDK_64-Bit_Server_VM/17.0.11+0 Java/17.0.11 scala/2.12.18 vendor/Homebrew io/sync http/Apache cfg/retry-mode/legacy"],
      |        "amz-sdk-invocation-id": ["c7c476d8-75f0-1193-9f98-aed5586e8878"],
      |        "amz-sdk-request": ["attempt=1; max=4"]
      |    },
      |    "body": "<?xml version=\"1.0\" encoding=\"UTF-8\"?><Delete xmlns=\"http://s3.amazonaws.com/doc/2006-03-01/\"><Object><Key>test_warehouse/c9af26aa-0afb-11ef-9e97-4fc80c092114/018f49ab-7805-70f6-9264-1f5dc7b323c9/metadata/data/00013-27-e7a39917-8839-4b67-9dd7-ce0635f32d13-0-00001.parquet</Key></Object></Delete>"
      |}""".stripMargin

  test("captured aws-sdk-java sign request decodes and signs end-to-end") {
    // warehouse created through the REFERENCE request shape: no
    // location field, base derives from the profile bucket — exactly
    // the deployment the captured request was recorded against
    val created = post("/management/v1/warehouse",
      s"""{"warehouse-name":"sign_wh","project-id":"$project",
         |"storage-profile":{"type":"s3","bucket":"demo-catalog-iceberg",
         |"region":"eu-central-1"},
         |"storage-credential":{"type":"s3","credential-type":"access-key",
         |"aws-access-key-id":"AKIDEXAMPLE",
         |"aws-secret-access-key":"wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"}}""".stripMargin)
    assert(created.statusCode() === 200, created.body())
    val prefix = json(created.body()).get("id").asText()
    assert(post(s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["signing"]}""").statusCode() === 200)
    val mk = post(s"/catalog/v1/$prefix/namespaces/signing/tables",
      """{"name":"t","schema":{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":true,"type":"long"}]}}""".stripMargin)
    assert(mk.statusCode() === 200, mk.body())
    val tableLocation = json(mk.body()).get("metadata").get("location").asText()
    assert(tableLocation.startsWith("s3://demo-catalog-iceberg/"))
    val tableKey = tableLocation.stripPrefix("s3://demo-catalog-iceberg/")

    // the VERBATIM captured payload addresses the bucket root (the
    // multi-object delete carries its keys in the XML body): it must
    // DECODE fully and fail the table lookup semantically — never a
    // parse error (the reference would refuse to sign it the same way)
    val verbatim = post(s"/catalog/v1/$prefix/v1/aws/s3/sign", signRequestGolden)
    assert(verbatim.statusCode() === 404, verbatim.body())
    assert(verbatim.body().contains("TableNotFound"), verbatim.body())

    // same captured request with ONLY the uri retargeted into the
    // table's location (what the sdk sends for a data-file PUT/DELETE):
    // signs end-to-end
    val r = post(s"/catalog/v1/$prefix/v1/aws/s3/sign", signRequestGolden.replace(
      "https://demo-catalog-iceberg.s3.eu-central-1.amazonaws.com?delete",
      s"https://demo-catalog-iceberg.s3.eu-central-1.amazonaws.com/${tableKey}/data/00013-27-e7a39917-8839-4b67-9dd7-ce0635f32d13-0-00001.parquet"))
    assert(r.statusCode() === 200, r.body())
    val resp = json(r.body())
    assert(resp.get("uri").asText().startsWith(
      "https://demo-catalog-iceberg.s3.eu-central-1.amazonaws.com/"))
    val headers = resp.get("headers")
    val auth = headers.get("authorization").get(0).asText()
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/"))
    assert(auth.contains("/eu-central-1/s3/aws4_request"))
    // the signable-header whitelist: sdk headers participate, the
    // unsignable User-Agent and Content-MD5 do not
    val signedHeaders = auth.split("SignedHeaders=")(1).split(",")(0)
    assert(signedHeaders.contains("amz-sdk-invocation-id"))
    assert(signedHeaders.contains("amz-sdk-request"))
    assert(signedHeaders.contains("content-type"))
    assert(!signedHeaders.contains("user-agent"))
    assert(!signedHeaders.contains("content-md5"))
    // body present ⇒ signed payload hash, not UNSIGNED-PAYLOAD
    val shaHeader = headers.get("x-amz-content-sha256").get(0).asText()
    assert(shaHeader.matches("[0-9a-f]{64}"))
  }

}
