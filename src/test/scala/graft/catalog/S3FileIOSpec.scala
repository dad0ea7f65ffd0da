package graft.catalog

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.UUID
import scala.collection.concurrent.TrieMap

/** [[S3FileIO]] against an in-process fake S3 (JDK HttpServer speaking
  * the object API: PUT/GET/HEAD/DELETE + ListObjectsV2 with
  * continuation paging, and SigV4 header checks on every request) —
  * the FileIO contract, HEAD-not-GET probes, list pagination, and the
  * warehouse-create storage probe end-to-end. */
class S3FileIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val objects = TrieMap.empty[String, Array[Byte]] // "/bucket/key" → bytes
  private var server: HttpServer = _
  private var io: S3FileIO = _
  @volatile private var lastAuth: Option[String] = None
  @volatile private var lastContentSha: Option[String] = None
  private val listRequests = new java.util.concurrent.atomic.AtomicLong(0)
  private val PageSize = 2

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    io = new S3FileIO(
      "AKIDEXAMPLE", "testsecret", "us-east-1",
      endpoint = Some(s"http://127.0.0.1:${server.getAddress.getPort}"),
      scheme = "s3t")
    FileIO.register("s3t", io)
  }

  override def afterAll(): Unit = {
    FileIO.unregister("s3t")
    server.stop(0)
  }

  private def handle(ex: HttpExchange): Unit = try {
    lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
    lastContentSha = Option(ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
    val path = ex.getRequestURI.getPath // decoded "/bucket/key..."
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val body = ex.getRequestBody.readAllBytes()
    ex.getRequestMethod match {
      case "PUT" =>
        objects(path) = body
        ex.sendResponseHeaders(200, -1)
      case "GET" if query.contains("list-type=2") =>
        listRequests.incrementAndGet()
        val params = query.split("&").map(_.split("=", 2))
          .map(a => a(0) -> (if (a.length > 1) a(1) else "")).toMap
        val bucket = path.stripSuffix("/")
        val prefix = java.net.URLDecoder.decode(
          params.getOrElse("prefix", ""), "UTF-8")
        val after = params.get("continuation-token")
          .map(t => java.net.URLDecoder.decode(t, "UTF-8"))
        val delim = params.get("delimiter")
          .map(d => java.net.URLDecoder.decode(d, "UTF-8"))
        val allKeys = objects.keys.toSeq.sorted
          .filter(_.startsWith(s"$bucket/$prefix"))
          .map(_.stripPrefix(s"$bucket/"))
        // delimiter rolls keys with a '/' past the prefix up into
        // distinct CommonPrefixes; paging covers the merged entries
        val all: Seq[(String, Boolean)] = delim match { // (name, isCommonPrefix)
          case Some(d) => allKeys.map { k =>
            val rest = k.stripPrefix(prefix)
            val i = rest.indexOf(d)
            if (i < 0) (k, false) else (prefix + rest.substring(0, i + d.length), true)
          }.distinct
          case None => allKeys.map((_, false))
        }
        val remaining = after.map(t => all.dropWhile(_._1 <= t)).getOrElse(all)
        val page = remaining.take(PageSize)
        val truncated = remaining.size > PageSize
        val keysXml = page.map {
          case (p, true) => s"<CommonPrefixes><Prefix>$p</Prefix></CommonPrefixes>"
          case (k, false) => s"<Contents><Key>$k</Key></Contents>"
        }.mkString
        val tokenXml =
          if (truncated) s"<NextContinuationToken>${page.last._1}</NextContinuationToken>"
          else ""
        val xml = "<?xml version=\"1.0\"?><ListBucketResult>" +
          s"<IsTruncated>$truncated</IsTruncated>$keysXml$tokenXml</ListBucketResult>"
        val out = xml.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, out.length.toLong)
        ex.getResponseBody.write(out)
      case "GET" =>
        objects.get(path) match {
          case Some(bytes) =>
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
          case None => ex.sendResponseHeaders(404, -1)
        }
      case "HEAD" =>
        objects.get(path) match {
          case Some(bytes) =>
            // JDK HttpServer: HEAD needs the explicit header (the
            // sendResponseHeaders length is suppressed for HEAD)
            ex.getResponseHeaders.add("Content-Length", bytes.length.toString)
            ex.sendResponseHeaders(200, -1)
          case None => ex.sendResponseHeaders(404, -1)
        }
      case "DELETE" =>
        objects.remove(path)
        ex.sendResponseHeaders(204, -1)
      case _ => ex.sendResponseHeaders(405, -1)
    }
  } finally ex.close()

  test("FileIO contract: write/read/exists/size/delete round trip") {
    val loc = "s3t://bucket/wh/db/t/metadata/m1.json"
    assert(io.read(loc).isEmpty && !io.exists(loc) && io.size(loc).isEmpty)
    io.write(loc, "hello-s3".getBytes(StandardCharsets.UTF_8))
    assert(io.read(loc).map(new String(_, StandardCharsets.UTF_8)) === Some("hello-s3"))
    assert(io.exists(loc) && io.size(loc) === Some(8L))
    io.delete(loc)
    assert(!io.exists(loc) && io.read(loc).isEmpty)
    io.delete(loc) // deleting an absent object is a no-op, like S3
  }

  test("every request is SigV4-signed with a content hash") {
    val loc = "s3t://bucket/sig/check.json"
    val payload = "signed".getBytes(StandardCharsets.UTF_8)
    io.write(loc, payload)
    val auth = lastAuth.getOrElse(fail("no Authorization header seen"))
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/"))
    assert(auth.contains("/us-east-1/s3/aws4_request"))
    assert(auth.contains("SignedHeaders="))
    assert(Seq("host", "x-amz-content-sha256", "x-amz-date").forall(auth.contains))
    assert(lastContentSha === Some(graft.server.SigV4.sha256Hex(payload)))
    // reads sign the EMPTY payload hash
    io.read(loc)
    assert(lastContentSha === Some(graft.server.SigV4.sha256Hex(Array.empty[Byte])))
    io.delete(loc)
  }

  test("list pages through ListObjectsV2 continuation tokens") {
    val keys = (1 to 5).map(i => s"s3t://bucket/listdir/f$i.json")
    keys.foreach(k => io.write(k, Array[Byte](1)))
    io.write("s3t://bucket/other/x.json", Array[Byte](1))
    assert(io.list("s3t://bucket/listdir/").toSeq === keys) // 3 pages of ≤2
    keys.foreach(io.delete)
    io.delete("s3t://bucket/other/x.json")
  }

  test("list is lazy: the first element costs one page, not the full tree") {
    val keys = (1 to 6).map(i => s"s3t://bucket/lazy/f$i.json")
    keys.foreach(k => io.write(k, Array[Byte](1)))
    val before = listRequests.get()
    val it = io.list("s3t://bucket/lazy/")
    assert(listRequests.get() === before) // building the iterator is free
    assert(it.next() === keys.head)
    assert(listRequests.get() === before + 1) // one page (≤2 keys) fetched
    assert(it.toSeq === keys.tail) // draining pages the rest on demand
    keys.foreach(io.delete)
  }

  test("listDir sends delimiter=/ and pages merged CommonPrefixes + keys") {
    val under = Seq(
      "s3t://bucket/dl/a/1.json", "s3t://bucket/dl/a/2.json",
      "s3t://bucket/dl/b/1.json", "s3t://bucket/dl/c.json")
    under.foreach(k => io.write(k, Array[Byte](1)))
    val d = io.listDir("s3t://bucket/dl/")
    // 3 merged entries at PageSize=2 → the client had to page
    assert(d.subPrefixes === Seq("s3t://bucket/dl/a/", "s3t://bucket/dl/b/"))
    assert(d.objects === Seq("s3t://bucket/dl/c.json"))
    under.foreach(io.delete)
  }

  test("metadata plane round-trips through S3: manifests + commit tree") {
    val dir = "s3t://bucket/wh/db/t2/metadata"
    val list = graft.engine.Manifests.writeCommit(dir, 42L, Nil,
      Seq(graft.engine.Manifests.DataFile(
        "s3t://bucket/wh/db/t2/data/a.parquet", 100L, 10L, Map.empty, seq = 1L)),
      iceberg = None)
    val files = graft.engine.Manifests.read(list)
    assert(files.map(_.path) === Seq("s3t://bucket/wh/db/t2/data/a.parquet"))
    assert(files.head.recordCount === 10L)
  }

  test("plugin registration wires s3 from spark conf on driver and executor paths") {
    val conf = Map(
      "spark.graft.s3.region" -> "eu-west-1",
      "spark.graft.s3.access-key-id" -> "AK",
      "spark.graft.s3.secret-access-key" -> "SK",
      "spark.graft.s3.endpoint" -> s"http://127.0.0.1:${server.getAddress.getPort}")
    try {
      GraftSparkPlugin.registerFromConf(conf.get)
      assert(FileIO.canHandle("s3://bucket/x"))
      // incomplete conf registers nothing
      FileIO.unregister("s3")
      GraftSparkPlugin.registerFromConf((conf - "spark.graft.s3.access-key-id").get)
      assert(!FileIO.canHandle("s3://bucket/x"))
    } finally FileIO.unregister("s3")
  }

  test("warehouse create runs the live storage probe; failures 400") {
    val store = new InMemoryCatalogStore
    val project = UUID.randomUUID()
    val srv = new graft.server.CatalogServer(store, project).start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def createWh(name: String, loc: String): Int = {
        val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${srv.baseUri}/management/v1/warehouse"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            s"""{"warehouse-name":"$name","location":"$loc"}"""))
          .build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
          .statusCode()
      }
      // registered backend + live fake → probe passes, nothing left behind
      assert(createWh("whs3", "s3t://bucket/whs3") === 200)
      assert(objects.keys.forall(!_.contains(".graft/probe-")))
      // registered backend, dead endpoint → probe fails with 400
      val deadPort = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
      FileIO.register("s3dead", new S3FileIO("k", "s", "us-east-1",
        endpoint = Some(s"http://127.0.0.1:$deadPort"), scheme = "s3dead"))
      try assert(createWh("whdead", "s3dead://bucket/whdead") === 400)
      finally FileIO.unregister("s3dead")
      // unregistered scheme skips the probe (signer-only warehouses)
      assert(createWh("whsigner", "s3zz://bucket/whsigner") === 200)
    } finally srv.stop()
  }
}
