package graft.server

import graft.catalog.TableIdent
import graft.engine.RestCatalogClient
import graft.service.TokenVerifier
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.UUID

/** [[ServerMain]] assembles a runnable catalog from flat env config —
  * the reference's binary bootstrap (iceberg-catalog-bin/src/main.rs:
  * 72-89: store pools, optional NATS sink, optional OIDC verifier all
  * selected by `ICEBERG_REST__*` env before the router is built).
  * Each case passes a config MAP to `build` so the selection logic is
  * exercised without mutating the JVM's environment. */
class ServerMainSpec extends AnyFunSuite {

  private val http = HttpClient.newHttpClient()

  private def post(base: String, path: String, body: String,
      bearer: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .method("POST", HttpRequest.BodyPublishers.ofString(body))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** management-API warehouse create; returns the warehouse id. */
  private def createWarehouse(base: String, project: UUID,
      bearer: Option[String] = None): String = {
    val loc = Files.createTempDirectory("graft-main-wh").toUri.toString.stripSuffix("/")
    val r = post(base, "/management/v1/warehouse",
      s"""{"warehouse-name":"wh","location":"$loc","project-id":"$project"}""",
      bearer)
    assert(r.statusCode() === 200, r.body())
    graft.core.JsonCodecs.parse(r.body()).get("id").asText()
  }

  test("default config: in-memory store, anonymous, full round trip") {
    val running = ServerMain.build(Map("GRAFT_PORT" -> "0"))
    try {
      val prefix = createWarehouse(running.baseUri, ServerMain.NilProject)
      val client = new RestCatalogClient(running.baseUri)
      client.createNamespace(prefix, Seq("db"), Map.empty)
      assert(client.listNamespaces(prefix) === Seq(Seq("db")))
    } finally running.close()
  }

  test("GRAFT_DB_PATH selects the JDBC store: state survives a restart") {
    val db = Files.createTempDirectory("graft-main-db").resolve("cat").toString
    val env = Map("GRAFT_PORT" -> "0", "GRAFT_DB_PATH" -> db)
    val first = ServerMain.build(env)
    val prefix =
      try {
        val p = createWarehouse(first.baseUri, ServerMain.NilProject)
        new RestCatalogClient(first.baseUri).createNamespace(p, Seq("db"), Map.empty)
        p
      } finally first.close()

    val second = ServerMain.build(env)
    try {
      val client = new RestCatalogClient(second.baseUri)
      assert(client.listNamespaces(prefix) === Seq(Seq("db")),
        "namespace created before restart must be visible from the re-opened store")
    } finally second.close()
  }

  test("GRAFT_OPENID_PROVIDER_URI mounts the OIDC verifier") {
    import com.sun.net.httpserver.HttpServer
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    val stub = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${stub.getAddress.getPort}"
    val issuer = s"$base/realm"
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    stub.createContext("/realm/.well-known/openid-configuration",
      ex => respond(ex, s"""{"issuer":"$issuer","jwks_uri":"$base/realm/jwks"}"""))
    stub.createContext("/realm/jwks", ex => respond(ex, TokenVerifier.jwksJson(
      Map("k1" -> kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]))))
    stub.start()
    try {
      val running = ServerMain.build(Map(
        "GRAFT_PORT" -> "0", "GRAFT_OPENID_PROVIDER_URI" -> issuer))
      try {
        // no token → 401 with the uniform envelope
        val denied = post(running.baseUri, "/management/v1/warehouse", "{}")
        assert(denied.statusCode() === 401, denied.body())
        // a token the stub's JWKS verifies → full round trip
        val tok = TokenVerifier.signRs256(kp.getPrivate, "k1", issuer,
          "alice", System.currentTimeMillis() / 1000 + 3600)
        createWarehouse(running.baseUri, ServerMain.NilProject, bearer = Some(tok))
      } finally running.close()
    } finally stub.stop(0)
  }

  test("an unreachable OIDC issuer fails startup, never an open catalog") {
    val ex = intercept[IllegalStateException](ServerMain.build(Map(
      "GRAFT_PORT" -> "0",
      "GRAFT_OPENID_PROVIDER_URI" -> "http://127.0.0.1:1/nowhere")))
    assert(ex.getMessage.contains("OIDC"))
  }

  test("GRAFT_EVENT_SINK path wires the JSONL file sink") {
    val sinkFile = Files.createTempDirectory("graft-main-ev").resolve("events.jsonl")
    val running = ServerMain.build(Map(
      "GRAFT_PORT" -> "0", "GRAFT_EVENT_SINK" -> sinkFile.toString))
    try {
      val prefix = createWarehouse(running.baseUri, ServerMain.NilProject)
      val client = new RestCatalogClient(running.baseUri)
      client.createNamespace(prefix, Seq("db"), Map.empty)
      client.createTable(prefix, TableIdent(Seq("db"), "t"),
        graft.core.Schema(0, Seq(graft.core.NestedField.required(
          1, "id", graft.core.IType.TLong))))
      // the publisher worker drains async; close() joins it
      running.close()
      val lines = Files.readAllLines(sinkFile)
      assert(lines.toString.contains("createTable"),
        s"table create must reach the file sink, got: $lines")
    } finally running.close() // idempotent: stop/close tolerate a second call
  }

  test("GRAFT_EVENT_SINK nats:// URL wires the NATS-protocol sink") {
    // minimal wire-protocol stub: INFO greeting, then record PUB frames
    val pubs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val stub = new Thread(() => {
      try while (!server.isClosed) {
        val s = server.accept()
        try {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(s.getInputStream))
          def line(): String = {
            val sb = new java.lang.StringBuilder()
            var c = in.read()
            while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
            if (c == -1) null else sb.toString
          }
          s.getOutputStream.write("INFO {}\r\n".getBytes("UTF-8"))
          var l = line()
          while (l != null) {
            if (l == "PING") {
              s.getOutputStream.write("PONG\r\n".getBytes("UTF-8"))
              s.getOutputStream.flush()
            } else if (l.startsWith("PUB ")) {
              val n = l.split(" ")(2).toInt
              val buf = new Array[Byte](n)
              in.readFully(buf); line()
              pubs.add(l.split(" ")(1) + "|" + new String(buf, "UTF-8"))
            }
            l = line()
          }
        } catch { case _: Exception => () } finally s.close()
      } catch { case _: Exception => () }
    })
    stub.setDaemon(true); stub.start()
    val running = ServerMain.build(Map(
      "GRAFT_PORT" -> "0",
      "GRAFT_EVENT_SINK" -> s"nats://127.0.0.1:${server.getLocalPort}/catalog.events"))
    try {
      val prefix = createWarehouse(running.baseUri, ServerMain.NilProject)
      val client = new RestCatalogClient(running.baseUri)
      client.createNamespace(prefix, Seq("db"), Map.empty)
      client.createTable(prefix, TableIdent(Seq("db"), "t"),
        graft.core.Schema(0, Seq(graft.core.NestedField.required(
          1, "id", graft.core.IType.TLong))))
      running.close() // joins the publisher worker: bytes are on the wire
      // the stub's READER runs on its own thread — poll briefly for it
      // to parse the delivered frames before asserting
      def seen(): Seq[String] = pubs.toArray(Array.empty[String]).toSeq
      def delivered(): Boolean = seen().exists(p =>
        p.startsWith("catalog.events|") && p.contains("createTable"))
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!delivered() && System.nanoTime() < deadline) Thread.sleep(20)
      assert(delivered(), s"expected a createTable on the subject: ${seen()}")
    } finally { running.close(); server.close() }
  }

  test("/health answers without a token even when OIDC is mounted") {
    import com.sun.net.httpserver.HttpServer
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    val stub = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${stub.getAddress.getPort}"
    val issuer = s"$base/realm"
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    stub.createContext("/realm/.well-known/openid-configuration",
      ex => respond(ex, s"""{"issuer":"$issuer","jwks_uri":"$base/realm/jwks"}"""))
    stub.createContext("/realm/jwks", ex => respond(ex, TokenVerifier.jwksJson(
      Map("k1" -> kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]))))
    stub.start()
    try {
      val running = ServerMain.build(Map(
        "GRAFT_PORT" -> "0", "GRAFT_OPENID_PROVIDER_URI" -> issuer))
      try {
        // the auth'd surface still 401s...
        assert(post(running.baseUri, "/management/v1/warehouse", "{}")
          .statusCode() === 401)
        // ...while the liveness probe answers token-free (the reference
        // mounts /health on the root router, api/router.rs:53)
        assert(ServerMain.healthcheck(running.baseUri))
      } finally running.close()
    } finally stub.stop(0)
  }

  test("healthcheck is false against a dead server") {
    intercept[Exception](ServerMain.healthcheck("http://127.0.0.1:1"))
  }

  test("GRAFT_BASE_URI sets the advertised callback URI in client config") {
    val running = ServerMain.build(Map(
      "GRAFT_PORT" -> "0",
      "GRAFT_BASE_URI" -> "https://catalog.example.com:8443/"))
    try {
      val prefix = createWarehouse(running.baseUri, ServerMain.NilProject)
      val cfg = http.send(
        HttpRequest.newBuilder(URI.create(
          s"${running.baseUri}/catalog/v1/config?warehouse=wh")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(cfg.statusCode() === 200, cfg.body())
      val uri = graft.core.JsonCodecs.parse(cfg.body())
        .get("overrides").get("uri").asText()
      // a non-loopback deployment must not advertise 127.0.0.1 — the
      // follow-up requests would hit the CLIENT's own loopback
      assert(uri === "https://catalog.example.com:8443/catalog", s"prefix=$prefix")
    } finally running.close()
  }

  test("GRAFT_DEFAULT_PROJECT_ID scopes the default project") {
    val pid = UUID.randomUUID()
    val running = ServerMain.build(Map(
      "GRAFT_PORT" -> "0", "GRAFT_DEFAULT_PROJECT_ID" -> pid.toString))
    try {
      createWarehouse(running.baseUri, pid)
      val listed = http.send(
        HttpRequest.newBuilder(URI.create(
          s"${running.baseUri}/management/v1/project")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(listed.body().contains(pid.toString))
    } finally running.close()
  }
}
