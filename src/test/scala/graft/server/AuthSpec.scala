package graft.server

import graft.catalog._
import graft.service.{AuthConfigHandler, TokenVerifier}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.UUID

/** Bearer-token middleware + AuthConfigHandler conformance (reference
  * service/token_verification.rs:46-75, service/auth.rs:200-249,
  * catalog/config.rs:115-126): with a verifier mounted, every route
  * 401s without a valid token; GET /config merges the handler's auth
  * entries so clients learn how to authenticate. */
class AuthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val secret = "graft-test-secret".getBytes("UTF-8")
  private val issuer = "https://idp.example/realm"
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val client = HttpClient.newHttpClient()
  private var prefix: String = _

  private def token(sub: String = "alice",
      exp: Long = System.currentTimeMillis() / 1000 + 3600,
      iss: String = issuer): String =
    TokenVerifier.signHs256(secret, iss, sub, exp)

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project,
      auth = new TokenVerifier.HmacJwtVerifier(secret, issuer),
      authConfig = AuthConfigHandler.Static(Map(
        "token-endpoint" -> s"$issuer/oauth/token",
        "auth-client-id" -> "graft"))).start()
    val wh = Files.createTempDirectory("graft-auth").toUri.toString.stripSuffix("/")
    val created = req("POST", "/management/v1/warehouse",
      s"""{"warehouse-name":"prod","location":"$wh","project-id":"$project"}""",
      bearer = Some(token()))
    assert(created.statusCode() === 200, created.body())
    prefix = graft.core.JsonCodecs.parse(created.body()).get("id").asText()
  }

  override def afterAll(): Unit = server.stop()

  private def req(method: String, path: String, body: String = "",
      bearer: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"${server.baseUri}$path"))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val withMethod = method match {
      case "GET" => b.GET()
      case _ => b.method(method, HttpRequest.BodyPublishers.ofString(body))
    }
    client.send(withMethod.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("requests without a token are rejected with 401") {
    val r = req("GET", s"/catalog/v1/$prefix/namespaces")
    assert(r.statusCode() === 401)
    assert(r.body().contains("Unauthorized"))
  }

  test("garbage, wrong-signature and expired tokens are rejected") {
    assert(req("GET", s"/catalog/v1/$prefix/namespaces",
      bearer = Some("not.a.jwt")).statusCode() === 401)
    val forged = TokenVerifier.signHs256(
      "wrong-secret".getBytes("UTF-8"), issuer, "mallory",
      System.currentTimeMillis() / 1000 + 3600)
    assert(req("GET", s"/catalog/v1/$prefix/namespaces",
      bearer = Some(forged)).statusCode() === 401)
    assert(req("GET", s"/catalog/v1/$prefix/namespaces",
      bearer = Some(token(exp = System.currentTimeMillis() / 1000 - 10)))
      .statusCode() === 401)
    assert(req("GET", s"/catalog/v1/$prefix/namespaces",
      bearer = Some(token(iss = "https://other.example")))
      .statusCode() === 401)
  }

  test("a valid token admits catalog operations end-to-end") {
    val t = Some(token())
    assert(req("POST", s"/catalog/v1/$prefix/namespaces",
      """{"namespace":["authed"],"properties":{}}""", bearer = t)
      .statusCode() === 200)
    val list = req("GET", s"/catalog/v1/$prefix/namespaces", bearer = t)
    assert(list.statusCode() === 200 && list.body().contains("authed"))
  }

  test("GET /config merges the AuthConfigHandler entries") {
    val r = req("GET", "/catalog/v1/config?warehouse=prod", bearer = Some(token()))
    assert(r.statusCode() === 200, r.body())
    val overrides = graft.core.JsonCodecs.parse(r.body()).get("overrides")
    assert(overrides.get("token-endpoint").asText() === s"$issuer/oauth/token")
    assert(overrides.get("auth-client-id").asText() === "graft")
  }

  // ------------------------------------------------------ RS256 / JWKS
  private def rsaKeyPair(): java.security.KeyPair = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  test("RS256 verifier: JWKS key admits, rotated/unknown/forged reject") {
    import java.security.interfaces.RSAPublicKey
    val active = rsaKeyPair()
    val retired = rsaKeyPair()
    val verifier = new TokenVerifier.RsaJwtVerifier(
      Map("k2" -> active.getPublic.asInstanceOf[RSAPublicKey]), issuer)
    val exp = System.currentTimeMillis() / 1000 + 3600

    val good = TokenVerifier.signRs256(active.getPrivate, "k2", issuer, "alice", exp)
    assert(verifier.verify(Some(good)).map(_.subject) === Right("alice"))

    // token minted under the rotated-out kid: key no longer in the set
    val stale = TokenVerifier.signRs256(retired.getPrivate, "k1", issuer, "alice", exp)
    assert(verifier.verify(Some(stale)).left.map(_.code) === Left(401))
    // right kid, wrong private key (forgery)
    val forged = TokenVerifier.signRs256(retired.getPrivate, "k2", issuer, "mallory", exp)
    assert(verifier.verify(Some(forged)).left.map(_.code) === Left(401))
    // expired / wrong issuer / no token
    val old = TokenVerifier.signRs256(active.getPrivate, "k2", issuer, "alice",
      System.currentTimeMillis() / 1000 - 10)
    assert(verifier.verify(Some(old)).left.map(_.code) === Left(401))
    val wrongIss = TokenVerifier.signRs256(active.getPrivate, "k2",
      "https://other.example", "alice", exp)
    assert(verifier.verify(Some(wrongIss)).left.map(_.code) === Left(401))
    assert(verifier.verify(None).left.map(_.code) === Left(401))
    // alg-confusion downgrade: an HS256 token never reaches the RSA path
    val hs = TokenVerifier.signHs256(secret, issuer, "mallory", exp)
    assert(verifier.verify(Some(hs)).left.map(_.code) === Left(401))
  }

  test("OIDC discovery: startup fetch, rate-limited rotation pickup, TTL refresh, degraded-refresh cache") {
    import java.security.interfaces.RSAPublicKey
    import com.sun.net.httpserver.HttpServer
    val kp1 = rsaKeyPair()
    val kp2 = rsaKeyPair()
    @volatile var served = Map("kid-1" -> kp1.getPublic.asInstanceOf[RSAPublicKey])
    @volatile var jwksFail = false
    @volatile var jwksHits = 0
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${http.getAddress.getPort}"
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    http.createContext("/realm/.well-known/openid-configuration",
      ex => respond(ex, 200,
        s"""{"issuer":"$issuer","jwks_uri":"$base/realm/jwks"}"""))
    http.createContext("/realm/jwks", ex => {
      jwksHits += 1
      if (jwksFail) respond(ex, 500, "boom")
      else respond(ex, 200, TokenVerifier.jwksJson(served))
    })
    http.start()
    try {
      var now = System.currentTimeMillis()
      val exp = now / 1000 + 3600
      val v = new TokenVerifier.OidcJwtVerifier(s"$base/realm", () => now)
      assert(jwksHits === 1) // startup: discovery doc + one JWKS fetch

      val t1 = TokenVerifier.signRs256(kp1.getPrivate, "kid-1", issuer, "alice", exp)
      assert(v.verify(Some(t1)).map(_.subject) === Right("alice"))
      assert(jwksHits === 1) // known kid: no extra fetch

      // rotation: new kid appears, but inside the min-refresh window the
      // verifier must NOT hammer the issuer — 401 without a fetch
      served = Map("kid-2" -> kp2.getPublic.asInstanceOf[RSAPublicKey])
      val t2 = TokenVerifier.signRs256(kp2.getPrivate, "kid-2", issuer, "bob", exp)
      assert(v.verify(Some(t2)).left.map(_.code) === Left(401))
      assert(jwksHits === 1)

      // past the window the unknown kid triggers the refresh: new key
      // admits, rotated-out key rejects
      now += 31 * 1000L
      assert(v.verify(Some(t2)).map(_.subject) === Right("bob"))
      assert(jwksHits === 2)
      assert(v.verify(Some(t1)).left.map(_.code) === Left(401))

      // refresh failure degrades to the cached keys, never to an outage
      jwksFail = true
      now += 31 * 1000L
      val bogus = TokenVerifier.signRs256(kp1.getPrivate, "kid-x", issuer, "eve", exp)
      assert(v.verify(Some(bogus)).left.map(_.code) === Left(401)) // attempted + failed
      assert(jwksHits === 3)
      assert(v.verify(Some(t2)).map(_.subject) === Right("bob")) // cache still serves

      // cache TTL: a stale key set refreshes after the next verify even
      // with no unknown kid in sight — fire-and-forget on a background
      // thread, so the verify itself returns from cache and the hit
      // lands shortly after
      jwksFail = false
      now += 16 * 60 * 1000L
      assert(v.verify(Some(t2)).map(_.subject) === Right("bob"))
      val deadline = System.currentTimeMillis() + 5000
      while (jwksHits < 4 && System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(jwksHits === 4)
    } finally http.stop(0)
  }

  test("a hung JWKS endpoint never blocks verifies that have cached keys") {
    import java.security.interfaces.RSAPublicKey
    import com.sun.net.httpserver.HttpServer
    val kp = rsaKeyPair()
    val served = Map("kid-1" -> kp.getPublic.asInstanceOf[RSAPublicKey])
    val hang = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hangEntered = new java.util.concurrent.CountDownLatch(1)
    val hangRelease = new java.util.concurrent.CountDownLatch(1)
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // JWKS requests must not serialize behind the hung one on the
    // stub's single dispatch thread
    http.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val base = s"http://127.0.0.1:${http.getAddress.getPort}"
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    http.createContext("/realm/.well-known/openid-configuration",
      ex => respond(ex, s"""{"issuer":"$issuer","jwks_uri":"$base/realm/jwks"}"""))
    http.createContext("/realm/jwks", ex => {
      if (hang.get()) {
        hangEntered.countDown()
        hangRelease.await(30, java.util.concurrent.TimeUnit.SECONDS)
      }
      respond(ex, TokenVerifier.jwksJson(served))
    })
    http.start()
    try {
      @volatile var now = System.currentTimeMillis()
      val exp = now / 1000 + 3600
      val v = new TokenVerifier.OidcJwtVerifier(s"$base/realm", () => now)
      val t = TokenVerifier.signRs256(kp.getPrivate, "kid-1", issuer, "alice", exp)
      assert(v.verify(Some(t)).map(_.subject) === Right("alice"))

      // age the cache past its TTL with the issuer wedged: the next
      // verify kicks off the refresh and parks on the hung fetch …
      hang.set(true)
      now += 16 * 60 * 1000L
      val stalled = new Thread(() => { v.verify(Some(t)); () })
      stalled.start()
      assert(hangEntered.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "refresh thread never reached the JWKS stub")

      // … while a verify on another thread must complete from the
      // cached keys instead of convoying behind the refresh. Run it on
      // its own thread with a bounded join so a lock regression fails
      // the test instead of deadlocking it.
      @volatile var concurrent: Option[String] = None
      val fast = new Thread(() =>
        concurrent = v.verify(Some(t)).map(_.subject).toOption)
      fast.start()
      fast.join(5000)
      assert(!fast.isAlive, "verify with cached keys blocked behind the hung JWKS refresh")
      assert(concurrent === Some("alice"))

      hangRelease.countDown()
      stalled.join(10000)
      assert(!stalled.isAlive)
    } finally http.stop(0)
  }

  test("unknown-kid verifies against a stalled JWKS return 503 within the bound, not behind the fetch") {
    import java.security.interfaces.RSAPublicKey
    import com.sun.net.httpserver.HttpServer
    val kp = rsaKeyPair()
    val rotated = rsaKeyPair()
    val served = Map("kid-1" -> kp.getPublic.asInstanceOf[RSAPublicKey])
    val hang = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hangRelease = new java.util.concurrent.CountDownLatch(1)
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val base = s"http://127.0.0.1:${http.getAddress.getPort}"
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    http.createContext("/realm/.well-known/openid-configuration",
      ex => respond(ex, s"""{"issuer":"$issuer","jwks_uri":"$base/realm/jwks"}"""))
    http.createContext("/realm/jwks", ex => {
      if (hang.get()) hangRelease.await(30, java.util.concurrent.TimeUnit.SECONDS)
      respond(ex, TokenVerifier.jwksJson(served))
    })
    http.start()
    try {
      @volatile var now = System.currentTimeMillis()
      val exp = now / 1000 + 3600
      val waitBound = 500L
      val v = new TokenVerifier.OidcJwtVerifier(s"$base/realm", () => now,
        unknownKidWaitMs = waitBound)
      val cached = TokenVerifier.signRs256(kp.getPrivate, "kid-1", issuer, "alice", exp)
      assert(v.verify(Some(cached)).map(_.subject) === Right("alice"))

      // key rotation happens while the issuer is wedged: a BURST of
      // unknown-kid tokens must each fail fast within the bound — not
      // serialize behind the single hung fetch — and cached-kid
      // verifies must keep succeeding throughout. The failure is 503
      // (keys not yet fetched — retryable), NOT 401: the kid's status
      // is unknown while the fetch is in flight, and clients must be
      // able to distinguish that from a genuinely bad token
      hang.set(true)
      now += 31 * 1000L
      val unknown = TokenVerifier.signRs256(
        rotated.getPrivate, "kid-2", issuer, "bob", exp)
      val n = 8
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Int, String]]()
      val t0 = System.nanoTime()
      val burst = (1 to n).map(_ => new Thread(() => {
        results.add(v.verify(Some(unknown))
          .map(_.subject).left.map(_.code))
      }))
      burst.foreach(_.start())
      burst.foreach(_.join(5000))
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(burst.forall(!_.isAlive),
        "an unknown-kid verify blocked past the join bound behind the hung fetch")
      import scala.jdk.CollectionConverters._
      assert(results.size === n && results.asScala.forall(_ === Left(503)))
      // concurrency proof: convoying behind the hung fetch would hold
      // threads for the 10s HTTP timeout (the old fetchLock behavior);
      // the burst must finish in roughly one bound — 6× slack keeps a
      // loaded box from flaking the assertion while staying far below
      // any serialized outcome
      assert(elapsedMs < waitBound * 6,
        s"burst of $n unknown-kid verifies took ${elapsedMs}ms — serialized behind the fetch?")
      // cached-kid traffic is untouched while the fetch is still hung
      assert(v.verify(Some(cached)).map(_.subject) === Right("alice"))
    } finally { hangRelease.countDown(); http.stop(0) }
  }

  test("rotation on a slow-but-healthy issuer: late arrivals join the in-flight fetch") {
    import java.security.interfaces.RSAPublicKey
    import com.sun.net.httpserver.HttpServer
    val kp1 = rsaKeyPair()
    val kp2 = rsaKeyPair()
    @volatile var served = Map("kid-1" -> kp1.getPublic.asInstanceOf[RSAPublicKey])
    @volatile var delayMs = 0L
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val base = s"http://127.0.0.1:${http.getAddress.getPort}"
    def respond(ex: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    http.createContext("/realm/.well-known/openid-configuration",
      ex => respond(ex, s"""{"issuer":"$issuer","jwks_uri":"$base/realm/jwks"}"""))
    http.createContext("/realm/jwks", ex => {
      if (delayMs > 0) Thread.sleep(delayMs)
      respond(ex, TokenVerifier.jwksJson(served))
    })
    http.start()
    try {
      @volatile var now = System.currentTimeMillis()
      val exp = now / 1000 + 3600
      val v = new TokenVerifier.OidcJwtVerifier(s"$base/realm", () => now,
        unknownKidWaitMs = 2000L)
      // rotate while the issuer answers SLOWLY (but within the wait
      // bound): several requests carrying the new kid land while the
      // first one's fetch is still in flight — every one of them must
      // join that fetch and verify, not fall through the rate-limit
      // check to a spurious 401
      served = Map("kid-2" -> kp2.getPublic.asInstanceOf[RSAPublicKey])
      delayMs = 400L
      now += 31 * 1000L
      val rotated = TokenVerifier.signRs256(kp2.getPrivate, "kid-2", issuer, "bob", exp)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Int, String]]()
      val threads = (1 to 4).map(i => new Thread(() => {
        Thread.sleep(i * 30L) // stagger: later ones arrive mid-fetch
        results.add(v.verify(Some(rotated)).map(_.subject).left.map(_.code))
      }))
      threads.foreach(_.start())
      threads.foreach(_.join(10000))
      assert(threads.forall(!_.isAlive))
      import scala.jdk.CollectionConverters._
      assert(results.asScala.toSeq === Seq.fill(4)(Right("bob")),
        s"late arrivals during the in-flight fetch were rejected: ${results.asScala.toSeq}")

      // a kid that is still absent AFTER a fetch that COMPLETED within
      // the bound is genuinely unknown → 401 (the 503 is reserved for
      // the not-yet-fetched case)
      delayMs = 0
      now += 31 * 1000L
      val ghost = TokenVerifier.signRs256(kp1.getPrivate, "kid-ghost", issuer, "eve", exp)
      assert(v.verify(Some(ghost)).left.map(_.code) === Left(401))
    } finally http.stop(0)
  }

  test("OIDC discovery failure is a loud startup error, not an open catalog") {
    // nothing listening on the path → fetch fails → constructor throws
    val ex = intercept[IllegalStateException](
      new TokenVerifier.OidcJwtVerifier("http://127.0.0.1:9/realm"))
    assert(ex.getMessage.contains("cannot start"))
  }

  test("RS256 verifier mounts as server middleware like the HS256 one") {
    import java.security.interfaces.RSAPublicKey
    val kp = rsaKeyPair()
    val rsServer = new CatalogServer(new InMemoryCatalogStore, UUID.randomUUID(),
      auth = new TokenVerifier.RsaJwtVerifier(
        Map("kid-1" -> kp.getPublic.asInstanceOf[RSAPublicKey]), issuer)).start()
    try {
      val exp = System.currentTimeMillis() / 1000 + 3600
      val t = TokenVerifier.signRs256(kp.getPrivate, "kid-1", issuer, "carol", exp)
      val ok = client.send(
        HttpRequest.newBuilder(URI.create(
          s"${rsServer.baseUri}/catalog/v1/config?warehouse=nope"))
          .header("Authorization", s"Bearer $t").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ok.statusCode() === 404) // authenticated; warehouse missing
      val anon = client.send(
        HttpRequest.newBuilder(URI.create(
          s"${rsServer.baseUri}/catalog/v1/config?warehouse=nope")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(anon.statusCode() === 401)
    } finally rsServer.stop()
  }

  test("auth-keys-unavailable surfaces as HTTP 503 with Retry-After") {
    // a verifier mid-key-fetch (the OIDC timed-out-join case) mounted
    // as middleware: the server must tell the client this is retryable
    val stuck = new TokenVerifier {
      def verify(bearer: Option[String]) =
        Left(graft.catalog.CatalogError(503, "AuthKeysUnavailable",
          "signing key not yet fetched; retry shortly"))
    }
    val srv = new CatalogServer(new InMemoryCatalogStore, UUID.randomUUID(),
      auth = stuck).start()
    try {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(
          s"${srv.baseUri}/catalog/v1/config?warehouse=nope"))
          .header("Authorization", "Bearer whatever").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 503)
      assert(resp.headers().firstValue("Retry-After").isPresent,
        "503 must carry Retry-After so clients distinguish retryable from terminal")
      assert(resp.body().contains("AuthKeysUnavailable"))
    } finally srv.stop()
  }
}
