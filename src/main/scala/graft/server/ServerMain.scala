package graft.server

import graft.catalog.{CatalogStore, InMemoryCatalogStore, JdbcCatalogStore}
import graft.service.{CloudEventBackend, QueueingEventPublisher, TokenVerifier}

import java.util.UUID

/** Env-configured catalog bootstrap — the deployable sibling of the
  * reference's server binary (iceberg-catalog-bin/src/main.rs:72-89
  * wires store pools, the optional NATS sink, and the optional OIDC
  * verifier from `ICEBERG_REST__*` env config before building the
  * router, router.rs:89-101). Every trait implementation already
  * exists behind [[CatalogServer]]'s constructor DI; this object is
  * the assembly from flat configuration:
  *
  *  - `GRAFT_PORT`            listen port (default 8080, the
  *                            reference's default base_uri port,
  *                            config.rs:85)
  *  - `GRAFT_DB_PATH`         directory for the embedded-Derby JDBC
  *                            store (created on first use; tables and
  *                            namespaces survive restarts). Unset →
  *                            in-memory store (dev mode; the reference
  *                            has no in-memory catalog, but its tests'
  *                            sqlx-pool stand-in plays the same role)
  *  - `GRAFT_OPENID_PROVIDER_URI`  OIDC issuer → [[TokenVerifier.OidcJwtVerifier]]
  *                            (live discovery + JWKS, FAIL-FAST on an
  *                            unreachable issuer exactly like the
  *                            reference's `Verifier::new(uri).await?`,
  *                            main.rs:86). Unset → anonymous
  *  - `GRAFT_EVENT_SINK`      `nats://host:port/subject` → NATS
  *                            wire-protocol sink (the reference's
  *                            backend, gated on
  *                            `ICEBERG_REST__NATS_ADDRESS`,
  *                            main.rs:56-62); `http(s)://…` →
  *                            CloudEvents POST sink; any other
  *                            non-empty value → JSONL file sink at
  *                            that path; unset → drop (reference:
  *                            tracing only)
  *  - `GRAFT_DEFAULT_PROJECT_ID`   UUID for single-project deployments
  *                            (reference config.rs default-project
  *                            semantics); default = the nil UUID
  *
  * `build(env)` is the testable seam (a spec passes a config map and
  * the AuthSpec OIDC stub); `main` reads `sys.env` and blocks.
  */
object ServerMain {

  val NilProject: UUID = new UUID(0L, 0L)

  /** A fully wired, STARTED server plus the resources it owns. */
  final class Running(
      val server: CatalogServer,
      val store: CatalogStore,
      sink: CloudEventBackend,
      val publisher: QueueingEventPublisher) extends AutoCloseable {
    def baseUri: String = server.baseUri
    def close(): Unit = {
      server.stop()
      publisher.close()
      sink match { case c: AutoCloseable => c.close(); case _ => () }
    }
  }

  def build(env: Map[String, String]): Running = {
    def get(k: String): Option[String] = env.get(k).map(_.trim).filter(_.nonEmpty)

    val port = get("GRAFT_PORT").map(_.toInt).getOrElse(8080)
    val projectId = get("GRAFT_DEFAULT_PROJECT_ID").map(UUID.fromString)
      .getOrElse(NilProject)

    val store: CatalogStore = get("GRAFT_DB_PATH") match {
      case Some(dir) => JdbcCatalogStore.embedded(java.nio.file.Paths.get(dir))
      case None => new InMemoryCatalogStore
    }

    // fail-fast: an unreachable issuer aborts startup here, inside
    // build(), before the port is bound — never an open catalog
    val auth: TokenVerifier = get("GRAFT_OPENID_PROVIDER_URI") match {
      case Some(uri) => new TokenVerifier.OidcJwtVerifier(uri)
      case None => TokenVerifier.AllowAnonymous
    }

    val sink: CloudEventBackend = get("GRAFT_EVENT_SINK") match {
      case Some(url) if url.startsWith("http://") || url.startsWith("https://") =>
        new CloudEventBackend.HttpBacked(url)
      case Some(url) if url.startsWith("nats://") =>
        // nats://host:4222/subject — the reference's NATS wiring
        // (main.rs:56-62 gated on ICEBERG_REST__NATS_ADDRESS + topic)
        val u = java.net.URI.create(url)
        val subject = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
          .getOrElse("graft-events")
        new CloudEventBackend.NatsBacked(
          u.getHost, if (u.getPort > 0) u.getPort else 4222, subject)
      case Some(path) =>
        new CloudEventBackend.FileBacked(java.nio.file.Paths.get(path))
      case None => CloudEventBackend.Noop
    }
    val publisher = new QueueingEventPublisher(sink)

    // GRAFT_BIND=0.0.0.0 exposes the server beyond loopback (the
    // reference binary's bind, main.rs:136-138); default stays local.
    // GRAFT_BASE_URI sets the externally-reachable URI advertised in
    // client-facing config (the reference's ICEBERG_REST__BASE_URI,
    // config.rs:38) — required with a non-loopback bind, because the
    // default advertises 127.0.0.1:<port>.
    val server = new CatalogServer(store, projectId, port = port,
      events = publisher, auth = auth,
      bindHost = get("GRAFT_BIND").getOrElse("127.0.0.1"),
      advertisedUri = get("GRAFT_BASE_URI"))
    new Running(server.start(), store, sink, publisher)
  }

  val Version = "0.9.0"

  /** Subcommands mirror the reference CLI (main.rs:123-160):
    * `serve` (default), `migrate`, `healthcheck`, `version`. */
  def main(args: Array[String]): Unit = args.headOption.getOrElse("serve") match {
    case "serve" =>
      val running = build(sys.env)
      System.err.println(s"[graft-server] graft catalog $Version listening on ${running.baseUri}")
      sys.addShutdownHook(running.close())
      Thread.currentThread().join() // serve until killed
    case "migrate" =>
      // embedded-Derby DDL runs on first store construction — the
      // JDBC sibling of the reference's embedded sqlx migrations
      // (main.rs:124-133); a no-op on an already-migrated directory
      sys.env.get("GRAFT_DB_PATH") match {
        case Some(dir) =>
          JdbcCatalogStore.embedded(java.nio.file.Paths.get(dir))
          println(s"Database migration complete: $dir")
        case None =>
          System.err.println("migrate requires GRAFT_DB_PATH")
          sys.exit(1)
      }
    case "healthcheck" =>
      val port = sys.env.get("GRAFT_PORT").map(_.trim).filter(_.nonEmpty)
        .map(_.toInt).getOrElse(8080)
      val healthy =
        try healthcheck(s"http://127.0.0.1:$port")
        catch { case _: Exception => false }
      if (!healthy) { System.err.println("Server is not healthy"); sys.exit(1) }
      println("Server is healthy.")
    case "version" => println(Version)
    case other =>
      System.err.println(s"unknown subcommand '$other' (serve|migrate|healthcheck|version)")
      sys.exit(1)
  }

  /** GET /health — true iff the server answers 200 (the probe route
    * sits outside the auth middleware, so no token is needed). */
  def healthcheck(baseUri: String): Boolean = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5)).build()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$baseUri/health"))
        .timeout(java.time.Duration.ofSeconds(5)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() == 200 && resp.body() == "OK"
  }
}
