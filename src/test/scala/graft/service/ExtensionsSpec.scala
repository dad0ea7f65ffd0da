package graft.service

import graft.catalog._
import graft.core._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.UUID

/** §2.6 extension traits: AuthZ gating, contract-verification chain
  * with short-circuit, and the bounded fire-and-forget event publisher
  * wired through the commit path. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  import IType._

  private val project = UUID.randomUUID()
  private val client = HttpClient.newHttpClient()

  private val schemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      |{"id":1,"name":"id","required":true,"type":"int"}]}""".stripMargin

  private def post(base: String, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def newServer(
      authz: AuthZHandler = AuthZHandler.AllowAll,
      contracts: ContractVerifiers = ContractVerifiers.Empty,
      events: QueueingEventPublisher =
        new QueueingEventPublisher(CloudEventBackend.Noop)): (CatalogServer, String, String) = {
    val store = new InMemoryCatalogStore
    val server = new CatalogServer(store, project,
      authz = authz, contracts = contracts, events = events).start()
    val wh = Files.createTempDirectory("graft-ext").toUri.toString.stripSuffix("/")
    val created = store.createWarehouse(project, "wh", wh)
      .fold(e => fail(e.message), identity)
    (server, server.baseUri, created.id.toString)
  }

  test("deny-all authz gates catalog routes with 403; management unaffected") {
    val (server, base, prefix) = newServer(authz = AuthZHandler.DenyCatalog)
    try {
      assert(post(base, s"/catalog/v1/$prefix/namespaces",
        """{"namespace":["ns"]}""").statusCode() === 403)
      assert(post(base, s"/catalog/v1/$prefix/namespaces/ns/tables",
        s"""{"name":"t","schema":$schemaJson}""").statusCode() === 403)
      // management stays open (separate checkWarehouseOp)
      assert(post(base, "/management/v1/warehouse",
        s"""{"warehouse-name":"w2","location":"file:///tmp/w2","project-id":"$project"}""")
        .statusCode() === 200)
    } finally server.stop()
  }

  test("contract verifier chain vetoes commits and short-circuits in order") {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    def verifier(n: String, veto: Boolean): ContractVerifier = new ContractVerifier {
      val name = n
      def checkCommit(updates: Seq[TableUpdate], current: TableMetadata): ContractOutcome = {
        calls += n
        if (veto && updates.exists(_.isInstanceOf[TableUpdate.SetProperties]))
          ContractOutcome.Violation("ContractViolation", "property changes are frozen")
        else ContractOutcome.Clear
      }
    }
    val (server, base, prefix) = newServer(
      contracts = ContractVerifiers(
        verifier("first", veto = true), verifier("second", veto = false)))
    try {
      assert(post(base, s"/catalog/v1/$prefix/namespaces",
        """{"namespace":["ns"]}""").statusCode() === 200)
      assert(post(base, s"/catalog/v1/$prefix/namespaces/ns/tables",
        s"""{"name":"t","schema":$schemaJson}""").statusCode() === 200)

      val veto = post(base, s"/catalog/v1/$prefix/namespaces/ns/tables/t",
        """{"updates":[{"action":"set-properties","updates":{"k":"v"}}]}""")
      assert(veto.statusCode() === 409)
      assert(veto.body().contains("[first] property changes are frozen"))
      // first verifier vetoed → second never ran for this commit
      assert(calls.count(_ == "first") === 1)
      assert(calls.count(_ == "second") === 0)

      // non-vetoed updates pass the whole chain
      val ok = post(base, s"/catalog/v1/$prefix/namespaces/ns/tables/t",
        """{"updates":[{"action":"remove-properties","removals":["ghost"]}]}""")
      assert(ok.statusCode() === 200)
      assert(calls.count(_ == "second") === 1)
    } finally server.stop()
  }

  test("commit path emits createTable/updateTable/dropTable events in order") {
    val sink = new CloudEventBackend.Collecting
    val publisher = new QueueingEventPublisher(sink)
    val (server, base, prefix) = newServer(events = publisher)
    try {
      assert(post(base, s"/catalog/v1/$prefix/namespaces",
        """{"namespace":["ns"]}""").statusCode() === 200)
      assert(post(base, s"/catalog/v1/$prefix/namespaces/ns/tables",
        s"""{"name":"t","schema":$schemaJson}""").statusCode() === 200)
      assert(post(base, s"/catalog/v1/$prefix/namespaces/ns/tables/t",
        """{"updates":[{"action":"set-properties","updates":{"k":"v"}}]}""")
        .statusCode() === 200)
      val del = client.send(HttpRequest.newBuilder(
        URI.create(s"$base/catalog/v1/$prefix/namespaces/ns/tables/t")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() === 204)

      // drain the async queue
      val deadline = System.nanoTime() + 5e9.toLong
      while (sink.events.size < 3 && System.nanoTime() < deadline) Thread.sleep(10)
      val evts = sink.events
      assert(evts.map(_.eventType) === Seq("createTable", "updateTable", "dropTable"))
      assert(evts.map(_.sequenceNumber) === Seq(1L, 2L, 3L))
      assert(evts.forall(_.ident.name == "t"))
      assert(evts.map(_.tableId).distinct.size === 1)
    } finally { server.stop(); publisher.close() }
  }

  test("publisher never blocks the caller: full queue drops after timeout") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val slow = new CloudEventBackend {
      def publish(e: CatalogEvent): Unit = gate.await() // wedge the worker
    }
    val p = new QueueingEventPublisher(slow, capacity = 2, enqueueTimeoutMs = 10)
    try {
      val ident = TableIdent(Seq("ns"), "t")
      def evt(i: Long) = CatalogEvent("updateTable", UUID.randomUUID(), ident,
        UUID.randomUUID(), i, i)
      val t0 = System.nanoTime()
      (1L to 10L).foreach(i => p.emit(evt(i))) // 1 wedged + 2 queued + 7 dropped
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      // 7 drops × ≤10ms timeout — far below a blocking publisher
      assert(elapsedMs < 2000, s"emit path blocked for ${elapsedMs}ms")
    } finally { gate.countDown(); p.close() }
  }

  test("file-backed sink: durable delivery through the publisher, append across reopen") {
    val f = Files.createTempFile("graft-events", ".jsonl")
    val ident = TableIdent(Seq("db"), "t")
    val e1 = CatalogEvent("createTable", UUID.randomUUID(), ident,
      UUID.randomUUID(), 1L, 100L)
    val e2 = e1.copy(eventType = "updateTable", sequenceNumber = 2L)

    val sink = new CloudEventBackend.FileBacked(f)
    val p = new QueueingEventPublisher(sink)
    try { p.emit(e1); p.emit(e2) } finally { p.close(); sink.close() }
    assert(CloudEventBackend.FileBacked.readAll(f) === Seq(e1, e2))

    // reopening appends — the log survives the process that wrote it
    val sink2 = new CloudEventBackend.FileBacked(f)
    try sink2.publish(e1.copy(eventType = "dropTable", sequenceNumber = 3L))
    finally sink2.close()
    assert(CloudEventBackend.FileBacked.readAll(f).map(_.eventType) ===
      Seq("createTable", "updateTable", "dropTable"))
    assert(CloudEventBackend.FileBacked.readAll(
      Files.createTempDirectory("none").resolve("absent.jsonl")) === Nil)
  }

  test("HTTP sink: CloudEvents POSTs delivered; failures logged-and-dropped; slow consumer sheds") {
    import com.sun.net.httpserver.HttpServer
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var failNext = false
    @volatile var delayMs = 0L
    val http = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/events", ex => {
      if (delayMs > 0) Thread.sleep(delayMs)
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (failNext) { failNext = false; ex.sendResponseHeaders(500, -1) }
      else { received.add(body); ex.sendResponseHeaders(204, -1) }
      ex.close()
    })
    // serialize handler calls like a real single consumer
    http.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor())
    http.start()
    val endpoint = s"http://127.0.0.1:${http.getAddress.getPort}/events"
    val ident = TableIdent(Seq("db"), "t")
    def evt(tpe: String, i: Long) =
      CatalogEvent(tpe, UUID.randomUUID(), ident, UUID.randomUUID(), i, 1700000000000L + i)
    def drain(p: QueueingEventPublisher): Unit = p.close()
    try {
      // delivery: CloudEvents 1.0 structured envelopes with our payload
      val p1 = new QueueingEventPublisher(new CloudEventBackend.HttpBacked(endpoint))
      p1.emit(evt("createTable", 1L)); p1.emit(evt("updateTable", 2L))
      drain(p1)
      val bodies = received.toArray(Array.empty[String]).toSeq
      assert(bodies.size === 2)
      val n = graft.core.JsonCodecs.parse(bodies.head)
      assert(n.get("specversion").asText() === "1.0")
      assert(n.get("type").asText() === "createTable")
      assert(n.get("source").asText() === "graft-catalog")
      assert(n.get("data").get("name").asText() === "t")
      assert(n.get("data").get("sequence-number").asLong() === 1L)
      assert(graft.core.JsonCodecs.parse(bodies(1)).get("type").asText() === "updateTable")

      // a non-2xx response is logged and dropped; the publisher survives
      received.clear()
      failNext = true
      val p2 = new QueueingEventPublisher(new CloudEventBackend.HttpBacked(endpoint))
      p2.emit(evt("dropTable", 3L)) // 500 → dropped
      p2.emit(evt("createTable", 4L)) // delivered
      drain(p2)
      val after = received.toArray(Array.empty[String]).toSeq
      assert(after.size === 1 &&
        graft.core.JsonCodecs.parse(after.head).get("type").asText() === "createTable")

      // slow consumer: the worker stalls on in-flight requests, the
      // bounded queue fills, and emits DROP after the offer timeout
      // instead of blocking the commit path
      received.clear()
      delayMs = 300L
      val p3 = new QueueingEventPublisher(new CloudEventBackend.HttpBacked(endpoint),
        capacity = 2, enqueueTimeoutMs = 10)
      val t0 = System.nanoTime()
      (1L to 10L).foreach(i => p3.emit(evt("updateTable", i)))
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(elapsedMs < 2000, s"emit path blocked for ${elapsedMs}ms")
      drain(p3)
      val slow = received.toArray(Array.empty[String]).toSeq
      assert(slow.nonEmpty && slow.size < 10,
        s"expected shed load: delivered ${slow.size}/10")
    } finally http.stop(0)
  }
}
