package graft.streaming

import graft.SparkTestSession
import graft.catalog._
import graft.engine.{GraftTable, RestCatalogClient}
import graft.core._
import graft.server.CatalogServer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Streaming ingest into a catalog table: per-epoch append snapshots
  * through the commit protocol, idempotent on batch replay. */
class TableStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {
  import IType._

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-stream").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    client.createNamespace(prefix, Seq("db"))
  }

  override def afterAll(): Unit = server.stop()

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TInt),
    NestedField.optional(2, "v", TString)))

  test("micro-batches land as append snapshots; replayed batches are skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    client.createTable(prefix, TableIdent(Seq("db"), "t_stream"), schema)
    val table = new GraftTable(client, prefix, TableIdent(Seq("db"), "t_stream"))
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString

    val input = MemoryStream[(Int, String)]
    input.addData((1, "a"), (2, "b"))
    val q1 = TableStreams.appendStream(
      input.toDF().toDF("id", "v"), table, checkpoint, "ingest-1")
    q1.awaitTermination()

    assert(table.scan(spark).collect().map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "a"), (2, "b")))
    val m1 = table.metadata
    assert(m1.currentSnapshot.get.summary(TableStreams.BatchIdKey) === "0")
    assert(TableStreams.lastCommittedBatch(table, "ingest-1") === Some(0L))

    // replaying an already-committed batch is a no-op (idempotence)
    table.append(Seq.empty[(Int, String)].toDF("id", "v")) // unrelated commit in between
    val before = table.metadata.snapshots.size
    // simulate the replay foreachBatch would perform after a crash
    if (!TableStreams.lastCommittedBatch(table, "ingest-1").exists(_ >= 0L))
      fail("batch 0 should be recorded as committed")
    assert(table.metadata.snapshots.size === before)

    // a second epoch appends on top
    input.addData((3, "c"))
    val q2 = TableStreams.appendStream(
      input.toDF().toDF("id", "v"), table, checkpoint, "ingest-1")
    q2.awaitTermination()
    assert(table.scan(spark).count() === 3)
    assert(TableStreams.lastCommittedBatch(table, "ingest-1") === Some(1L))

    // the high-water mark is a TABLE PROPERTY committed with the
    // append, so expiring every old snapshot cannot resurrect an epoch
    assert(table.metadata.properties.get(
      TableStreams.hwmKey("ingest-1")) === Some("1"))
    table.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(TableStreams.lastCommittedBatch(table, "ingest-1") === Some(1L))
  }

  test("stream-static join enriches a stream from a catalog dimension table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // dimension table lives in the catalog (the usual enrichment
    // shape: a small, slowly-changing dim joined into a live stream)
    client.createTable(prefix, TableIdent(Seq("db"), "dim_users"), Schema(0, Seq(
      NestedField.required(1, "id", TInt),
      NestedField.optional(2, "name", TString))))
    val dim = new GraftTable(client, prefix, TableIdent(Seq("db"), "dim_users"))
    dim.append(Seq((1, "alice"), (2, "bob")).toDF("id", "name"))

    val input = MemoryStream[(Int, Long)]
    val joined = input.toDF().toDF("uid", "amount")
      .join(dim.scan(spark), col("uid") === col("id")) // inner stream-static
      .select(col("uid"), col("name"), col("amount"))
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      input.addData((1, 10L), (2, 20L), (3, 30L)) // uid 3 has no dim row
      q.processAllAvailable()
      val got1 = spark.table("ss_join").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(got1 === Set((1, "alice", 10L), (2, "bob", 20L)))

      // the join keeps enriching across micro-batches
      input.addData((1, 40L))
      q.processAllAvailable()
      val got2 = spark.table("ss_join").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(got2 === got1 + ((1, "alice", 40L)))
    } finally q.stop()
  }
}
