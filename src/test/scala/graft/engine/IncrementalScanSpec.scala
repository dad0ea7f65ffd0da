package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Incremental append scan (CDC-style read): semantics end-to-end on a
  * real table (appends, compaction transparency, row-level-change and
  * non-ancestor rejection) plus the I/O-complexity contract — the plan
  * diffs manifest LISTS and pays content reads ONLY for the shards the
  * range actually added. */
class IncrementalScanSpec extends AnyFunSuite with BeforeAndAfterAll {
  import IType._

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-inc").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    client.createNamespace(prefix, Seq("db"))
  }

  override def afterAll(): Unit = server.stop()

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TInt),
    NestedField.optional(2, "v", TString)))

  private def table(name: String): GraftTable = {
    client.createTable(prefix, TableIdent(Seq("db"), name), schema)
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))
  }

  private def df(rows: (Int, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "v")
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Int] =
    d.collect().map(_.getInt(0)).toSet

  test("incremental read returns exactly the rows appended after the checkpoint") {
    val t = table("t_inc")
    val s1 = t.append(df(1 -> "a", 2 -> "b")).currentSnapshotId.get
    val s2 = t.append(df(3 -> "c")).currentSnapshotId.get
    val s3 = t.append(df(4 -> "d", 5 -> "e")).currentSnapshotId.get

    assert(ids(t.scanIncremental(spark, s1)) === Set(3, 4, 5))
    assert(ids(t.scanIncremental(spark, s2)) === Set(4, 5))
    assert(ids(t.scanIncremental(spark, s1, Some(s2))) === Set(3))
    assert(t.scanIncremental(spark, s3).collect().isEmpty) // caught up
    // full-range sanity: from-the-first-snapshot == everything after it
    assert(ids(t.scan(spark)) === Set(1, 2, 3, 4, 5))
  }

  test("compaction in range is transparent; later appends still flow") {
    val t = table("t_inc_compact")
    val s1 = t.append(df(1 -> "a")).currentSnapshotId.get
    t.append(df(2 -> "b"))
    t.rewriteDataFiles(spark) // "replace": rewrites rows 1,2 into new files
    val afterCompact = t.append(df(3 -> "c")).currentSnapshotId.get

    // append semantics survive the compaction: row 2 (appended after
    // s1) arrives exactly once, via its ORIGINAL shard — the replace
    // snapshot contributes nothing, so the rewritten copy of rows 1+2
    // is never double-read; row 3 (appended after the compaction) is
    // present. (The original shard stays readable until
    // expire_snapshots + orphan sweep — read checkpoints before
    // expiring history, the same contract Iceberg's incremental scan
    // has.)
    assert(ids(t.scanIncremental(spark, s1, Some(afterCompact))) === Set(2, 3))
  }

  test("row-level change in range is rejected; non-ancestors are rejected") {
    val t = table("t_inc_reject")
    val s1 = t.append(df(1 -> "a", 2 -> "b")).currentSnapshotId.get
    t.deleteWhere(spark, org.apache.spark.sql.functions.expr("id = 1"))
    t.append(df(3 -> "c"))
    val e = intercept[CatalogError](t.planFilesIncremental(s1))
    assert(e.code === 400 && e.message.contains("row-level change"))

    // a snapshot that exists but is not an ancestor (a tag off an old
    // snapshot whose chain was cut by overwrite) — simulate with an id
    // from another table entirely
    val other = table("t_inc_other")
    val sOther = other.append(df(9 -> "z")).currentSnapshotId.get
    val e2 = intercept[CatalogError](t.planFilesIncremental(sOther))
    assert(e2.code === 404 || e2.code === 400)
  }

  test("plan I/O: lists diffed, content reads only for ADDED shards") {
    val mem = new InMemoryFileIO
    FileIO.register("incmem", mem)
    try {
      store.createWarehouse(project, "wh_mem", "incmem://wh").fold(e => fail(e.message), identity)
      val memPrefix = client.config("wh_mem")
      client.createNamespace(memPrefix, Seq("db"))
      val tid = TableIdent(Seq("db"), "t_io")
      client.createTable(memPrefix, tid, schema)
      val t = new GraftTable(client, memPrefix, tid)

      def file(n: String) = Manifests.DataFile(s"incmem://wh/db/t_io/data/$n", 1L, 1L)
      val s1 = t.commitDelta(Seq(file("f1.parquet")), "append", None).currentSnapshotId.get
      t.commitDelta(Seq(file("f2.parquet")), "append", t.metadata.currentSnapshotId)
      // compaction: complete-content replace with one rewritten file
      t.commitFiles(Seq(file("fc.parquet")), "replace", t.metadata.currentSnapshotId)
      t.commitDelta(Seq(file("f3.parquet")), "append", t.metadata.currentSnapshotId)

      val m = t.metadata // metadata fetch outside the counting window
      mem.resetCounters()
      val planned = t.planFilesIncremental(s1)
      assert(planned.map(_.path).toSet ===
        Set("incmem://wh/db/t_io/data/f2.parquet", "incmem://wh/db/t_io/data/f3.parquet"))
      // 4 manifest LISTS (from + 3 chain snapshots) + 2 added-shard
      // contents; the carried shard of s1 and the replace's rewritten
      // shard are never opened
      assert(mem.reads.get() <= 6L,
        s"incremental plan read ${mem.reads.get()} objects; expected <= 6 (4 lists + 2 added shards)")
    } finally FileIO.unregister("incmem")
  }
}
