package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Snapshot-management procedures: `rewrite_manifests` (metadata
  * compaction — same files, fewer/prunable shards, bit-identical
  * reads) and `rollback_to_snapshot` / `set_current_snapshot`
  * (branch-head moves with ancestor validation). */
class SnapshotProceduresSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftsnap"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-snap").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def table(name: String): GraftTable =
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))

  private def shardCount(name: String): Long =
    spark.sql(s"SELECT count(*) FROM $cat.db.$name.manifests")
      .collect().head.getLong(0)

  test("rewrite_manifests compacts shards; reads stay bit-identical") {
    spark.sql(s"CREATE TABLE $cat.db.rm (id BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    // 4 commits × 2 partitions → 8 shard entries before compaction
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO $cat.db.rm VALUES " +
        s"($i, 'a'), (${i + 100}, 'b')")
    }
    val before = spark.sql(s"SELECT * FROM $cat.db.rm ORDER BY id").collect().toSeq
    val shardsBefore = shardCount("rm")
    assert(shardsBefore >= 8L, s"expected ≥8 pre-compaction shards: $shardsBefore")

    spark.sql(s"CALL $cat.system.rewrite_manifests(table => 'db.rm')")

    // one shard per partition tuple now
    assert(shardCount("rm") === 2L)
    val mans = spark.sql(s"SELECT partition_summary FROM $cat.db.rm.manifests")
      .collect().map(_.getString(0)).sorted
    assert(mans === Array("part=a", "part=b"))
    assert(spark.sql(s"SELECT * FROM $cat.db.rm ORDER BY id").collect().toSeq === before)
    // partition pruning still works over the rewritten shards
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.rm WHERE part = 'a'")
      .collect().head.getLong(0) === 4L)
  }

  test("rewrite_manifests preserves MoR delete scoping exactly") {
    spark.sql(s"CREATE TABLE $cat.db.rmd (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.rmd VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    // row-level MoR delete, then a NEWER insert that re-uses a deleted key:
    // the delete's sequence number must keep scoping ONLY the older file
    spark.sql(s"DELETE FROM $cat.db.rmd WHERE id % 2 = 0")
    spark.sql(s"INSERT INTO $cat.db.rmd VALUES (2,'b2')")
    val before = spark.sql(s"SELECT * FROM $cat.db.rmd ORDER BY id, v").collect().toSeq
    assert(before.map(_.getLong(0)) === Seq(1L, 2L, 3L))

    spark.sql(s"CALL $cat.system.rewrite_manifests(table => 'db.rmd')")
    assert(spark.sql(s"SELECT * FROM $cat.db.rmd ORDER BY id, v").collect().toSeq
      === before)
    assert(table("rmd").planFiles().exists(_.isDeleteFile),
      "delete files must survive the manifest rewrite")
  }

  test("rollback_to_snapshot undoes commits; non-ancestors are refused") {
    spark.sql(s"CREATE TABLE $cat.db.rb (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.rb VALUES (1), (2)")
    val snapA = table("rb").metadata.currentSnapshotId.get
    spark.sql(s"INSERT INTO $cat.db.rb VALUES (3)")
    val snapB = table("rb").metadata.currentSnapshotId.get

    spark.sql(s"CALL $cat.system.rollback_to_snapshot(table => 'db.rb', " +
      s"snapshot_id => $snapA)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.rb")
      .collect().head.getLong(0) === 2L)

    // snapB is no longer an ancestor of the (rolled-back) head
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.rollback_to_snapshot(table => 'db.rb', " +
        s"snapshot_id => $snapB)")
    }
    assert(e.getMessage.contains("not an ancestor"))

    // ... but set_current_snapshot moves anywhere the table retains
    spark.sql(s"CALL $cat.system.set_current_snapshot(table => 'db.rb', " +
      s"snapshot_id => $snapB)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.rb")
      .collect().head.getLong(0) === 3L)

    // unknown snapshot → clear refusal
    val bad = intercept[Exception] {
      spark.sql(s"CALL $cat.system.set_current_snapshot(table => 'db.rb', " +
        s"snapshot_id => 12345)")
    }
    assert(bad.getMessage.contains("unknown snapshot"))
  }

  test("rollback then write: history forks cleanly from the restored head") {
    spark.sql(s"CREATE TABLE $cat.db.fork (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.fork VALUES (1)")
    val snapA = table("fork").metadata.currentSnapshotId.get
    spark.sql(s"INSERT INTO $cat.db.fork VALUES (2)")
    spark.sql(s"CALL $cat.system.rollback_to_snapshot(table => 'db.fork', " +
      s"snapshot_id => $snapA)")
    spark.sql(s"INSERT INTO $cat.db.fork VALUES (9)")
    assert(spark.sql(s"SELECT id FROM $cat.db.fork ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 9L))
    // the new head's parent is the restored snapshot, not the undone one
    val m = table("fork").metadata
    assert(m.currentSnapshot.flatMap(_.parentSnapshotId) === Some(snapA))
  }

  test("fast_forward publishes a branch; divergence and tags are refused") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.ff (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.ff VALUES (1)")
    val t = table("ff")
    t.createRef("dev", graft.core.SnapshotRefType.Branch)
    t.append(Seq(2L).toDF("id"), branch = "dev")
    t.append(Seq(3L).toDF("id"), branch = "dev")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ff")
      .collect().head.getLong(0) === 1L) // main untouched pre-publish

    spark.sql(s"CALL $cat.system.fast_forward(table => 'db.ff', " +
      "branch => 'main', to => 'dev')")
    val m = t.metadata
    assert(m.refs("main").snapshotId === m.refs("dev").snapshotId)
    assert(spark.sql(s"SELECT id FROM $cat.db.ff ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))

    // ff of a branch that does not exist yet: created at the target head
    spark.sql(s"CALL $cat.system.fast_forward(table => 'db.ff', " +
      "branch => 'audit', to => 'main')")
    assert(table("ff").metadata.refs("audit").snapshotId === m.refs("main").snapshotId)

    // diverge main past dev — the move back is no longer a fast-forward
    spark.sql(s"INSERT INTO $cat.db.ff VALUES (4)")
    t.append(Seq(5L).toDF("id"), branch = "dev")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.fast_forward(table => 'db.ff', " +
        "branch => 'main', to => 'dev')")
    }
    assert(e.getMessage.contains("not a fast-forward"))

    // a tag can never be fast-forwarded
    t.createRef("v1", graft.core.SnapshotRefType.Tag)
    val tagErr = intercept[Exception] {
      spark.sql(s"CALL $cat.system.fast_forward(table => 'db.ff', " +
        "branch => 'v1', to => 'dev')")
    }
    assert(tagErr.getMessage.contains("tag"))
  }

  test("cherrypick_snapshot applies one branch append onto a diverged main") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.cp (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.cp VALUES (1)")
    val t = table("cp")
    val snapA = t.metadata.currentSnapshotId.get
    t.createRef("dev", graft.core.SnapshotRefType.Branch)
    t.append(Seq(2L).toDF("id"), branch = "dev")
    val devHead = t.metadata.refs("dev").snapshotId
    spark.sql(s"INSERT INTO $cat.db.cp VALUES (3)") // main diverges

    spark.sql(s"CALL $cat.system.cherrypick_snapshot(table => 'db.cp', " +
      s"snapshot_id => $devHead)")
    assert(spark.sql(s"SELECT id FROM $cat.db.cp ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val m = t.metadata
    // provenance recorded; dev itself untouched
    assert(m.currentSnapshot.get.summary.get("source-snapshot-id")
      === Some(devHead.toString))
    assert(m.refs("dev").snapshotId === devHead)
    assert(t.scan(spark, t.AtRef("dev")).collect().map(_.getLong(0)).toSet
      === Set(1L, 2L))

    // an ancestor of main cannot be picked again (would duplicate rows)
    val dup = intercept[Exception] {
      spark.sql(s"CALL $cat.system.cherrypick_snapshot(table => 'db.cp', " +
        s"snapshot_id => $snapA)")
    }
    assert(dup.getMessage.contains("already an ancestor"))

    // row-level change is not replayable
    spark.sql(s"DELETE FROM $cat.db.cp WHERE id = 2")
    val delSnap = t.metadata.currentSnapshotId.get
    val nonAppend = intercept[Exception] {
      spark.sql(s"CALL $cat.system.cherrypick_snapshot(table => 'db.cp', " +
        s"snapshot_id => $delSnap)")
    }
    assert(nonAppend.getMessage.contains("append snapshots only"))
  }
}
