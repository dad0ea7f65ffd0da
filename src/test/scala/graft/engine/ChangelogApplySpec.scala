package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Incremental materialization from the changelog: a per-key
  * (count, sum) aggregate maintained purely from
  * [[GraftTable.changelogScan]] deltas must equal the full recompute
  * after every checkpoint step — the CDC consumer contract
  * (checkpoint snapshot id → fold delta → repeat). */
class ChangelogApplySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftcdm"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-cdm").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("changelog-maintained count/sum equals the full recompute at every step") {
    spark.sql(s"CREATE TABLE $cat.db.mat (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.mat VALUES ('a', 1), ('a', 2), ('b', 10)")
    val t = table("mat")
    val full = () => spark.sql(s"SELECT k, v FROM $cat.db.mat")

    // cold start: materialize from the table head, checkpoint the id
    var mat = ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")
      .persist()
    var checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) === Seq(("a", 2L, 3L), ("b", 1L, 10L)))

    // step 1: appends + a MoR delete, folded incrementally
    spark.sql(s"INSERT INTO $cat.db.mat VALUES ('b', 20), ('c', 5)")
    spark.sql(s"DELETE FROM $cat.db.mat WHERE k = 'a' AND v = 1")
    mat = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v").persist()
    checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) ===
      sorted(ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")))
    assert(sorted(mat) === Seq(("a", 1L, 2L), ("b", 2L, 30L), ("c", 1L, 5L)))

    // step 2: MERGE update (delete+insert through the changelog), a
    // group emptied to zero must DROP OUT, and compaction in range
    // must fold to nothing
    spark.sql(s"MERGE INTO $cat.db.mat t USING (SELECT 'c' AS k, 50L AS v) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    spark.sql(s"DELETE FROM $cat.db.mat WHERE k = 'a'")
    spark.sql(s"CALL $cat.system.rewrite_data_files(table => 'db.mat', " +
      "target_file_count => 1)")
    mat = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v")
    checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) ===
      sorted(ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")))
    assert(sorted(mat) === Seq(("b", 2L, 30L), ("c", 1L, 50L)))
    assert(!sorted(mat).exists(_._1 == "a"), "emptied group must drop out")

    // step 3: empty range folds to the identity
    val same = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v")
    assert(sorted(same) === sorted(mat))
  }

  private def table(name: String): GraftTable =
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))

  test("runOnce maintains a target TABLE exactly-once across ticks and retries") {
    spark.sql(s"CREATE TABLE $cat.db.src2 (k STRING, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.mat2 (k STRING, n_rows BIGINT, sum_v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.src2 VALUES ('a', 1), ('b', 10)")
    val src = table("src2")
    val tgt = table("mat2")

    // cold start: full recompute, checkpoint recorded atomically
    val c1 = ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v")
    assert(c1 === src.metadata.currentSnapshotId)
    assert(sorted(spark.sql(s"SELECT k, n_rows, sum_v FROM $cat.db.mat2"))
      === Seq(("a", 1L, 1L), ("b", 1L, 10L)))

    // retry with no source change: no-op, no new target snapshot
    val snaps = tgt.metadata.snapshots.size
    assert(ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v") === None)
    assert(tgt.metadata.snapshots.size === snaps)

    // steady state: churn folds incrementally, equal to the recompute
    spark.sql(s"INSERT INTO $cat.db.src2 VALUES ('a', 2), ('c', 7)")
    spark.sql(s"DELETE FROM $cat.db.src2 WHERE k = 'b'")
    val c2 = ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v")
    assert(c2 === src.metadata.currentSnapshotId)
    assert(sorted(spark.sql(s"SELECT k, n_rows, sum_v FROM $cat.db.mat2"))
      === Seq(("a", 2L, 3L), ("c", 1L, 7L)))
    assert(sorted(spark.sql(s"SELECT k, n_rows, sum_v FROM $cat.db.mat2"))
      === sorted(ChangelogApply.recomputeCountSum(
        spark.sql(s"SELECT k, v FROM $cat.db.src2"), Seq("k"), "v")))
    // and the tick is again idempotent
    assert(ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v") === None)
  }
}
