package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Row-level changelog (CDC) scan: inserts from appends, exact
  * visibility-diff deletes from MoR delete/merge commits, file-removal
  * deletes, nothing from compaction — plus the
  * `create_changelog_view` procedure surface. */
class ChangelogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftcdc"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-cdc").toUri.toString.stripSuffix("/")
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

  private def changes(t: GraftTable, from: Long): Seq[(Long, String, String, Int)] =
    t.changelogScan(spark, from).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getInt(3)))
      .sortBy(c => (c._4, c._3, c._1)).toSeq

  test("append / MoR delete / merge / compaction changelog is exact") {
    spark.sql(s"CREATE TABLE $cat.db.cl (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.cl VALUES (1,'a'), (2,'b')")
    val t = table("cl")
    val s1 = t.metadata.currentSnapshotId.get

    spark.sql(s"INSERT INTO $cat.db.cl VALUES (3,'c')")          // ord 0: insert
    spark.sql(s"DELETE FROM $cat.db.cl WHERE id = 2")            // ord 1: MoR pos delete
    spark.sql(s"MERGE INTO $cat.db.cl t USING (SELECT 3L AS id, 'c2' AS v) s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")                          // ord 2: delete old + insert new
    spark.sql(s"CALL $cat.system.rewrite_data_files(table => 'db.cl', " +
      "target_file_count => 1)")                                 // ord 3: replace — silent

    assert(changes(t, s1) === Seq(
      (3L, "c", "insert", 0),
      (2L, "b", "delete", 1),
      (3L, "c", "delete", 2),
      (3L, "c2", "insert", 2)))

    // the table's final state equals s1 + replayed changelog
    assert(spark.sql(s"SELECT id, v FROM $cat.db.cl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (3L, "c2")))

    // empty range; identical from/to
    assert(t.changelogScan(spark, t.metadata.currentSnapshotId.get).count() === 0L)
  }

  test("equality deletes and truncate emit their removed rows") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.cle (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.cle VALUES (1,'a'), (2,'b'), (3,'c')")
    val t = table("cle")
    val s1 = t.metadata.currentSnapshotId.get

    t.deleteByKeys(spark, Seq("id"), Seq(2L).toDF("id"))         // ord 0: eq delete
    assert(changes(t, s1) === Seq((2L, "b", "delete", 0)))

    spark.sql(s"DELETE FROM $cat.db.cle")                        // ord 1: truncate
    assert(changes(t, s1) === Seq(
      (2L, "b", "delete", 0),
      (1L, "a", "delete", 1),
      (3L, "c", "delete", 1)))
  }

  test("create_changelog_view procedure exposes the range through SQL") {
    spark.sql(s"CREATE TABLE $cat.db.clv (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.clv VALUES (1,'a')")
    val t = table("clv")
    val s1 = t.metadata.currentSnapshotId.get
    spark.sql(s"INSERT INTO $cat.db.clv VALUES (2,'b')")
    val s2 = t.metadata.currentSnapshotId.get
    spark.sql(s"INSERT INTO $cat.db.clv VALUES (3,'c')")

    spark.sql(s"CALL $cat.system.create_changelog_view(table => 'db.clv', " +
      s"changelog_view => 'clv_changes', from_snapshot_id => $s1, " +
      s"to_snapshot_id => $s2)")
    val got = spark.sql(
      "SELECT id, v, _change_type, _commit_snapshot_id FROM clv_changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((2L, "b", "insert", s2)))
  }

  test("delete-diff reads only the files the delete can touch (stats-narrowed)") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.cln (id BIGINT, v STRING)")
    // two commits → two data files with DISJOINT id ranges
    spark.sql(s"INSERT INTO $cat.db.cln VALUES (1,'a'), (2,'b')")
    spark.sql(s"INSERT INTO $cat.db.cln VALUES (100,'x'), (101,'y')")
    val t = table("cln")
    val s1 = t.metadata.currentSnapshotId.get

    // position delete: only the targeted file is affected
    spark.sql(s"DELETE FROM $cat.db.cln WHERE id = 100")
    t.changelogScan(spark, s1).collect()
    val pos = GraftTable.lastChangelogDiff.get
    assert(pos.affectedFiles === 1 && pos.candidateFiles > 1,
      s"pos-delete diff read ${pos.affectedFiles} of ${pos.candidateFiles}")

    // equality delete keyed far inside the low file's range: manifest
    // stats must exclude the high file
    val s2 = t.metadata.currentSnapshotId.get
    t.deleteByKeys(spark, Seq("id"), Seq(2L).toDF("id"))
    val got = t.changelogScan(spark, s2).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got === Seq((2L, "delete")))
    val eq = GraftTable.lastChangelogDiff.get
    assert(eq.affectedFiles < eq.candidateFiles && eq.affectedFiles >= 1,
      s"eq-delete diff read ${eq.affectedFiles} of ${eq.candidateFiles} " +
        "— stats narrowing did not exclude the out-of-range files")
  }

  test("pos-delete key cap forced to 0: broader scoping, identical changelog") {
    spark.sql(s"CREATE TABLE $cat.db.clc (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.clc VALUES (1,'a'), (2,'b')")
    spark.sql(s"INSERT INTO $cat.db.clc VALUES (100,'x'), (101,'y')")
    val t = table("clc")
    val s1 = t.metadata.currentSnapshotId.get
    spark.sql(s"DELETE FROM $cat.db.clc WHERE id = 100")

    // default cap: targeted-file scoping (a strict subset of the
    // candidates — each INSERT may land as several task files)
    val narrow = changes(t, s1)
    val narrowDiff = GraftTable.lastChangelogDiff.get
    assert(narrowDiff.affectedFiles >= 1 &&
      narrowDiff.affectedFiles < narrowDiff.candidateFiles,
      s"expected targeted scoping, got $narrowDiff")

    // cap 0: the driver materializes NO target keys — sequence-bound
    // fallback reads every parent data file, rows out must be identical
    spark.conf.set(GraftTable.ChangelogMaxPosDeleteKeysConf, "0")
    try {
      val broad = changes(t, s1)
      val broadDiff = GraftTable.lastChangelogDiff.get
      assert(broadDiff.affectedFiles === broadDiff.candidateFiles,
        "capped fallback must scope every candidate file")
      assert(broad === narrow, "the broader read must not change the answer")
      assert(broad === Seq((100L, "x", "delete", 0)))
    } finally spark.conf.unset(GraftTable.ChangelogMaxPosDeleteKeysConf)
  }

  test("foreign same-commit position deletes suppress never-visible inserts") {
    import spark.implicits._
    // Legal Iceberg our own writers never emit (but register can
    // adopt): ONE commit adds a data file AND a position-delete file
    // targeting that same data file. The deleted row was never
    // visible in any snapshot, so the changelog must not report it as
    // an insert — a naive raw read of added files would, corrupting
    // downstream ChangelogApply materializations.
    spark.sql(s"CREATE TABLE $cat.db.clf (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.clf VALUES (1,'a')")
    val t = table("clf")
    val s1 = t.metadata.currentSnapshotId.get
    val m = t.metadata

    val dataFiles = GraftTable.writeDataFiles(
      Seq((10L, "x0"), (11L, "x1"), (12L, "x2")).toDF("id", "v").coalesce(1), m)
    assert(dataFiles.size === 1)
    val delRows = Seq((dataFiles.head.path, 0L)).toDF("file_path", "pos")
      .select(
        col("file_path").as("file_path",
          SchemaBridge.fieldIdMetadata(GraftTable.PosDeleteFilePathId)),
        col("pos").as("pos",
          SchemaBridge.fieldIdMetadata(GraftTable.PosDeletePosId)))
    val delDir = s"${m.location}/deletes/${UUID.randomUUID()}"
    val delFiles = GraftTable
      .toDataFiles(ParquetBatchWrite.writeJob(delRows, delDir, None))
      .map(_.copy(content = Manifests.ContentPositionDeletes))
    t.commitDelta(dataFiles ++ delFiles, "overwrite", Some(s1))

    // the table itself never shows row 10 (MoR scan applies the delete)
    assert(spark.sql(s"SELECT id FROM $cat.db.clf ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 11L, 12L))
    // and neither does the changelog: inserts are the VISIBLE adds only
    assert(changes(t, s1) === Seq(
      (11L, "x1", "insert", 0),
      (12L, "x2", "insert", 0)))
  }

  test("a non-ancestor start snapshot is refused loudly") {
    spark.sql(s"CREATE TABLE $cat.db.clx (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.clx VALUES (1)")
    val t = table("clx")
    val head = t.metadata.currentSnapshotId.get
    spark.sql(s"CALL $cat.system.rollback_to_snapshot(table => 'db.clx', " +
      s"snapshot_id => ${t.metadata.snapshots(head).parentSnapshotId.getOrElse(head)})")
    val e = intercept[Exception](t.changelogScan(spark, 999999L).collect())
    assert(e.getMessage.contains("not found"))
  }
}
