package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** `CALL system.rewrite_position_delete_files`: many small MoR
  * position-delete files collapse to one, reads stay bit-identical,
  * data files never move, and rows whose target data file left the
  * snapshot are dropped. Plus the SQL twin of the delete-cache file
  * key, pinned equivalent to the JVM form across every documented URI
  * shape. */
class PosDeleteCompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftpdc"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-pdc").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def liveFiles(name: String): Seq[Manifests.DataFile] = {
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), name))
    t.metadata.currentSnapshot.toSeq
      .flatMap(s => Manifests.filesOf(Manifests.readEntries(s.manifestList)))
  }

  test("fileKeyExpr is the JVM fileKey on every documented URI shape") {
    import spark.implicits._
    val shapes = Seq(
      "file:/tmp/wh/data/f1.parquet",
      "/tmp/wh/data/f1.parquet",
      "file:///tmp/wh/data/f1.parquet",
      "s3://bucket/wh/data/f1.parquet",
      "hdfs://host:9000/wh/data/f1.parquet",
      "s3://bucket-without-path")
    val got = shapes.toDF("file_path")
      .select(GraftTable.fileKey(org.apache.spark.sql.functions.col("file_path")))
      .collect().map(_.getString(0)).toSeq
    assert(got === shapes.map(GraftDeleteCache.fileKey))
  }

  test("many MoR delete files compact to one; reads bit-identical; data untouched") {
    spark.sql(s"CREATE TABLE $cat.db.pdc (id BIGINT, v STRING)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO $cat.db.pdc SELECT id, concat('v', id) FROM range(${i * 100}, ${i * 100 + 100})"))
    // three row-level DELETEs -> at least three position-delete files
    Seq(7L, 113L, 205L).foreach(id =>
      spark.sql(s"DELETE FROM $cat.db.pdc WHERE id = $id"))
    val before = spark.sql(s"SELECT * FROM $cat.db.pdc ORDER BY id").collect().toSeq
    assert(before.length === 297)
    val posBefore = liveFiles("pdc").filter(_.isPositionDeleteFile)
    assert(posBefore.size >= 3)
    val dataBefore = liveFiles("pdc").filter(_.content == Manifests.ContentData)
      .map(_.path).sorted

    spark.sql(s"CALL $cat.system.rewrite_position_delete_files(table => 'db.pdc')")

    val filesAfter = liveFiles("pdc")
    val posAfter = filesAfter.filter(_.isPositionDeleteFile)
    assert(posAfter.size === 1, s"expected 1 compacted delete file, got ${posAfter.size}")
    assert(posAfter.head.recordCount === 3)
    assert(filesAfter.filter(_.content == Manifests.ContentData).map(_.path).sorted
      === dataBefore, "data files must not move")
    assert(spark.sql(s"SELECT * FROM $cat.db.pdc ORDER BY id").collect().toSeq === before)
    // deletes still apply after another unrelated append
    spark.sql(s"INSERT INTO $cat.db.pdc VALUES (7, 'resurrection-check')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.pdc WHERE id = 7")
      .collect().head.getLong(0) === 1)
  }

  test("rows targeting data files that left the snapshot are dropped") {
    spark.sql(s"CREATE TABLE $cat.db.pdc2 (id BIGINT, part STRING) PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO $cat.db.pdc2 VALUES (1, 'a'), (2, 'a')")
    spark.sql(s"INSERT INTO $cat.db.pdc2 VALUES (10, 'b'), (11, 'b')")
    spark.sql(s"DELETE FROM $cat.db.pdc2 WHERE id = 1")   // targets partition a's file
    spark.sql(s"DELETE FROM $cat.db.pdc2 WHERE id = 10")  // targets partition b's file
    // partition a is overwritten: the delete row aimed at its old file
    // is now a dead pointer
    spark.sql(s"INSERT OVERWRITE $cat.db.pdc2 PARTITION (part = 'a') SELECT 3 AS id")
    val before = spark.sql(s"SELECT * FROM $cat.db.pdc2 ORDER BY id").collect().toSeq

    spark.sql(s"CALL $cat.system.rewrite_position_delete_files(table => 'db.pdc2')")

    val pos = liveFiles("pdc2").filter(_.isPositionDeleteFile)
    assert(pos.size === 1)
    assert(pos.head.recordCount === 1, "the dead pointer must be dropped")
    assert(spark.sql(s"SELECT * FROM $cat.db.pdc2 ORDER BY id").collect().toSeq === before)
  }

  test("no-op when the table has no position-delete files") {
    spark.sql(s"CREATE TABLE $cat.db.pdc3 (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.pdc3 VALUES (1), (2)")
    val snapBefore = new GraftTable(client, prefix, TableIdent(Seq("db"), "pdc3"))
      .metadata.currentSnapshotId
    spark.sql(s"CALL $cat.system.rewrite_position_delete_files(table => 'db.pdc3')")
    spark.sql(s"CALL $cat.system.convert_equality_deletes(table => 'db.pdc3')")
    val snapAfter = new GraftTable(client, prefix, TableIdent(Seq("db"), "pdc3"))
      .metadata.currentSnapshotId
    assert(snapBefore === snapAfter, "no commit on a delete-free table")
  }

  test("convert_equality_deletes: id-resolved across RENAME, then the triad folds to one file") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.ced (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.ced SELECT id, concat('v', id) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.ced SELECT id, concat('v', id) FROM range(100, 200)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "ced"))
    // two equality-delete commits + one position-delete commit
    t.deleteByKeys(spark, Seq("id"), Seq(5L).toDF("id"))
    t.deleteByKeys(spark, Seq("id"), Seq(150L).toDF("id"))
    spark.sql(s"DELETE FROM $cat.db.ced WHERE id = 42")
    // rename the equality KEY column while the delete files are live
    spark.sql(s"ALTER TABLE $cat.db.ced RENAME COLUMN id TO ident")
    val before = spark.sql(s"SELECT * FROM $cat.db.ced ORDER BY ident").collect().toSeq
    assert(before.length === 197)
    assert(liveFiles("ced").count(_.content == Manifests.ContentEqualityDeletes) === 2)

    spark.sql(s"CALL $cat.system.convert_equality_deletes(table => 'db.ced')")

    val afterConvert = liveFiles("ced")
    assert(afterConvert.count(_.content == Manifests.ContentEqualityDeletes) === 0)
    assert(afterConvert.count(_.isPositionDeleteFile) >= 2) // converted + original DELETE's
    assert(spark.sql(s"SELECT * FROM $cat.db.ced ORDER BY ident").collect().toSeq === before)
    // equality semantics preserved going forward: a re-insert of a
    // converted key SURVIVES (both forms only affect older files)
    spark.sql(s"INSERT INTO $cat.db.ced VALUES (5, 'reborn')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ced WHERE ident = 5")
      .collect().head.getLong(0) === 1)

    // the triad composition: all delete state folds into ONE file
    spark.sql(s"CALL $cat.system.rewrite_position_delete_files(table => 'db.ced')")
    val pos = liveFiles("ced").filter(_.isPositionDeleteFile)
    assert(pos.size === 1)
    assert(pos.head.recordCount === 3) // ids 5, 150, 42
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ced").collect().head.getLong(0) === 198)
  }
}
