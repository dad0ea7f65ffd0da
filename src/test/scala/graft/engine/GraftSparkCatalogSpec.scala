package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** The SQL front door: Spark SQL DDL + queries through the V2 catalog
  * plugin against our REST server — the reference's own usage shape
  * (test_spark.py SQL statements via SparkCatalog). */
class GraftSparkCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftsql"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-sqlcat").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
  }

  override def afterAll(): Unit = server.stop()

  test("SQL DDL + scan round-trip through the catalog") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.db")
    val namespaces = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0))
    assert(namespaces.contains("db"))

    spark.sql(s"CREATE TABLE $cat.db.t (id INT, s STRING) PARTITIONED BY (bucket(4, id))")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect().map(_.getString(1)).toSet === Set("t"))

    // spec landed server-side with the bucket transform bound
    val rec = client.loadTable(prefix, TableIdent(Seq("db"), "t"))
    assert(rec.metadata.defaultSpec.fields.map(f => (f.name, f.transform.wireName)) ===
      Seq(("id_bucket", "bucket[4]")))

    // empty scan via SQL
    assert(spark.sql(s"SELECT * FROM $cat.db.t").count() === 0)

    // write through the engine commit path, read back via SQL
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "t"))
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"))
    val out = spark.sql(s"SELECT id, s FROM $cat.db.t WHERE id > 1 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out === Seq((2, "b"), (3, "c")))

    // predicate reaches the parquet scan
    val plan = spark.sql(s"SELECT id FROM $cat.db.t WHERE id > 1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)

    // SQL INSERT goes through the snapshot-commit path: a new snapshot
    // appears and the rows are visible
    val snapsBefore = client.loadTable(prefix, TableIdent(Seq("db"), "t"))
      .metadata.snapshots.size
    spark.sql(s"INSERT INTO $cat.db.t VALUES (9, 'z')")
    assert(spark.sql(s"SELECT s FROM $cat.db.t WHERE id = 9")
      .collect().map(_.getString(0)).toSeq === Seq("z"))
    assert(client.loadTable(prefix, TableIdent(Seq("db"), "t"))
      .metadata.snapshots.size === snapsBefore + 1)

    // rename + drop via SQL
    spark.sql(s"ALTER TABLE $cat.db.t RENAME TO db.t2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t2").collect().head.getLong(0) === 4)
    spark.sql(s"DROP TABLE $cat.db.t2")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").count() === 0)
    spark.sql(s"DROP NAMESPACE $cat.db")
  }

  test("SQL INSERT OVERWRITE replaces content; CTAS creates and loads") {
    spark.sql(s"CREATE NAMESPACE $cat.w")
    spark.sql(s"CREATE TABLE $cat.w.t (id INT, s STRING)")
    spark.sql(s"INSERT INTO $cat.w.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.w.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.w.t").collect().head.getLong(0) === 3)

    spark.sql(s"INSERT OVERWRITE $cat.w.t VALUES (7, 'x')")
    assert(spark.sql(s"SELECT id, s FROM $cat.w.t")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((7, "x")))
    // overwrite is a snapshot, not an erase: the pre-overwrite state is
    // still reachable by time travel
    val m = client.loadTable(prefix, TableIdent(Seq("w"), "t")).metadata
    val overwriteSnap = m.currentSnapshot.get
    assert(overwriteSnap.summary("operation") === "overwrite")
    val parent = overwriteSnap.parentSnapshotId.get
    assert(spark.sql(s"SELECT * FROM $cat.w.t VERSION AS OF $parent").count() === 3)

    // CTAS: create + populate through the same catalog in one statement
    spark.sql(s"CREATE TABLE $cat.w.big AS SELECT id * 10 AS id10, s FROM $cat.w.t")
    assert(spark.sql(s"SELECT id10, s FROM $cat.w.big")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((70, "x")))
  }

  test("SQL INSERT into a partitioned table records partition tuples") {
    spark.sql(s"CREATE NAMESPACE $cat.p")
    spark.sql(
      s"CREATE TABLE $cat.p.t (id INT, s STRING) PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.p.t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    val t = new GraftTable(client, prefix, TableIdent(Seq("p"), "t"))
    val files = t.planFiles()
    assert(files.nonEmpty)
    assert(files.forall(_.partition.keySet === Set("id_bucket")))
    assert(spark.sql(s"SELECT count(*) FROM $cat.p.t").collect().head.getLong(0) === 4)
  }

  test("SQL ALTER TABLE: properties and column evolution") {
    spark.sql(s"CREATE NAMESPACE $cat.a")
    spark.sql(s"CREATE TABLE $cat.a.t (id INT, s STRING)")
    spark.sql(s"INSERT INTO $cat.a.t VALUES (1, 'a')")

    spark.sql(s"ALTER TABLE $cat.a.t SET TBLPROPERTIES ('dept' = 'graft', 'x' = '1')")
    spark.sql(s"ALTER TABLE $cat.a.t UNSET TBLPROPERTIES ('x')")
    val props = client.loadTable(prefix, TableIdent(Seq("a"), "t")).metadata.properties
    assert(props.get("dept") === Some("graft") && !props.contains("x"))

    spark.sql(s"ALTER TABLE $cat.a.t ADD COLUMN score DOUBLE")
    spark.sql(s"ALTER TABLE $cat.a.t RENAME COLUMN s TO label")
    val m = client.loadTable(prefix, TableIdent(Seq("a"), "t")).metadata
    assert(m.currentSchema.fields.map(_.name) === Seq("id", "label", "score"))
    // new column got a fresh id beyond the old last-column-id
    assert(m.currentSchema.fields.last.id === 3 && m.lastColumnId === 3)
    // evolution is a new schema version; the original schema survives
    assert(m.schemas.size === 3)

    // existing rows read the added column as NULL; inserts fill it
    spark.sql(s"INSERT INTO $cat.a.t VALUES (2, 'b', 0.5)")
    val rows = spark.sql(s"SELECT id, label, score FROM $cat.a.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(rows === Seq((1, "a", None), (2, "b", Some(0.5))))

    spark.sql(s"ALTER TABLE $cat.a.t DROP COLUMN score")
    assert(spark.sql(s"SELECT * FROM $cat.a.t").columns.toSeq === Seq("id", "label"))
  }

  test("SQL DELETE FROM commits position-delete deltas; no-WHERE is a truncate") {
    spark.sql(s"CREATE NAMESPACE $cat.d")
    spark.sql(s"CREATE TABLE $cat.d.t (id INT, s STRING)")
    spark.sql(s"INSERT INTO $cat.d.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = new GraftTable(client, prefix, TableIdent(Seq("d"), "t"))
    val dataBefore = t.planFiles().map(_.path).toSet

    spark.sql(s"DELETE FROM $cat.d.t WHERE id = 2 OR s = 'c'")
    assert(spark.sql(s"SELECT id FROM $cat.d.t").collect().map(_.getInt(0)).toSeq === Seq(1))
    val m = client.loadTable(prefix, TableIdent(Seq("d"), "t")).metadata
    assert(m.currentSnapshot.get.summary("operation") === "delete")
    // data files carried over untouched; matches masked by pos-deletes
    val after = t.planFiles()
    assert(dataBefore.subsetOf(after.map(_.path).toSet))
    assert(after.exists(_.isPositionDeleteFile))

    // delete everything (no WHERE) = metadata-only truncate: zero
    // delete records written, still a scannable empty table
    spark.sql(s"DELETE FROM $cat.d.t")
    assert(spark.sql(s"SELECT * FROM $cat.d.t").count() === 0)
    assert(t.planFiles().isEmpty)
  }

  test("DELETE keeps rows whose condition evaluates NULL (SQL semantics)") {
    spark.sql(s"CREATE NAMESPACE $cat.dn")
    spark.sql(s"CREATE TABLE $cat.dn.t (id INT, x INT)")
    spark.sql(s"INSERT INTO $cat.dn.t VALUES (1, 10), (2, NULL), (3, 3)")

    // x > 5 is NULL for id=2 — that row must SURVIVE the delete
    spark.sql(s"DELETE FROM $cat.dn.t WHERE x > 5")
    assert(spark.sql(s"SELECT id FROM $cat.dn.t ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(2, 3))

    // MoR mode: IN-list containing NULL never matches NULL keys — must
    // not take the <=> equality-delete path (which would delete id=2)
    spark.sql(s"CREATE TABLE $cat.dn.m (id INT, k INT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $cat.dn.m VALUES (1, 1), (2, NULL), (3, 3)")
    spark.sql(s"DELETE FROM $cat.dn.m WHERE k IN (3, NULL)")
    assert(spark.sql(s"SELECT id FROM $cat.dn.m ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 2))
  }

  test("SQL DELETE under write.delete.mode=merge-on-read commits a delete file") {
    spark.sql(s"CREATE NAMESPACE $cat.md")
    spark.sql(s"CREATE TABLE $cat.md.t (id INT, v STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $cat.md.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = new GraftTable(client, prefix, TableIdent(Seq("md"), "t"))
    val dataBefore = t.planFiles().filterNot(_.isDeleteFile).map(_.path).toSet

    spark.sql(s"DELETE FROM $cat.md.t WHERE id = 2")
    assert(spark.sql(s"SELECT id FROM $cat.md.t ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 3))
    // data files untouched, one equality-delete file added
    val files = t.planFiles()
    assert(files.filterNot(_.isDeleteFile).map(_.path).toSet === dataBefore)
    assert(files.count(_.isDeleteFile) === 1)

    // a non-equality condition falls back to copy-on-write
    spark.sql(s"DELETE FROM $cat.md.t WHERE id > 1")
    assert(spark.sql(s"SELECT id FROM $cat.md.t").collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("DELETE with a subquery runs through the delta row-level path") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.ds")
    spark.sql(s"CREATE TABLE $cat.ds.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.ds.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    Seq(2, 3).toDF("id").createOrReplaceTempView("ds_kill")
    val t = new GraftTable(client, prefix, TableIdent(Seq("ds"), "t"))
    val before = t.planFiles().map(_.path).toSet

    // IN-subquery is not translatable to source filters, so Spark plans
    // the SupportsDelta rewrite: row ids become position-delete records
    spark.sql(s"DELETE FROM $cat.ds.t WHERE id IN (SELECT id FROM ds_kill)")
    assert(spark.sql(s"SELECT id FROM $cat.ds.t").collect().map(_.getInt(0)).toSeq === Seq(1))
    val after = t.planFiles()
    assert(before.subsetOf(after.map(_.path).toSet))
    assert(after.exists(_.isPositionDeleteFile))
    assert(t.metadata.currentSnapshot.get.summary("operation") === "delete")
  }

  test("MoR snapshot scans keep predicate pushdown and column pruning") {
    spark.sql(s"CREATE NAMESPACE $cat.mp")
    spark.sql(s"CREATE TABLE $cat.mp.t (id INT, v STRING, w STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $cat.mp.t VALUES (1, 'a', 'x'), (2, 'b', 'y'), (3, 'c', 'z')")
    spark.sql(s"DELETE FROM $cat.mp.t WHERE id = 2")
    assert(new GraftTable(client, prefix, TableIdent(Seq("mp"), "t"))
      .planFiles().exists(_.isDeleteFile))

    val q = spark.sql(s"SELECT v FROM $cat.mp.t WHERE id > 1")
    assert(q.collect().map(_.getString(0)).toSeq === Seq("c"))
    // the filter is pushed INTO the MoR scan (it commutes with the
    // delete anti-join) instead of evaluated on every surviving row
    val outer = q.queryExecution.executedPlan.toString
    assert(outer.contains("PushedFilters") && outer.contains("GreaterThan(id,1)"), outer)
  }

  test("DataFrameWriterV2 createOrReplace: atomic stage-create, then replace") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.s")

    // stage-create: the table only becomes visible with its data
    Seq((1, "a"), (2, "b")).toDF("id", "v").writeTo(s"$cat.s.t").createOrReplace()
    assert(spark.sql(s"SELECT id, v FROM $cat.s.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((1, "a"), (2, "b")))

    // replace with a DIFFERENT schema in one atomic operation
    Seq((10L, 1.5)).toDF("key", "score").writeTo(s"$cat.s.t").createOrReplace()
    val out = spark.sql(s"SELECT key, score FROM $cat.s.t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out === Seq((10L, 1.5)))
    val m = client.loadTable(prefix, TableIdent(Seq("s"), "t")).metadata
    assert(m.currentSnapshot.get.summary("operation") === "replace")
    // pre-replace content (old schema) still reachable by time travel
    val parent = m.currentSnapshot.get.parentSnapshotId.get
    assert(spark.sql(s"SELECT * FROM $cat.s.t VERSION AS OF $parent")
      .columns.toSeq === Seq("id", "v"))

    // SQL REPLACE TABLE AS SELECT uses the same staged path
    spark.sql(s"REPLACE TABLE $cat.s.t AS SELECT 5 AS n")
    assert(spark.sql(s"SELECT n FROM $cat.s.t").collect().map(_.getInt(0)).toSeq === Seq(5))

    // a replace may introduce partitioning: the new spec binds against
    // the new schema and the rewritten files carry partition tuples
    import org.apache.spark.sql.functions.col
    Seq((1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)).toDF("id", "cat", "v")
      .writeTo(s"$cat.s.t").partitionedBy(col("cat")).createOrReplace()
    val t = new GraftTable(client, prefix, TableIdent(Seq("s"), "t"))
    assert(t.metadata.defaultSpec.fields.map(_.name) === Seq("cat"))
    assert(t.planFiles().forall(_.partition.keySet === Set("cat")))
    assert(t.scanPruned(spark, p => p.get("cat").contains("x"))
      .collect().map(_.getInt(0)).toSet === Set(1, 3))
    assert(spark.sql(s"SELECT count(*) FROM $cat.s.t").collect().head.getLong(0) === 3)

    // replacing a PARTITIONED table retires its old specs
    // (remove-partition-specs) and installs the new partitioning
    Seq((10, 100L), (11, 200L), (12, 300L)).toDF("k", "ts")
      .writeTo(s"$cat.s.t").partitionedBy(org.apache.spark.sql.functions
        .bucket(4, col("k"))).createOrReplace()
    val t2 = new GraftTable(client, prefix, TableIdent(Seq("s"), "t"))
    assert(t2.metadata.defaultSpec.fields.map(_.name) === Seq("k_bucket"))
    // old specs (over dropped columns) are gone — only the new one remains
    assert(t2.metadata.partitionSpecs.keySet === Set(t2.metadata.defaultSpecId))
    assert(t2.planFiles().forall(_.partition.keySet === Set("k_bucket")))
    assert(spark.sql(s"SELECT sum(ts) FROM $cat.s.t").collect().head.getLong(0) === 600L)

    // and a replace may DROP partitioning entirely
    Seq(("only", 1)).toDF("s", "n").writeTo(s"$cat.s.t").createOrReplace()
    val t3 = new GraftTable(client, prefix, TableIdent(Seq("s"), "t"))
    assert(t3.metadata.defaultSpec.isUnpartitioned)
    assert(t3.metadata.partitionSpecs.size === 1)
    assert(spark.sql(s"SELECT s FROM $cat.s.t").collect().map(_.getString(0)).toSeq === Seq("only"))
  }

  test("SQL MERGE INTO: matched update, unmatched insert, via snapshot commit") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.m")
    spark.sql(s"CREATE TABLE $cat.m.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.m.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    Seq((2, "B"), (4, "D")).toDF("id", "v").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $cat.m.t t USING merge_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val rows = spark.sql(s"SELECT id, v FROM $cat.m.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((1, "a"), (2, "B"), (3, "c"), (4, "D")))
    val m = client.loadTable(prefix, TableIdent(Seq("m"), "t")).metadata
    assert(m.currentSnapshot.get.summary("operation") === "merge")
    // pre-merge content still time-travelable
    val parent = m.currentSnapshot.get.parentSnapshotId.get
    assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF $parent").count() === 3)
  }

  test("1-row MERGE is a delta: untouched files carry over, O(changes) written") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.sc")
    spark.sql(s"CREATE TABLE $cat.sc.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.sc.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.sc.t VALUES (3, 'c'), (4, 'd')")
    val t = new GraftTable(client, prefix, TableIdent(Seq("sc"), "t"))
    val before = t.planFiles().map(_.path).toSet
    assert(before.size >= 2)

    // one matched update + one insert
    Seq((2, "B"), (9, "Z")).toDF("id", "v").createOrReplaceTempView("sc_src")
    spark.sql(
      s"""MERGE INTO $cat.sc.t t USING sc_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    assert(spark.sql(s"SELECT id, v FROM $cat.sc.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "a"), (2, "B"), (3, "c"), (4, "d"), (9, "Z")))

    // EVERY pre-merge data file is still referenced (no table rewrite);
    // the merge added only new data files + position-delete files
    val after = t.planFiles()
    assert(before.subsetOf(after.map(_.path).toSet))
    val added = after.filterNot(f => before.contains(f.path))
    val (delFiles, newData) = added.partition(_.isDeleteFile)
    assert(delFiles.nonEmpty && delFiles.forall(_.isPositionDeleteFile))
    // changed rows only: 2 rows written (update re-insert + new insert),
    // 1 position-delete row recorded
    assert(newData.map(_.recordCount).sum === 2L)
    assert(delFiles.map(_.recordCount).sum === 1L)
    assert(t.metadata.currentSnapshot.get.summary("operation") === "merge")

    // an UPDATE is the same delta shape: nothing rewritten
    val beforeUpd = t.planFiles().map(_.path).toSet
    spark.sql(s"UPDATE $cat.sc.t SET v = 'one' WHERE id = 1")
    assert(beforeUpd.subsetOf(t.planFiles().map(_.path).toSet))
    assert(spark.sql(s"SELECT v FROM $cat.sc.t WHERE id = 1")
      .collect().map(_.getString(0)).toSeq === Seq("one"))

    // compaction materializes the deltas back into plain data files
    t.rewriteDataFiles(spark, targetFileCount = 1)
    assert(!t.planFiles().exists(_.isDeleteFile))
    assert(spark.sql(s"SELECT count(*) FROM $cat.sc.t").collect().head.getLong(0) === 5)
  }

  test("SQL MERGE and UPDATE on a PARTITIONED table route partition tuples") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.pm")
    spark.sql(s"CREATE TABLE $cat.pm.t (id INT, cat STRING, v DOUBLE) " +
      "PARTITIONED BY (cat, bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.pm.t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0)")

    spark.sql(s"UPDATE $cat.pm.t SET v = v * 10 WHERE cat = 'a'")
    val rows = spark.sql(s"SELECT id, cat, v FROM $cat.pm.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1, "a", 10.0), (2, "b", 2.0), (3, "a", 30.0)))

    // every DATA file carries a full partition tuple in the manifest
    // (position-delete files ride along unpartitioned)
    val t = new GraftTable(client, prefix, TableIdent(Seq("pm"), "t"))
    val files = t.planFiles()
    val dataFiles = files.filterNot(_.isDeleteFile)
    assert(dataFiles.nonEmpty &&
      dataFiles.forall(_.partition.keySet === Set("cat", "id_bucket")))
    // partition values agree with the engine's own write path: a pruned
    // scan on cat=a sees exactly the a-rows
    val aRows = t.scanPruned(spark, p => p.get("cat").contains("a"))
      .collect().map(_.getInt(0)).toSet
    assert(aRows === Set(1, 3))

    Seq((2, "b", 0.0), (9, "c", 9.0)).toDF("id", "cat", "v")
      .createOrReplaceTempView("pm_src")
    spark.sql(
      s"""MERGE INTO $cat.pm.t t USING pm_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT id, v FROM $cat.pm.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ===
      Seq((1, 10.0), (2, 0.0), (3, 30.0), (9, 9.0)))
  }

  test("SQL UPDATE rewrites matching rows through the commit path") {
    spark.sql(s"CREATE NAMESPACE $cat.u")
    spark.sql(s"CREATE TABLE $cat.u.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.u.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"UPDATE $cat.u.t SET v = upper(v) WHERE id >= 2")
    val rows = spark.sql(s"SELECT id, v FROM $cat.u.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((1, "a"), (2, "B"), (3, "C")))
    val m = client.loadTable(prefix, TableIdent(Seq("u"), "t")).metadata
    assert(m.currentSnapshot.get.summary("operation") === "update")
  }

  test("SQL time travel: VERSION AS OF snapshot id and tag") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.tt")
    spark.sql(s"CREATE TABLE $cat.tt.t (id INT, s STRING)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("tt"), "t"))
    t.append(Seq((1, "v1")).toDF("id", "s"))
    val firstSnap = t.metadata.currentSnapshotId.get
    t.createRef("rel1", graft.core.SnapshotRefType.Tag)
    t.append(Seq((2, "v2")).toDF("id", "s"))

    assert(spark.sql(s"SELECT * FROM $cat.tt.t").count() === 2)
    assert(spark.sql(s"SELECT * FROM $cat.tt.t VERSION AS OF $firstSnap").count() === 1)
    assert(spark.sql(s"SELECT s FROM $cat.tt.t VERSION AS OF 'rel1'")
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
    assertThrows[Exception](
      spark.sql(s"SELECT * FROM $cat.tt.t VERSION AS OF 'ghost'").collect())
  }

  test("SQL time travel: TIMESTAMP AS OF picks the last snapshot at or before") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.tts")
    spark.sql(s"CREATE TABLE $cat.tts.t (id INT, s STRING)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("tts"), "t"))
    t.append(Seq((1, "v1")).toDF("id", "s"))
    val firstMs = t.metadata.currentSnapshot.get.timestampMs
    Thread.sleep(5) // distinct commit millis, so the boundary is testable
    t.append(Seq((2, "v2")).toDF("id", "s"))
    val secondMs = t.metadata.currentSnapshot.get.timestampMs
    assert(secondMs > firstMs)

    def atMs(ms: Long): Long = {
      // render the literal in UTC explicitly: Spark parses it in the
      // UTC session timeZone, while java.sql.Timestamp.toString would
      // use the host JVM default zone and shift the boundary on
      // non-UTC machines
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
      spark.sql(s"SELECT * FROM $cat.tts.t TIMESTAMP AS OF '$ts'").count()
    }
    // the exact first-commit instant sees snapshot 1; just before it, nothing
    assert(atMs(firstMs) === 1)
    assert(atMs(secondMs - 1) === 1)
    assert(atMs(secondMs) === 2)
    assert(atMs(System.currentTimeMillis() + 60000) === 2)
    val ex = intercept[Exception](atMs(firstMs - 1))
    assert(ex.getMessage.contains("no snapshot"))
  }

  test("MoR equality deletes survive RENAME COLUMN on a key column") {
    spark.sql(s"CREATE NAMESPACE $cat.rn")
    spark.sql(s"CREATE TABLE $cat.rn.t (id INT, v STRING) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $cat.rn.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"DELETE FROM $cat.rn.t WHERE id = 2")
    // the delete key column is RENAMED while the delete file is live:
    // the manifest records the key by FIELD ID, so the scan resolves it
    spark.sql(s"ALTER TABLE $cat.rn.t RENAME COLUMN id TO ident")
    assert(spark.sql(s"SELECT ident FROM $cat.rn.t ORDER BY ident")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 3))
    // the old name can even be REUSED for a new column without
    // poisoning the delete resolution
    spark.sql(s"ALTER TABLE $cat.rn.t ADD COLUMN id STRING")
    assert(spark.sql(s"SELECT ident FROM $cat.rn.t ORDER BY ident")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 3))
  }

  test("unsafe column type changes and protected column drops are rejected") {
    spark.sql(s"CREATE NAMESPACE $cat.ev")
    spark.sql(s"CREATE TABLE $cat.ev.t (id INT, n INT, f FLOAT, s STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    // widening promotions commit
    spark.sql(s"ALTER TABLE $cat.ev.t ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.ev.t ALTER COLUMN f TYPE DOUBLE")
    val m = client.loadTable(prefix, TableIdent(Seq("ev"), "t")).metadata
    assert(m.currentSchema.fieldByName("n").get.fieldType === graft.core.IType.TLong)
    // narrowing / cross-family changes are refused
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $cat.ev.t ALTER COLUMN n TYPE INT"))
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $cat.ev.t ALTER COLUMN s TYPE INT"))
    // dropping a partition-source column would strand the spec
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $cat.ev.t DROP COLUMN id"))
    // non-referenced columns still drop fine
    spark.sql(s"ALTER TABLE $cat.ev.t DROP COLUMN s")
  }

  test("SHOW TBLPROPERTIES surfaces the catalog's table properties") {
    spark.sql(s"CREATE NAMESPACE $cat.tp")
    spark.sql(s"CREATE TABLE $cat.tp.t (id INT) TBLPROPERTIES ('dept' = 'graft')")
    spark.sql(s"ALTER TABLE $cat.tp.t SET TBLPROPERTIES ('rev' = '7')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.tp.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("dept") === Some("graft") && props.get("rev") === Some("7"))
  }

  test("metadata tables readable via SQL identifier suffixes") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.mt")
    spark.sql(s"CREATE TABLE $cat.mt.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.mt.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.mt.t VALUES (3, 'c')")
    val t = new GraftTable(client, prefix, TableIdent(Seq("mt"), "t"))
    t.createRef("v1", graft.core.SnapshotRefType.Tag)

    val files = spark.sql(s"SELECT file_path, record_count FROM $cat.mt.t.files")
      .collect()
    assert(files.map(_.getLong(1)).sum === 3L)
    assert(files.forall(_.getString(0).endsWith(".parquet")))

    assert(spark.sql(s"SELECT * FROM $cat.mt.t.partitions").count() >= 1)

    val refs = spark.sql(s"SELECT name, type FROM $cat.mt.t.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refs === Seq(("main", "branch"), ("v1", "tag")))

    assert(spark.sql(s"SELECT snapshot_id FROM $cat.mt.t.snapshots").count() === 2)
    assert(spark.sql(
      s"SELECT * FROM $cat.mt.t.history WHERE is_current_ancestor").count() >= 1)
  }

  test("branch- and tag-qualified SQL reads pin the ref's snapshot") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE $cat.br")
    spark.sql(s"CREATE TABLE $cat.br.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $cat.br.t VALUES (1, 'v1')")
    val t = new GraftTable(client, prefix, TableIdent(Seq("br"), "t"))
    t.createRef("rel", graft.core.SnapshotRefType.Tag)
    t.createRef("audit", graft.core.SnapshotRefType.Branch)
    // advance main and the audit branch independently
    spark.sql(s"INSERT INTO $cat.br.t VALUES (2, 'v2')")
    t.append(Seq((9, "branch-only")).toDF("id", "v"), branch = "audit")

    assert(spark.sql(s"SELECT count(*) FROM $cat.br.t").collect().head.getLong(0) === 2)
    assert(spark.sql(s"SELECT v FROM $cat.br.t.tag_rel")
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
    assert(spark.sql(s"SELECT id FROM $cat.br.t.branch_audit ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 9))

    // SQL INSERT into a branch commits on the branch ref; main untouched
    spark.sql(s"INSERT INTO $cat.br.t.branch_audit VALUES (10, 'sql-branch')")
    assert(spark.sql(s"SELECT id FROM $cat.br.t.branch_audit ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 9, 10))
    assert(spark.sql(s"SELECT count(*) FROM $cat.br.t").collect().head.getLong(0) === 2)
    // tags refuse writes
    assertThrows[Exception](
      spark.sql(s"INSERT INTO $cat.br.t.tag_rel VALUES (99, 'nope')"))
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD evolves the default spec via SQL") {
    spark.sql(s"CREATE NAMESPACE $cat.pf")
    spark.sql(s"CREATE TABLE $cat.pf.t (id INT, cat STRING, v DOUBLE)")
    def spec = client.loadTable(prefix, TableIdent(Seq("pf"), "t"))
      .metadata.defaultSpec

    // the reference's evolution sequence: identity → bucket → truncate → drop
    spark.sql(s"ALTER TABLE $cat.pf.t ADD PARTITION FIELD cat")
    assert(spec.fields.map(f => (f.name, f.transform.wireName)) === Seq(("cat", "identity")))

    spark.sql(s"ALTER TABLE $cat.pf.t ADD PARTITION FIELD bucket(16, id)")
    assert(spec.fields.map(_.name) === Seq("cat", "id_bucket"))

    spark.sql(s"ALTER TABLE $cat.pf.t ADD PARTITION FIELD truncate(4, cat)")
    assert(spec.fields.map(_.name) === Seq("cat", "id_bucket", "cat_trunc"))

    spark.sql(s"ALTER TABLE $cat.pf.t DROP PARTITION FIELD bucket(16, id)")
    assert(spec.fields.map(_.name) === Seq("cat", "cat_trunc"))

    // drop by the partition FIELD NAME works too (derived names like
    // cat_trunc are not schema columns)
    spark.sql(s"ALTER TABLE $cat.pf.t ADD PARTITION FIELD bucket(8, id)")
    spark.sql(s"ALTER TABLE $cat.pf.t DROP PARTITION FIELD id_bucket")
    assert(spec.fields.map(_.name) === Seq("cat", "cat_trunc"))

    // writes AFTER the evolution carry the new spec's tuples
    spark.sql(s"INSERT INTO $cat.pf.t VALUES (1, 'abcdef', 1.0)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("pf"), "t"))
    val dataFiles = t.planFiles().filterNot(_.isDeleteFile)
    assert(dataFiles.forall(_.partition.keySet === Set("cat", "cat_trunc")))
    assert(dataFiles.head.partition("cat_trunc") === "abcd")
  }

  test("CALL system.rewrite_data_files and expire_snapshots procedures") {
    spark.sql(s"CREATE NAMESPACE $cat.pr")
    spark.sql(s"CREATE TABLE $cat.pr.t (id INT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $cat.pr.t VALUES (1), (2)")
    spark.sql(s"INSERT INTO $cat.pr.t VALUES (3)")
    spark.sql(s"DELETE FROM $cat.pr.t WHERE id = 2")
    val t = new GraftTable(client, prefix, TableIdent(Seq("pr"), "t"))
    assert(t.planFiles().size > 2 && t.planFiles().exists(_.isDeleteFile))

    spark.sql(s"CALL $cat.system.rewrite_data_files(table => 'pr.t')")
    assert(t.planFiles().size === 1 && !t.planFiles().exists(_.isDeleteFile))
    assert(spark.sql(s"SELECT id FROM $cat.pr.t ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 3))

    val before = t.metadata.snapshots.size
    spark.sql(s"CALL $cat.system.expire_snapshots(table => 'pr.t', " +
      s"older_than_ms => ${System.currentTimeMillis() + 1000})")
    assert(t.metadata.snapshots.size < before)

    // expired snapshots' files are now unreferenced: the orphan sweep
    // (future cutoff — no age protection in this test) reclaims them,
    // and the table still reads its live content
    spark.sql(s"CALL $cat.system.remove_orphan_files(" +
      s"table => 'pr.t', older_than_ms => ${System.currentTimeMillis() + 1000})")
    assert(spark.sql(s"SELECT id FROM $cat.pr.t ORDER BY id")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 3))
  }

  test("table and namespace misses surface as standard analysis errors") {
    import org.apache.spark.sql.AnalysisException
    assertThrows[AnalysisException](spark.sql(s"SELECT * FROM $cat.nope.t").collect())
    assertThrows[AnalysisException](spark.sql(s"SHOW TABLES IN $cat.nope").collect())
  }

  test("partition-scoped .partitions/.files queries parse only matching shards") {
    spark.sql(s"CREATE NAMESPACE $cat.meta")
    spark.sql(s"CREATE TABLE $cat.meta.tmeta (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql(s"INSERT INTO $cat.meta.tmeta SELECT /*+ COALESCE(1) */ id, 'a' FROM range(0, 20)")
    spark.sql(s"INSERT INTO $cat.meta.tmeta SELECT /*+ COALESCE(1) */ id, 'b' FROM range(0, 30)")

    GraftTable.lastMetaPlan = None
    val parts = spark.sql(
      s"SELECT * FROM $cat.meta.tmeta.partitions WHERE partition = 'cat=a'").collect()
    assert(parts.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("cat=a", 1L)))
    val plan = GraftTable.lastMetaPlan.get
    assert(plan.total === 2 && plan.shards === 1,
      s"expected 1 of 2 shards parsed, got $plan")

    GraftTable.lastMetaPlan = None
    val files = spark.sql(
      s"SELECT file_path FROM $cat.meta.tmeta.files WHERE partition = 'cat=b'").collect()
    assert(files.nonEmpty)
    assert(GraftTable.lastMetaPlan.get.shards === 1)

    // unscoped queries still see everything
    assert(spark.sql(s"SELECT * FROM $cat.meta.tmeta.partitions").collect().length === 2)
  }

  test("ALTER NAMESPACE SET/UNSET PROPERTIES round-trips through the catalog") {
    spark.sql(s"CREATE NAMESPACE $cat.nsprops")
    spark.sql(s"ALTER NAMESPACE $cat.nsprops SET PROPERTIES ('team'='eng', 'tier'='gold')")
    val props = client.getNamespaceProperties(prefix, Seq("nsprops"))
    assert(props.get("team") === Some("eng"))
    assert(props.get("tier") === Some("gold"))

    spark.sql(s"ALTER NAMESPACE $cat.nsprops UNSET PROPERTIES ('tier')")
    val after = client.getNamespaceProperties(prefix, Seq("nsprops"))
    assert(after.get("team") === Some("eng"))
    assert(!after.contains("tier"))

    import org.apache.spark.sql.AnalysisException
    assertThrows[AnalysisException](
      spark.sql(s"ALTER NAMESPACE $cat.nope SET PROPERTIES ('a'='b')"))
  }
}
