package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Surface B minimum slice (SURVEY §7.3): CREATE NAMESPACE → CREATE
  * TABLE → INSERT → SELECT through our own catalog server, plus the
  * wider §2.5 capabilities the reference proves with Spark: multi-batch
  * appends, MERGE-upsert, DELETE, tags + time travel, branches, schema
  * metadata, compaction. Mirrors test_spark.py:38-47,64-81,123-136,
  * 267-357 re-expressed on our engine.
  */
class SurfaceBSpec extends AnyFunSuite with BeforeAndAfterAll {
  import IType._

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-sb").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    client.createNamespace(prefix, Seq("db"))
  }

  override def afterAll(): Unit = server.stop()

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TInt),
    NestedField.optional(2, "strings", TString),
    NestedField.optional(3, "floats", TDouble)))

  private def table(name: String): GraftTable = {
    client.createTable(prefix, TableIdent(Seq("db"), name), schema)
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))
  }

  private def rows(t: GraftTable): Set[(Int, String, Double)] = {
    t.scan(spark).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
  }

  test("create namespace → create table → insert → select round-trip") {
    import spark.implicits._
    val t = table("t1")

    // empty scan works and has the declared schema
    val empty = t.scan(spark)
    assert(empty.count() === 0)
    assert(empty.schema.fieldNames.toSeq === Seq("id", "strings", "floats"))

    t.append(Seq((1, "one", 1.0), (2, "two", 2.0))
      .toDF("id", "strings", "floats"))
    assert(rows(t) === Set((1, "one", 1.0), (2, "two", 2.0)))

    // second insert appends, not replaces
    t.append(Seq((3, "three", 3.0)).toDF("id", "strings", "floats"))
    assert(rows(t) === Set((1, "one", 1.0), (2, "two", 2.0), (3, "three", 3.0)))
    // two appends = two snapshots, linear parent chain
    val m = t.metadata
    assert(m.snapshots.size === 2)
    assert(m.snapshotLog.size === 2)
  }

  test("manifest inventory (bytes/rows) is task-reported and matches the filesystem") {
    import spark.implicits._
    val t = table("t_inv")
    t.append((1 to 100).map(i => (i, s"s$i", i * 0.5)).toDF("id", "strings", "floats")
      .repartition(4))
    val files = t.planFiles()
    assert(files.nonEmpty)
    assert(files.map(_.recordCount).sum === 100L)
    // the bytes in the manifest came from the write tasks, not a driver
    // walk — they must still equal the real on-disk sizes
    files.foreach { f =>
      val p = graft.catalog.MetadataIO.toPath(f.path)
      assert(Files.size(p) === f.sizeBytes, f.path)
      assert(f.sizeBytes > 0)
    }
  }

  test("appends reuse the base snapshot's manifest shards (O(new files) manifest I/O)") {
    import spark.implicits._
    import graft.core.{Transform => Tr, UnboundPartitionField, UnboundPartitionSpec}
    client.createTable(prefix, TableIdent(Seq("db"), "t_shard"), schema,
      UnboundPartitionSpec(None, Seq(UnboundPartitionField(1, None, "id", Tr.Identity))))
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "t_shard"))

    t.append((1 to 4).map(i => (i, s"s$i", i * 1.0)).toDF("id", "strings", "floats"))
    val m1 = t.metadata
    val entries1 = Manifests.readEntries(m1.currentSnapshot.get.manifestList)
    assert(entries1.nonEmpty && entries1.forall(_.partition.isDefined))

    t.append(Seq((9, "s9", 9.0)).toDF("id", "strings", "floats"))
    val entries2 = Manifests.readEntries(t.metadata.currentSnapshot.get.manifestList)
    // every shard of snapshot 1 is referenced VERBATIM by snapshot 2 —
    // the append wrote only its own (single-partition) shard + a list
    assert(entries1.map(_.path).toSet.subsetOf(entries2.map(_.path).toSet))
    val added = entries2.filterNot(e => entries1.map(_.path).contains(e.path))
    assert(added.size === 1 && added.head.partition === Some(Map("id" -> "9")))
    assert(t.scan(spark).count() === 5)

    // shard-level pruning reads only the matching partitions' shards
    assert(t.scanPruned(spark, p => p.get("id").contains("2"))
      .collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("MERGE upsert: matched rows update, unmatched insert") {
    import spark.implicits._
    val t = table("t_merge")
    t.append(Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("id", "strings", "floats"))

    val dataBefore = t.planFiles().filterNot(_.isDeleteFile).map(_.path).toSet
    t.upsert(spark,
      Seq((2, "b2", 2.5), (3, "c", 3.0)).toDF("id", "strings", "floats"),
      keys = Seq("id"))
    assert(rows(t) === Set((1, "a", 1.0), (2, "b2", 2.5), (3, "c", 3.0)))
    assert(t.metadata.currentSnapshot.get.summary("operation") === "merge")
    // delta shape: the pre-merge data files carry over untouched; the
    // matched row is masked by a position-delete file
    val after = t.planFiles()
    assert(dataBefore.subsetOf(after.map(_.path).toSet))
    assert(after.exists(_.isPositionDeleteFile))
  }

  test("DELETE FROM masks matching rows with position-delete records") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = table("t_del")
    t.append(Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))
      .toDF("id", "strings", "floats"))
    t.deleteWhere(spark, col("id") === 2)
    assert(rows(t).map(_._1) === Set(1, 3))
  }

  test("tags + time travel: VERSION AS OF a tag reads the old snapshot") {
    import spark.implicits._
    val t = table("t_tag")
    t.append(Seq((1, "v1", 1.0)).toDF("id", "strings", "floats"))
    t.createRef("v1", SnapshotRefType.Tag, maxRefAgeMs = Some(86400000L))
    t.append(Seq((2, "v2", 2.0)).toDF("id", "strings", "floats"))

    assert(rows(t).size === 2)
    val atTag = t.scan(spark, t.AtRef("v1")).collect().map(_.getInt(0)).toSet
    assert(atTag === Set(1))
    // time travel by snapshot id too
    val firstSnap = t.metadata.snapshotLog.head.snapshotId
    assert(t.scan(spark, t.AtSnapshot(firstSnap)).count() === 1)
    // writing to a tag is rejected
    val e = intercept[CatalogError](
      t.append(Seq((9, "x", 9.0)).toDF("id", "strings", "floats"), branch = "v1"))
    assert(e.code === 400)
  }

  test("branches: writes to a branch leave main untouched") {
    import spark.implicits._
    val t = table("t_branch")
    t.append(Seq((1, "main", 1.0)).toDF("id", "strings", "floats"))
    t.createRef("dev", SnapshotRefType.Branch)

    t.append(Seq((2, "dev-only", 2.0)).toDF("id", "strings", "floats"), branch = "dev")
    assert(rows(t).map(_._1) === Set(1)) // main unchanged
    val dev = t.scan(spark, t.AtRef("dev")).collect().map(_.getInt(0)).toSet
    assert(dev === Set(1, 2))
    // .refs metadata view
    val m = t.metadata
    assert(m.refs.keySet === Set("main", "dev"))
    assert(m.refs("dev").refType === SnapshotRefType.Branch)
  }

  test("compaction: rewrite_data_files keeps content, reduces files") {
    import spark.implicits._
    val t = table("t_compact")
    for (i <- 1 to 4)
      t.append(Seq((i, s"r$i", i.toDouble)).toDF("id", "strings", "floats"))
    val filesBefore = Manifests.read(t.metadata.currentSnapshot.get.manifestList).size
    assert(filesBefore >= 4)

    t.rewriteDataFiles(spark, targetFileCount = 1)
    val after = t.metadata.currentSnapshot.get
    assert(after.summary("operation") === "replace")
    assert(Manifests.read(after.manifestList).size === 1)
    assert(rows(t).map(_._1) === Set(1, 2, 3, 4))
  }

  test("schema evolution: add column then read old and new data") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "t_evolve")
    client.createTable(prefix, ident, schema)
    val t = new GraftTable(client, prefix, ident)
    t.append(Seq((1, "old", 1.0)).toDF("id", "strings", "floats"))

    // ALTER TABLE ADD COLUMN flag boolean
    val evolved = Schema(1, schema.fields :+ NestedField.optional(4, "flag", TBoolean))
    client.commitTable(prefix, ident, Nil, Seq(
      TableUpdate.AddSchema(evolved, Some(4)),
      TableUpdate.SetCurrentSchema(-1)))
    assert(t.metadata.currentSchema.fields.map(_.name) ===
      Seq("id", "strings", "floats", "flag"))

    // a current scan presents the CURRENT schema; pre-evolution rows
    // read the added column as NULL
    val preEvolveSnap = t.metadata.currentSnapshotId.get
    assert(t.scan(spark).schema.fieldNames.toSeq ===
      Seq("id", "strings", "floats", "flag"))
    assert(t.scan(spark).collect().map(r => Option(r.get(3))).toSeq === Seq(None))

    // time travel to the pre-evolution snapshot pins the OLD schema
    assert(t.scan(spark, t.AtSnapshot(preEvolveSnap)).schema.fieldNames.toSeq ===
      Seq("id", "strings", "floats"))

    // new writes carry the new column
    t.append(Seq((2, "new", 2.0, true)).toDF("id", "strings", "floats", "flag"))
    val current = t.scan(spark).collect().map(r => (r.getInt(0), Option(r.get(3))))
    assert(current.toSet === Set((1, None), (2, Some(true))))
  }

  test("partitioned writes: identity + bucket + day derive per-file tuples") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "t_part")
    val pschema = Schema(0, Seq(
      NestedField.required(1, "id", TInt),
      NestedField.required(2, "category", TString),
      NestedField.required(3, "ts", TTimestamptz)))
    val spec = UnboundPartitionSpec(None, Seq(
      UnboundPartitionField(2, None, "category", Transform.Identity),
      UnboundPartitionField(1, None, "id_bucket", Transform.Bucket(4)),
      UnboundPartitionField(3, None, "ts_day", Transform.Day)))
    client.createTable(prefix, ident, pschema, spec)
    val t = new GraftTable(client, prefix, ident)

    val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2017-11-16T22:31:08Z"))
    val ts2 = java.sql.Timestamp.from(java.time.Instant.parse("2017-11-17T01:00:00Z"))
    t.append(Seq(
      (1, "news", ts1), (2, "news", ts1), (3, "blog", ts1), (4, "blog", ts2))
      .toDF("id", "category", "ts"))

    val files = t.planFiles()
    assert(files.nonEmpty)
    // every file carries the full partition tuple
    assert(files.forall(_.partition.keySet === Set("category", "id_bucket", "ts_day")))
    // day ordinal matches the spec vector (2017-11-16 = 17486)
    assert(files.map(_.partition("ts_day")).toSet.subsetOf(Set("17486", "17487")))
    // bucket values agree with the pure JVM transform
    val bucketOf = (i: Int) => graft.core.Transform.Bucket(4)(i).toString
    for (f <- files; id <- Seq(1, 2, 3, 4)
         if f.partition("id_bucket") == bucketOf(id)) ()
    // data files retain ALL source columns (partition cols are derived)
    val all = t.scan(spark)
    assert(all.columns.toSeq === Seq("id", "category", "ts"))
    assert(all.count() === 4)

    // partition-pruned scan reads only matching files
    val newsFiles = files.filter(_.partition("category") == "news")
    assert(newsFiles.nonEmpty && newsFiles.size < files.size)
    val pruned = t.scanPruned(spark, p => p("category") == "news")
    assert(pruned.collect().map(_.getInt(0)).toSet === Set(1, 2))
    assert(pruned.inputFiles.length === newsFiles.size)

    // .partitions metadata table aggregates per tuple
    val parts = t.metadataTable(spark, "partitions").collect()
    assert(parts.map(_.getLong(2)).sum === 4) // records add up
    assert(parts.exists(_.getString(0).contains("category=news")))
    // .files carries sizes and counts
    val filesMeta = t.metadataTable(spark, "files").collect()
    assert(filesMeta.length === files.size)
    assert(filesMeta.forall(_.getLong(1) > 0))
  }

  test("special characters in partition values round-trip") {
    import spark.implicits._
    val ident = TableIdent(Seq("db"), "t_special")
    val pschema = Schema(0, Seq(
      NestedField.required(1, "id", TInt),
      NestedField.required(2, "label", TString)))
    val spec = UnboundPartitionSpec(None, Seq(
      UnboundPartitionField(2, None, "label", Transform.Identity)))
    client.createTable(prefix, ident, pschema, spec)
    val t = new GraftTable(client, prefix, ident)
    t.append(Seq((1, "with space"), (2, "a/slash"), (3, "colon:2020"))
      .toDF("id", "label"))
    val tuples = t.planFiles().map(_.partition("label")).toSet
    assert(tuples === Set("with space", "a/slash", "colon:2020"))
    assert(t.scanPruned(spark, _("label") == "with space")
      .collect().map(_.getInt(0)).toSet === Set(1))
    assert(t.scan(spark).collect().map(_.getString(1)).toSet ===
      Set("with space", "a/slash", "colon:2020"))
  }

  test("metadata tables: refs, snapshots, history") {
    import spark.implicits._
    val t = table("t_meta")
    t.append(Seq((1, "a", 1.0)).toDF("id", "strings", "floats"))
    t.createRef("v1", SnapshotRefType.Tag)
    t.append(Seq((2, "b", 2.0)).toDF("id", "strings", "floats"))

    val refs = t.metadataTable(spark, "refs").collect()
    assert(refs.map(_.getString(0)).toSet === Set("main", "v1"))
    val snaps = t.metadataTable(spark, "snapshots").collect()
    assert(snaps.length === 2)
    assert(snaps.map(_.getString(4)).forall(_ === "append"))
    assert(snaps.map(_.getLong(3)).toSeq === Seq(1L, 2L)) // sequence numbers
    val hist = t.metadataTable(spark, "history").collect()
    assert(hist.length === 2)
    assert(hist.last.getBoolean(2)) // latest is current
  }

  test("table properties round-trip over the engine client") {
    val ident = TableIdent(Seq("db"), "t_props")
    client.createTable(prefix, ident, schema, props = Map("write.format" -> "parquet"))
    client.commitTable(prefix, ident, Nil,
      Seq(TableUpdate.SetProperties(Map("commit.retries" -> "5"))))
    val m = client.loadTable(prefix, ident).metadata
    assert(m.properties === Map("write.format" -> "parquet", "commit.retries" -> "5"))
  }

  test("expire_snapshots drops old unreferenced snapshots, keeps refs") {
    import spark.implicits._
    val t = table("t_expire")
    t.append(Seq((1, "a", 1.0)).toDF("id", "strings", "floats"))
    val first = t.metadata.currentSnapshotId.get
    t.createRef("keepme", SnapshotRefType.Tag)
    t.append(Seq((2, "b", 2.0)).toDF("id", "strings", "floats"))
    t.append(Seq((3, "c", 3.0)).toDF("id", "strings", "floats"))
    val before = t.metadata
    assert(before.snapshots.size === 3)
    val middle = before.snapshotLog(1).snapshotId

    val after = t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 60000)
    // first snapshot survives (tagged), middle expired, current kept
    assert(after.snapshots.keySet === Set(first, before.currentSnapshotId.get))
    assert(after.refs.keySet === Set("main", "keepme"))
    assert(!after.snapshots.contains(middle))
    // reads still correct on current and on the tag
    assert(rows(t).map(_._1) === Set(1, 2, 3))
    assert(t.scan(spark, t.AtRef("keepme")).count() === 1)
    // time travel to the expired snapshot now fails cleanly
    assertThrows[CatalogError](t.scan(spark, t.AtSnapshot(middle)))
  }

  test("expire_snapshots retain_last keeps the newest N ancestors at any cutoff") {
    import spark.implicits._
    val t = table("t_retain")
    t.append(Seq((1, "a", 1.0)).toDF("id", "strings", "floats"))
    t.append(Seq((2, "b", 2.0)).toDF("id", "strings", "floats"))
    t.append(Seq((3, "c", 3.0)).toDF("id", "strings", "floats"))
    val before = t.metadata
    assert(before.snapshots.size === 3)
    val ancestry = before.snapshotLog.map(_.snapshotId)

    // a cutoff in the FUTURE would expire everything unguarded;
    // retain_last => 2 keeps the newest two ancestors
    val after = t.expireSnapshots(
      olderThanMs = System.currentTimeMillis() + 60000, retainLast = 2)
    assert(after.snapshots.keySet === ancestry.takeRight(2).toSet)
    // rollback to the retained parent still works — the guard's point
    t.setCurrentSnapshot(ancestry(1), requireAncestor = true)
    assert(rows(t).map(_._1) === Set(1, 2))
  }

  test("writes honor the table's default sort order within each file") {
    import spark.implicits._
    val t = table("t_sorted")
    client.commitTable(prefix, TableIdent(Seq("db"), "t_sorted"), Nil, Seq(
      TableUpdate.AddSortOrder(SortOrder(-1, Seq(SortField(
        1, Transform.Identity, SortDirection.Desc, NullOrder.NullsLast)))),
      TableUpdate.SetDefaultSortOrder(-1)))

    // shuffled input, one task → one file whose rows must come out DESC
    t.append((1 to 50).map(i => ((i * 17) % 53, s"s$i", i * 1.0))
      .toDF("id", "strings", "floats").coalesce(1))
    val files = t.planFiles()
    assert(files.size === 1)
    val inFile = spark.read
      .parquet(graft.catalog.MetadataIO.toPath(files.head.path).toString)
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(inFile === inFile.sorted.reverse, "file rows not in sort order")
    // content unaffected
    assert(t.scan(spark).count() === 50)
  }

  test("remove_orphan_files sweeps only old unreferenced data-plane files") {
    import spark.implicits._
    val t = table("t_orphan")
    t.append(Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("id", "strings", "floats"))
    val m = t.metadata
    val live = t.planFiles().map(_.path).toSet

    // plant two strays under data/: one old, one fresh
    val dataDir = graft.catalog.MetadataIO.toPath(s"${m.location}/data").toString
    val oldStray = java.nio.file.Paths.get(dataDir, "stray-old.parquet")
    val newStray = java.nio.file.Paths.get(dataDir, "stray-new.parquet")
    java.nio.file.Files.write(oldStray, Array[Byte](1, 2, 3))
    java.nio.file.Files.write(newStray, Array[Byte](4, 5, 6))
    java.nio.file.Files.setLastModifiedTime(oldStray,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10L * 24 * 3600 * 1000))

    val swept = t.removeOrphanFiles(spark) // default 3-day guard
    assert(swept.deletedCount === 1L && swept.sample.head.endsWith("stray-old.parquet"),
      s"swept=$swept live=$live")
    assert(!java.nio.file.Files.exists(oldStray))
    assert(java.nio.file.Files.exists(newStray)) // too fresh: protected

    // live data untouched, table still reads
    assert(t.planFiles().map(_.path).toSet === live)
    assert(rows(t) === Set((1, "a", 1.0), (2, "b", 2.0)))

    // explicit future cutoff reclaims the fresh stray too
    val swept2 = t.removeOrphanFiles(spark, System.currentTimeMillis() + 1000)
    assert(swept2.deletedCount === 1L && !java.nio.file.Files.exists(newStray),
      s"swept2=$swept2 live=$live")
    assert(rows(t) === Set((1, "a", 1.0), (2, "b", 2.0)))
  }

  test("concurrent engine appends through HTTP converge") {
    import spark.implicits._
    val t = table("t_conc")
    val threads = (1 to 4).map { i =>
      new Thread(() => t.append(Seq((i, s"w$i", i.toDouble))
        .toDF("id", "strings", "floats")))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(rows(t).map(_._1) === Set(1, 2, 3, 4))
    assert(t.metadata.snapshots.size === 4)
    val seqs = t.metadata.snapshots.values.map(_.sequenceNumber).toSeq.sorted
    assert(seqs === Seq(1L, 2L, 3L, 4L))
  }
}
