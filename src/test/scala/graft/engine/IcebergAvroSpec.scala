package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core.IType
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Iceberg-spec serialization conformance: every commit writes avro
  * manifests + a manifest list with the spec's schemas and field ids
  * ([[IcebergAvro]]), and metadata.json carries the spec's required v2
  * fields — the surface an external engine (pyiceberg/iceberg-spark)
  * reads (reference test_pyiceberg.py:6-98; no external engine ships
  * in this environment, so conformance is asserted structurally:
  * field ids, file metadata keys, value encodings, carried-manifest
  * reuse). */
class IcebergAvroSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftavro"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-avro").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def avroListPath(manifestList: String): String =
    manifestList.stripSuffix(".json") + "-manifest-list.avro"

  private def fieldId(s: org.apache.avro.Schema, name: String): Int =
    s.getField(name).getObjectProp("field-id").asInstanceOf[Number].intValue()

  test("single-value bound serialization follows spec Appendix D") {
    def bytes(s: String, t: IType): Array[Byte] = {
      val bb = IcebergAvro.boundBytes(s, t).get
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    }
    assert(bytes("1", IType.TInt).toSeq === Seq[Byte](1, 0, 0, 0))
    assert(bytes("-1", IType.TInt).toSeq === Seq[Byte](-1, -1, -1, -1))
    assert(bytes("1", IType.TLong).toSeq === Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    assert(bytes("ab", IType.TString).toSeq === "ab".getBytes("UTF-8").toSeq)
    assert(bytes("20678", IType.TDate).length === 4)
    assert(bytes("true", IType.TBoolean).toSeq === Seq[Byte](1))
    assert(IcebergAvro.boundBytes("x", IType.TInt).isEmpty) // unparseable
  }

  test("commits write spec-shaped avro manifests and manifest lists") {
    spark.sql(s"CREATE TABLE $cat.db.av (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql(s"INSERT INTO $cat.db.av SELECT id, 'a' FROM range(0, 10)")
    spark.sql(s"INSERT INTO $cat.db.av SELECT id, 'b' FROM range(10, 20)")

    val m = client.loadTable(prefix, TableIdent(Seq("db"), "av")).metadata
    val snap = m.currentSnapshot.get

    // ---- manifest list
    val (listSchema, listMeta, listRecs) =
      IcebergAvro.readRecords(avroListPath(snap.manifestList))
    assert(listMeta("format-version") === "2")
    assert(listMeta("snapshot-id") === snap.snapshotId.toString)
    assert(listMeta("sequence-number") === snap.sequenceNumber.toString)
    assert(listMeta.contains("parent-snapshot-id")) // second commit has a parent
    assert(fieldId(listSchema, "manifest_path") === 500)
    assert(fieldId(listSchema, "manifest_length") === 501)
    assert(fieldId(listSchema, "partition_spec_id") === 502)
    assert(fieldId(listSchema, "added_snapshot_id") === 503)
    assert(fieldId(listSchema, "sequence_number") === 515)
    assert(fieldId(listSchema, "min_sequence_number") === 516)
    assert(fieldId(listSchema, "content") === 517)

    val jsonEntries = Manifests.readEntries(snap.manifestList)
    assert(jsonEntries.forall(_.avro.isDefined))
    assert(listRecs.size === jsonEntries.size && listRecs.size >= 2)
    // the first commit's manifest is carried: existing, original snapshot
    assert(listRecs.exists(r =>
      r.get("existing_files_count").asInstanceOf[Int] > 0 &&
        r.get("added_snapshot_id").asInstanceOf[Long] != snap.snapshotId))
    assert(listRecs.exists(r =>
      r.get("added_files_count").asInstanceOf[Int] > 0 &&
        r.get("added_snapshot_id").asInstanceOf[Long] === snap.snapshotId))
    // lengths match the files on disk
    listRecs.foreach { r =>
      val p = graft.catalog.MetadataIO.toPath(r.get("manifest_path").toString)
      assert(Files.size(p) === r.get("manifest_length").asInstanceOf[Long])
    }
    // partition-homogeneous shards carry r508 field summaries with
    // tight (lower = upper) bounds — the shard-pruning info
    val dataRec = listRecs
      .find(r => r.get("added_files_count").asInstanceOf[Int] > 0).get
    val sums = dataRec.get("partitions").asInstanceOf[java.util.List[_]]
    assert(sums != null && sums.size() === 1)
    val s0 = sums.get(0).asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(s0.get("contains_null") === false)
    assert(s0.get("lower_bound") === s0.get("upper_bound"))

    // ---- one data manifest, deep
    val entry = jsonEntries.find(e => !e.hasDeletes).get
    val (mSchema, mMeta, mRecs) = IcebergAvro.readRecords(entry.avro.get.path)
    assert(mMeta("format-version") === "2")
    assert(mMeta("content") === "data")
    assert(mMeta("partition-spec-id") === m.defaultSpecId.toString)
    assert(graft.core.JsonCodecs.parse(mMeta("schema")).get("fields").size() === 2)
    assert(graft.core.JsonCodecs.parse(mMeta("partition-spec")).isArray)
    assert(fieldId(mSchema, "status") === 0)
    assert(fieldId(mSchema, "data_file") === 2)
    val df0 = mSchema.getField("data_file").schema()
    assert(fieldId(df0, "file_path") === 100)
    assert(fieldId(df0, "partition") === 102)
    assert(fieldId(df0, "record_count") === 103)
    assert(fieldId(df0, "content") === 134)

    val jsonFiles = Manifests.read(entry.path)
    assert(mRecs.size === jsonFiles.size)
    val idFieldId = m.currentSchema.fieldByName("id").get.id
    mRecs.foreach { r =>
      assert(r.get("status").asInstanceOf[Int] === 1)
      val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val path = df.get("file_path").toString
      val jf = jsonFiles.find(_.path == path).get
      assert(df.get("record_count").asInstanceOf[Long] === jf.recordCount)
      assert(df.get("file_size_in_bytes").asInstanceOf[Long] === jf.sizeBytes)
      assert(df.get("file_format").toString === "PARQUET")
      assert(df.get("content").asInstanceOf[Int] === 0)
      // typed partition value round-trips
      val part = df.get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(part.get("cat").toString === jf.partition("cat"))
      // id bounds decode as little-endian longs matching the stats
      val lower = df.get("lower_bounds").asInstanceOf[java.util.List[_]]
      assert(lower != null && !lower.isEmpty)
      var found = false
      lower.forEach { e =>
        val er = e.asInstanceOf[org.apache.avro.generic.GenericRecord]
        if (er.get("key").asInstanceOf[Int] == idFieldId) {
          val bb = er.get("value").asInstanceOf[java.nio.ByteBuffer]
            .duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
          assert(bb.getLong === jf.stats(idFieldId).min.get.toLong)
          found = true
        }
      }
      assert(found, s"no lower bound for id field $idFieldId")
    }
  }

  test("delete commits produce delete-content manifests") {
    spark.sql(s"DELETE FROM $cat.db.av WHERE id = 5")
    val m = client.loadTable(prefix, TableIdent(Seq("db"), "av")).metadata
    val snap = m.currentSnapshot.get
    val (_, _, listRecs) = IcebergAvro.readRecords(avroListPath(snap.manifestList))
    assert(listRecs.exists(_.get("content").asInstanceOf[Int] === 1))

    val delEntry = Manifests.readEntries(snap.manifestList).find(_.hasDeletes).get
    val (_, mMeta, mRecs) = IcebergAvro.readRecords(delEntry.avro.get.path)
    assert(mMeta("content") === "deletes")
    mRecs.foreach { r =>
      val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(df.get("content").asInstanceOf[Int] === 1) // position deletes
    }
  }

  test("a snapshot committed with an avro manifest list reads through the engine") {
    import graft.core.{Snapshot, SnapshotRefType, TableMetadata, TableUpdate}
    // "external writer": parquet data files + SPEC avro manifests only —
    // no engine JSON tree — committed through the REST protocol
    spark.sql(s"CREATE TABLE $cat.db.ext (id BIGINT, cat STRING)")
    val ident = TableIdent(Seq("db"), "ext")
    val m0 = client.loadTable(prefix, ident).metadata

    val dataDir = graft.catalog.MetadataIO.toPath(s"${m0.location}/data/ext")
    spark.range(0, 7).selectExpr("id", "'x' AS cat")
      .coalesce(1).write.parquet(dataDir.toString)
    val part = Files.list(dataDir).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    // external writers record bounds (Iceberg metrics) — model that, so
    // the avro→engine stats decode is exercised by the pruning below
    val extIdField = m0.currentSchema.fieldByName("id").get.id
    val df = Manifests.DataFile(part.toString, Files.size(part), 7L,
      stats = Map(extIdField ->
        Manifests.ColumnStats(Some("0"), Some("6"), Some(0L))))

    val snapId = 424242L
    val seq = m0.lastSequenceNumber + 1
    val ctx = IcebergAvro.Ctx(m0.currentSchema, m0.partitionSpecs,
      m0.defaultSpecId, snapId, None, seq)
    val info = IcebergAvro.writeManifest(
      s"${m0.location}/metadata/ext-manifest.avro", Seq(df), ctx).get
    val listLoc = s"${m0.location}/metadata/ext-list.avro"
    IcebergAvro.writeManifestList(listLoc,
      Seq(IcebergAvro.ListRow(info, 1L, 7L, hasDeletes = false, carried = false)), ctx)

    client.commitTable(prefix, ident, Nil, Seq(
      TableUpdate.AddSnapshot(Snapshot(snapId, None, seq,
        System.currentTimeMillis(), listLoc,
        Map("operation" -> "append"), Some(m0.currentSchemaId))),
      TableUpdate.SetSnapshotRef(TableMetadata.MainBranch, snapId,
        SnapshotRefType.Branch)))

    // the engine scans the avro tree directly
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ext")
      .collect().head.getLong(0) === 7L)
    // stats from the avro bounds still prune
    import org.apache.spark.sql.execution.datasources.GraftFileIndex
    GraftFileIndex.lastPlanned = None
    assert(spark.sql(s"SELECT * FROM $cat.db.ext WHERE id = 100")
      .collect().isEmpty)
    assert(GraftFileIndex.lastPlanned.get.kept === 0)

    // and our own next commit CARRIES the avro manifest forward
    spark.sql(s"INSERT INTO $cat.db.ext VALUES (100, 'y')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ext")
      .collect().head.getLong(0) === 8L)
    val m2 = client.loadTable(prefix, ident).metadata
    val entries = Manifests.readEntries(m2.currentSnapshot.get.manifestList)
    assert(entries.exists(_.path.endsWith("ext-manifest.avro")))
  }

  test("metadata.json carries the required Iceberg v2 fields") {
    val m = client.loadTable(prefix, TableIdent(Seq("db"), "av")).metadata
    val j = graft.core.JsonCodecs.parse(graft.core.JsonCodecs.metadataToJson(m))
    assert(j.get("format-version").asInt() === 2)
    assert(j.get("table-uuid").asText().nonEmpty)
    assert(j.get("location").asText().nonEmpty)
    assert(j.get("last-sequence-number").isNumber)
    assert(j.get("last-updated-ms").isNumber)
    assert(j.get("last-column-id").isNumber)
    assert(j.get("schemas").isArray && j.get("schemas").size() >= 1)
    assert(j.get("current-schema-id").isNumber)
    assert(j.get("partition-specs").isArray)
    assert(j.get("default-spec-id").isNumber)
    assert(j.get("last-partition-id").isNumber)
    assert(j.get("sort-orders").isArray)
    assert(j.get("default-sort-order-id").isNumber)
    assert(j.get("snapshots").isArray && j.get("snapshots").size() >= 1)
    assert(j.get("refs").isObject)
    val snap = j.get("snapshots").elements().next()
    assert(snap.get("snapshot-id").isNumber)
    assert(snap.get("sequence-number").isNumber)
    assert(snap.get("timestamp-ms").isNumber)
    assert(snap.get("manifest-list").asText().nonEmpty)
    assert(snap.get("summary").get("operation").asText().nonEmpty)
  }

  test("committing over a legacy (pre-avro) snapshot backfills twins — no truncated list") {
    import graft.core.{NestedField, PartitionSpec, Schema}
    val dir = Files.createTempDirectory("graft-legacy").toUri.toString.stripSuffix("/")
    val schema = Schema(0, Seq(NestedField.required(1, "id", IType.TInt)))
    val specs = Map(0 -> PartitionSpec(0, Nil))

    // round-≤4-style snapshot: JSON manifests only, no avro anywhere
    val legacyList = Manifests.writeCommit(s"$dir/metadata", 100L, Nil,
      Seq(Manifests.DataFile(s"$dir/data/f1.parquet", 10L, 5L, seq = 1L),
        Manifests.DataFile(s"$dir/data/f2.parquet", 10L, 5L, seq = 1L)),
      iceberg = None)
    val carried = Manifests.readEntries(legacyList)
    assert(carried.nonEmpty && carried.forall(_.avro.isEmpty))

    // child commit with the avro tree enabled
    val ctx = IcebergAvro.Ctx(schema, specs, 0, 200L, Some(100L), 2L)
    val childList = Manifests.writeCommit(s"$dir/metadata", 200L, carried,
      Seq(Manifests.DataFile(s"$dir/data/f3.parquet", 10L, 7L, seq = 2L)),
      iceberg = Some(ctx))

    // the avro list exists and names the COMPLETE content (carried + new)
    val avroEntries =
      IcebergAvro.readManifestList(s"$dir/metadata/snap-200-manifest-list.avro")
    val jsonEntries = Manifests.readEntries(childList)
    assert(avroEntries.size === jsonEntries.size)
    assert(jsonEntries.forall(_.avro.isDefined), "backfilled twin not recorded")
    assert(avroEntries.map(_.fileCount).sum === 3)

    // the backfilled shard: EXISTING status, ORIGINAL per-file sequence
    val backfilled = jsonEntries.find(_.path == carried.head.path).get.avro.get
    val (_, _, recs) = IcebergAvro.readRecords(backfilled.path)
    assert(recs.forall(_.get("status").asInstanceOf[Int] === 0))
    assert(IcebergAvro.readManifest(backfilled.path, inheritSeq = 0L)
      .forall(_.seq === 1L))
    assert(backfilled.minSequence === 1L && backfilled.seq === 1L)
    // spec snapshot attribution: the files were ADDED by snapshot 100,
    // not by the backfilling commit 200
    assert(backfilled.addedSnapshotId === 100L)
    assert(recs.forall(_.get("snapshot_id").asInstanceOf[Long] === 100L))

    // reading the whole snapshot through the AVRO list sees every file
    assert(Manifests.read(s"$dir/metadata/snap-200-manifest-list.avro").size === 3)
  }

  test("avro list is skipped outright, never truncated, when a twin is impossible") {
    import graft.core.{NestedField, PartitionField, PartitionSpec, Schema, Transform}
    val dir = Files.createTempDirectory("graft-notwin").toUri.toString.stripSuffix("/")
    // a decimal partition source has no avro partition mapping
    val schema = Schema(0, Seq(
      NestedField.required(1, "id", IType.TInt),
      NestedField.required(2, "amt", IType.TDecimal(10, 2))))
    val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "amt", Transform.Identity)))
    val ctx = IcebergAvro.Ctx(schema, Map(0 -> spec), 0, 300L, None, 1L)
    val list = Manifests.writeCommit(s"$dir/metadata", 300L, Nil,
      Seq(Manifests.DataFile(s"$dir/data/f1.parquet", 10L, 5L,
        partition = Map("amt" -> "1.50"), seq = 1L)),
      iceberg = Some(ctx))
    // JSON tree intact, no twin, and NO avro manifest list on disk
    assert(Manifests.read(list).size === 1)
    assert(Manifests.readEntries(list).forall(_.avro.isEmpty))
    assert(graft.catalog.FileIO.readString(
      s"$dir/metadata/snap-300-manifest-list.avro").isEmpty)
  }
}
