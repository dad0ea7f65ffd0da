package graft.catalog

import graft.core.{IType, NestedField, PartitionSpec, Schema, TableMetadataBuilder}
import graft.engine.{IcebergAvro, Manifests}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Object-store readiness of the metadata plane: every metadata
  * artifact (table metadata JSON, manifest list + shards, avro twins)
  * round-trips through a [[FileIO]] backend with S3 semantics — a flat
  * key→bytes namespace, no directories — proving no code path between
  * commit and scan planning assumes a local filesystem. */
class FileIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mem = new InMemoryFileIO

  override def beforeAll(): Unit = FileIO.register("mem", mem)
  override def afterAll(): Unit = FileIO.unregister("mem")

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", IType.TLong),
    NestedField.required(2, "cat", IType.TString)))

  test("scheme routing: bare/file → local, registered scheme → backend, unknown → error") {
    assert(FileIO.forLocation("/tmp/x.json") eq LocalFileIO)
    assert(FileIO.forLocation("file:///tmp/x.json") eq LocalFileIO)
    assert(FileIO.forLocation("mem://bucket/x.json") eq mem)
    assert(!FileIO.canHandle("s3://bucket/x.json"))
    val e = intercept[IllegalStateException](FileIO.forLocation("s3://bucket/x.json"))
    assert(e.getMessage.contains("s3"))
  }

  test("table metadata mirror writes and reads through a registered object store") {
    val meta = TableMetadataBuilder
      .newTable(java.util.UUID.randomUUID(), "mem://bucket/wh/db/t", schema,
        timestampMs = 1700000000000L)
      .flatMap(_.build()).fold(e => fail(e.toString), identity)
    val loc = "mem://bucket/wh/db/t/metadata/00000.gz.metadata.json"
    assert(MetadataIO.isWritable(loc))
    MetadataIO.write(loc, meta)
    assert(mem.keys.contains(loc), "object must land in the store, not on disk")
    val back = MetadataIO.read(loc).fold(e => fail(e), identity)
    assert(back.schemas === meta.schemas)
    assert(back.location === meta.location)
    // unregistered scheme: mirror write is skipped, never throws
    assert(!MetadataIO.isWritable("s3://bucket/x.metadata.json"))
    MetadataIO.write("s3://bucket/x.metadata.json", meta)
  }

  test("manifest tree (JSON shards + avro twins) round-trips through the object store") {
    val dir = "mem://bucket/wh/db/t/metadata"
    val spec = PartitionSpec(0, Nil)
    val ctx = IcebergAvro.Ctx(schema, Map(0 -> spec), 0,
      snapshotId = 7L, parentSnapshotId = None, sequenceNumber = 1L)
    val files = Seq(
      Manifests.DataFile("mem://bucket/wh/db/t/data/a.parquet", 100L, 10L, Map.empty,
        seq = 1L, stats = Map(1 -> Manifests.ColumnStats(Some("0"), Some("9"), Some(0L)))),
      Manifests.DataFile("mem://bucket/wh/db/t/data/b.parquet", 200L, 20L, Map.empty,
        seq = 1L))
    val before = mem.keys.size
    val list = Manifests.writeCommit(dir, 7L, carried = Nil, newFiles = files,
      iceberg = Some(ctx))

    assert(list.startsWith("mem://"), s"list location must stay in the store: $list")
    assert(mem.keys.size > before, "shards/list/avro twins must be store objects")

    val read = Manifests.read(list).sortBy(_.path)
    assert(read.map(_.path) === files.map(_.path))
    assert(read.head.stats(1).min === Some("0"))
    assert(read.map(_.recordCount).sum === 30L)

    // carried entries reuse the stored shards on a child commit
    val entries = Manifests.readEntries(list)
    assert(entries.nonEmpty && entries.forall(_.path.startsWith("mem://")))
    val list2 = Manifests.writeCommit(dir, 8L, carried = entries, newFiles = Nil,
      iceberg = Some(ctx.copy(snapshotId = 8L, parentSnapshotId = Some(7L),
        sequenceNumber = 2L)))
    assert(Manifests.read(list2).map(_.path).sorted === files.map(_.path))

    // the avro twin list written beside it reads back through the store
    val avroList = s"$dir/snap-7-manifest-list.avro"
    assert(mem.keys.contains(avroList))
    val (avroSchema, _, _) = IcebergAvro.readRecords(avroList)
    assert(IcebergAvro.isManifestList(avroSchema))
    assert(Manifests.read(avroList).map(_.path).sorted === files.map(_.path))
  }

  test("mirror reads degrade to absent; CONTENT reads throw on unregistered scheme") {
    // mirror reads (metadata.json convenience copy): degrade quietly
    assert(FileIO.readBytes("s3zz://nowhere/x.json").isEmpty)
    assert(FileIO.readString("s3zz://nowhere/x.json").isEmpty)
    // snapshot-referenced CONTENT (manifest lists/shards): a JVM whose
    // backend registration is missing must fail loudly — NOT serve the
    // table as silently empty (reference errors on an unresolvable
    // storage profile)
    intercept[IllegalStateException](
      FileIO.readContentBytes("s3zz://nowhere/metadata/snap-1.json"))
    intercept[IllegalStateException](
      Manifests.read("s3zz://nowhere/metadata/snap-1.json"))
    intercept[IllegalStateException](
      Manifests.readEntries("s3zz://nowhere/metadata/snap-1.avro"))
    // absent object on a REGISTERED scheme still degrades to empty
    val mem = new InMemoryFileIO
    FileIO.register("s3zz", mem)
    try {
      assert(FileIO.readContentBytes("s3zz://nowhere/metadata/snap-1.json").isEmpty)
      assert(Manifests.read("s3zz://nowhere/metadata/snap-1.json") === Nil)
    } finally FileIO.unregister("s3zz")
  }

  test("LocalFileIO.list walks the deepest existing directory, preserves prefix form") {
    val dir = java.nio.file.Files.createTempDirectory("graft-list")
    val sub = dir.resolve("data")
    java.nio.file.Files.createDirectories(sub.resolve("inner"))
    java.nio.file.Files.write(sub.resolve("a.json"), Array[Byte](1))
    java.nio.file.Files.write(sub.resolve("inner").resolve("b.json"), Array[Byte](2))
    java.nio.file.Files.write(dir.resolve("outside.json"), Array[Byte](3))

    // directory prefix: walks IT, not its parent (outside.json excluded)
    val bare = LocalFileIO.list(s"$sub/").toSeq
    assert(bare.map(_.split('/').last).sorted === Seq("a.json", "b.json"))
    assert(bare.forall(!_.startsWith("file:"))) // bare prefix → bare paths

    // file: URI prefix → file: URI results
    val asUri = LocalFileIO.list(sub.toUri.toString).toSeq
    assert(asUri.nonEmpty && asUri.forall(_.startsWith("file:")))

    // name-prefix inside a directory still filters
    assert(LocalFileIO.list(s"$sub/a").map(_.split('/').last).toSeq === Seq("a.json"))
    // nonexistent root
    assert(LocalFileIO.list(s"$dir/nope/deeper/x").toSeq === Nil)
    // one-level delimiter listing: the sub-directory and the direct file
    val d = LocalFileIO.listDir(s"$sub/")
    assert(d.subPrefixes.map(_.split('/').last) === Seq("inner") &&
      d.objects.map(_.split('/').last) === Seq("a.json"))
  }
}
