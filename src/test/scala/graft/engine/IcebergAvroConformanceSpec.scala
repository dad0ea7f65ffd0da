package graft.engine

import graft.core.{IType, NestedField, PartitionSpec, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Offline conformance anchor for the Iceberg-spec avro tree (the
  * approximation of the reference's real-second-engine check,
  * test_pyiceberg.py:6-98 — no external Iceberg ships in this sandbox):
  *
  *  1. STRICT READER: the FULL v2 `manifest_entry` / `manifest_file`
  *     avro schemas, transcribed literally from the public Iceberg
  *     table spec (including every optional field we never write —
  *     column_sizes, split_offsets, sort_order_id, key_metadata…),
  *     must RESOLVE our writer's output via avro schema resolution.
  *     Field-name or type drift in our writer fails this immediately;
  *     spec-only fields must land as null defaults.
  *
  *  2. GOLDEN READ: a manifest written directly through those
  *     spec-parsed schemas (independent of [[IcebergAvro]]'s builders,
  *     carrying spec-only fields a real engine would populate) must
  *     read back through our interop reader with correct values.
  *
  *  3. Container level: avro object-container magic on every file.
  */
class IcebergAvroConformanceSpec extends AnyFunSuite {

  // ---- public Iceberg table spec, "Manifests" avro schema (v2), full
  private def intMap(name: String, kId: Int, vId: Int, vType: String) =
    s"""{"type":"array","logicalType":"map","items":{"type":"record","name":"$name",
       |"fields":[{"name":"key","type":"int","field-id":$kId},
       |{"name":"value","type":"$vType","field-id":$vId}]}}""".stripMargin

  private val specManifestEntry: String =
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int","field-id":0},
       |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
       |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
       |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
       |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
       |{"name":"content","type":"int","field-id":134},
       |{"name":"file_path","type":"string","field-id":100},
       |{"name":"file_format","type":"string","field-id":101},
       |{"name":"partition","field-id":102,
       | "type":{"type":"record","name":"r102","fields":[
       |   {"name":"id_part","type":["null","int"],"default":null,"field-id":1000}]}},
       |{"name":"record_count","type":"long","field-id":103},
       |{"name":"file_size_in_bytes","type":"long","field-id":104},
       |{"name":"column_sizes","type":["null",${intMap("k117_v118", 117, 118, "long")}],"default":null,"field-id":108},
       |{"name":"value_counts","type":["null",${intMap("k119_v120", 119, 120, "long")}],"default":null,"field-id":109},
       |{"name":"null_value_counts","type":["null",${intMap("k121_v122", 121, 122, "long")}],"default":null,"field-id":110},
       |{"name":"nan_value_counts","type":["null",${intMap("k138_v139", 138, 139, "long")}],"default":null,"field-id":137},
       |{"name":"lower_bounds","type":["null",${intMap("k126_v127", 126, 127, "bytes")}],"default":null,"field-id":125},
       |{"name":"upper_bounds","type":["null",${intMap("k129_v130", 129, 130, "bytes")}],"default":null,"field-id":128},
       |{"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
       |{"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
       |{"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
       |{"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
       |]}}]}""".stripMargin

  // ---- public Iceberg table spec, "Manifest Lists" avro schema (v2)
  private val specManifestFile: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","field-id":507,"type":["null",{"type":"array","items":
      |  {"type":"record","name":"r508","fields":[
      |    {"name":"contains_null","type":"boolean","field-id":509},
      |    {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |    {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |    {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      |  ]}}],"default":null},
      |{"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}
      |]}""".stripMargin

  private val tableSchema = Schema(0, Seq(
    NestedField.required(1, "id_part", IType.TInt),
    NestedField.optional(2, "v", IType.TString)))
  private val spec = PartitionSpec(0, Seq(
    graft.core.PartitionField(1, 1000, "id_part", graft.core.Transform.Identity)))

  /** One committed snapshot (partitioned, with stats) under a temp dir;
    * returns (manifest avro path, manifest list avro path). */
  private def writeTree(): (String, String) = {
    val dir = Files.createTempDirectory("graft-conf").toUri.toString.stripSuffix("/")
    val ctx = IcebergAvro.Ctx(tableSchema, Map(0 -> spec), 0, 7L, None, 3L)
    Manifests.writeCommit(s"$dir/metadata", 7L, Nil,
      Seq(Manifests.DataFile(s"$dir/data/a.parquet", 99L, 4L,
        partition = Map("id_part" -> "5"), seq = 3L,
        stats = Map(
          1 -> Manifests.ColumnStats(Some("5"), Some("5"), Some(0L)),
          2 -> Manifests.ColumnStats(Some("aa"), Some("zz"), Some(1L))))),
      iceberg = Some(ctx))
    (s"$dir/metadata/manifest-7-0.avro", s"$dir/metadata/snap-7-manifest-list.avro")
  }

  private def readWithStrictSchema(
      path: String, readerSchemaJson: String): Seq[GenericRecord] = {
    val reader = new org.apache.avro.Schema.Parser().parse(readerSchemaJson)
    val bytes = graft.catalog.FileIO.readBytes(path).get
    val r = new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord](null, reader))
    try r.iterator().asScala.toList
    finally r.close()
  }

  test("avro object-container magic on manifests and lists") {
    val (manifest, list) = writeTree()
    Seq(manifest, list).foreach { p =>
      val head = graft.catalog.FileIO.readBytes(p).get.take(4)
      assert(head.toSeq === Seq[Byte]('O', 'b', 'j', 1), s"bad magic in $p")
    }
  }

  test("strict spec manifest_entry schema resolves our manifests") {
    val (manifest, _) = writeTree()
    val recs = readWithStrictSchema(manifest, specManifestEntry)
    assert(recs.size === 1)
    val e = recs.head
    assert(e.get("status").asInstanceOf[Int] === 1)
    assert(e.get("sequence_number").asInstanceOf[Long] === 3L)
    val df = e.get("data_file").asInstanceOf[GenericRecord]
    assert(df.get("content").asInstanceOf[Int] === 0)
    assert(df.get("file_path").toString.endsWith("/data/a.parquet"))
    assert(df.get("file_format").toString === "PARQUET")
    assert(df.get("record_count").asInstanceOf[Long] === 4L)
    assert(df.get("file_size_in_bytes").asInstanceOf[Long] === 99L)
    val part = df.get("partition").asInstanceOf[GenericRecord]
    assert(part.get("id_part").asInstanceOf[Int] === 5)
    // bounds present, keyed by field id, Appendix-D bytes
    val lower = df.get("lower_bounds").asInstanceOf[java.util.List[GenericRecord]]
    val byId = lower.asScala.map(r =>
      r.get("key").asInstanceOf[Int] -> r.get("value")).toMap
    assert(byId.keySet === Set(1, 2))
    // spec-only fields we never write resolve to their null defaults
    Seq("column_sizes", "nan_value_counts", "key_metadata", "split_offsets",
      "sort_order_id").foreach(f => assert(df.get(f) == null, s"$f not null"))
  }

  test("strict spec manifest_file schema resolves our manifest lists") {
    val (_, list) = writeTree()
    val recs = readWithStrictSchema(list, specManifestFile)
    assert(recs.size === 1)
    val m = recs.head
    assert(m.get("manifest_path").toString.endsWith("manifest-7-0.avro"))
    assert(m.get("partition_spec_id").asInstanceOf[Int] === 0)
    assert(m.get("content").asInstanceOf[Int] === 0)
    assert(m.get("sequence_number").asInstanceOf[Long] === 3L)
    assert(m.get("min_sequence_number").asInstanceOf[Long] === 3L)
    assert(m.get("added_snapshot_id").asInstanceOf[Long] === 7L)
    assert(m.get("added_files_count").asInstanceOf[Int] === 1)
    assert(m.get("added_rows_count").asInstanceOf[Long] === 4L)
    assert(m.get("key_metadata") == null)
    // partition field summaries in spec order with tight bounds
    val parts = m.get("partitions").asInstanceOf[java.util.List[GenericRecord]]
    assert(parts.size() === 1)
    assert(parts.get(0).get("contains_null").asInstanceOf[Boolean] === false)
    assert(parts.get(0).get("lower_bound") != null)
  }

  test("golden manifest written through the spec schemas reads back through our reader") {
    // an "external writer": records built straight from the parsed spec
    // schema, populating fields our own writer never emits
    val entrySchema = new org.apache.avro.Schema.Parser().parse(specManifestEntry)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()

    val df = new GenericData.Record(dfSchema)
    df.put("content", 0)
    df.put("file_path", "s3://bucket/wh/db/t/data/golden.parquet")
    df.put("file_format", "PARQUET")
    val part = new GenericData.Record(partSchema)
    part.put("id_part", 9)
    df.put("partition", part)
    df.put("record_count", 77L)
    df.put("file_size_in_bytes", 1234L)
    df.put("split_offsets", java.util.List.of(java.lang.Long.valueOf(4L)))
    df.put("sort_order_id", Int.box(0))
    val entry = new GenericData.Record(entrySchema)
    entry.put("status", 1)
    entry.put("snapshot_id", 55L)
    entry.put("sequence_number", 6L)
    entry.put("file_sequence_number", 6L)
    entry.put("data_file", df)

    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord]())
    w.setMeta("schema", graft.core.JsonCodecs.schemaToJson(tableSchema).toString)
    w.setMeta("partition-spec",
      graft.core.JsonCodecs.specToJson(spec).get("fields").toString)
    w.setMeta("partition-spec-id", "0")
    w.setMeta("format-version", "2")
    w.setMeta("content", "data")
    w.create(entrySchema, buf)
    w.append(entry)
    w.close()

    val path = Files.createTempDirectory("graft-golden")
      .resolve("golden-m0.avro").toUri.toString
    graft.catalog.FileIO.forLocation(path).write(path, buf.toByteArray)

    val files = IcebergAvro.readManifest(path, inheritSeq = 0L)
    assert(files.size === 1)
    val f = files.head
    assert(f.path === "s3://bucket/wh/db/t/data/golden.parquet")
    assert(f.recordCount === 77L && f.sizeBytes === 1234L)
    assert(f.seq === 6L)
    assert(f.partition === Map("id_part" -> "9"))
    assert(!f.isDeleteFile)
  }
}
