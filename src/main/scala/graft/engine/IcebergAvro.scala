package graft.engine

import graft.core.{IType, PartitionSpec, Schema => CoreSchema, Transform}
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.{DataFileReader, DataFileWriter}

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Iceberg-SPEC avro manifests — the interop serialization external
  * engines (pyiceberg, iceberg-spark) read, written ALONGSIDE the
  * engine-native JSON manifest tree on every commit (reference proves
  * this surface end-to-end via pyiceberg, tests/python/tests/
  * test_pyiceberg.py:6-98; schemas and field ids from the PUBLIC
  * Iceberg table spec, manifests + manifest-lists sections and
  * Appendix C/D).
  *
  * Layout per snapshot: each new manifest SHARD gets one avro manifest
  * file (`manifest-<snap>-<i>.avro`, v2 `manifest_entry` records with
  * the spec's field ids), and the snapshot gets one avro manifest list
  * (`snap-<id>-manifest-list.avro`, v2 `manifest_file` records).
  * Carried-over shards reuse their existing avro twins — commit cost
  * stays O(new files + shard count), same as the JSON tree. Bounds
  * from the manifest column stats serialize per the spec's
  * single-value binary forms (Appendix D: little-endian ints/longs/
  * floats, UTF-8 strings).
  *
  * Documented divergences: unpartitioned delete files ride under the
  * table's default spec with a null partition tuple, and columns whose
  * stats are unrepresentable (non-ASCII strings) simply omit their
  * bounds — both lossy-conservative, never wrong. Decimal bounds
  * serialize per Appendix D (unscaled big-endian two's complement).
  */
object IcebergAvro {

  /** What the avro writer needs from table metadata at commit time. */
  final case class Ctx(
      schema: CoreSchema,
      specs: Map[Int, PartitionSpec],
      specId: Int,
      snapshotId: Long,
      parentSnapshotId: Option[Long],
      sequenceNumber: Long)

  /** The avro twin of a JSON manifest shard, recorded in the JSON list
    * so child commits can carry it without rereading anything.
    * `minSeq` is the smallest data sequence among the shard's entries
    * (backfilled carried shards span older commits); None = same as
    * `seq`. */
  final case class AvroInfo(
      path: String, length: Long, specId: Int, seq: Long,
      addedSnapshotId: Long, minSeq: Option[Long] = None) {
    def minSequence: Long = minSeq.getOrElse(seq)
  }

  // ----------------------------------------------------- avro schemas
  private def fld(name: String, s: ASchema, id: Int): ASchema.Field = {
    val f = new ASchema.Field(name, s, null, null.asInstanceOf[AnyRef])
    f.addProp("field-id", id)
    f
  }
  private def optFld(name: String, s: ASchema, id: Int): ASchema.Field = {
    val f = new ASchema.Field(
      name, ASchema.createUnion(ASchema.create(ASchema.Type.NULL), s),
      null, ASchema.Field.NULL_DEFAULT_VALUE)
    f.addProp("field-id", id)
    f
  }
  private def prim(t: ASchema.Type) = ASchema.create(t)
  private def rec(name: String, fields: Seq[ASchema.Field]): ASchema =
    ASchema.createRecord(name, null, null, false, fields.asJava)

  /** map<int, T> the Iceberg-avro way: array of key/value records with
    * a "map" logical-type marker. */
  private def intKeyedMap(
      name: String, valueType: ASchema.Type, keyId: Int, valueId: Int): ASchema = {
    val entry = rec(s"k${keyId}_v$valueId", Seq(
      fld("key", prim(ASchema.Type.INT), keyId),
      fld("value", prim(valueType), valueId)))
    val arr = ASchema.createArray(entry)
    arr.addProp("logicalType", "map")
    arr
  }

  /** Avro type for a partition field's RESULT type (nullable — delete
    * files and null source values write null). */
  private def partitionFieldType(t: IType): Option[ASchema] = t match {
    case IType.TInt => Some(prim(ASchema.Type.INT))
    case IType.TLong | IType.TTime => Some(prim(ASchema.Type.LONG))
    case IType.TString | IType.TUuid => Some(prim(ASchema.Type.STRING))
    case IType.TBoolean => Some(prim(ASchema.Type.BOOLEAN))
    case IType.TFloat => Some(prim(ASchema.Type.FLOAT))
    case IType.TDouble => Some(prim(ASchema.Type.DOUBLE))
    case IType.TDate =>
      val s = prim(ASchema.Type.INT); s.addProp("logicalType", "date"); Some(s)
    case IType.TTimestamp | IType.TTimestamptz =>
      val s = prim(ASchema.Type.LONG)
      s.addProp("logicalType", "timestamp-micros"); Some(s)
    case _ => None // decimals/binary partition values: skip avro twin
  }

  /** The r102 partition struct for a spec (field ids from the spec's
    * partition-field ids, 1000+). None when a field's type has no avro
    * mapping. */
  private def partitionStruct(
      spec: PartitionSpec, schema: CoreSchema): Option[ASchema] = {
    val fields = spec.fields.map { pf =>
      val src = schema.fieldById(pf.sourceId)
      val resultT = src.map(s => pf.transform.resultType(s.fieldType))
      resultT.flatMap(partitionFieldType)
        .map(t => optFld(pf.name, t, pf.fieldId))
    }
    if (fields.exists(_.isEmpty)) None
    else Some(rec("r102", fields.flatten))
  }

  private def dataFileSchema(partType: ASchema): ASchema = rec("r2", Seq(
    fld("content", prim(ASchema.Type.INT), 134),
    fld("file_path", prim(ASchema.Type.STRING), 100),
    fld("file_format", prim(ASchema.Type.STRING), 101),
    fld("partition", partType, 102),
    fld("record_count", prim(ASchema.Type.LONG), 103),
    fld("file_size_in_bytes", prim(ASchema.Type.LONG), 104),
    optFld("null_value_counts", intKeyedMap("nvc", ASchema.Type.LONG, 121, 122), 110),
    optFld("lower_bounds", intKeyedMap("lb", ASchema.Type.BYTES, 126, 127), 125),
    optFld("upper_bounds", intKeyedMap("ub", ASchema.Type.BYTES, 129, 130), 128),
    optFld("equality_ids", {
      val a = ASchema.createArray(prim(ASchema.Type.INT))
      a.addProp("element-id", 136); a
    }, 135)))

  private def manifestEntrySchema(dataFile: ASchema): ASchema =
    rec("manifest_entry", Seq(
      fld("status", prim(ASchema.Type.INT), 0),
      optFld("snapshot_id", prim(ASchema.Type.LONG), 1),
      optFld("sequence_number", prim(ASchema.Type.LONG), 3),
      optFld("file_sequence_number", prim(ASchema.Type.LONG), 4),
      fld("data_file", dataFile, 2)))

  private val fieldSummarySchema: ASchema = rec("r508", Seq(
    fld("contains_null", prim(ASchema.Type.BOOLEAN), 509),
    optFld("contains_nan", prim(ASchema.Type.BOOLEAN), 518),
    optFld("lower_bound", prim(ASchema.Type.BYTES), 510),
    optFld("upper_bound", prim(ASchema.Type.BYTES), 511)))

  private val manifestFileSchema: ASchema = rec("manifest_file", Seq(
    fld("manifest_path", prim(ASchema.Type.STRING), 500),
    fld("manifest_length", prim(ASchema.Type.LONG), 501),
    fld("partition_spec_id", prim(ASchema.Type.INT), 502),
    fld("content", prim(ASchema.Type.INT), 517),
    fld("sequence_number", prim(ASchema.Type.LONG), 515),
    fld("min_sequence_number", prim(ASchema.Type.LONG), 516),
    fld("added_snapshot_id", prim(ASchema.Type.LONG), 503),
    fld("added_files_count", prim(ASchema.Type.INT), 504),
    fld("existing_files_count", prim(ASchema.Type.INT), 505),
    fld("deleted_files_count", prim(ASchema.Type.INT), 506),
    fld("added_rows_count", prim(ASchema.Type.LONG), 512),
    fld("existing_rows_count", prim(ASchema.Type.LONG), 513),
    fld("deleted_rows_count", prim(ASchema.Type.LONG), 514),
    optFld("partitions", ASchema.createArray(fieldSummarySchema), 507)))

  // ----------------------------------------------- value serialization
  /** Spec Appendix D single-value binary form of a canonical stats
    * string (the [[Manifests.ColumnStats]] domain). */
  private[engine] def boundBytes(stored: String, t: IType): Option[ByteBuffer] = {
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    try t match {
      case IType.TInt | IType.TDate =>
        Some(le(4).putInt(stored.toInt).flip().asInstanceOf[ByteBuffer])
      case IType.TLong | IType.TTime | IType.TTimestamp | IType.TTimestamptz =>
        Some(le(8).putLong(stored.toLong).flip().asInstanceOf[ByteBuffer])
      case IType.TFloat =>
        Some(le(4).putFloat(stored.toFloat).flip().asInstanceOf[ByteBuffer])
      case IType.TDouble =>
        Some(le(8).putDouble(stored.toDouble).flip().asInstanceOf[ByteBuffer])
      case IType.TString | IType.TUuid =>
        Some(ByteBuffer.wrap(stored.getBytes(StandardCharsets.UTF_8)))
      case IType.TBoolean =>
        Some(ByteBuffer.wrap(Array[Byte](if (stored.toBoolean) 1 else 0)))
      case d: IType.TDecimal =>
        // spec Appendix D: unscaled value, two's-complement big-endian
        // minimal bytes; setScale is exact — a mismatched scale drops
        // the bound rather than rounding it
        Some(ByteBuffer.wrap(new java.math.BigDecimal(stored)
          .setScale(d.scale).unscaledValue().toByteArray))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Rendered partition value string → the typed avro value (the
    * inverse of the write path's rendering, per transform). */
  private def partitionValue(
      rendered: String, transform: Transform, sourceType: IType): Option[Any] = {
    if (rendered == StatsPruning.NullSentinel) return Some(null)
    val resultT = transform.resultType(sourceType)
    try (transform, resultT) match {
      case (Transform.Identity, IType.TDate) =>
        Some(Math.toIntExact(java.time.LocalDate.parse(rendered).toEpochDay))
      case (_, IType.TDate) => Some(rendered.toInt) // day ordinal, rendered raw
      case (_, IType.TInt) => Some(rendered.toInt)
      case (_, IType.TLong | IType.TTime | IType.TTimestamp | IType.TTimestamptz) =>
        Some(rendered.toLong)
      case (_, IType.TString | IType.TUuid) => Some(rendered)
      case (_, IType.TBoolean) => Some(rendered.toBoolean)
      case (_, IType.TFloat) => Some(rendered.toFloat)
      case (_, IType.TDouble) => Some(rendered.toDouble)
      case _ => None
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------ write
  private def contentCode(f: Manifests.DataFile): Int = f.content match {
    case Manifests.ContentPositionDeletes => 1
    case Manifests.ContentEqualityDeletes => 2
    case _ => 0
  }

  /** Write one avro manifest for a homogeneous shard of files — ADDED
    * at this snapshot, or (with `carried = true`) EXISTING files
    * backfilled from a pre-avro shard, keeping their own per-file
    * sequence numbers. Returns None — no avro twin — when the spec's
    * partition types have no avro mapping or the shard mixes data and
    * delete files (legacy mixed shards; a spec manifest must be
    * homogeneous); interop degrades for that table, the engine path is
    * untouched. */
  def writeManifest(
      path: String, files: Seq[Manifests.DataFile], ctx: Ctx,
      carried: Boolean = false,
      /** the snapshot that originally ADDED these files (spec
        * manifest_entry.snapshot_id semantics) — backfilled carried
        * shards pass their source shard's id; None = this commit */
      addedSnapshotId: Option[Long] = None): Option[AvroInfo] = {
    if (files.exists(_.isDeleteFile) && files.exists(!_.isDeleteFile)) return None
    val spec = ctx.specs.getOrElse(ctx.specId, PartitionSpec(ctx.specId, Nil))
    val partType = partitionStruct(spec, ctx.schema).getOrElse(return None)
    val entrySchema = manifestEntrySchema(dataFileSchema(partType))
    val dfSchema = entrySchema.getField("data_file").schema()

    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord]())
    w.setMeta("schema", graft.core.JsonCodecs.schemaToJson(ctx.schema).toString)
    w.setMeta("partition-spec",
      graft.core.JsonCodecs.specToJson(spec).get("fields").toString)
    w.setMeta("partition-spec-id", spec.specId.toString)
    w.setMeta("format-version", "2")
    w.setMeta("content", if (files.exists(_.isDeleteFile)) "deletes" else "data")
    w.create(entrySchema, buf)
    try files.foreach { f =>
      val df = new GenericData.Record(dfSchema)
      df.put("content", contentCode(f))
      df.put("file_path", f.path)
      df.put("file_format", "PARQUET")
      val part = new GenericData.Record(partType)
      spec.fields.foreach { pf =>
        val v = f.partition.get(pf.name).flatMap { rendered =>
          ctx.schema.fieldById(pf.sourceId)
            .flatMap(s => partitionValue(rendered, pf.transform, s.fieldType))
        }
        part.put(pf.name, v.orNull)
      }
      df.put("partition", part)
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", f.sizeBytes)
      def boundMap(pick: Manifests.ColumnStats => Option[String],
          keyId: Int, valueId: Int) = {
        val entries = f.stats.toSeq.sortBy(_._1).flatMap { case (id, cs) =>
          for {
            s <- pick(cs)
            t <- ctx.schema.fieldById(id).map(_.fieldType)
            b <- boundBytes(s, t)
          } yield {
            val es = intKeyedMap("x", ASchema.Type.BYTES, keyId, valueId)
              .getElementType
            val e = new GenericData.Record(es)
            e.put("key", id); e.put("value", b); e
          }
        }
        if (entries.isEmpty) null else entries.asJava
      }
      df.put("lower_bounds", boundMap(_.min, 126, 127))
      df.put("upper_bounds", boundMap(_.max, 129, 130))
      val nulls = f.stats.toSeq.sortBy(_._1).flatMap { case (id, cs) =>
        cs.nullCount.map { n =>
          val es = intKeyedMap("x", ASchema.Type.LONG, 121, 122).getElementType
          val e = new GenericData.Record(es)
          e.put("key", id); e.put("value", n); e
        }
      }
      df.put("null_value_counts", if (nulls.isEmpty) null else nulls.asJava)
      df.put("equality_ids",
        if (f.equalityIds.isEmpty) null
        else f.equalityIds.map(Int.box).asJava)

      val entry = new GenericData.Record(entrySchema)
      // spec status codes: 0 = EXISTING, 1 = ADDED
      entry.put("status", if (carried) 0 else 1)
      entry.put("snapshot_id", addedSnapshotId.getOrElse(ctx.snapshotId))
      val fseq =
        if (f.seq != Manifests.UnassignedSeq) f.seq else ctx.sequenceNumber
      entry.put("sequence_number", fseq)
      entry.put("file_sequence_number", fseq)
      entry.put("data_file", df)
      w.append(entry)
    } finally w.close()
    val bytes = buf.toByteArray
    graft.catalog.FileIO.forLocation(path).write(path, bytes)
    val seqs = files.map(f =>
      if (f.seq != Manifests.UnassignedSeq) f.seq else ctx.sequenceNumber)
    Some(AvroInfo(path, bytes.length.toLong, spec.specId,
      if (seqs.isEmpty) ctx.sequenceNumber else seqs.max,
      addedSnapshotId.getOrElse(ctx.snapshotId),
      minSeq = if (seqs.isEmpty) None else Some(seqs.min)))
  }

  /** One manifest's row in the list: counts, content, carried-ness,
    * and — for partition-homogeneous shards — the tuple that becomes
    * the r508 field summaries. */
  final case class ListRow(
      info: AvroInfo, fileCount: Long, rowCount: Long,
      hasDeletes: Boolean, carried: Boolean,
      partition: Option[Map[String, String]] = None)

  /** One `manifest_file` record per manifest (new + carried), exactly
    * the v2 manifest-list shape. Carried manifests keep their original
    * added-snapshot / sequence numbers and report their files as
    * existing rather than added. Partition-homogeneous shards get
    * field summaries (contains_null + tight lower=upper bounds), so a
    * spec-compliant reader shard-prunes exactly like our JSON list. */
  def writeManifestList(path: String, manifests: Seq[ListRow], ctx: Ctx): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord]())
    w.setMeta("snapshot-id", ctx.snapshotId.toString)
    ctx.parentSnapshotId.foreach(id => w.setMeta("parent-snapshot-id", id.toString))
    w.setMeta("sequence-number", ctx.sequenceNumber.toString)
    w.setMeta("format-version", "2")
    w.create(manifestFileSchema, buf)
    try manifests.foreach { row =>
      val info = row.info
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", info.path)
      r.put("manifest_length", info.length)
      r.put("partition_spec_id", info.specId)
      r.put("content", if (row.hasDeletes) 1 else 0)
      r.put("sequence_number", info.seq)
      r.put("min_sequence_number", info.minSequence)
      r.put("added_snapshot_id", info.addedSnapshotId)
      r.put("added_files_count", if (row.carried) 0 else row.fileCount.toInt)
      r.put("existing_files_count", if (row.carried) row.fileCount.toInt else 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", if (row.carried) 0L else row.rowCount)
      r.put("existing_rows_count", if (row.carried) row.rowCount else 0L)
      r.put("deleted_rows_count", 0L)
      r.put("partitions", fieldSummaries(row.partition, info.specId, ctx))
      w.append(r)
    } finally w.close()
    graft.catalog.FileIO.forLocation(path).write(path, buf.toByteArray)
  }

  /** r508 field summaries for a partition-homogeneous shard: one entry
    * per spec field, in spec order; a single tuple value gives tight
    * lower=upper bounds. Null when the tuple is unknown (mixed/legacy
    * shards) — readers then scan the manifest, never wrongly skip. */
  private def fieldSummaries(
      partition: Option[Map[String, String]], specId: Int, ctx: Ctx): AnyRef =
    (for {
      tuple <- partition
      spec <- ctx.specs.get(specId)
      if spec.fields.nonEmpty
    } yield spec.fields.map { pf =>
      val r = new GenericData.Record(fieldSummarySchema)
      val typed = for {
        rendered <- tuple.get(pf.name)
        if rendered != StatsPruning.NullSentinel
        src <- ctx.schema.fieldById(pf.sourceId)
        v <- partitionValue(rendered, pf.transform, src.fieldType)
        if v != null
        b <- typedBytes(v)
      } yield b
      typed match {
        case Some(b) =>
          r.put("contains_null", false)
          r.put("lower_bound", b.duplicate())
          r.put("upper_bound", b.duplicate())
        case None =>
          // unknown or null tuple value: may contain null, no bounds
          r.put("contains_null", true)
      }
      r
    }.asJava).orNull

  /** A typed partition value → spec Appendix D bytes. */
  private def typedBytes(v: Any): Option[ByteBuffer] = {
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    v match {
      case i: Int => Some(le(4).putInt(i).flip().asInstanceOf[ByteBuffer])
      case l: Long => Some(le(8).putLong(l).flip().asInstanceOf[ByteBuffer])
      case f: Float => Some(le(4).putFloat(f).flip().asInstanceOf[ByteBuffer])
      case d: Double => Some(le(8).putDouble(d).flip().asInstanceOf[ByteBuffer])
      case s: String => Some(ByteBuffer.wrap(s.getBytes(StandardCharsets.UTF_8)))
      case b: Boolean => Some(ByteBuffer.wrap(Array[Byte](if (b) 1 else 0)))
      case _ => None
    }
  }

  // ------------------------------------------------------------- read
  /** Read back an avro file's records + file metadata (conformance
    * checks, debugging, and the interop read path below). */
  def readRecords(path: String): (ASchema, Map[String, String], Seq[GenericRecord]) =
    parseRecords(graft.catalog.FileIO.forLocation(path).read(path)
      .getOrElse(throw new java.io.FileNotFoundException(path)))

  /** Parse already-fetched avro bytes — lets callers that just did the
    * (single) object-store read avoid a second round trip. */
  def parseRecords(bytes: Array[Byte])
      : (ASchema, Map[String, String], Seq[GenericRecord]) = {
    val r = new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    try {
      val meta = r.getMetaKeys.asScala
        .filter(!_.startsWith("avro.")).map(k => k -> r.getMetaString(k)).toMap
      (r.getSchema, meta, r.iterator().asScala.toList)
    } finally r.close()
  }

  /** True when the avro file is a manifest LIST (vs a manifest). */
  def isManifestList(schema: ASchema): Boolean =
    schema.getName == "manifest_file"

  /** Interop READ: entries of a spec avro manifest list, as the
    * engine's [[Manifests.ManifestEntry]] shape — what lets a snapshot
    * committed by an EXTERNAL Iceberg writer (avro manifest-list in
    * its `manifest-list` field) scan and carry forward through this
    * engine. Tuple-level pruning info isn't in the list (that rides in
    * per-file partition tuples, applied file-level). */
  def readManifestList(path: String): Seq[Manifests.ManifestEntry] =
    manifestListEntries(readRecords(path)._3)

  /** Record-level form of [[readManifestList]] for callers holding
    * already-parsed records (single-read paths). */
  def manifestListEntries(recs: Seq[GenericRecord]): Seq[Manifests.ManifestEntry] = {
    recs.map { r =>
      def i(n: String) = r.get(n).asInstanceOf[Number]
      val files = i("added_files_count").longValue() +
        i("existing_files_count").longValue()
      val rows = i("added_rows_count").longValue() +
        i("existing_rows_count").longValue()
      Manifests.ManifestEntry(
        r.get("manifest_path").toString,
        files, rows,
        hasDeletes = i("content").intValue() == 1,
        partition = None,
        avro = Some(AvroInfo(
          r.get("manifest_path").toString,
          i("manifest_length").longValue(),
          i("partition_spec_id").intValue(),
          i("sequence_number").longValue(),
          i("added_snapshot_id").longValue(),
          minSeq = Some(i("min_sequence_number").longValue()))))
    }
  }

  /** Interop READ: one spec avro manifest → engine [[Manifests.DataFile]]s.
    * Types come from the manifest's own `schema` metadata; partition
    * values re-render into the engine's string domain via the
    * `partition-spec` metadata's transforms. Entries with null
    * sequence numbers inherit `inheritSeq` (the spec's v2 sequence
    * inheritance from the list entry). DELETED-status entries drop. */
  def readManifest(path: String, inheritSeq: Long): Seq[Manifests.DataFile] = {
    val (_, meta, recs) = readRecords(path)
    manifestFiles(meta, recs, inheritSeq)
  }

  /** Record-level form of [[readManifest]] for callers holding
    * already-parsed records (single-read paths). */
  def manifestFiles(
      meta: Map[String, String], recs: Seq[GenericRecord],
      inheritSeq: Long): Seq[Manifests.DataFile] = {
    val schema = graft.core.JsonCodecs
      .schemaFromJson(graft.core.JsonCodecs.parse(meta("schema")))
      .fold(e => sys.error(s"bad manifest schema metadata: $e"), identity)
    // partition-spec metadata: [{"name":…,"transform":…,"source-id":…,…}]
    val transforms: Map[String, (Transform, IType)] =
      Option(meta.get("partition-spec")).flatten.map { sp =>
        graft.core.JsonCodecs.parse(sp).elements().asScala.flatMap { f =>
          for {
            t <- Transform.parse(f.get("transform").asText()).toOption
            src <- schema.fieldById(f.get("source-id").asInt())
          } yield f.get("name").asText() -> (t, src.fieldType)
        }.toMap
      }.getOrElse(Map.empty)

    recs.filter(_.get("status").asInstanceOf[Int] != 2).map { r =>
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      val content = df.get("content").asInstanceOf[Int] match {
        case 1 => Manifests.ContentPositionDeletes
        case 2 => Manifests.ContentEqualityDeletes
        case _ => Manifests.ContentData
      }
      val partition = Option(df.get("partition"))
        .map(_.asInstanceOf[GenericRecord]).map { p =>
          p.getSchema.getFields.asScala.flatMap { f =>
            Option(p.get(f.name())) match {
              case None => Some(f.name() -> StatsPruning.NullSentinel)
              case Some(v) =>
                val rendered = transforms.get(f.name()) match {
                  case Some((Transform.Identity, IType.TDate)) =>
                    java.time.LocalDate.ofEpochDay(
                      v.asInstanceOf[Number].longValue()).toString
                  case _ => v.toString
                }
                Some(f.name() -> rendered)
            }
          }.toMap
        }.getOrElse(Map.empty)
      val seq = Option(r.get("sequence_number"))
        .map(_.asInstanceOf[Number].longValue()).getOrElse(inheritSeq)
      val equalityIds = Option(df.get("equality_ids"))
        .map(_.asInstanceOf[java.util.List[_]].asScala
          .map(_.asInstanceOf[Number].intValue()).toSeq).getOrElse(Nil)
      def bounds(field: String): Map[Int, String] =
        Option(df.get(field)).map(_.asInstanceOf[java.util.List[_]].asScala
          .flatMap { e =>
            val er = e.asInstanceOf[GenericRecord]
            val id = er.get("key").asInstanceOf[Number].intValue()
            schema.fieldById(id).map(_.fieldType).flatMap(t =>
              decodeBound(er.get("value").asInstanceOf[ByteBuffer], t))
              .map(id -> _)
          }.toMap).getOrElse(Map.empty)
      val lower = bounds("lower_bounds")
      val upper = bounds("upper_bounds")
      val nulls: Map[Int, Long] =
        Option(df.get("null_value_counts"))
          .map(_.asInstanceOf[java.util.List[_]].asScala.map { e =>
            val er = e.asInstanceOf[GenericRecord]
            er.get("key").asInstanceOf[Number].intValue() ->
              er.get("value").asInstanceOf[Number].longValue()
          }.toMap).getOrElse(Map.empty)
      val statIds = lower.keySet ++ upper.keySet ++ nulls.keySet
      Manifests.DataFile(
        df.get("file_path").toString,
        df.get("file_size_in_bytes").asInstanceOf[Long],
        df.get("record_count").asInstanceOf[Long],
        partition, content, seq,
        equalityIds = equalityIds,
        stats = statIds.map(id => id -> Manifests.ColumnStats(
          lower.get(id), upper.get(id), nulls.get(id))).toMap)
    }
  }

  /** Spec Appendix D bytes → the engine's canonical stats string; the
    * inverse of [[boundBytes]], with the same ASCII guard on strings
    * (non-ASCII bounds drop rather than mis-order). */
  private[engine] def decodeBound(bb: ByteBuffer, t: IType): Option[String] = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    try t match {
      case IType.TInt | IType.TDate if b.remaining() == 4 =>
        Some(b.getInt.toString)
      case IType.TLong | IType.TTime | IType.TTimestamp | IType.TTimestamptz
          if b.remaining() == 8 => Some(b.getLong.toString)
      case IType.TFloat if b.remaining() == 4 => Some(b.getFloat.toString)
      case IType.TDouble if b.remaining() == 8 => Some(b.getDouble.toString)
      case IType.TString | IType.TUuid =>
        val a = new Array[Byte](b.remaining()); b.get(a)
        val s = new String(a, StandardCharsets.UTF_8)
        if (s.length <= 64 && s.forall(_ < 128)) Some(s) else None
      case IType.TBoolean if b.remaining() == 1 =>
        Some((b.get() != 0).toString)
      case d: IType.TDecimal =>
        val a = new Array[Byte](b.remaining()); b.get(a)
        Some(new java.math.BigDecimal(
          new java.math.BigInteger(a), d.scale).toPlainString)
      case _ => None
    } catch { case _: Exception => None }
  }
}
