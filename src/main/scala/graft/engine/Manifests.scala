package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.jdk.CollectionConverters._

/** Snapshot file manifests: a two-level tree like Iceberg's.
  *
  * Each snapshot's `manifest-list` points at a LIST document naming the
  * snapshot's manifest SHARDS; each shard holds a subset of the data /
  * delete files, grouped by partition tuple. Commits write only the
  * shards for the files they ADD and a new (small) list that reuses the
  * base snapshot's shard paths unchanged — so an append's manifest I/O
  * is O(new files + shard count), never O(total files). At 100 TB with
  * millions of files, the old single-document design rewrote the whole
  * listing on every commit; here untouched shards are immutable and
  * shared across snapshots.
  *
  * Shards are partition-grouped, and each list entry records its
  * shard's partition tuple — so partition-pruned scans skip entire
  * shard FILES at plan time ([[readPruned]]), not just file entries
  * after parsing them. Commits touching more than [[MaxShardsPerCommit]]
  * distinct tuples collapse the overflow into one mixed shard (entry
  * partition `None` = "read always"); compaction re-shards cleanly.
  *
  * JSON instead of Iceberg's avro — simpler, same planning information
  * (per-file path, bytes, rows, partition tuple, content kind,
  * sequence number). The legacy single-document format (round ≤ 4) is
  * still readable: a list-less document is treated as one mixed shard.
  */
object Manifests {

  /** Content kinds, mirroring Iceberg v2: plain data files,
    * equality-delete files (rows are key tuples; they delete every
    * matching row in data files with a STRICTLY LOWER sequence number)
    * and position-delete files (rows are `(file_path, pos)` pairs; they
    * delete the addressed row in data files with sequence number ≤
    * theirs — the output of row-level MERGE/UPDATE/DELETE delta
    * writes). */
  val ContentData = "data"
  val ContentEqualityDeletes = "equality-deletes"
  val ContentPositionDeletes = "position-deletes"

  /** Sentinel for "assign the commit's sequence number at commit time"
    * (files are written before the winning base snapshot is known). */
  val UnassignedSeq: Long = -1L

  /** A commit adding more distinct partition tuples than this gets the
    * overflow collapsed into ONE mixed shard — bounds the shard-file
    * count per commit without losing pruning for the common case. */
  val MaxShardsPerCommit = 64

  /** Per-column min/max/null-count for ONE data file, the planning
    * information Iceberg manifests carry as `lower_bounds` /
    * `upper_bounds` / `null_value_counts`. Bounds are canonical strings
    * in the column's storage domain (ints/longs/epoch-days/micros as
    * decimal strings, floats via toString, ASCII strings raw) —
    * see [[StatsPruning]] for the comparison semantics. A missing
    * bound means "unknown", never "no rows". */
  final case class ColumnStats(
      min: Option[String], max: Option[String], nullCount: Option[Long])

  final case class DataFile(
      path: String,
      sizeBytes: Long,
      recordCount: Long,
      /** partition-field name → literal string value ("" when unpartitioned) */
      partition: Map[String, String] = Map.empty,
      content: String = ContentData,
      /** data sequence number: commit order for MoR delete scoping */
      seq: Long = UnassignedSeq,
      /** equality-delete key columns BY NAME (legacy manifests only —
        * names go stale across RENAME COLUMN) */
      equalityColumns: Seq[String] = Nil,
      /** equality-delete key FIELD IDS (Iceberg v2 `equality_ids`):
        * resolved to current names at scan time, rename-safe */
      equalityIds: Seq[Int] = Nil,
      /** per-column stats BY FIELD ID (rename-safe) — what makes
        * selective non-partition predicates skip whole files at plan
        * time instead of reading every footer */
      stats: Map[Int, ColumnStats] = Map.empty) {
    def isDeleteFile: Boolean =
      content == ContentEqualityDeletes || content == ContentPositionDeletes
    def isPositionDeleteFile: Boolean = content == ContentPositionDeletes
  }

  /** One manifest shard as named by the list: `partition = Some(tuple)`
    * when every file in the shard has that exact partition tuple (the
    * pruning key); `None` for mixed/legacy shards, which are always
    * read. Delete-file shards are always read regardless. `avro` names
    * the shard's Iceberg-spec avro twin ([[IcebergAvro]]), carried
    * forward so child commits can assemble a spec manifest list without
    * rewriting untouched manifests. */
  final case class ManifestEntry(
      path: String,
      fileCount: Long,
      rowCount: Long,
      hasDeletes: Boolean,
      partition: Option[Map[String, String]],
      avro: Option[IcebergAvro.AvroInfo] = None)

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- write
  /** Write a commit's manifests: shards for `newFiles` (partition-
    * grouped) plus a new list reusing `carried` entries verbatim.
    * Returns the list location to store in the snapshot. */
  def writeCommit(
      metadataDir: String,
      snapshotId: Long,
      carried: Seq[ManifestEntry],
      newFiles: Seq[DataFile],
      /** when present, each new shard also gets an Iceberg-spec avro
        * manifest and the snapshot an avro manifest list
        * ([[IcebergAvro]]) — same O(new files) cost, carried shards
        * reuse their avro twins */
      iceberg: Option[IcebergAvro.Ctx] = None): String = {
    val groups: Seq[(Option[Map[String, String]], Seq[DataFile])] = {
      // shards are homogeneous: delete files never share a shard with
      // data files, so a list entry's hasDeletes describes ALL its
      // files (summary accounting and always-read behavior stay exact)
      val byTuple = newFiles.groupBy(f => (f.isDeleteFile, f.partition)).toSeq
        .sortBy { case ((d, p), _) => (d, p.toSeq.sorted.mkString) }
      if (byTuple.size <= MaxShardsPerCommit)
        byTuple.map { case ((_, p), fs) => (Some(p), fs) }
      else {
        val (deletes, datas) = byTuple.partition(_._1._1)
        val (kept, overflow) = datas.splitAt(
          math.max(MaxShardsPerCommit - 1 - deletes.size, 0))
        deletes.map { case ((_, p), fs) => (Some(p), fs) } ++
          kept.map { case ((_, p), fs) => (Some(p), fs) } :+
          (None, overflow.flatMap(_._2))
      }
    }
    val newEntries = groups.zipWithIndex.map { case ((pt, fs), i) =>
      val path = s"$metadataDir/manifest-$snapshotId-$i.json"
      writeShard(path, snapshotId, fs)
      val avro = iceberg.flatMap(ctx => IcebergAvro.writeManifest(
        s"$metadataDir/manifest-$snapshotId-$i.avro", fs, ctx))
      ManifestEntry(path, fs.size.toLong, fs.map(_.recordCount).sum,
        fs.exists(_.isDeleteFile), pt, avro)
    }
    // Backfill avro twins for carried shards that predate the avro
    // tree (legacy JSON-only shards): one O(shard files) re-read per
    // shard, ONCE — the twin rides in the JSON list from here on, so
    // the cost amortizes to zero. Files keep their own sequence
    // numbers and are recorded as EXISTING. Shards that cannot have a
    // twin (unmappable partition types, mixed legacy shards) stay bare.
    val carriedOut = iceberg match {
      case None => carried
      case Some(ctx) => carried.zipWithIndex.map {
        case (e, _) if e.avro.isDefined => e
        case (e, i) =>
          // spec manifest_entry.snapshot_id = the snapshot that ADDED
          // the file: the legacy JSON shard recorded its writing
          // commit's id — carry it through instead of claiming this one
          val origSnap = parse(e.path)
            .flatMap(n => Option(n.get("snapshot-id")).map(_.asLong()))
          val twin = IcebergAvro.writeManifest(
            s"$metadataDir/manifest-$snapshotId-c$i.avro",
            entryFiles(e), ctx, carried = true, addedSnapshotId = origSnap)
          e.copy(avro = twin)
      }
    }
    iceberg.foreach { ctx =>
      val all = carriedOut.map(e => (e, true)) ++ newEntries.map(e => (e, false))
      // A spec manifest list must name the snapshot's COMPLETE content:
      // if any entry has no avro twin, an external reader would see a
      // silently incomplete table — worse than no list. Skip it.
      if (all.forall(_._1.avro.isDefined)) {
        val rows = all.map { case (e, isCarried) =>
          IcebergAvro.ListRow(
            e.avro.get, e.fileCount, e.rowCount, e.hasDeletes, isCarried, e.partition)
        }
        IcebergAvro.writeManifestList(
          s"$metadataDir/snap-$snapshotId-manifest-list.avro", rows, ctx)
      } else System.err.println(
        s"[graft] snapshot $snapshotId: skipping avro manifest list — " +
          s"${all.count(_._1.avro.isEmpty)} of ${all.size} shards have no avro twin")
    }
    val listPath = s"$metadataDir/snap-$snapshotId.json"
    val o = mapper.createObjectNode()
    o.put("snapshot-id", snapshotId)
    val arr = mapper.createArrayNode()
    (carriedOut ++ newEntries).foreach { e =>
      val eo = mapper.createObjectNode()
      eo.put("path", e.path)
      eo.put("file-count", e.fileCount)
      eo.put("row-count", e.rowCount)
      if (e.hasDeletes) eo.put("has-deletes", true)
      e.partition.foreach { p =>
        val po = mapper.createObjectNode()
        p.toSeq.sortBy(_._1).foreach { case (k, v) => po.put(k, v) }
        eo.set[ObjectNode]("partition", po)
      }
      e.avro.foreach { a =>
        val ao = mapper.createObjectNode()
        ao.put("path", a.path)
        ao.put("length", a.length)
        ao.put("spec-id", a.specId)
        ao.put("sequence-number", a.seq)
        ao.put("added-snapshot-id", a.addedSnapshotId)
        a.minSeq.foreach(ao.put("min-sequence-number", _))
        eo.set[ObjectNode]("avro", ao)
      }
      arr.add(eo)
    }
    o.set[ArrayNode]("manifests", arr)
    writeDoc(listPath, o)
    listPath
  }

  private def writeShard(location: String, snapshotId: Long, files: Seq[DataFile]): Unit = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", snapshotId)
    val arr = mapper.createArrayNode()
    files.foreach { f =>
      val fo = mapper.createObjectNode()
      fo.put("path", f.path)
      fo.put("size-bytes", f.sizeBytes)
      fo.put("record-count", f.recordCount)
      if (f.partition.nonEmpty) {
        val p = mapper.createObjectNode()
        f.partition.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
        fo.set[ObjectNode]("partition", p)
      }
      if (f.content != ContentData) fo.put("content", f.content)
      if (f.seq != UnassignedSeq) fo.put("sequence-number", f.seq)
      if (f.equalityColumns.nonEmpty) {
        val eq = mapper.createArrayNode()
        f.equalityColumns.foreach(eq.add)
        fo.set[ArrayNode]("equality-columns", eq)
      }
      if (f.equalityIds.nonEmpty) {
        val eq = mapper.createArrayNode()
        f.equalityIds.foreach(eq.add)
        fo.set[ArrayNode]("equality-ids", eq)
      }
      if (f.stats.nonEmpty) {
        val st = mapper.createObjectNode()
        f.stats.toSeq.sortBy(_._1).foreach { case (id, cs) =>
          val so = mapper.createObjectNode()
          cs.min.foreach(so.put("min", _))
          cs.max.foreach(so.put("max", _))
          cs.nullCount.foreach(n => so.put("nulls", n))
          st.set[ObjectNode](id.toString, so)
        }
        fo.set[ObjectNode]("stats", st)
      }
      arr.add(fo)
    }
    o.set[ArrayNode]("files", arr)
    writeDoc(location, o)
  }

  private def writeDoc(location: String, o: ObjectNode): Unit =
    graft.catalog.FileIO.writeString(location, mapper.writeValueAsString(o))

  // -------------------------------------------------------------- read
  /** Complete file listing of a snapshot (list → all shards). A
    * location ending in `.avro` is an Iceberg-SPEC manifest list (or
    * bare manifest) — e.g. a snapshot committed through the REST
    * catalog by an EXTERNAL Iceberg writer — and reads through
    * [[IcebergAvro]] into the same engine shapes. */
  def read(location: String): Seq[DataFile] =
    if (location.endsWith(".avro")) readAvro(location)
    else parse(location) match {
      case None => Nil
      case Some(n) if n.has("files") => shardFiles(n) // legacy single doc
      case Some(n) => entriesOf(n).flatMap(entryFiles)
    }

  /** Files of an explicit entry subset — the incremental-scan read
    * path: the caller diffs manifest LISTS (O(shards)) and only the
    * named shards pay content I/O. */
  def filesOf(entries: Seq[ManifestEntry]): Seq[DataFile] =
    entries.flatMap(entryFiles)

  /** One list entry's files — the shard may be a JSON shard or an avro
    * manifest (mixed trees happen when our commits carry entries from
    * an externally-written snapshot forward). */
  private def entryFiles(e: ManifestEntry): Seq[DataFile] =
    if (e.path.endsWith(".avro"))
      IcebergAvro.readManifest(e.path, e.avro.map(_.seq).getOrElse(0L))
    else read(e.path)

  /** ONE content read (absent object → Nil; UNREGISTERED SCHEME throws
    * — see the [[graft.catalog.FileIO]] policy: a JVM missing its
    * backend must not read the table as empty), parsed once — never
    * exists+read+read round trips. */
  private def readAvro(location: String): Seq[DataFile] =
    graft.catalog.FileIO.readContentBytes(location) match {
      case None => Nil
      case Some(bytes) =>
        val (schema, meta, recs) = IcebergAvro.parseRecords(bytes)
        if (IcebergAvro.isManifestList(schema))
          IcebergAvro.manifestListEntries(recs).flatMap(entryFiles)
        else IcebergAvro.manifestFiles(meta, recs, inheritSeq = 0L)
    }

  /** Partition-pruned listing: reads ONLY the shards whose partition
    * tuple passes `keep` (mixed and delete shards always read), then
    * filters file-level for mixed shards — same result as
    * `read(...).filter(f => f.isDeleteFile || keep(f.partition))` with
    * O(matching shards) I/O. */
  def readPruned(
      location: String, keep: Map[String, String] => Boolean): Seq[DataFile] =
    if (location.endsWith(".avro"))
      // avro lists carry no shard-level tuple; prune file-level
      readAvro(location).filter(f => f.isDeleteFile || keep(f.partition))
    else parse(location) match {
      case None => Nil
      case Some(n) if n.has("files") =>
        shardFiles(n).filter(f => f.isDeleteFile || keep(f.partition))
      case Some(n) =>
        entriesOf(n)
          .filter(e => e.hasDeletes || e.partition.forall(keep))
          .flatMap(entryFiles)
          .filter(f => f.isDeleteFile || keep(f.partition))
    }

  /** The list entries of a snapshot, for carrying into a child commit.
    * A legacy single-document manifest becomes one synthetic mixed
    * entry pointing at itself. */
  def readEntries(location: String): Seq[ManifestEntry] =
    if (location.endsWith(".avro")) {
      graft.catalog.FileIO.readContentBytes(location) match {
        case None => Nil
        case Some(bytes) =>
          IcebergAvro.manifestListEntries(IcebergAvro.parseRecords(bytes)._3)
      }
    } else parse(location) match {
      case None => Nil
      case Some(n) if n.has("files") =>
        val files = shardFiles(n)
        if (files.isEmpty) Nil
        else Seq(ManifestEntry(location, files.size.toLong,
          files.map(_.recordCount).sum, files.exists(_.isDeleteFile), None))
      case Some(n) => entriesOf(n)
    }

  private def parse(location: String): Option[JsonNode] =
    graft.catalog.FileIO.readContentString(location).map(mapper.readTree)

  private def entriesOf(n: JsonNode): Seq[ManifestEntry] =
    n.get("manifests").elements().asScala.map { e =>
      ManifestEntry(
        e.get("path").asText(),
        e.get("file-count").asLong(),
        e.get("row-count").asLong(),
        Option(e.get("has-deletes")).exists(_.asBoolean()),
        Option(e.get("partition")).filter(!_.isNull).map(p =>
          p.properties().asScala.map(x => x.getKey -> x.getValue.asText()).toMap),
        Option(e.get("avro")).filter(!_.isNull).map(a =>
          IcebergAvro.AvroInfo(
            a.get("path").asText(), a.get("length").asLong(),
            a.get("spec-id").asInt(), a.get("sequence-number").asLong(),
            a.get("added-snapshot-id").asLong(),
            Option(a.get("min-sequence-number")).map(_.asLong()))))
    }.toSeq

  private def shardFiles(n: JsonNode): Seq[DataFile] =
    n.get("files").elements().asScala.map { f =>
      DataFile(
        f.get("path").asText(),
        f.get("size-bytes").asLong(),
        f.get("record-count").asLong(),
        Option(f.get("partition")).filter(!_.isNull).map(p =>
          p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty),
        Option(f.get("content")).map(_.asText()).getOrElse(ContentData),
        Option(f.get("sequence-number")).map(_.asLong()).getOrElse(UnassignedSeq),
        Option(f.get("equality-columns")).map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Nil),
        Option(f.get("equality-ids")).map(_.elements().asScala.map(_.asInt()).toSeq)
          .getOrElse(Nil),
        Option(f.get("stats")).map(_.properties().asScala.map { e =>
          val so = e.getValue
          e.getKey.toInt -> ColumnStats(
            Option(so.get("min")).map(_.asText()),
            Option(so.get("max")).map(_.asText()),
            Option(so.get("nulls")).map(_.asLong()))
        }.toMap).getOrElse(Map.empty))
    }.toSeq
}
