package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot file manifests. Each snapshot's `manifest-list` points at
  * ONE JSON document holding the COMPLETE data-file listing for that
  * snapshot (copy-on-write semantics: an append writes old ++ new).
  *
  * This is deliberately simpler than Iceberg's avro manifest tree but
  * carries the same planning information: per-file path, byte size,
  * record count and the partition tuple — enough for snapshot isolation,
  * time travel, and partition pruning at plan time. At 100 TB the
  * listing for a snapshot is O(file count) JSON; the upgrade path is
  * sharding the listing per partition (manifest-per-partition), which
  * changes only this module.
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

  final case class DataFile(
      path: String,
      sizeBytes: Long,
      recordCount: Long,
      /** partition-field name → literal string value ("" when unpartitioned) */
      partition: Map[String, String] = Map.empty,
      content: String = ContentData,
      /** data sequence number: commit order for MoR delete scoping */
      seq: Long = UnassignedSeq,
      /** equality-delete key columns (equality-delete files only) */
      equalityColumns: Seq[String] = Nil) {
    def isDeleteFile: Boolean =
      content == ContentEqualityDeletes || content == ContentPositionDeletes
    def isPositionDeleteFile: Boolean = content == ContentPositionDeletes
  }

  private val mapper = new ObjectMapper()

  def write(location: String, snapshotId: Long, files: Seq[DataFile]): Unit = {
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
      arr.add(fo)
    }
    o.set[ArrayNode]("files", arr)
    val path = graft.catalog.MetadataIO.toPath(location)
    Files.createDirectories(path.getParent)
    Files.write(path, mapper.writeValueAsString(o).getBytes(StandardCharsets.UTF_8))
  }

  def read(location: String): Seq[DataFile] = {
    val path = graft.catalog.MetadataIO.toPath(location)
    if (!Files.exists(path)) return Nil
    val n = mapper.readTree(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
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
          .getOrElse(Nil))
    }.toSeq
  }
}
