package graft.core

/** Snapshots, references (branches/tags) and history logs
  * (SURVEY.md §1.2 rows `snapshots`, `refs`, `snapshot_log`).
  */
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    /** Pointer to the snapshot's file manifest (our data plane stores a
      * JSON manifest list; the catalog core treats it as opaque). */
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int]) {
  def operation: Option[String] = summary.get("operation")
}

object SnapshotRefType {
  val Branch = "branch"
  val Tag = "tag"
}

/** A named ref. Branches move on commit; tags are immutable pointers.
  * Retention knobs mirror the Iceberg spec (used by CREATE TAG ... RETAIN /
  * CREATE BRANCH ... RETAIN in test_spark.py:267-327). */
final case class SnapshotReference(
    snapshotId: Long,
    refType: String,
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None) {
  def isBranch: Boolean = refType == SnapshotRefType.Branch
}

final case class SnapshotLogEntry(snapshotId: Long, timestampMs: Long)
final case class MetadataLogEntry(metadataFile: String, timestampMs: Long)
