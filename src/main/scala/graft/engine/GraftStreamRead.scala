package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Snapshot

import java.util

/** The table as a Structured Streaming SOURCE (`db.t.stream`): each
  * micro-batch reads the snapshots committed since the last processed
  * offset through [[GraftTable.planFilesIncremental]] — exactly-once
  * across restarts because the OFFSET IS THE SNAPSHOT ID, checkpointed
  * by Spark's streaming engine like any other source offset.
  *
  * Scale: a trigger plans O(snapshots since last trigger · shards)
  * driver work and reads only the shards those appends added; the
  * batch itself is the normal distributed scan over just-added files.
  * Combined with [[graft.streaming.TableStreams.appendStream]] (the
  * write side) this closes the loop: tables are both streaming sinks
  * and streaming sources, so pipelines chain through the catalog with
  * per-stage time travel.
  *
  * Options:
  *  - `stream-from` = `latest` (default): only snapshots committed
  *    after the query starts are streamed;
  *  - `stream-from` = `earliest`: the table's full current content is
  *    the first batch (rejected if the snapshot carries merge-on-read
  *    delete files — compact first), then increments;
  *  - `stream-from` = <snapshot-id>: resume from an explicit
  *    checkpoint snapshot (it must remain an un-expired ancestor);
  *  - `max-rows-per-trigger` = N: admission control — each trigger
  *    admits whole snapshots until their summed row counts exceed N
  *    (always at least one, so oversized commits still progress); a
  *    commit backlog after downtime drains as bounded batches.
  *
  * Row-level change (`delete`/`overwrite` snapshots) in a streamed
  * range throws — same line the batch incremental scan draws; streams
  * over churning tables should read a branch that only receives
  * appends, or opt in:
  *  - `skip-row-level-changes` = true: delete/overwrite snapshots in
  *    range contribute NOTHING instead of throwing (Iceberg's
  *    `streaming-skip-delete-snapshots` line) — for signal-style
  *    consumers (MV maintenance reads the changelog itself) or readers
  *    that accept missing overwrite-added rows.
  */
final class StreamReadTable(
    tableName: String,
    gt: GraftTable,
    coreSchema: graft.core.Schema,
    sparkSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = sparkSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = sparkSchema
        override def description(): String = s"GraftStreamScan[$tableName]"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftMicroBatchStream(gt, coreSchema, sparkSchema,
            Option(options.get("stream-from")).getOrElse("latest"),
            Option(options.get("max-rows-per-trigger")).map(_.toLong),
            Option(options.get("skip-row-level-changes")).exists(_.toBoolean))
      }
    }
}

/** Offset = snapshot id ([[GraftMicroBatchStream.Earliest]] = "before
  * any snapshot"). */
final case class GraftSnapshotOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshot-id":$snapshotId}"""
}

final class GraftMicroBatchStream(
    gt: GraftTable,
    coreSchema: graft.core.Schema,
    sparkSchema: StructType,
    streamFrom: String,
    maxRowsPerTrigger: Option[Long] = None,
    skipRowLevelChanges: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  import GraftMicroBatchStream.Earliest

  private def spark: SparkSession = SparkSession.active

  /** Trigger.AvailableNow pin: offsets never pass the snapshot that was
    * current when the trigger started, so the query drains to a fixed
    * point and stops even while writers keep committing. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(gt.metadata.currentSnapshotId.getOrElse(Earliest))

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Admission control: walk the snapshot lineage forward from `start`
    * and admit whole snapshots until their summed row counts exceed the
    * limit — always at least one, so a single oversized commit still
    * makes progress (batch granularity is the snapshot; we never split
    * one). Costs come from the `total-records` summary diffs — O(chain)
    * driver map lookups, no manifest I/O at offset time. A snapshot
    * missing the summary admits and stops (conservative progress). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftSnapshotOffset].snapshotId
    val m = gt.metadata
    val cur = availableNowCap.getOrElse(m.currentSnapshotId.getOrElse(Earliest))
    if (cur == Earliest || cur == s) return GraftSnapshotOffset(s)
    limit match {
      case r: ReadMaxRows =>
        // chain: s-exclusive .. cur, oldest first
        var chain = List.empty[Snapshot]
        var at = m.snapshots.get(cur)
        while (at.exists(_.snapshotId != s)) {
          chain ::= at.get
          at = at.get.parentSnapshotId.flatMap(m.snapshots.get)
        }
        // the walk must TERMINATE AT s (s == Earliest legitimately
        // drains the whole lineage); anything else means the
        // checkpointed snapshot expired or lives on another branch —
        // fail HERE with the real diagnosis instead of letting
        // planFilesIncremental throw a confusing range error later
        if (at.isEmpty && s != Earliest)
          throw graft.catalog.CatalogError.badRequest(
            s"stream checkpoint snapshot $s is not an ancestor of the " +
              s"current snapshot $cur (expired via expire_snapshots, or " +
              "on another branch) — restart the stream from a fresh " +
              "checkpoint or stream-from=earliest")
        def totalOf(id: Long): Option[Long] =
          m.snapshots.get(id).flatMap(_.summary.get("total-records"))
            .flatMap(_.toLongOption)
        var admitted = s
        var budget = r.maxRows()
        var it = chain
        var stop = false
        while (!stop && it.nonEmpty) {
          val snap = it.head
          val cost = for {
            t <- totalOf(snap.snapshotId)
            p = snap.parentSnapshotId.flatMap(totalOf).getOrElse(0L)
          } yield math.max(0L, t - p)
          val affordable = cost.exists(_ <= budget)
          if (affordable || admitted == s) { // always admit >= 1
            admitted = snap.snapshotId
            budget -= cost.getOrElse(budget)
            stop = cost.isEmpty
            it = it.tail
          } else stop = true
        }
        GraftSnapshotOffset(admitted)
      case _ => GraftSnapshotOffset(cur)
    }
  }

  override def reportLatestOffset(): Offset =
    GraftSnapshotOffset(gt.metadata.currentSnapshotId.getOrElse(Earliest))

  override def initialOffset(): Offset = streamFrom match {
    case "latest" =>
      GraftSnapshotOffset(gt.metadata.currentSnapshotId.getOrElse(Earliest))
    case "earliest" => GraftSnapshotOffset(Earliest)
    case id => GraftSnapshotOffset(
      id.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"stream-from must be latest, earliest, or a snapshot id; got '$id'")))
  }

  override def latestOffset(): Offset =
    GraftSnapshotOffset(gt.metadata.currentSnapshotId.getOrElse(Earliest))

  override def deserializeOffset(json: String): Offset = {
    val m = """"snapshot-id"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
    GraftSnapshotOffset(m.group(1).toLong)
  }

  private def filesBetween(start: Long, end: Long): Seq[Manifests.DataFile] =
    if (end == Earliest || start == end) Nil
    else if (start == Earliest) {
      // full current content as the first batch
      val m = gt.metadata
      val snap = m.snapshots.getOrElse(end,
        throw graft.catalog.CatalogError.notFound(
          "SnapshotNotFound", s"snapshot $end not found"))
      val listing = Manifests.read(snap.manifestList)
      if (listing.exists(_.isDeleteFile))
        throw graft.catalog.CatalogError.badRequest(
          "stream-from=earliest over a snapshot with merge-on-read delete " +
            "files — run CALL system.rewrite_data_files first")
      listing
    } else gt.planFilesIncremental(start, Some(end), skipRowLevelChanges)

  private def scanFor(files: Seq[Manifests.DataFile]): GraftMorScan =
    new GraftMorScan(spark, coreSchema, sparkSchema, files,
      _ => _ => true, Nil, sparkSchema)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftSnapshotOffset].snapshotId
    val e = end.asInstanceOf[GraftSnapshotOffset].snapshotId
    scanFor(filesBetween(s, e)).planInputPartitions()
  }

  /** Offset-independent: the factory reads any planned partition (the
    * delete-file plumbing is empty by construction — appends never add
    * deletes, and `earliest` rejects delete-bearing snapshots). */
  override def createReaderFactory(): PartitionReaderFactory =
    scanFor(Nil).createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object GraftMicroBatchStream {
  /** Sentinel offset meaning "before any snapshot". */
  val Earliest: Long = -1L
}
