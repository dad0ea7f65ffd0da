package graft.engine

import graft.core.Schema
import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Pushdown-capable scan over a snapshot's file listing, applying
  * merge-on-read deletes task-side.
  *
  * Used wherever the plain parquet-table delegate can't serve the read:
  *  - snapshots with outstanding merge-on-read delete files, and
  *  - row-level operation scans (MERGE/UPDATE/DELETE), which must also
  *    surface the `_file`/`_pos` row-lineage metadata columns that form
  *    the SupportsDelta row id.
  *
  * This is a NATIVE V2 `Batch` (no V1 bridge, no InternalRow→Row copy):
  * each input partition is a bin-packed set of data-file splits, and
  * the reader opens them with Spark's own vectorized parquet machinery
  * ([[GraftShims.parquetReadFunc]]), then applies deletes row-by-row —
  * position deletes as a per-file hash set of row ordinals (true row
  * indexes from the reader's row-index column), equality deletes as
  * key-tuple hash sets scoped by sequence number. Delete sets load once
  * per executor (soft-referenced cache), so N tasks over M delete rows
  * cost O(M) loading, not O(N·M). Delete application is therefore fully
  * distributed with no join planning at all — the Iceberg executor-side
  * `DeleteFilter` design — and scales with (task's rows + applicable
  * delete rows) per task at any table size.
  *
  * Pushed data filters COMMUTE with delete application (a row deleted
  * by key/position is deleted regardless of any predicate on its other
  * columns). They prune the file LISTING through manifest stats /
  * partition tuples at plan time and are re-evaluated per row as a
  * compiled predicate; they are deliberately NOT handed to the parquet
  * row-group filter, which matches columns by NAME — on a file written
  * before a column rename it would treat the renamed column as all-null
  * and skip blocks that do hold matching rows (our columns resolve by
  * field id, so name-based block skipping is unsound here).
  *
  * The scan implements [[SupportsRuntimeFiltering]] on every table
  * column: when Spark plans a DPP-style runtime filter against it (see
  * [[MergeRuntimeFiltering]] for the row-level MERGE wiring), the
  * runtime `In`/range filters prune the file listing through the same
  * stats evaluator before any file is opened — a key-only
  * `MERGE ... ON t.id = s.id` reads candidate files, not the table.
  */
final class GraftScanBuilder(
    coreSchema: Schema,
    listing: Seq[Manifests.DataFile],
    /** pushed filters → file keeper: the listing is pruned by manifest
      * column stats + partition tuples before any file is read
      * ([[StatsPruning]]); delete files always survive */
    keeper: Seq[Filter] => Manifests.DataFile => Boolean = _ => _ => true,
    /** the table's default partition spec, for storage-partitioned-join
      * key grouping (None disables SPJ reporting) */
    spjSpec: Option[graft.core.PartitionSpec] = None,
    /** ALL the table's partition specs, for manifest-answered GROUP BY
      * (identity-column groups; [[MetadataAggregates]]) */
    aggSpecs: Iterable[graft.core.PartitionSpec] = Nil)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private val tableSchema = SchemaBridge.toSpark(coreSchema)
  private val lineageFields = Seq(
    StructField(GraftTable.FileCol, StringType, nullable = false),
    StructField(GraftTable.PosCol, LongType, nullable = false))

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  /** Accepted filters are REMOVED from Spark's post-scan evaluation, so
    * they must be fully enforceable by the scan's residual predicate —
    * which binds against TOP-LEVEL parquet output columns. Decline any
    * filter referencing a nested field (dotted ref) or a name outside
    * the table schema (e.g. the lineage metadata columns): those go back
    * to Spark for post-scan evaluation instead of losing rows or
    * throwing at residual-bind time. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val dataCols = tableSchema.fieldNames.toSet
    val (ok, rest) = filters.partition(f =>
      FilterBridge.translate(f).isDefined &&
        f.references.forall(r => !r.contains('.') && dataCols.contains(r)))
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // requested names may include the lineage metadata columns; keep
    // whatever was asked, typed from the table/lineage definitions
    val byName = (tableSchema.fields.toSeq ++ lineageFields).map(f => f.name -> f).toMap
    required = StructType(requiredSchema.fields.flatMap(f => byName.get(f.name)))
  }

  /** Manifest-answered aggregation, when sound ([[MetadataAggregates]]):
    * count/min/max over a delete-free, unfiltered snapshot never reads
    * a data file. `pushed.nonEmpty` declines because accepted filters
    * are REMOVED from Spark's post-scan evaluation on this path — a
    * metadata answer could not enforce them. */
  private var metaAgg: Option[(StructType, Array[InternalRow], Seq[String])] = None

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    pushed.isEmpty &&
      MetadataAggregates.plan(coreSchema, aggSpecs, listing, agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    metaAgg =
      if (pushed.nonEmpty) None
      else MetadataAggregates.plan(coreSchema, aggSpecs, listing, agg)
    metaAgg.isDefined
  }

  override def build(): Scan = metaAgg match {
    case Some((schema, rows, funcs)) => new GraftMetaAggScan(schema, rows, funcs)
    case None =>
      val spark = SparkSession.active
      // plan-time static prune (stats + partition tuples); deletes survive
      val kept =
        if (pushed.isEmpty) listing else listing.filter(keeper(pushed.toSeq))
      new GraftMorScan(spark, coreSchema, tableSchema, kept, keeper,
        pushed.toSeq, required, spjSpec)
  }
}

/** One split of a data file, with the file's commit sequence number
  * (delete-scoping) and its manifest key-column stats (equality-delete
  * file pruning) riding along. */
private[engine] final case class GraftFileSlice(
    path: String, fileSize: Long, seq: Long, start: Long, length: Long,
    stats: Map[Int, Manifests.ColumnStats])

/** The ONE storage-partitioned-join eligibility predicate, shared by
  * the catalog's scan routing and the scan's key grouping so the two
  * can never drift: a spec qualifies when every field is an identity
  * or bucket transform (the transforms the planner can resolve —
  * identity as a column ref, bucket through the catalog's V2
  * FunctionCatalog). */
private[engine] object GraftSpj {
  def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false").toBoolean
  def supportedSpec(spec: graft.core.PartitionSpec): Boolean =
    spec.fields.nonEmpty && spec.fields.forall(f =>
      f.transform == graft.core.Transform.Identity ||
        f.transform.isInstanceOf[graft.core.Transform.Bucket])
}

private[engine] sealed trait GraftSlicedPartition extends InputPartition {
  def slices: Seq[GraftFileSlice]
}

private[engine] final case class GraftInputPartition(slices: Seq[GraftFileSlice])
    extends GraftSlicedPartition

/** One storage partition's files as one Spark partition, with the
  * typed partition tuple exposed for KeyGroupedPartitioning — the unit
  * of a storage-partitioned (shuffle-free) join. */
private[engine] final case class GraftKeyedInputPartition(
    slices: Seq[GraftFileSlice], key: InternalRow)
    extends GraftSlicedPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}


/** One equality-delete file with its sequence number and key-column
  * stats (by field id). */
private[engine] final case class EqDeleteFile(
    path: String, size: Long, seq: Long,
    stats: Map[Int, Manifests.ColumnStats])

/** One equality-delete key set: the delete files carrying it plus how
  * to read them and where the key columns sit in the data reader's
  * output. `keyIds`/`keyITypes` drive file-level pruning: a delete
  * file whose key bounds provably miss a data file's key range never
  * loads for that file's tasks — partition-localized churn stays
  * local at 100 TB. */
private[engine] final case class EqDeleteSpec(
    files: Seq[EqDeleteFile],
    readFunc: PartitionedFile => Iterator[InternalRow],
    keyOrdinals: Seq[Int],
    keyTypes: Seq[DataType],
    keyIds: Seq[Int],
    keyITypes: Seq[graft.core.IType]) {

  /** Can this delete file's keys touch rows in a data file with
    * `dataStats`? Missing stats on either side keep it.
    *
    * NULL keys are matched NULL-SAFELY by the tuple path (an MV's
    * null-extended group key is a legitimate delete target), and a
    * NULL key value is invisible to min/max bounds — so a column may
    * also match when the delete file carries NULL key values and the
    * data file may contain NULLs. Without this arm, a delete row like
    * `(2, 'A', NULL)` was range-gated by the non-null rows sharing its
    * file ('q'..'y' vs 'p'..'p' → provably disjoint → never loaded),
    * silently stranding the stored null-keyed row. */
  def mightApply(f: EqDeleteFile, dataStats: Map[Int, Manifests.ColumnStats]): Boolean =
    keyIds.zip(keyITypes).forall { case (id, t) =>
      (f.stats.get(id), dataStats.get(id)) match {
        case (Some(a), Some(b)) =>
          StatsPruning.rangesOverlap(a, b, t) ||
            (a.nullCount.forall(_ > 0L) && !b.nullCount.contains(0L))
        case _ => true
      }
    }
}

private[engine] final case class PosDeleteSpec(
    files: Seq[(String, Long, Long)],
    readFunc: PartitionedFile => Iterator[InternalRow])

final class GraftMorScan(
    spark: SparkSession,
    coreSchema: Schema,
    tableSchema: StructType,
    listing: Seq[Manifests.DataFile],
    keeper: Seq[Filter] => Manifests.DataFile => Boolean,
    pushed: Seq[Filter],
    required: StructType,
    spjSpec: Option[graft.core.PartitionSpec] = None)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  @volatile private var current: Seq[Manifests.DataFile] = listing

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Manifest-derived size/row statistics AFTER static pruning — free
    * at plan time (the commit recorded them), and what lets Catalyst
    * auto-broadcast a small merge-on-read table: without this a V2
    * scan defaults to "unknown = huge" and a dim table carrying one
    * delete file silently loses broadcastability. Row count is the
    * pre-delete upper bound (delete subtraction is a read-time
    * property); size is raw parquet bytes, matching what the stock
    * FileScan reports for the delete-free path. */
  override def estimateStatistics(): Statistics = {
    val datas = current.filterNot(_.isDeleteFile)
    val bytes = datas.map(_.sizeBytes).sum
    val rows = datas.map(_.recordCount).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }
  override def description(): String =
    s"GraftMorScan[files=${listing.count(!_.isDeleteFile)}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** Every OUTPUT data column participates: [[StatsPruning]] evaluates
    * any of them against manifest stats and partition transforms, so a
    * runtime filter on any column can only shrink the listing.
    * (Restricted to the pruned output — Spark resolves these against
    * the scan relation's attributes.) */
  override def filterAttributes(): Array[NamedReference] = {
    val dataCols = tableSchema.fieldNames.toSet
    required.fieldNames.filter(dataCols).map(Expressions.column)
  }

  /** Runtime (DPP) filters: prune the file listing driver-side before
    * [[planInputPartitions]] re-plans. Conservative like the static
    * path — unknown shapes keep files; delete files always survive. */
  override def filter(filters: Array[Filter]): Unit = {
    val kept = current.filter(keeper(filters.toSeq))
    GraftMorScan.lastRuntimePrune = Some(GraftMorScan.PruneInfo(
      kept.count(!_.isDeleteFile), listing.count(!_.isDeleteFile)))
    current = kept
  }

  // ------------------------------------------------- storage-partitioned join
  /** Identity-partition key grouping for storage-partitioned joins:
    * when `spark.sql.sources.v2.bucketing.enabled` is set and the
    * table's default spec is all identity/bucket, every storage partition
    * becomes ONE Spark partition carrying its typed partition tuple
    * (`HasPartitionKey`), and the scan reports KeyGroupedPartitioning —
    * two tables partitioned the same way then JOIN WITHOUT ANY
    * SHUFFLE, the single biggest join lever at 100 TB (co-located
    * fact-fact joins; Iceberg's SPJ shape). Groups are computed from
    * the STATIC post-pushdown listing so the reported key set never
    * shifts under runtime filtering (a runtime-pruned group plans as
    * an empty partition rather than vanishing). Any unparseable
    * partition value (legacy files, unsupported source type) falls
    * back to the normal bin-packed layout.
    *
    * TRADEOFF (why this is opt-in via the conf, same as Iceberg's
    * preserve-data-grouping): while enabled, EVERY scan of an eligible
    * table plans one unsplit task per storage partition and reads
    * through this scan instead of the stock columnar delegate — for
    * non-join queries that caps parallelism at the partition count.
    * Enable it per-session around co-partitioned join workloads (the
    * conf is read at plan time, so `SET` toggles it query-by-query);
    * leave it off for scan-heavy sessions. */
  private lazy val spjGroups
      : Option[(Array[org.apache.spark.sql.connector.expressions.Expression],
                Seq[(InternalRow, Seq[Manifests.DataFile])])] = {
    spjSpec.filter(_ => GraftSpj.enabled(spark))
      .filter(GraftSpj.supportedSpec)
      .flatMap { sp =>
        val srcs = sp.fields.map(f => coreSchema.fieldById(f.sourceId))
        if (srcs.exists(_.isEmpty)) None
        else try {
          val fields = sp.fields.zip(srcs.map(_.get))
          val exprs = fields.map { case (pf, s) =>
            (pf.transform match {
              case graft.core.Transform.Bucket(n) =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .bucket(n, s.name)
              case _ =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .identity(s.name)
            }): org.apache.spark.sql.connector.expressions.Expression }
          val grouped = listing.filterNot(_.isDeleteFile)
            .groupBy(f => fields.map { case (pf, s) =>
              GraftMorScan.partitionKeyValue(
                f.partition.getOrElse(pf.name,
                  throw new IllegalArgumentException(s"no tuple value ${pf.name}")),
                pf.transform.resultType(s.fieldType))
            })
            .toSeq.sortBy(_._1.map(String.valueOf(_)).mkString("|"))
            .map { case (vals, fs) =>
              (new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                vals.toArray[Any]): InternalRow, fs)
            }
          if (grouped.isEmpty) None else Some((exprs.toArray, grouped))
        } catch { case _: Exception => None }
      }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjGroups match {
      case Some((exprs, groups)) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(exprs, groups.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  override def planInputPartitions(): Array[InputPartition] = {
    spjGroups match {
      case Some((_, groups)) =>
        val keep = current.filterNot(_.isDeleteFile).map(_.path).toSet
        val kept = groups.iterator.map(_._2.count(f => keep(f.path))).sum
        GraftMorScan.lastPlannedFiles = Some(kept)
        GraftMorScan.plannedFilesCumulative.addAndGet(kept.toLong)
        return groups.map { case (key, fs) =>
          GraftKeyedInputPartition(
            fs.filter(f => keep(f.path)).map(f => GraftFileSlice(
              f.path, f.sizeBytes, f.seq, 0L, f.sizeBytes, f.stats)),
            key): InputPartition
        }.toArray
      case None => ()
    }
    val datas = current.filterNot(_.isDeleteFile)
    GraftMorScan.lastPlannedFiles = Some(datas.size)
    GraftMorScan.plannedFilesCumulative.addAndGet(datas.size.toLong)
    val (maxSplit, openCost) = GraftShims.fileSplitConf(spark)
    val slices = datas.flatMap { f =>
      if (f.sizeBytes <= maxSplit)
        Seq(GraftFileSlice(f.path, f.sizeBytes, f.seq, 0L, f.sizeBytes, f.stats))
      else (0L until f.sizeBytes by maxSplit).map(off => GraftFileSlice(
        f.path, f.sizeBytes, f.seq, off,
        math.min(maxSplit, f.sizeBytes - off), f.stats))
    }
    // Spark's own FilePartition packing: largest-first, greedy fill
    val parts = Seq.newBuilder[InputPartition]
    val bin = scala.collection.mutable.ArrayBuffer.empty[GraftFileSlice]
    var binBytes = 0L
    slices.sortBy(-_.length).foreach { s =>
      val cost = s.length + openCost
      if (bin.nonEmpty && binBytes + cost > maxSplit) {
        parts += GraftInputPartition(bin.toSeq); bin.clear(); binBytes = 0L
      }
      bin += s; binBytes += cost
    }
    if (bin.nonEmpty) parts += GraftInputPartition(bin.toSeq)
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory

  /** Driver-side reader plan, built once: the parquet open function,
    * the output projection template, the residual predicate, and the
    * delete-file specs. Deletes are never runtime-pruned, so this is
    * stable across [[filter]] calls. */
  private lazy val factory: GraftReaderFactory = {
    val byName = tableSchema.fields.map(f => f.name -> f).toMap
    val deletes = listing.filter(_.isDeleteFile)
    val posFiles = deletes.filter(_.isPositionDeleteFile)

    // equality-delete groups: key columns resolve against the CURRENT
    // schema by field id (rename-safe); legacy manifests recorded names
    val eqGroups = deletes.filterNot(_.isPositionDeleteFile)
      .groupBy(f => (f.equalityIds, f.equalityColumns)).toSeq
      .sortBy(_._1.toString)
      .map { case ((ids, legacyNames), dfiles) =>
        val keyFields =
          if (ids.nonEmpty) ids.map(id => coreSchema.fieldById(id).getOrElse(
            sys.error(s"equality-delete key field id $id missing from schema")))
          else legacyNames.map(n => coreSchema.fieldByName(n).getOrElse(
            sys.error(s"equality-delete key column $n missing from schema")))
        (keyFields, dfiles)
      }

    val requiredData = required.fields.filter(f =>
      f.name != GraftTable.FileCol && f.name != GraftTable.PosCol)
    val needPos = required.fieldNames.contains(GraftTable.PosCol) || posFiles.nonEmpty
    // parquet read set: requested data columns ∪ equality keys ∪ filter
    // columns (residual evaluation), plus the row-index column when
    // positions matter — all id-stamped from the table schema
    val extraNames = (eqGroups.flatMap(_._1.map(_.name)) ++
      pushed.flatMap(_.references.toSeq).filterNot(_.contains('.'))).distinct
    val dataColNames = (requiredData.map(_.name) ++
      extraNames.filter(byName.contains)).distinct
    val dataFields = dataColNames.map(byName)
    val parquetOut = StructType(
      dataFields ++ (if (needPos)
        Seq(StructField(GraftShims.rowIndexColumnName, LongType)) else Nil))
    val ordinalOf = parquetOut.fieldNames.zipWithIndex.toMap
    val rowIdxOrdinal = if (needPos) parquetOut.length - 1 else -1

    val readFunc = GraftShims.parquetReadFunc(spark, parquetOut, parquetOut, Nil)

    // output projection template over JoinedRow(parquetRow, [filePath])
    val outputExprs: Seq[Expression] = required.fields.toSeq.map { f =>
      f.name match {
        case GraftTable.FileCol =>
          BoundReference(parquetOut.length, StringType, nullable = false)
        case GraftTable.PosCol =>
          BoundReference(rowIdxOrdinal, LongType, nullable = false)
        case n => BoundReference(ordinalOf(n), f.dataType, f.nullable)
      }
    }

    val residual: Option[Expression] =
      if (pushed.isEmpty) None
      else FilterBridge.translateAll(pushed.toArray).map(c =>
        GraftShims.boundExpressions(spark, parquetOut, Seq(c)).head)

    val eqSpecs = eqGroups.map { case (keyFields, dfiles) =>
      val delSchema = StructType(keyFields.map(f =>
        StructField(f.name, SchemaBridge.toSpark(f.fieldType), nullable = true,
          SchemaBridge.fieldIdMetadata(f.id))))
      EqDeleteSpec(
        dfiles.map(f => EqDeleteFile(f.path, f.sizeBytes, f.seq, f.stats)),
        GraftShims.parquetReadFunc(spark, delSchema, delSchema, Nil),
        keyFields.map(f => ordinalOf(f.name)),
        delSchema.fields.map(_.dataType).toSeq,
        keyFields.map(_.id),
        keyFields.map(_.fieldType))
    }
    val posSpec =
      if (posFiles.isEmpty) None
      else Some(PosDeleteSpec(
        posFiles.map(f => (f.path, f.sizeBytes, f.seq)),
        GraftShims.parquetReadFunc(
          spark, GraftTable.PosDeleteSchema, GraftTable.PosDeleteSchema, Nil)))

    new GraftReaderFactory(readFunc, parquetOut.length, outputExprs, residual,
      eqSpecs, posSpec, rowIdxOrdinal)
  }
}

object GraftMorScan {
  /** Runtime-filter observability: data files kept vs the statically-
    * planned total — the observable half of MERGE runtime pruning. */
  final case class PruneInfo(kept: Int, total: Int)
  @volatile var lastRuntimePrune: Option[PruneInfo] = None
  /** Data-file count of the most recent planInputPartitions call. */
  @volatile var lastPlannedFiles: Option[Int] = None
  /** Cumulative data-file count across ALL planInputPartitions calls
    * this JVM — lets a spec bound the files a multi-scan operation
    * (e.g. one MV refresh tick) actually planned, where the
    * last-call-only counter would under-report. Test observability;
    * reset before the window you mean to measure. */
  val plannedFilesCumulative = new java.util.concurrent.atomic.AtomicLong

  /** Cumulative executor-side delete-set loads (cache misses) this JVM
    * — the observable half of equality-delete file pruning, exported
    * into the bench harness output so delete-prune efficacy is visible
    * per run. */
  def deleteCacheLoads: Long = GraftDeleteCache.loads.get()

  /** Manifest partition-tuple string → catalyst value for the
    * HasPartitionKey row (inverse of ParquetBatchWrite.render).
    * Unsupported source types throw — the caller falls back to the
    * non-SPJ layout. */
  private[engine] def partitionKeyValue(s: String, t: graft.core.IType): Any = {
    import graft.core.IType._
    if (s == "__HIVE_DEFAULT_PARTITION__") null
    else t match {
      case TInt => s.toInt
      case TLong => s.toLong
      case TString => UTF8String.fromString(s)
      case TDate => java.time.LocalDate.parse(s).toEpochDay.toInt
      case TBoolean => s.toBoolean
      case TDouble => s.toDouble
      case TFloat => s.toFloat
      case other => throw new IllegalArgumentException(
        s"SPJ unsupported partition source type ${other.wireName}")
    }
  }
}

/** Executor-side reader: streams each slice through the shared parquet
  * open function, drops rows the residual predicate rejects, drops
  * deleted rows (position sets by row index, equality sets by key
  * tuple), and projects to the scan's output schema (lineage columns
  * synthesized from the slice path + row index). */
private[engine] final class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    parquetArity: Int,
    outputExprs: Seq[Expression],
    residual: Option[Expression],
    eqSpecs: Seq[EqDeleteSpec],
    posSpec: Option[PosDeleteSpec],
    rowIdxOrdinal: Int)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val slices = p.asInstanceOf[GraftSlicedPartition].slices.iterator
      private val proj = GraftShims.unsafeProjection(outputExprs)
      private val pred = residual.map(GraftShims.basePredicate).orNull
      private val joined = new JoinedRow
      private var st: SliceState = _
      private var out: InternalRow = _

      private final class SliceState(s: GraftFileSlice) {
        val rows: Iterator[InternalRow] =
          readFunc(GraftShims.partitionedFile(s.path, s.start, s.length, s.fileSize))
        val fileRow = new GenericInternalRow(Array[Any](UTF8String.fromString(s.path)))
        /** equality sets whose sequence is strictly above this file's
          * AND whose key bounds can touch this file's key range */
        val eq: Seq[(Seq[Int], Seq[DataType], Seq[java.util.HashSet[AnyRef]])] =
          eqSpecs.flatMap { g =>
            val sets = g.files
              .filter(f => f.seq > s.seq && g.mightApply(f, s.stats))
              .map(f => GraftDeleteCache.eqTuples(f.path, f.size, g.readFunc, g.keyTypes))
            if (sets.isEmpty) None else Some((g.keyOrdinals, g.keyTypes, sets))
          }
        /** position sets addressing THIS file, sequence ≥ the file's.
          * Unlike the equality path there is no bounds-based FILE
          * pruning here: pos-delete `file_path` bounds record the
          * scan-time URI form (scheme-divergent from manifest paths)
          * and real paths exceed the 64-char bound cap anyway, so the
          * per-executor cache is the load bound; at 100 TB pos-delete
          * files are partition-scoped by the writer. */
        val pos: Seq[java.util.HashSet[java.lang.Long]] = posSpec.toSeq.flatMap { pd =>
          val key = GraftDeleteCache.fileKey(s.path)
          pd.files.filter(_._3 >= s.seq).flatMap(f =>
            Option(GraftDeleteCache.posMap(f._1, f._2, pd.readFunc).get(key)))
        }
        def keep(r: InternalRow): Boolean = {
          if (pred != null && !pred.eval(r)) return false
          if (pos.nonEmpty) {
            val ix = r.getLong(rowIdxOrdinal)
            if (pos.exists(_.contains(ix))) return false
          }
          var i = 0
          while (i < eq.length) {
            val (ords, types, sets) = eq(i)
            val tuple = GraftDeleteCache.tuple(r, ords, types)
            if (sets.exists(_.contains(tuple))) return false
            i += 1
          }
          true
        }
      }

      override def next(): Boolean = {
        while (true) {
          if (st == null) {
            if (!slices.hasNext) return false
            st = new SliceState(slices.next())
          }
          while (st.rows.hasNext) {
            val r = st.rows.next()
            if (st.keep(r)) { out = proj(joined(r, st.fileRow)); return true }
          }
          st = null
        }
        false
      }
      override def get(): InternalRow = out
      override def close(): Unit = ()
    }
}

/** Executor-level cache of materialized delete sets, keyed by delete
  * file path (delete files are immutable once committed). Soft
  * references: under memory pressure a set reloads instead of OOMing.
  * At 100 TB, delete files are partition-scoped by the writer, so a
  * task's applicable sets stay bounded by its partition's churn. */
private[engine] object GraftDeleteCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[AnyRef]]()

  /** Actual (non-cache-hit) delete-set loads — the observable half of
    * equality-delete FILE pruning in specs (local mode: one JVM). */
  val loads = new java.util.concurrent.atomic.AtomicLong(0)

  private def getOrLoad[T <: AnyRef](key: String)(load: => T): T = {
    val ref = cache.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = load
      cache.put(key, new java.lang.ref.SoftReference[AnyRef](v))
      v
    }
  }

  /** Key a file by its FULL path with any scheme/authority stripped:
    * position-delete `file_path` strings may carry a different URI form
    * than manifest paths (`file:/x` vs `/x` vs `file:///x`), but the
    * path component itself is identical — TaskWriter records the data
    * file's scan path verbatim (see its naming invariant). Matching the
    * whole path (not a name suffix) keeps deletes correct under any
    * future nested/hive-style layout or cross-job name reuse. */
  def fileKey(p: String): String = {
    val i = p.indexOf("://")
    if (i > 0) {
      // scheme://authority/path → /path (authority is table-constant)
      val rest = p.substring(i + 3)
      val slash = rest.indexOf('/')
      if (slash < 0) rest else rest.substring(slash)
    } else if (p.startsWith("file:")) p.substring(5)
    else p
  }

  /** Key tuple of `r` at `ords`, normalized so tuple equality matches
    * SQL `<=>`: null elements compare equal, -0.0 folds onto 0.0 (NaN
    * already self-equal under boxed equality). */
  def tuple(r: InternalRow, ords: Seq[Int], types: Seq[DataType]): List[Any] = {
    val b = List.newBuilder[Any]
    var i = 0
    while (i < ords.length) {
      b += norm(if (r.isNullAt(ords(i))) null else r.get(ords(i), types(i)))
      i += 1
    }
    b.result()
  }

  private def norm(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0d => java.lang.Double.valueOf(0.0d)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    // binary keys: arrays compare by REFERENCE in java collections —
    // wrap as Seq[Byte] so tuple equality/hashing see the content
    case b: Array[Byte] => b.toSeq
    case other => other
  }

  def eqTuples(
      path: String, size: Long,
      readFunc: PartitionedFile => Iterator[InternalRow],
      types: Seq[DataType]): java.util.HashSet[AnyRef] =
    getOrLoad("eq:" + path) {
      loads.incrementAndGet()
      val set = new java.util.HashSet[AnyRef]()
      val ords = types.indices.toSeq
      readFunc(GraftShims.partitionedFile(path, 0L, size, size)).foreach { r =>
        // rows from the reader are reused buffers — copy before keeping
        set.add(tuple(r.copy(), ords, types))
      }
      set
    }

  def posMap(
      path: String, size: Long,
      readFunc: PartitionedFile => Iterator[InternalRow])
      : java.util.HashMap[String, java.util.HashSet[java.lang.Long]] =
    getOrLoad("pos:" + path) {
      val m = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
      readFunc(GraftShims.partitionedFile(path, 0L, size, size)).foreach { r =>
        val fk = fileKey(r.getUTF8String(0).toString)
        m.computeIfAbsent(fk, _ => new java.util.HashSet[java.lang.Long]())
          .add(java.lang.Long.valueOf(r.getLong(1)))
      }
      m
    }
}
