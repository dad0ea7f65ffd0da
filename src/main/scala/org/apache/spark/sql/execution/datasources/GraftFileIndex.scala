package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.sources.Filter

/** A [[PartitioningAwareFileIndex]] backed by a snapshot's MANIFEST
  * listing instead of filesystem walks: paths and sizes come from the
  * commit metadata, so planning a scan costs ZERO driver filesystem
  * calls — no directory listing, no per-file `getFileStatus`, no
  * footer reads. At 100 TB / millions of files the driver-side
  * `InMemoryFileIndex` this replaces is itself a scan bottleneck
  * (one RPC per file on an object store); here the listing is already
  * in memory when the table loads.
  *
  * `listFiles` additionally evaluates the scan's pushed data filters
  * against the manifest's per-file column stats and partition tuples
  * (via the `prune` callback into [[graft.engine.StatsPruning]]), so
  * selective predicates skip whole files AT PLAN TIME — the native
  * `ParquetScan` machinery (vectorized reader, row-group pruning,
  * whole-stage codegen) then runs over only the surviving files.
  * Spark re-evaluates all predicates post-scan; skipping is purely an
  * I/O reduction, mirroring Iceberg's manifest-stats planning.
  */
class GraftFileIndex(
    spark: SparkSession,
    tableName: String,
    files: Seq[(String, Long)],
    prune: Seq[Filter] => (String => Boolean))
    extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

  private val statuses: Seq[FileStatus] = files.map { case (p, len) =>
    new FileStatus(len, false, 1, 134217728L, 0L, new Path(p))
  }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def rootPaths: Seq[Path] = statuses.map(_.getPath.getParent).distinct

  override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] =
    scala.collection.mutable.LinkedHashMap(statuses.map(s => s.getPath -> s): _*)

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val translated = dataFilters.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
    val keep = prune(translated)
    val kept =
      if (translated.isEmpty) statuses
      else statuses.filter(s => keep(s.getPath.toString))
    GraftFileIndex.lastPlanned = Some(
      GraftFileIndex.Planned(tableName, kept.size, statuses.size))
    GraftFileIndex.plannedFilesCumulative.addAndGet(kept.size.toLong)
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def sizeInBytes: Long = files.map(_._2).sum

  override def inputFiles: Array[String] = files.map(_._1).toArray
}

object GraftFileIndex {
  final case class Planned(table: String, kept: Int, total: Int)

  /** Last plan-time pruning decision — a test observation point (specs
    * assert a selective predicate planned a strict subset). */
  @volatile var lastPlanned: Option[Planned] = None

  /** Last RUNTIME (DPP) pruning decision on the delegate scan path. */
  @volatile var lastRuntimePrune: Option[Planned] = None

  /** Cumulative kept-file count across ALL listFiles calls this JVM —
    * the delegate-path twin of GraftMorScan.plannedFilesCumulative,
    * letting a spec bound the files a multi-scan operation planned.
    * Test observability; reset before the measured window. */
  val plannedFilesCumulative = new java.util.concurrent.atomic.AtomicLong
}

/** The stock parquet scan builder, except the built scan understands
  * RUNTIME filters: Spark's dynamic partition pruning plants a
  * subquery filter when this table is the probe side of a join whose
  * build side is selective, and [[GraftRuntimeFilteredScan]] prunes
  * the FILE LISTING with the materialized join keys through manifest
  * stats — the delegate-path sibling of the MoR scan's runtime
  * filtering. (Stock `FileScan` only runtime-filters on hive-style
  * partition columns, which this table deliberately has none of — its
  * pruning dimension is manifest stats.) */
class GraftRuntimeScanBuilder(
    spark: SparkSession,
    index: PartitioningAwareFileIndex,
    tableSchema: org.apache.spark.sql.types.StructType,
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    tableName: String,
    files: Seq[(String, Long)],
    prune: Seq[Filter] => (String => Boolean),
    metaAgg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation =>
      Option[(org.apache.spark.sql.types.StructType,
        Array[org.apache.spark.sql.catalyst.InternalRow], Seq[String])] = _ => None)
    extends v2.parquet.ParquetScanBuilder(
      spark, index, tableSchema, tableSchema, options) {

  /** Manifest-answered aggregation (graft.engine.MetadataAggregates):
    * a bare count/min/max never opens a file — the listing's stats
    * already hold the answer. Guarded on no pushed filters (file-source
    * data filters are re-evaluated post-scan, so Spark won't push
    * aggregates with filters present anyway — belt and braces), else
    * falls through to the stock parquet footer-based pushdown. */
  private var answered: Option[(org.apache.spark.sql.types.StructType,
    Array[org.apache.spark.sql.catalyst.InternalRow], Seq[String])] = None

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    (dataFilters.isEmpty && partitionFilters.isEmpty && metaAgg(agg).isDefined) ||
      super.supportCompletePushDown(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    answered =
      if (dataFilters.isEmpty && partitionFilters.isEmpty) metaAgg(agg) else None
    answered.isDefined || super.pushAggregation(agg)
  }

  override def build(): v2.parquet.ParquetScan = {
    val p = super.build()
    answered match {
      case Some((schema, rows, funcs)) =>
        new GraftMetaAggDelegateScan(p, spark, schema, rows, funcs)
      case None =>
        // stock aggregate pushdown replans the scan shape — leave it stock
        if (p.pushedAggregate.nonEmpty) p
        else new GraftRuntimeFilteredScan(p, spark, tableName, files, prune)
    }
  }
}

/** The scan a manifest-answered aggregation builds on the parquet
  * delegate path: structurally a [[v2.parquet.ParquetScan]] (the
  * builder's return type is narrowed to it) but planned as a
  * [[org.apache.spark.sql.connector.read.LocalScan]] — the strategy
  * turns it into a local table scan of the precomputed result row.
  * ZERO Spark jobs, zero file opens. */
final class GraftMetaAggDelegateScan(
    p: v2.parquet.ParquetScan,
    spark: SparkSession,
    schema: org.apache.spark.sql.types.StructType,
    result: Array[InternalRow],
    funcs: Seq[String])
    extends v2.parquet.ParquetScan(
      spark, p.hadoopConf, p.fileIndex, p.dataSchema, p.readDataSchema,
      p.readPartitionSchema, p.pushedFilters, p.options, p.pushedAggregate,
      p.partitionFilters, p.dataFilters)
    with org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): org.apache.spark.sql.types.StructType = schema
  override def rows(): Array[InternalRow] = result
  override def description(): String =
    s"GraftMetaAggScan[${funcs.mkString(", ")}] (manifest stats, no file reads)"
}

/** [[v2.parquet.ParquetScan]] with [[SupportsRuntimeFiltering]] over
  * the scan's DATA columns: a runtime `In`/range filter prunes the
  * manifest listing (stats + partition tuples via `prune`) and input
  * partitions re-plan over the surviving files — vectorized reading,
  * row-group pruning, and codegen stay stock (reader construction is
  * untouched; only the file listing shrinks). */
final class GraftRuntimeFilteredScan(
    p: v2.parquet.ParquetScan,
    spark: SparkSession,
    tableName: String,
    allFiles: Seq[(String, Long)],
    prune: Seq[Filter] => (String => Boolean))
    extends v2.parquet.ParquetScan(
      spark, p.hadoopConf, p.fileIndex, p.dataSchema, p.readDataSchema,
      p.readPartitionSchema, p.pushedFilters, p.options, p.pushedAggregate,
      p.partitionFilters, p.dataFilters)
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** Pruned re-plan after [[filter]]; None = no runtime filter. */
  @volatile private var pruned: Option[v2.parquet.ParquetScan] = None

  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    pruned.map(_.toBatch.planInputPartitions())
      .getOrElse(super.planInputPartitions())

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    readDataSchema.fieldNames
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    val keep = prune(filters.toSeq)
    val kept = allFiles.filter(f => keep(f._1))
    GraftFileIndex.lastRuntimePrune = Some(
      GraftFileIndex.Planned(tableName, kept.size, allFiles.size))
    pruned = Some(copy(fileIndex =
      new GraftFileIndex(spark, tableName, kept, prune)))
  }
}

/** The builtin V2 parquet table with its file index swapped for the
  * manifest-backed [[GraftFileIndex]]: scans keep the stock
  * `ParquetScanBuilder`/`ParquetScan` path (pushdown, vectorization,
  * codegen) while file enumeration and skipping come from commit
  * metadata. */
class GraftParquetTable(
    tableName: String,
    spark: SparkSession,
    paths: Seq[String],
    tableSchema: org.apache.spark.sql.types.StructType,
    index: PartitioningAwareFileIndex,
    files: Seq[(String, Long)],
    prune: Seq[Filter] => (String => Boolean),
    metaAgg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation =>
      Option[(org.apache.spark.sql.types.StructType,
        Array[org.apache.spark.sql.catalyst.InternalRow], Seq[String])] = _ => None)
    extends v2.parquet.ParquetTable(
      tableName,
      spark,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()),
      paths,
      Some(tableSchema),
      classOf[parquet.ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex = index

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : v2.parquet.ParquetScanBuilder =
    new GraftRuntimeScanBuilder(
      spark, fileIndex, tableSchema, options, tableName, files, prune, metaAgg)
}
