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
    index: PartitioningAwareFileIndex)
    extends v2.parquet.ParquetTable(
      tableName,
      spark,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()),
      paths,
      Some(tableSchema),
      classOf[parquet.ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex = index
}
