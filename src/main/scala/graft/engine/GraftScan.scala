package graft.engine

import graft.core.Schema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Pushdown-capable scan over a snapshot's file listing, built on the
  * engine's delete-applying read ([[GraftTable.readFiles]]).
  *
  * Used wherever the plain parquet-table delegate can't serve the read:
  *  - snapshots with outstanding merge-on-read delete files (the scan
  *    is an anti-join plan, not a bare file list), and
  *  - row-level operation scans (MERGE/UPDATE/DELETE), which must also
  *    surface the `_file`/`_pos` row-lineage metadata columns that form
  *    the SupportsDelta row id.
  *
  * Data-side filters COMMUTE with the delete anti-joins (a row deleted
  * by key/position is deleted regardless of any predicate on its other
  * columns), so accepted filters are applied to the inner DataFrame,
  * where Catalyst pushes them through the joins down to the parquet
  * scan (`PushedFilters` on the inner plan — predicate pushdown does
  * not die with a MoR snapshot). Column pruning selects only the
  * requested columns; the inner planner then prunes the parquet reader
  * to requested ∪ delete-key ∪ `_metadata` columns.
  */
final class GraftScanBuilder(
    coreSchema: Schema,
    listing: Seq[Manifests.DataFile],
    /** pushed filters → file keeper: the listing is pruned by manifest
      * column stats + partition tuples before any file is read
      * ([[StatsPruning]]); delete files always survive */
    keeper: Seq[Filter] => Manifests.DataFile => Boolean = _ => _ => true)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val tableSchema = SchemaBridge.toSpark(coreSchema)
  private val lineageFields = Seq(
    StructField(GraftTable.FileCol, StringType, nullable = false),
    StructField(GraftTable.PosCol, LongType, nullable = false))

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f => FilterBridge.translate(f).isDefined)
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

  override def build(): Scan = new V1Scan {
    private val out = required
    private val filters = pushed.toSeq
    override def readSchema(): StructType = out
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: org.apache.spark.sql.SQLContext): T =
      (new BaseRelation with TableScan {
        override def sqlContext: org.apache.spark.sql.SQLContext = context
        override def schema: StructType = out
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
          val spark = SparkSession.active
          val needsLineage = out.fieldNames.exists(n =>
            n == GraftTable.FileCol || n == GraftTable.PosCol)
          val kept =
            if (filters.isEmpty) listing else listing.filter(keeper(filters))
          var df = GraftTable.readFiles(spark, coreSchema, kept,
            lineage = needsLineage)
          filters.flatMap(FilterBridge.translate).foreach(c => df = df.filter(c))
          df.select(out.fieldNames.toIndexedSeq.map(col): _*).rdd
        }
      }).asInstanceOf[T]
  }
}
