package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Executor-side column statistics for freshly-written parquet files:
  * the parquet writer already computed per-row-group min/max/null
  * counts; [[fromFooter]] folds them into the per-FILE bounds the
  * manifest records ([[Manifests.ColumnStats]]), read from the footer
  * the task just wrote — no extra data pass, no driver I/O. This is
  * how Iceberg populates manifest `lower_bounds`/`upper_bounds`
  * (writers fold parquet metrics at commit time); here the fold rides
  * the task's commit message.
  *
  * Conservative by construction: a column whose stats are missing,
  * deprecated (INT96), NaN-tainted, non-ASCII, or over-long in ANY row
  * group records no bound (readers treat missing as "might match").
  * Only top-level scalar columns carrying a `parquet.field.id` are
  * considered — nested paths never prune.
  */
object ParquetStats {

  /** Bounds longer than this are dropped rather than truncated: a
    * truncated max would need upper-rounding to stay sound (Iceberg's
    * truncate(16) with increment); whole-value-or-nothing is simpler
    * and loses only long-text pruning, which never prunes well. */
  val MaxBoundLength = 64

  /** Columns beyond this many record no stats — bounds manifest-entry
    * growth on very wide tables. */
  val MaxStatsColumns = 100

  def fromFooter(
      path: String,
      conf: Configuration,
      schema: StructType): Map[Int, Manifests.ColumnStats] = {
    val eligible: Map[String, (Int, DataType)] = schema.fields.iterator
      .take(MaxStatsColumns)
      .filter(_.metadata.contains(SchemaBridge.ParquetFieldId))
      .map(f => f.name ->
        (f.metadata.getLong(SchemaBridge.ParquetFieldId).toInt, f.dataType))
      .toMap
    if (eligible.isEmpty) return Map.empty

    final case class Acc(
        var min: Option[String], var max: Option[String],
        var nulls: Option[Long], var boundsOk: Boolean)
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Acc]

    val in = HadoopInputFile.fromPath(new Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { chunk =>
          val name = chunk.getPath.toDotString
          eligible.get(name).foreach { case (_, dt) =>
            val a = acc.getOrElseUpdate(name, Acc(None, None, Some(0L), boundsOk = true))
            val st = chunk.getStatistics
            if (st == null) { a.boundsOk = false; a.nulls = None }
            else {
              a.nulls =
                if (st.isNumNullsSet) a.nulls.map(_ + st.getNumNulls) else None
              if (st.hasNonNullValue) {
                (render(st.genericGetMin.asInstanceOf[AnyRef], dt),
                  render(st.genericGetMax.asInstanceOf[AnyRef], dt)) match {
                  case (Some(lo), Some(hi)) if a.boundsOk =>
                    a.min = Some(a.min.filter(m => less(m, lo, dt)).getOrElse(lo))
                    a.max = Some(a.max.filter(m => less(hi, m, dt)).getOrElse(hi))
                  case _ => a.boundsOk = false
                }
              }
            }
          }
        }
      }
    } finally reader.close()

    acc.iterator.flatMap { case (name, a) =>
      val (id, _) = eligible(name)
      val (mn, mx) = if (a.boundsOk) (a.min, a.max) else (None, None)
      if (mn.isEmpty && mx.isEmpty && a.nulls.isEmpty) None
      else Some(id -> Manifests.ColumnStats(mn, mx, a.nulls))
    }.toMap
  }

  /** Footer-typed min/max → the canonical string domain
    * [[StatsPruning]] compares in. None = unusable (drop bounds). */
  private def render(v: AnyRef, dt: DataType): Option[String] = (v, dt) match {
    case (i: java.lang.Integer, IntegerType | ShortType | ByteType | DateType) =>
      Some(i.toString) // DateType: epoch-day ordinal
    case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) =>
      Some(l.toString) // timestamps only when written as INT64 micros
    case (f: java.lang.Float, FloatType) if !f.isNaN => Some(f.toString)
    case (d: java.lang.Double, DoubleType) if !d.isNaN => Some(d.toString)
    case (b: Binary, StringType) =>
      val s = b.toStringUsingUTF8
      // ASCII-only: parquet orders UTF-8 bytes, Java orders UTF-16
      // units; they agree on ASCII, diverge beyond the BMP
      if (s.length <= MaxBoundLength && s.forall(_ < 128)) Some(s) else None
    case (b: java.lang.Boolean, BooleanType) => Some(b.toString)
    // decimals: parquet stores the unscaled value as INT32/INT64/binary
    // depending on precision; canonical form is the plain decimal
    // string (TPC-H predicates — l_discount BETWEEN, l_quantity < —
    // live on decimal columns, so these bounds carry the flagship
    // pruning wins)
    case (i: java.lang.Integer, d: DecimalType) =>
      Some(java.math.BigDecimal.valueOf(i.longValue(), d.scale).toPlainString)
    case (l: java.lang.Long, d: DecimalType) =>
      Some(java.math.BigDecimal.valueOf(l.longValue(), d.scale).toPlainString)
    case (b: Binary, d: DecimalType) =>
      Some(new java.math.BigDecimal(
        new java.math.BigInteger(b.getBytes), d.scale).toPlainString)
    case _ => None
  }

  /** Strict order in the canonical domain (both values rendered). */
  private def less(a: String, b: String, dt: DataType): Boolean = dt match {
    case IntegerType | ShortType | ByteType | DateType | LongType |
         TimestampType | TimestampNTZType => a.toLong < b.toLong
    case FloatType | DoubleType => a.toDouble < b.toDouble
    case StringType => a.compareTo(b) < 0
    case BooleanType => !a.toBoolean && b.toBoolean
    case _: DecimalType =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) < 0
    case _ => false
  }
}
