package graft.engine

import graft.core._
import graft.functions.IcebergBucket
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg partition transforms as Spark Columns for the WRITE path:
  * every row's partition tuple is derived with builtin (codegen'd)
  * expressions, except `bucket[N]` which is the native
  * [[graft.functions.IcebergBucket]] Catalyst expression. Values agree
  * with the pure JVM transforms in [[graft.core.Transform]] (epoch
  * ordinals with floor semantics; UTC session time zone).
  */
object PartitionExprs {

  /** Spark column computing `field`'s partition value from source
    * column `src` (with the source's Iceberg type). */
  def partitionValue(transform: Transform, src: Column, sourceType: IType): Column =
    transform match {
      case Transform.Identity => src
      case Transform.Bucket(n) => IcebergBucket.bucket(n, src)
      case Transform.Truncate(w) => sourceType match {
        case IType.TString => substring(src, 1, w)
        case IType.TInt | IType.TLong =>
          // round toward -inf: v - ((v % w + w) % w)
          src - pmod(pmod(src, lit(w)) + lit(w), lit(w))
        case other => throw new IllegalArgumentException(
          s"truncate[$w] write path does not support ${other.wireName}")
      }
      case Transform.Year => year(src) - lit(1970)
      case Transform.Month => (year(src) - lit(1970)) * lit(12) + month(src) - lit(1)
      case Transform.Day => datediff(src.cast("date"), lit("1970-01-01").cast("date"))
      case Transform.Hour => floor(unix_micros(src) / lit(3600000000L)).cast("int")
      case Transform.Void => lit(null)
      case other => throw new IllegalArgumentException(
        s"unsupported write transform: ${other.wireName}")
    }

  /** All partition columns for a bound spec against `schema`, aliased
    * with the spec's field names. */
  def partitionColumns(spec: PartitionSpec, schema: Schema, col: String => Column)
      : Seq[Column] =
    spec.fields.map { f =>
      val source = schema.fieldById(f.sourceId).getOrElse(
        throw new IllegalArgumentException(s"spec source ${f.sourceId} not in schema"))
      partitionValue(f.transform, col(source.name), source.fieldType).as(f.name)
    }
}
