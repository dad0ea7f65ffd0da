package graft.functions

import graft.core.Murmur3
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg `bucket[N]` partition transform as a native Catalyst
  * expression (spec-conformant Murmur3-x86-32 from [[graft.core.Murmur3]],
  * positive-mod to N buckets). `doGenCode` emits a single static call, so
  * the expression stays inside whole-stage codegen — no UDF boundary in
  * the write path that derives partition values for every row.
  *
  * Supported inputs mirror the spec: int/long/date (int days)/
  * timestamp (long micros)/string/binary/decimal.
  */
final case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"iceberg_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
         StringType | BinaryType | _: DecimalType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket cannot be applied to ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType => IcebergBucketHelper.bucketInt(input.asInstanceOf[Int], numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketHelper.bucketLong(input.asInstanceOf[Long], numBuckets)
    case StringType => IcebergBucketHelper.bucketString(input.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => IcebergBucketHelper.bucketBinary(input.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType => IcebergBucketHelper.bucketDecimal(
      input.asInstanceOf[org.apache.spark.sql.types.Decimal], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = IcebergBucketHelper.getClass.getName.stripSuffix("$")
    val fn = child.dataType match {
      case IntegerType | DateType => "bucketInt"
      case LongType | TimestampType | TimestampNTZType => "bucketLong"
      case StringType => "bucketString"
      case BinaryType => "bucketBinary"
      case _: DecimalType => "bucketDecimal"
    }
    defineCodeGen(ctx, ev, c => s"$helper.$fn($c, $numBuckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergBucketHelper {
  def bucketInt(v: Int, n: Int): Int = (Murmur3.hashLong(v.toLong) & Int.MaxValue) % n
  def bucketLong(v: Long, n: Int): Int = (Murmur3.hashLong(v) & Int.MaxValue) % n
  def bucketString(v: UTF8String, n: Int): Int =
    (Murmur3.hashBytes(v.getBytes) & Int.MaxValue) % n
  def bucketBinary(v: Array[Byte], n: Int): Int =
    (Murmur3.hashBytes(v) & Int.MaxValue) % n
  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    (Murmur3.hashBytes(v.toJavaBigDecimal.unscaledValue.toByteArray) & Int.MaxValue) % n
}

object IcebergBucket {
  /** Column form for the DataFrame API. */
  def bucket(n: Int, c: Column): Column =
    GraftShims.column(IcebergBucket(GraftShims.expression(c), n))
}
