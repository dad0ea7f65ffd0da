package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg `bucket` transform as a Spark V2 catalog function —
  * what lets the planner UNDERSTAND bucket-partitioned layouts rather
  * than merely compute them: storage-partitioned joins compare the two
  * sides' partition transforms by resolving `bucket(N, col)` through
  * the table catalog's FunctionCatalog, so exposing this (bound to the
  * same spec-conformant Murmur3 as [[IcebergBucket]]) is what turns
  * two bucket(N, id)-partitioned tables into a shuffle-free join.
  * Same hashing, three surfaces: write path ([[IcebergBucket]]
  * expression), metadata transforms ([[graft.core.Transform]]), and
  * now planner function resolution — all pinned equal in specs. */
object IcebergBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): Iceberg Murmur3 bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.size == 2,
      s"bucket expects (numBuckets int, col), got ${inputType.catalogString}")
    val src = inputType.fields(1).dataType
    src match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
           StringType | BinaryType | _: DecimalType => Bound(src)
      case other => throw new UnsupportedOperationException(
        s"bucket cannot be applied to ${other.catalogString}")
    }
  }

  private final case class Bound(src: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, src)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    /** Equality across scan relations is BY THIS NAME — both sides of a
      * storage-partitioned join must produce the same string. */
    override def canonicalName(): String = s"graft.bucket(${src.catalogString})"
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(0) || input.isNullAt(1)) return null
      val n = input.getInt(0)
      src match {
        case IntegerType | DateType => IcebergBucketHelper.bucketInt(input.getInt(1), n)
        case LongType | TimestampType | TimestampNTZType =>
          IcebergBucketHelper.bucketLong(input.getLong(1), n)
        case StringType => IcebergBucketHelper.bucketString(
          input.getUTF8String(1), n)
        case BinaryType => IcebergBucketHelper.bucketBinary(input.getBinary(1), n)
        case d: DecimalType => IcebergBucketHelper.bucketDecimal(
          input.getDecimal(1, d.precision, d.scale), n)
      }
    }
  }
}
