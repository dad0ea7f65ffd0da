package graft.engine

import graft.core._
import org.apache.spark.sql.types._

/** Iceberg ↔ Spark type bridge (mapping table in SURVEY.md §1.5; field
  * ids live only on the Iceberg side, Spark sees plain StructTypes the
  * way iceberg-spark surfaces them).
  */
object SchemaBridge {
  import IType._

  /** Iceberg field ids travel to Spark as `parquet.field.id` column
    * metadata: the parquet writer stamps them into files
    * (spark.sql.parquet.fieldId.write.enabled) and the reader resolves
    * columns BY ID instead of by name
    * (spark.sql.parquet.fieldId.read.enabled) — Spark's native
    * implementation of Iceberg's id-based column resolution, which is
    * what makes RENAME COLUMN safe without rewriting data files. */
  val ParquetFieldId = "parquet.field.id"

  def fieldIdMetadata(id: Int): Metadata =
    new MetadataBuilder().putLong(ParquetFieldId, id.toLong).build()

  def toSpark(t: IType): DataType = t match {
    case TBoolean => BooleanType
    case TInt => IntegerType
    case TLong => LongType
    case TFloat => FloatType
    case TDouble => DoubleType
    case TDecimal(p, s) => DecimalType(p, s)
    case TDate => DateType
    case TTime => LongType // micros-since-midnight; Spark has no time type
    case TTimestamp => TimestampNTZType
    case TTimestamptz => TimestampType
    case TString => StringType
    case TUuid => StringType // iceberg-spark surfaces uuid as string
    case _: TFixed => BinaryType
    case TBinary => BinaryType
    case TStruct(fields) => StructType(fields.map(f =>
      StructField(f.name, toSpark(f.fieldType), nullable = !f.required,
        metadata = fieldIdMetadata(f.id))))
    case TList(_, elem, req) => ArrayType(toSpark(elem), containsNull = !req)
    case TMap(_, k, _, v, req) =>
      MapType(toSpark(k), toSpark(v), valueContainsNull = !req)
  }

  def toSpark(schema: Schema): StructType =
    toSpark(schema.struct).asInstanceOf[StructType]

  /** Spark → Iceberg type conversion; `id` allocates ids for nested
    * fields/elements (schema evolution passes the table's last-column-id
    * counter so new nested ids never collide with existing ones). */
  def toIcebergType(dt: DataType, id: () => Int): IType = {
    def conv(dt: DataType): IType = dt match {
      case BooleanType => TBoolean
      case ByteType | ShortType | IntegerType => TInt
      case LongType => TLong
      case FloatType => TFloat
      case DoubleType => TDouble
      case d: DecimalType => TDecimal(d.precision, d.scale)
      case DateType => TDate
      case TimestampNTZType => TTimestamp
      case TimestampType => TTimestamptz
      case StringType => TString
      case BinaryType => TBinary
      case s: StructType => TStruct(s.fields.toSeq.map(f => {
        val fid = id()
        NestedField(fid, f.name, !f.nullable, conv(f.dataType))
      }))
      case a: ArrayType => TList(id(), conv(a.elementType), !a.containsNull)
      case m: MapType => TMap(id(), conv(m.keyType), id(), conv(m.valueType),
        !m.valueContainsNull)
      case other =>
        throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    conv(dt)
  }

  /** Spark → Iceberg with depth-first field-id assignment from 1 (the
    * create-table path when the caller starts from a DataFrame). */
  def toIceberg(schema: StructType): Schema = {
    var nextId = 0
    def id(): Int = { nextId += 1; nextId }
    // top-level fields get the first ids, then nested — assign in two
    // passes like Iceberg's fresh-schema assignment
    val fields = schema.fields.toSeq.map { f =>
      val fid = id()
      (fid, f)
    }.map { case (fid, f) =>
      NestedField(fid, f.name, !f.nullable, toIcebergType(f.dataType, id)) }
    Schema(0, fields)
  }
}
