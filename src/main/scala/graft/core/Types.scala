package graft.core

/** Iceberg-style column type system (pure Scala, no Spark dependency).
  *
  * Models the schema surface described in SURVEY.md §1.3: primitives
  * (boolean, int, long, float, double, decimal, date, time,
  * timestamp/timestamptz, string, uuid, fixed, binary) and nested types
  * (struct, list, map), with per-field ids. Wire strings follow the
  * public Iceberg spec (e.g. "decimal(10, 2)", "fixed[16]").
  * Reference behavior: /root/reference/crates/iceberg-ext/src/catalog/rest/table.rs:332-358
  * (JSON field form) — re-expressed from scratch.
  */
sealed trait IType {
  /** Iceberg wire name; nested types serialize as JSON objects. */
  def wireName: String
  def isPrimitive: Boolean = this.isInstanceOf[PrimitiveType]
}

sealed abstract class PrimitiveType(val wireName: String) extends IType

object IType {
  case object TBoolean extends PrimitiveType("boolean")
  case object TInt extends PrimitiveType("int")
  case object TLong extends PrimitiveType("long")
  case object TFloat extends PrimitiveType("float")
  case object TDouble extends PrimitiveType("double")
  final case class TDecimal(precision: Int, scale: Int)
      extends PrimitiveType(s"decimal($precision, $scale)")
  case object TDate extends PrimitiveType("date")
  case object TTime extends PrimitiveType("time")
  case object TTimestamp extends PrimitiveType("timestamp")
  case object TTimestamptz extends PrimitiveType("timestamptz")
  case object TString extends PrimitiveType("string")
  case object TUuid extends PrimitiveType("uuid")
  final case class TFixed(length: Int) extends PrimitiveType(s"fixed[$length]")
  case object TBinary extends PrimitiveType("binary")

  final case class TStruct(fields: Seq[NestedField]) extends IType {
    val wireName = "struct"
    def fieldById(id: Int): Option[NestedField] = {
      def search(fs: Seq[NestedField]): Option[NestedField] =
        fs.collectFirst { case f if f.id == id => f }.orElse(
          fs.iterator.flatMap(f => childrenOf(f.fieldType)).toSeq match {
            case Nil => None
            case cs => search(cs)
          })
      search(fields)
    }
    private def childrenOf(t: IType): Seq[NestedField] = t match {
      case TStruct(fs) => fs
      case TList(_, elem, _) => childrenOf(elem)
      case TMap(_, k, _, v, _) => childrenOf(k) ++ childrenOf(v)
      case _ => Nil
    }
    /** Highest field id anywhere in this struct (nested included). */
    def maxFieldId: Int = {
      def walk(t: IType): Int = t match {
        case TStruct(fs) => (0 +: fs.map(f => math.max(f.id, walk(f.fieldType)))).max
        case TList(id, e, _) => math.max(id, walk(e))
        case TMap(kid, k, vid, v, _) => Seq(kid, vid, walk(k), walk(v)).max
        case _ => 0
      }
      walk(this)
    }
  }
  final case class TList(elementId: Int, element: IType, elementRequired: Boolean)
      extends IType { val wireName = "list" }
  final case class TMap(keyId: Int, key: IType, valueId: Int, value: IType,
      valueRequired: Boolean) extends IType { val wireName = "map" }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  /** Parse a primitive wire name ("int", "decimal(10, 2)", …). */
  def parsePrimitive(s: String): Either[String, PrimitiveType] = s match {
    case "boolean" => Right(TBoolean)
    case "int" | "integer" => Right(TInt)
    case "long" => Right(TLong)
    case "float" => Right(TFloat)
    case "double" => Right(TDouble)
    case "date" => Right(TDate)
    case "time" => Right(TTime)
    case "timestamp" => Right(TTimestamp)
    case "timestamptz" => Right(TTimestamptz)
    case "string" => Right(TString)
    case "uuid" => Right(TUuid)
    case "binary" => Right(TBinary)
    case DecimalRe(p, sc) => Right(TDecimal(p.toInt, sc.toInt))
    case FixedRe(n) => Right(TFixed(n.toInt))
    case other => Left(s"unknown primitive type: $other")
  }
}

/** A named, id'd field of a struct/schema. */
final case class NestedField(
    id: Int,
    name: String,
    required: Boolean,
    fieldType: IType,
    doc: Option[String] = None)

object NestedField {
  def required(id: Int, name: String, t: IType): NestedField =
    NestedField(id, name, required = true, t)
  def optional(id: Int, name: String, t: IType): NestedField =
    NestedField(id, name, required = false, t)
}

/** A versioned schema: a struct plus identifier field ids.
  *
  * Identity rule (structural): two schemas are "the same" when the
  * struct AND the identifier-field-id set match, ignoring schema-id —
  * mirrors the reference's schema dedup-on-add behavior
  * (iceberg-ext/src/spec/table_metadata.rs:22-27).
  */
final case class Schema(
    schemaId: Int,
    fields: Seq[NestedField],
    identifierFieldIds: Set[Int] = Set.empty) {

  def struct: IType.TStruct = IType.TStruct(fields)

  def sameStructure(other: Schema): Boolean =
    fields == other.fields && identifierFieldIds == other.identifierFieldIds

  def fieldById(id: Int): Option[NestedField] = struct.fieldById(id)

  def fieldByName(name: String): Option[NestedField] =
    fields.find(_.name == name)

  /** Highest field id used anywhere (for last_column_id bookkeeping). */
  def maxFieldId: Int = struct.maxFieldId
}
