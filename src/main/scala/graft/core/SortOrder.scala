package graft.core

/** Sort orders (SURVEY.md §1.2: sort_orders map + default_sort_order_id;
  * unsorted order reuses id 0 — table_metadata.rs:538-600).
  */
sealed trait SortDirection { def wireName: String }
object SortDirection {
  case object Asc extends SortDirection { val wireName = "asc" }
  case object Desc extends SortDirection { val wireName = "desc" }
  def parse(s: String): Either[String, SortDirection] = s match {
    case "asc" => Right(Asc)
    case "desc" => Right(Desc)
    case o => Left(s"unknown sort direction: $o")
  }
}

sealed trait NullOrder { def wireName: String }
object NullOrder {
  case object NullsFirst extends NullOrder { val wireName = "nulls-first" }
  case object NullsLast extends NullOrder { val wireName = "nulls-last" }
  def parse(s: String): Either[String, NullOrder] = s match {
    case "nulls-first" => Right(NullsFirst)
    case "nulls-last" => Right(NullsLast)
    case o => Left(s"unknown null order: $o")
  }
}

final case class SortField(
    sourceId: Int,
    transform: Transform,
    direction: SortDirection,
    nullOrder: NullOrder)

final case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def isUnsorted: Boolean = fields.isEmpty

  /** Identity ignores order id (used for dedup-on-add). */
  def sameOrder(other: SortOrder): Boolean = fields == other.fields

  /** Validate all source fields exist and transforms apply. */
  def bind(schema: Schema): Either[String, SortOrder] = {
    for (f <- fields) {
      val src = schema.fieldById(f.sourceId) match {
        case Some(s) => s
        case None => return Left(s"sort source field id ${f.sourceId} not in schema")
      }
      if (!f.transform.canTransform(src.fieldType))
        return Left(s"sort transform ${f.transform.wireName} cannot apply to ${src.name}")
    }
    Right(this)
  }
}

object SortOrder {
  /** The canonical unsorted order: id 0, no fields. */
  val Unsorted: SortOrder = SortOrder(0, Nil)
}
