package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._

/** V2 pushdown `Filter`s → DataFrame `Column` predicates — the bridge
  * that lets SQL `DELETE FROM ... WHERE` reuse [[GraftTable.deleteWhere]]
  * (copy-on-write rewrite of the non-matching rows). Translation is
  * total on the filter shapes Spark produces for scalar predicates;
  * anything untranslatable makes `canDeleteWhere` refuse, so Spark
  * surfaces a clean error instead of deleting the wrong rows. */
object FilterBridge {

  def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    case Or(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }

  /** AND of all filters; None when any is untranslatable. Empty input
    * (DELETE with no WHERE) means "everything". */
  def translateAll(filters: Array[Filter]): Option[Column] =
    if (filters.isEmpty) Some(lit(true))
    else {
      val cols = filters.map(translate)
      if (cols.exists(_.isEmpty)) None else Some(cols.flatten.reduce(_ && _))
    }
}
