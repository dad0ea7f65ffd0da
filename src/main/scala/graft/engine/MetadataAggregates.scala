package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.IType
import graft.core.IType._
import graft.core.Schema

/** Answers whole aggregation queries from MANIFEST column statistics —
  * `SELECT count(*) / count(c) / min(c) / max(c) FROM t` never opens a
  * data file: the commit already recorded per-file record counts,
  * null counts, and exact value bounds, so the result is a driver-side
  * fold over the snapshot listing. At 100 TB this is the difference
  * between a metadata lookup (milliseconds, zero tasks) and a
  * full-table scan; it is how Iceberg answers `count(*)` from
  * manifests (reference serves the same manifests for engines to do
  * exactly this).
  *
  * Exactness rules — the fold DECLINES (returns None, and the query
  * runs as a normal scan) unless every contributing value is provably
  * exact:
  *  - any outstanding delete file → decline (deletes subtract rows at
  *    read time; manifest counts are pre-delete upper bounds);
  *  - any pushed data filter → decline (row-level predicates are not
  *    evaluable against file-level stats);
  *  - GROUP BY → decline (no per-group stats in manifests);
  *  - `count(c)`: every data file must carry a null count for `c`;
  *  - `min(c)`/`max(c)`: every data file must carry the bound for `c`
  *    — except files recorded as all-null or empty, which provably
  *    contribute nothing. Bounds are whole-value-or-nothing
  *    ([[ParquetStats.MaxBoundLength]] drops, never truncates), so a
  *    present bound IS the file's exact extreme;
  *  - float/double min/max → decline: a file containing NaN may still
  *    record finite bounds (parquet writers skip NaN in stats), while
  *    Spark's ordering ranks NaN above every value — the manifest
  *    answer could differ from the scan answer;
  *  - `count(DISTINCT ...)` and every other function → decline.
  *
  * Disable with `spark.graft.aggregatePushdown=false` (session conf)
  * to force the scan path — the A/B hook the spec uses.
  */
object MetadataAggregates {

  final case class Answered(functions: Seq[String], files: Int)

  /** Last aggregation answered from manifests — spec observation point. */
  @volatile var lastAnswered: Option[Answered] = None

  val ConfKey = "spark.graft.aggregatePushdown"

  def enabled: Boolean =
    SparkSession.active.conf.get(ConfKey, "true").toBoolean

  /** Try to answer `agg` from `listing`'s stats. Some = the exact
    * result: the scan's output schema (one field per aggregate, in
    * order), its single result row, and the answered function names
    * (for the scan's EXPLAIN description). */
  def plan(
      schema: Schema,
      listing: Seq[Manifests.DataFile],
      agg: Aggregation): Option[(StructType, Array[InternalRow], Seq[String])] = {
    if (!enabled) return None
    if (agg.aggregateExpressions.isEmpty) return None
    if (agg.groupByExpressions.nonEmpty) return None
    if (listing.exists(_.isDeleteFile)) return None
    val datas = listing

    // single top-level column; count needs only a null count (any
    // type), min/max additionally need exact-bound types
    def anyCol(e: VExpression): Option[(Int, IType, DataType)] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        schema.fieldByName(r.fieldNames()(0)).map(f =>
          (f.id, f.fieldType, SchemaBridge.toSpark(f.fieldType)))
      case _ => None
    }
    def col(e: VExpression): Option[(Int, IType, DataType)] =
      anyCol(e).filter { case (_, t, _) => boundsExact(t) }

    def countStar: Long = datas.iterator.map(_.recordCount).sum

    def countCol(id: Int): Option[Long] =
      datas.foldLeft(Option(0L)) { (acc, f) =>
        acc.flatMap(n => f.stats.get(id).flatMap(_.nullCount)
          .map(nulls => n + f.recordCount - nulls))
      }

    // fold one bound across files; None = some file's bound is missing
    // and the file can't be proven valueless; Some(None) = no values
    def extreme(id: Int, t: IType, wantMin: Boolean): Option[Option[Any]] =
      datas.foldLeft(Option(Option.empty[Any])) { (acc, f) =>
        acc.flatMap { cur =>
          val st = f.stats.get(id)
          val allNull = st.exists(_.nullCount.contains(f.recordCount))
          if (f.recordCount == 0L || allNull) Some(cur)
          else st.flatMap(s => if (wantMin) s.min else s.max).map { bound =>
            val v = parse(bound, t)
            Some(cur.filter(c => if (wantMin) !lt(v, c, t) else !lt(c, v, t))
              .getOrElse(v))
          }
        }
      }

    val fields = Vector.newBuilder[StructField]
    val values = Vector.newBuilder[Any]
    val names = Vector.newBuilder[String]
    val ok = agg.aggregateExpressions.forall {
      case _: CountStar =>
        fields += StructField("count_star", LongType, nullable = false)
        values += java.lang.Long.valueOf(countStar)
        names += "count(*)"
        true
      case c: Count if !c.isDistinct =>
        anyCol(c.column).flatMap { case (id, _, _) => countCol(id) }.exists { n =>
          fields += StructField("count", LongType, nullable = false)
          values += java.lang.Long.valueOf(n)
          names += s"count(${c.column})"
          true
        }
      case m: Min =>
        col(m.column).flatMap { case (id, t, dt) =>
          extreme(id, t, wantMin = true).map(v => (v, t, dt))
        }.exists { case (v, t, dt) =>
          fields += StructField("min", dt, nullable = true)
          values += v.map(internal(_, t)).orNull
          names += s"min(${m.column})"
          true
        }
      case m: Max =>
        col(m.column).flatMap { case (id, t, dt) =>
          extreme(id, t, wantMin = false).map(v => (v, t, dt))
        }.exists { case (v, t, dt) =>
          fields += StructField("max", dt, nullable = true)
          values += v.map(internal(_, t)).orNull
          names += s"max(${m.column})"
          true
        }
      case _ => false
    }
    if (!ok) None
    else {
      val funcNames = names.result()
      lastAnswered = Some(Answered(funcNames, datas.size))
      Some((StructType(fields.result()),
        Array[InternalRow](new GenericInternalRow(values.result().toArray)),
        funcNames))
    }
  }

  /** Types whose manifest bounds, when present, are the exact file
    * extremes under Spark's ordering ([[ParquetStats.render]] writes
    * whole values only; float/double excluded for NaN, see class doc —
    * they still qualify for null-count-based `count(c)`). */
  private def boundsExact(t: IType): Boolean = t match {
    case TBoolean | TInt | TLong | TDate | TTime | TTimestamp |
         TTimestamptz | TString => true
    case _: TDecimal => true
    case _ => false
  }

  /** Canonical bound string → comparable JVM value (same domain as
    * [[ParquetStats.render]] wrote). */
  private def parse(s: String, t: IType): Any = t match {
    case TInt | TDate => s.toInt
    case TLong | TTime | TTimestamp | TTimestamptz => s.toLong
    case TBoolean => s.toBoolean
    case TString => s
    case _: TDecimal => new java.math.BigDecimal(s)
    case other => throw new IllegalStateException(s"unparseable bound type $other")
  }

  private def lt(a: Any, b: Any, t: IType): Boolean = t match {
    case TInt | TDate => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case TLong | TTime | TTimestamp | TTimestamptz =>
      a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case TBoolean => !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
    case TString => a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) < 0
    case _: TDecimal =>
      a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]) < 0
    case other => throw new IllegalStateException(s"incomparable bound type $other")
  }

  /** Comparable value → Catalyst internal value. */
  private def internal(v: Any, t: IType): Any = t match {
    case TString => UTF8String.fromString(v.asInstanceOf[String])
    case TDecimal(p, s) =>
      Decimal(v.asInstanceOf[java.math.BigDecimal], p, s)
    case _ => v
  }
}

/** The scan a manifest-answered aggregation builds: a [[LocalScan]] —
  * the result rows live on the driver and plan as a local table scan,
  * ZERO Spark jobs and zero file reads. Used directly by
  * [[GraftScanBuilder]] (the MoR/SPJ scan path). */
final class GraftMetaAggScan(
    schema: StructType, result: Array[InternalRow], funcs: Seq[String])
    extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = result
  override def description(): String =
    s"GraftMetaAggScan[${funcs.mkString(", ")}] (manifest stats, no file reads)"
}
