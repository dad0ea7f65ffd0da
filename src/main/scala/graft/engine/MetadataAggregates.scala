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

  final case class Answered(functions: Seq[String], files: Int, groups: Int)

  /** Last aggregation answered from manifests — spec observation point. */
  @volatile var lastAnswered: Option[Answered] = None

  val ConfKey = "spark.graft.aggregatePushdown"

  def enabled: Boolean =
    SparkSession.active.conf.get(ConfKey, "true").toBoolean

  /** One resolved aggregate function: its output field and a fold over
    * a file group. `eval` returns None to DECLINE (missing stats);
    * a present result may still be the SQL NULL (empty min/max). */
  private final case class AggFold(
      field: StructField, name: String,
      eval: Seq[Manifests.DataFile] => Option[Any])

  /** Try to answer `agg` from `listing`'s stats. Some = the exact
    * result: the scan's output schema (group columns first, then one
    * field per aggregate, in order), its result rows (one per group;
    * exactly one for the global case), and the answered function names
    * (for the scan's EXPLAIN description).
    *
    * GROUP BY is answerable when every group column is an IDENTITY
    * partition column in every spec that names it (`specs`): each data
    * file then carries the exact group value in its partition tuple —
    * `SELECT day, count(*) ... GROUP BY day` over 100 TB is a fold
    * over the listing, one output row per partition value, zero file
    * reads. Any file missing the tuple key (pre-evolution files) or a
    * name that was ever a non-identity transform declines. */
  def plan(
      schema: Schema,
      specs: Iterable[graft.core.PartitionSpec],
      listing: Seq[Manifests.DataFile],
      agg: Aggregation): Option[(StructType, Array[InternalRow], Seq[String])] = {
    if (!enabled) return None
    if (agg.aggregateExpressions.isEmpty && agg.groupByExpressions.isEmpty)
      return None
    if (listing.exists(_.isDeleteFile)) return None

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

    def countCol(id: Int, datas: Seq[Manifests.DataFile]): Option[Long] =
      datas.foldLeft(Option(0L)) { (acc, f) =>
        acc.flatMap(n => f.stats.get(id).flatMap(_.nullCount)
          .map(nulls => n + f.recordCount - nulls))
      }

    // fold one bound across files; None = some file's bound is missing
    // and the file can't be proven valueless; Some(None) = no values
    def extreme(id: Int, t: IType, wantMin: Boolean,
        datas: Seq[Manifests.DataFile]): Option[Option[Any]] =
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

    // ---- aggregate functions → per-group folds (all-or-nothing)
    val folds: Option[Seq[AggFold]] =
      agg.aggregateExpressions.foldLeft(Option(Vector.empty[AggFold])) {
        (acc, fn) => acc.flatMap { fs =>
          fn match {
            case _: CountStar => Some(fs :+ AggFold(
              StructField("count_star", LongType, nullable = false), "count(*)",
              datas => Some(java.lang.Long.valueOf(
                datas.iterator.map(_.recordCount).sum))))
            case c: Count if !c.isDistinct =>
              anyCol(c.column).map { case (id, _, _) => fs :+ AggFold(
                StructField("count", LongType, nullable = false),
                s"count(${c.column})",
                datas => countCol(id, datas).map(java.lang.Long.valueOf)) }
            case m: Min =>
              col(m.column).map { case (id, t, dt) => fs :+ AggFold(
                StructField("min", dt, nullable = true), s"min(${m.column})",
                datas => extreme(id, t, wantMin = true, datas)
                  .map(_.map(internal(_, t)).orNull)) }
            case m: Max =>
              col(m.column).map { case (id, t, dt) => fs :+ AggFold(
                StructField("max", dt, nullable = true), s"max(${m.column})",
                datas => extreme(id, t, wantMin = false, datas)
                  .map(_.map(internal(_, t)).orNull)) }
            case _ => None
          }
        }
      }

    // ---- group columns → identity partition-tuple keys
    final case class GroupCol(pname: String, t: IType, dt: DataType)
    val allSpecFields = specs.flatMap(_.fields).toSeq
    val groupCols: Option[Seq[GroupCol]] =
      agg.groupByExpressions.foldLeft(Option(Vector.empty[GroupCol])) {
        (acc, e) => acc.flatMap { cols =>
          e match {
            case r: NamedReference if r.fieldNames.length == 1 =>
              schema.fieldByName(r.fieldNames()(0)).flatMap { f =>
                val idNames = allSpecFields.filter(pf =>
                  pf.sourceId == f.id &&
                    pf.transform == graft.core.Transform.Identity)
                  .map(_.name).distinct
                idNames match {
                  // the name must ALWAYS have meant identity-on-this-
                  // column: a name that was ever a different transform
                  // (or source) can carry non-identity rendered values
                  // in files written under the older spec
                  case Seq(pname) if allSpecFields.filter(_.name == pname)
                    .forall(pf => pf.sourceId == f.id &&
                      pf.transform == graft.core.Transform.Identity) &&
                    groupKeyExact(f.fieldType) =>
                    Some(cols :+ GroupCol(
                      pname, f.fieldType, SchemaBridge.toSpark(f.fieldType)))
                  case _ => None
                }
              }
            case _ => None
          }
        }
      }

    // ---- file groups: Nil key = the global fold (one row even when
    // empty); grouped keys come from partition tuples (zero-row files
    // contribute no group, matching a real scan's empty-group absence)
    def fileGroups(cols: Seq[GroupCol])
        : Option[Seq[(Seq[String], Seq[Manifests.DataFile])]] =
      if (cols.isEmpty) Some(Seq(Nil -> listing))
      else {
        val datas = listing.filter(_.recordCount > 0)
        val allKeyed = datas.forall(f =>
          cols.forall(c => f.partition.contains(c.pname)))
        // a STRING value equal to the null marker is indistinguishable
        // from a genuine null — decline rather than conflate
        val ambiguous = cols.exists(c => c.t == IType.TString &&
          datas.exists(_.partition.get(c.pname).contains(NullMarker)))
        if (!allKeyed || ambiguous) None
        else Some(datas.groupBy(f => cols.map(c => f.partition(c.pname)))
          .toSeq.sortBy(_._1.mkString("\u0000")))
      }

    for {
      fs <- folds
      cols <- groupCols
      groups <- fileGroups(cols)
      rows <- groups.foldLeft(Option(Vector.empty[InternalRow])) {
        (acc, kv) => acc.flatMap { rs =>
          val (key, datas) = kv
          fs.foldLeft(Option(Vector.empty[Any])) { (vacc, fold) =>
            vacc.flatMap(vs => fold.eval(datas).map(vs :+ _))
          }.map { aggVals =>
            val keyVals = cols.zip(key).map { case (c, s) =>
              GraftMorScan.partitionKeyValue(s, c.t)
            }
            rs :+ new GenericInternalRow((keyVals ++ aggVals).toArray)
          }
        }
      }
    } yield {
      val groupFields = cols.zipWithIndex.map { case (c, i) =>
        StructField(s"group_$i", c.dt, nullable = true)
      }
      val funcNames = fs.map(_.name)
      lastAnswered = Some(Answered(funcNames, listing.size, groups.size))
      (StructType(groupFields ++ fs.map(_.field)), rows.toArray, funcNames)
    }
  }

  /** The partition-tuple null marker ([[ParquetBatchWrite]] rendering). */
  private val NullMarker = "__HIVE_DEFAULT_PARTITION__"

  /** Types whose rendered partition values round-trip exactly through
    * [[GraftMorScan.partitionKeyValue]] (the SPJ-proven inverse). */
  private def groupKeyExact(t: IType): Boolean = t match {
    case TInt | TLong | TString | TDate | TBoolean => true
    case _ => false
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
