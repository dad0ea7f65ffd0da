package graft.engine

import graft.core.{IType, NestedField, PartitionSpec, Schema, Transform}
import org.apache.spark.sql.sources._

/** Plan-time file skipping: decide from a data file's manifest entry —
  * per-column min/max/null-count stats ([[Manifests.ColumnStats]]) plus
  * its partition tuple — whether the file CAN contain a row matching a
  * pushed predicate. This is the stats half of Iceberg's scan planning
  * (manifests carry `lower_bounds`/`upper_bounds`/`null_value_counts`;
  * the planner evaluates pushed filters against them before any data
  * I/O). At 100 TB a selective predicate touches the handful of files
  * whose ranges overlap, not every footer in the table.
  *
  * Everything here is CONSERVATIVE: "true" means "might match, read
  * the file"; only provably-impossible files are skipped. Unknown
  * columns, missing stats, unparseable bounds, and untranslated
  * predicate shapes all keep the file. Spark re-evaluates every
  * predicate on the rows it reads, so skipping is pure I/O savings —
  * never a correctness lever.
  *
  * Partition pruning rides the same evaluation: identity-partition
  * values act as exact min=max bounds, and non-identity transforms
  * (bucket/truncate/year/month/day/hour) are applied to predicate
  * literals with the spec-conformant [[graft.core.Transform]] algebra —
  * equality prunes through any transform, ranges prune through the
  * monotonic ones. (Reference context: the catalog's partition specs,
  * partition_binder.rs, exist precisely so engines can plan this way.)
  */
object StatsPruning {

  /** The writer's rendering of a NULL partition value
    * ([[ParquetBatchWrite.render]]); all listed transforms are
    * null-preserving, so a sentinel value means the SOURCE column is
    * null for every row in the file. */
  val NullSentinel = "__HIVE_DEFAULT_PARTITION__"

  /** One partition field usable for pruning: where its value comes
    * from (`sourceId`) and how it was derived. */
  final case class PartField(name: String, sourceId: Int, transform: Transform)

  /** Name-keyed partition fields across ALL of a table's specs (files
    * written under old specs keep their tuples; the file's own tuple
    * keys select which entries apply). A name bound to conflicting
    * definitions across specs is dropped — no pruning on it. Void
    * fields never prune (their value is null regardless of source). */
  def partFields(specs: Iterable[PartitionSpec]): Map[String, PartField] = {
    val all = specs.flatMap(_.fields).toSeq
      .filter(_.transform != Transform.Void)
      .map(f => PartField(f.name, f.sourceId, f.transform))
    all.groupBy(_.name).collect {
      case (name, fs) if fs.distinct.size == 1 => name -> fs.head
    }
  }

  /** A predicate over files: true = read. Delete files always ride
    * along (they subtract rows; the data files they apply to decide
    * relevance). `filters` combine as AND. */
  def keeper(
      schema: Schema,
      parts: Map[String, PartField],
      filters: Seq[Filter]): Manifests.DataFile => Boolean =
    if (filters.isEmpty) _ => true
    else {
      val byId = parts.values.groupBy(_.sourceId)
      f => f.isDeleteFile ||
        filters.forall(mightMatch(_, f, schema, byId))
    }

  // ------------------------------------------------------ evaluation
  private def mightMatch(
      filter: Filter, file: Manifests.DataFile, schema: Schema,
      partsBySource: Map[Int, Iterable[PartField]]): Boolean = {
    def recur(f: Filter): Boolean = f match {
      case And(l, r) => recur(l) && recur(r)
      case Or(l, r) => recur(l) || recur(r)
      case EqualTo(a, v) => v != null && mightEqual(a, v)
      case EqualNullSafe(a, null) => mightHaveNull(a)
      case EqualNullSafe(a, v) => mightEqual(a, v)
      case In(a, vs) =>
        vs != null && vs.exists(v => v != null && mightEqual(a, v))
      case GreaterThan(a, v) => v != null && mightBeyond(a, v, Gt)
      case GreaterThanOrEqual(a, v) => v != null && mightBeyond(a, v, Ge)
      case LessThan(a, v) => v != null && mightBeyond(a, v, Lt)
      case LessThanOrEqual(a, v) => v != null && mightBeyond(a, v, Le)
      case IsNull(a) => mightHaveNull(a)
      case IsNotNull(a) => mightHaveNonNull(a)
      case StringStartsWith(a, p) => p != null && mightStartWith(a, p)
      case _ => true // Not/EndsWith/Contains/…: no sound range rule
    }

    def field(a: String): Option[NestedField] = schema.fieldByName(a)

    /** min/max/null information for `a` in this file: manifest stats
      * when recorded, identity-partition value as exact fallback. */
    def bounds(fld: NestedField): Bounds = {
      val identity = partsBySource.getOrElse(fld.id, Nil)
        .find(_.transform == Transform.Identity)
        .flatMap(pf => file.partition.get(pf.name))
      file.stats.get(fld.id) match {
        case Some(cs) =>
          Bounds(cs.min, cs.max, cs.nullCount, file.recordCount)
        case None => identity match {
          case Some(NullSentinel) =>
            Bounds(None, None, Some(file.recordCount), file.recordCount)
          case Some(v) =>
            val c = canonicalPartition(v, fld.fieldType)
            Bounds(c, c, Some(0L), file.recordCount)
          case None => Bounds(None, None, None, file.recordCount)
        }
      }
    }

    /** Non-identity transform check: can a row with `a = v` live in
      * this file's partition? Equality prunes through ANY transform;
      * untransformable values keep the file. */
    def transformAllows(fld: NestedField, v: Any): Boolean =
      partsBySource.getOrElse(fld.id, Nil)
        .filter(_.transform != Transform.Identity)
        .forall { pf =>
          file.partition.get(pf.name) match {
            case None => true
            case Some(NullSentinel) => false // whole file has null source
            case Some(pv) =>
              applyTransform(pf.transform, v, fld.fieldType)
                .forall(_ == pv)
          }
        }

    def mightEqual(a: String, v: Any): Boolean = field(a).forall { fld =>
      val b = bounds(fld)
      if (b.allNull) false
      else {
        val inRange =
          b.min.flatMap(cmp(_, v, fld.fieldType)).forall(_ <= 0) &&
          b.max.flatMap(cmp(_, v, fld.fieldType)).forall(_ >= 0)
        inRange && transformAllows(fld, v)
      }
    }

    def mightBeyond(a: String, v: Any, op: Op): Boolean =
      field(a).forall { fld =>
        val b = bounds(fld)
        if (b.allNull) false
        else {
          val statOk = op match {
            // need max > v (resp. >=): a known smaller max prunes
            case Gt => b.max.flatMap(cmp(_, v, fld.fieldType)).forall(_ > 0)
            case Ge => b.max.flatMap(cmp(_, v, fld.fieldType)).forall(_ >= 0)
            case Lt => b.min.flatMap(cmp(_, v, fld.fieldType)).forall(_ < 0)
            case Le => b.min.flatMap(cmp(_, v, fld.fieldType)).forall(_ <= 0)
          }
          statOk && monotonicAllows(fld, v, op)
        }
      }

    /** Range pruning through monotonic transforms: if T is monotone
      * non-decreasing, `a > v` requires the file's partition value
      * T(a) >= T(v) (and dually for <). Bucket is not monotonic. */
    def monotonicAllows(fld: NestedField, v: Any, op: Op): Boolean =
      partsBySource.getOrElse(fld.id, Nil)
        .filter(pf => isMonotonic(pf.transform, fld.fieldType))
        .forall { pf =>
          file.partition.get(pf.name) match {
            case None => true
            case Some(NullSentinel) => false
            case Some(pv) =>
              applyTransform(pf.transform, v, fld.fieldType).forall { tv =>
                val c = cmpTransformed(pv, tv, pf.transform)
                c.forall(x => op match {
                  case Gt | Ge => x >= 0 // partition ordinal at or past T(v)
                  case Lt | Le => x <= 0
                })
              }
          }
        }

    def mightHaveNull(a: String): Boolean = field(a).forall { fld =>
      val b = bounds(fld)
      if (b.noNulls) false
      else partsBySource.getOrElse(fld.id, Nil).forall { pf =>
        file.partition.get(pf.name) match {
          // any null-preserving transform with a non-null partition
          // value means no source row is null
          case Some(pv) => pv == NullSentinel
          case None => true
        }
      }
    }

    def mightHaveNonNull(a: String): Boolean = field(a).forall { fld =>
      !bounds(fld).allNull &&
        partsBySource.getOrElse(fld.id, Nil).forall { pf =>
          file.partition.get(pf.name).forall(_ != NullSentinel)
        }
    }

    def mightStartWith(a: String, p: String): Boolean =
      field(a).forall { fld =>
        val b = bounds(fld)
        if (b.allNull) false
        else {
          // strings with prefix p form [p, next(p)): overlap with
          // [min, max] needs max >= p and prefix_|p|(min) <= p
          val maxOk = b.max.forall(_.compareTo(p) >= 0)
          val minOk = b.min.forall(_.take(p.length).compareTo(p) <= 0)
          maxOk && minOk
        }
      }

    recur(filter)
  }

  /** Conservative range overlap of two columns' CANONICAL stats: false
    * only when both ranges are known and provably disjoint (any
    * missing bound keeps the pair). Used to skip equality-delete files
    * whose key bounds cannot touch a data file's key range. */
  def rangesOverlap(
      a: Manifests.ColumnStats, b: Manifests.ColumnStats, t: IType): Boolean = {
    val aAboveB = for {
      amin <- a.min; bmax <- b.max; c <- cmpStored(amin, bmax, t)
    } yield c > 0
    val aBelowB = for {
      amax <- a.max; bmin <- b.min; c <- cmpStored(amax, bmin, t)
    } yield c < 0
    !(aAboveB.contains(true) || aBelowB.contains(true))
  }

  /** Compare two canonical-domain bound strings. None = incomparable. */
  private def cmpStored(a: String, b: String, t: IType): Option[Int] = t match {
    case IType.TInt | IType.TLong | IType.TTime | IType.TDate |
         IType.TTimestamp | IType.TTimestamptz =>
      for { x <- a.toLongOption; y <- b.toLongOption }
        yield java.lang.Long.compare(x, y)
    case IType.TFloat | IType.TDouble =>
      for { x <- a.toDoubleOption; y <- b.toDoubleOption }
        yield java.lang.Double.compare(x, y)
    case IType.TString | IType.TUuid => Some(a.compareTo(b))
    case _: IType.TDecimal =>
      try Some(new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)))
      catch { case _: NumberFormatException => None }
    case IType.TBoolean =>
      for { x <- a.toBooleanOption; y <- b.toBooleanOption }
        yield java.lang.Boolean.compare(x, y)
    case _ => None
  }

  private sealed trait Op
  private case object Gt extends Op
  private case object Ge extends Op
  private case object Lt extends Op
  private case object Le extends Op

  private final case class Bounds(
      min: Option[String], max: Option[String],
      nullCount: Option[Long], rowCount: Long) {
    def allNull: Boolean = nullCount.contains(rowCount) && rowCount > 0
    def noNulls: Boolean = nullCount.contains(0L)
  }

  // ------------------------------------------------- value plumbing
  /** Partition tuples render dates as ISO strings; stats store
    * epoch-day ordinals. Canonicalize to the stats domain. */
  private def canonicalPartition(v: String, t: IType): Option[String] =
    t match {
      case IType.TDate =>
        try Some(java.time.LocalDate.parse(v).toEpochDay.toString)
        catch { case _: Exception => None }
      case _ => Some(v)
    }

  /** Compare a canonical stored bound against a predicate literal in
    * the column's domain. None = not comparable (no pruning). */
  private def cmp(stored: String, value: Any, t: IType): Option[Int] =
    t match {
      case IType.TInt | IType.TLong | IType.TTime | IType.TDate |
           IType.TTimestamp | IType.TTimestamptz =>
        for {
          s <- stored.toLongOption
          v <- asLong(value, t)
        } yield java.lang.Long.compare(s, v)
      case IType.TFloat | IType.TDouble =>
        for {
          s <- stored.toDoubleOption
          v <- value match {
            case n: Number => Some(n.doubleValue())
            case _ => None
          }
        } yield java.lang.Double.compare(s, v)
      case IType.TString | IType.TUuid => value match {
        case s: String => Some(stored.compareTo(s))
        case _ => None
      }
      case _: IType.TDecimal =>
        try value match {
          case d: java.math.BigDecimal => Some(new java.math.BigDecimal(stored).compareTo(d))
          case d: BigDecimal => Some(BigDecimal(stored).compare(d))
          case _ => None
        } catch { case _: NumberFormatException => None }
      case IType.TBoolean => value match {
        case b: java.lang.Boolean =>
          stored.toBooleanOption.map(s => java.lang.Boolean.compare(s, b))
        case _ => None
      }
      case _ => None
    }

  /** Predicate literal → the column's storage representation (what the
    * transform algebra and bucket hash consume). */
  private def asLong(value: Any, t: IType): Option[Long] = t match {
    case IType.TInt | IType.TLong | IType.TTime => value match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    case IType.TDate => value match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case n: Number => Some(n.longValue())
      case _ => None
    }
    case IType.TTimestamp | IType.TTimestamptz => value match {
      case ts: java.sql.Timestamp =>
        Some(Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      case i: java.time.Instant =>
        Some(Math.addExact(
          Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
      case l: java.time.LocalDateTime =>
        Some(Math.addExact(Math.multiplyExact(
          l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
          l.getNano / 1000L))
      case n: Number => Some(n.longValue())
      case _ => None
    }
    case _ => None
  }

  /** T(v) rendered the way the write path renders partition values
    * (int/long ordinals via toString, truncated strings raw). None =
    * can't evaluate (no pruning). */
  private def applyTransform(t: Transform, v: Any, srcType: IType): Option[String] =
    try t match {
      case b: Transform.Bucket => srcType match {
        case IType.TInt | IType.TLong | IType.TTime =>
          asLong(v, srcType).map(l => b.apply(l).toString)
        case IType.TDate =>
          // dates bucket by their int day ordinal (spec appendix B)
          asLong(v, srcType).map(l => b.apply(l.toInt).toString)
        case IType.TTimestamp | IType.TTimestamptz =>
          asLong(v, srcType).map(l => b.apply(l).toString)
        case IType.TString | IType.TUuid => v match {
          case s: String => Some(b.apply(s).toString)
          case _ => None
        }
        case _ => None
      }
      case tr: Transform.Truncate => srcType match {
        case IType.TInt =>
          asLong(v, srcType).map(l => tr.apply(l.toInt).toString)
        case IType.TLong =>
          asLong(v, srcType).map(l => tr.apply(l).toString)
        case IType.TString => v match {
          case s: String => Some(tr.apply(s).toString)
          case _ => None
        }
        case _ => None
      }
      case tt: Transform.TimeTransform => srcType match {
        case IType.TDate => asLong(v, srcType).map(l => tt.apply(l.toInt).toString)
        case IType.TTimestamp | IType.TTimestamptz =>
          asLong(v, srcType).map(l => tt.apply(l).toString)
        case _ => None
      }
      case _ => None
    } catch { case _: Exception => None }

  /** Is T monotone non-decreasing on this source type (so range
    * predicates carry through)? */
  private def isMonotonic(t: Transform, srcType: IType): Boolean = t match {
    case _: Transform.TimeTransform => true
    case _: Transform.Truncate => srcType match {
      case IType.TInt | IType.TLong | IType.TString => true
      case _ => false
    }
    case _ => false
  }

  /** Compare a file's rendered partition value with a rendered T(v)
    * in the transform's OUTPUT domain. */
  private def cmpTransformed(pv: String, tv: String, t: Transform): Option[Int] =
    t match {
      case Transform.Truncate(_) if !pv.forall(c => c.isDigit || c == '-') =>
        Some(pv.compareTo(tv)) // string truncation: lexical
      case _ =>
        for { p <- pv.toLongOption; v <- tv.toLongOption }
          yield java.lang.Long.compare(p, v)
    }
}
