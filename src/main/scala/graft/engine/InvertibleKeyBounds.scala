package graft.engine

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Cast, Divide, Expression, Floor, IntegralDivide,
  Literal, RuntimeReplaceable, TruncDate, TruncTimestamp, UnixTimestamp,
  WidthBucket, Year}
import org.apache.spark.sql.types.{
  ByteType, DateType, DecimalType, DoubleType, FloatType, IntegerType,
  LongType, ShortType, StringType, TimestampType}
import org.apache.spark.sql.{sources => S}

/** Inverse-bounds registry for the expression-keyed MV rebuild tier
  * (r16, closing r15's one weak item): a `GROUP BY <bucketing-expr>`
  * MV's refresh tick knows which expression VALUES are touched, but no
  * stored column carries the expression — so r15 full-scanned the
  * source every tick. For MONOTONE bucketings the premise is too
  * pessimistic: a touched `date_trunc('day', ts)` value `d` implies
  * `ts ∈ [d, d+1day)`, and the touched tuple's min/max therefore map
  * to SOURCE-COLUMN bounds that [[GraftTable.scanStatsPruned]] can
  * consume — an hourly time-bucketed MV over 100 TB (the most common
  * MV in practice) reads a few touched hours' files per tick, never
  * the table.
  *
  * Every inversion here is a closed-interval SUPERSET, padded past any
  * time-zone/DST skew (a day bucket can span 25 local hours; a cast-
  * to-date bucket's instants shift by the session zone's offset) —
  * pruning only NARROWS the file listing, and the tick's row-level
  * exactness gate remains the null-safe semi on the expression tuple.
  * Tightness is deliberately traded away: skipping 364 of 366 days'
  * files is the win; one extra bucket's files on each side is noise.
  *
  * All registry expressions are null-preserving with non-null literal
  * arguments (`date_trunc(fmt, NULL) = NULL`, `NULL div n = NULL`,
  * `year(NULL) = NULL`), so a NULL touched value corresponds exactly
  * to NULL source rows — the caller ORs `IsNull(column)` in.
  * Opaque expressions (`length(s)`-class) return None and keep the
  * documented full scan.
  */
object InvertibleKeyBounds {

  /** One invertible group expression: the single source column it
    * buckets, and a builder from the touched tuples' (min, max)
    * EXTERNAL values to a manifest-stats Filter every contributing
    * row's source column must satisfy. Returns None when the values
    * don't convert (never guess — no pruning is always sound). */
  final case class Inversion(
      column: String,
      bounds: (Any, Any) => Option[S.Filter])

  /** Seconds-domain pads. Sub-day truncation buckets are at most
    * unit + 2h of instants wide under any DST transition; day-and-up
    * buckets at most the calendar width + 1 day. The LOW side gets the
    * same slack: zone-offset resolution at DST gaps can only move a
    * truncated instant below its rows, but the pad costs nothing and
    * closes the argument for every historical LMT offset. */
  private val SubDayPad = 3L * 3600
  private val DayPad = 86400L

  /** Bucket widths (upper bounds, in seconds) for timestamp
    * truncation units, as `date_trunc` spells them. */
  private def truncWidthSeconds(fmt: String): Option[Long] =
    fmt.toLowerCase(java.util.Locale.ROOT) match {
      case "microsecond" | "millisecond" | "second" => Some(2L)
      case "minute" => Some(62L)
      case "hour" => Some(3700L)
      case "day" | "dd" => Some(26L * 3600)
      case "week" => Some(8L * 86400)
      case "month" | "mon" | "mm" => Some(32L * 86400)
      case "quarter" => Some(93L * 86400)
      case "year" | "yyyy" | "yy" => Some(367L * 86400)
      case _ => None
    }

  /** Bucket widths (upper bounds, in DAYS) for date truncation — the
    * `trunc(date, fmt)` unit set; dates are zone-free so no DST pad. */
  private def truncWidthDays(fmt: String): Option[Long] =
    fmt.toLowerCase(java.util.Locale.ROOT) match {
      case "week" => Some(7L)
      case "month" | "mon" | "mm" => Some(31L)
      case "quarter" => Some(92L)
      case "year" | "yyyy" | "yy" => Some(366L)
      case _ => None
    }

  // ------------------------------------------------ value conversion
  private def toInstant(v: Any): Option[java.time.Instant] = v match {
    case i: java.time.Instant => Some(i)
    case ts: java.sql.Timestamp => Some(ts.toInstant)
    case l: java.time.LocalDateTime => Some(l.toInstant(java.time.ZoneOffset.UTC))
    case _ => None
  }

  private def toEpochDay(v: Any): Option[Long] = v match {
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case n: Number => Some(n.longValue())
    case _ => None
  }

  private def toBigDec(v: Any): Option[java.math.BigDecimal] = v match {
    case d: java.math.BigDecimal => Some(d)
    case d: BigDecimal => Some(d.bigDecimal)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None
      else Some(java.math.BigDecimal.valueOf(d))
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None
      else Some(new java.math.BigDecimal(f.toString))
    case n: Number => Some(java.math.BigDecimal.valueOf(n.longValue()))
    case _ => None
  }

  private def between(column: String, lo: Any, hi: Any): S.Filter =
    S.And(S.GreaterThanOrEqual(column, lo), S.LessThanOrEqual(column, hi))

  /** Timestamp-column bounds: [minInstant − lowPad, maxInstant +
    * width + lowPad], closed. */
  private def instantBounds(
      column: String, widthSec: Long, lowPadSec: Long)(mn: Any, mx: Any): Option[S.Filter] =
    for { lo <- toInstant(mn); hi <- toInstant(mx) } yield between(
      column,
      lo.minusSeconds(lowPadSec),
      hi.plusSeconds(widthSec + lowPadSec))

  /** Date-column bounds in whole days (zone-free, exact). */
  private def dateBounds(column: String, widthDays: Long)(mn: Any, mx: Any): Option[S.Filter] =
    for { lo <- toEpochDay(mn); hi <- toEpochDay(mx) } yield between(
      column,
      java.time.LocalDate.ofEpochDay(lo),
      java.time.LocalDate.ofEpochDay(hi + widthDays))

  private def isNumeric(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  /** A positive numeric literal's exact decimal value. Sees through
    * the analyzer's type-coercion Casts (r17: `floor(x / 3600)` wraps
    * both operands in cast-to-double at ANALYSIS time; constant
    * folding only runs in the optimizer) by evaluating any foldable
    * deterministic subtree driver-side. */
  private def posLit(e: Expression): Option[java.math.BigDecimal] =
    foldableValue(e).filter(_.signum > 0)

  /** Any-sign foldable numeric value (width_bucket's lo may be ≤ 0). */
  private def numLit(e: Expression): Option[java.math.BigDecimal] =
    foldableValue(e)

  private def foldableValue(e: Expression): Option[java.math.BigDecimal] = e match {
    case Literal(v, _) => toBigDec(v)
    case _ if e.foldable && e.deterministic =>
      scala.util.Try(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
        .toOption.flatMap(v => Option(v)).flatMap(toBigDec)
    case _ => None
  }

  // ------------------------------------------------------- registry
  /** Group expression → inversion, or None (opaque: caller keeps the
    * full scan for this key; other keys may still prune). */
  def invert(e: Expression): Option[Inversion] = e match {
    // plain pass-through attribute (a mixed attr+expr key set): the
    // identity bucketing, exact bounds
    case a: AttributeReference =>
      Some(Inversion(a.name, (mn, mx) => Some(between(a.name, mn, mx))))

    // runtime-replaceable wrappers (`to_date(ts)` → cast-to-date, and
    // friends) are SEMANTICALLY their replacement — the analyzer keeps
    // the wrapper (ReplaceExpressions runs in the optimizer), so
    // invert through it (r17). Sound because the replacement computes
    // the identical value; recursion terminates because replacements
    // are spelled in concrete expressions.
    case r: RuntimeReplaceable => invert(r.replacement)

    // date_trunc(fmt, ts): ts ∈ [v, v + width)
    case TruncTimestamp(Literal(fmt, StringType), a: AttributeReference, _)
        if fmt != null && a.dataType == TimestampType =>
      truncWidthSeconds(fmt.toString).map { w =>
        Inversion(a.name, instantBounds(a.name, w,
          if (w >= 26L * 3600) DayPad else SubDayPad))
      }

    // trunc(date, fmt): date ∈ [v, v + widthDays]
    case TruncDate(a: AttributeReference, Literal(fmt, StringType))
        if fmt != null && a.dataType == DateType =>
      truncWidthDays(fmt.toString).map { w =>
        Inversion(a.name, dateBounds(a.name, w))
      }

    // CAST(ts AS DATE): day bucketing in the session zone — instants
    // of date d sit within [d ± zone offset]; ±1 day covers any zone
    case Cast(a: AttributeReference, DateType, _, _)
        if a.dataType == TimestampType =>
      Some(Inversion(a.name, (mn, mx) =>
        for { lo <- toEpochDay(mn); hi <- toEpochDay(mx) } yield between(
          a.name,
          java.time.LocalDate.ofEpochDay(lo - 1)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant,
          java.time.LocalDate.ofEpochDay(hi + 2)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant)))

    // year(x): calendar-year bucketing
    case Year(a: AttributeReference) if a.dataType == DateType =>
      Some(Inversion(a.name, (mn, mx) =>
        for { lo <- yearToInt(mn); hi <- yearToInt(mx) } yield between(
          a.name,
          java.time.LocalDate.of(lo, 1, 1),
          java.time.LocalDate.of(hi + 1, 1, 1))))
    case Year(a: AttributeReference) if a.dataType == TimestampType =>
      Some(Inversion(a.name, (mn, mx) =>
        for { lo <- yearToInt(mn); hi <- yearToInt(mx) } yield between(
          a.name,
          java.time.LocalDate.of(lo, 1, 1)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.minusSeconds(DayPad),
          java.time.LocalDate.of(hi + 1, 1, 1)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.plusSeconds(DayPad))))

    // floor(x / n), n > 0 literal: x ∈ [v·n, (v+1)·n] — widened one
    // bucket each side against FP boundary noise
    case Floor(Divide(a: AttributeReference, d, _))
        if isNumeric(a) && posLit(d).isDefined =>
      val n = posLit(d).get
      Some(Inversion(a.name, (mn, mx) =>
        for { lo <- toBigDec(mn); hi <- toBigDec(mx) } yield numericBetween(
          a, lo.multiply(n).subtract(n),
          hi.add(java.math.BigDecimal.ONE).multiply(n).add(n))))

    // floor(x): x ∈ [v, v + 1]
    case Floor(a: AttributeReference) if isNumeric(a) =>
      Some(Inversion(a.name, (mn, mx) =>
        for { lo <- toBigDec(mn); hi <- toBigDec(mx) } yield numericBetween(
          a, lo.subtract(java.math.BigDecimal.ONE),
          hi.add(java.math.BigDecimal.valueOf(2)))))

    // x div n, n > 0 literal: integral division truncates TOWARD ZERO
    // (floor for positives, ceil for negatives) — [(v−1)·n, (v+1)·n]
    // covers both directions
    case IntegralDivide(a: AttributeReference, d, _)
        if isNumeric(a) && posLit(d).isDefined =>
      val n = posLit(d).get
      Some(Inversion(a.name, (mn, mx) =>
        for { lo <- toBigDec(mn); hi <- toBigDec(mx) } yield numericBetween(
          a, lo.subtract(java.math.BigDecimal.ONE).multiply(n),
          hi.add(java.math.BigDecimal.ONE).multiply(n))))

    // unix_timestamp(ts) div n  /  floor(unix_timestamp(ts) / n):
    // epoch-second time buckets (r17) — ts ∈ [(v−1)·n, (v+2)·n]
    // seconds, one bucket of slack each side covering both truncation
    // directions, clamped to the micros-representable Instant domain
    // (an overflowed bound could land INSIDE the data and un-keep
    // files; clamping keeps the interval a superset)
    case IntegralDivide(u, d, _)
        if unixSecondsOf(u).isDefined && posLit(d).isDefined =>
      val a = unixSecondsOf(u).get
      Some(Inversion(a.name, epochSecondBucketBounds(a.name, posLit(d).get)))
    case Floor(Divide(u, d, _))
        if unixSecondsOf(u).isDefined && posLit(d).isDefined =>
      val a = unixSecondsOf(u).get
      Some(Inversion(a.name, epochSecondBucketBounds(a.name, posLit(d).get)))

    // width_bucket(x, lo, hi, n), literal ascending bounds (r17):
    // bucket i ∈ [1, n] holds [lo + (i−1)·w, lo + i·w), w = (hi−lo)/n;
    // bucket 0 is everything below lo (no lower bound expressible),
    // n+1 everything ≥ hi (no upper bound) — one-sided filters there,
    // None when both sides are open. One bucket of slack each side.
    case WidthBucket(v, loE, hiE, nE) =>
      val attr = v match {
        case a: AttributeReference if isNumeric(a) => Some(a)
        // coercion cast is EXACT only for ≤32-bit integrals and float
        // (a long/decimal column's cast-to-double can round by more
        // than the ±1-bucket pad near 2^63 — those keep the full scan)
        case Cast(a: AttributeReference, DoubleType, _, _)
            if a.dataType == ByteType || a.dataType == ShortType ||
              a.dataType == IntegerType || a.dataType == FloatType => Some(a)
        case _ => None
      }
      (attr, numLit(loE), numLit(hiE), posLit(nE)) match {
        case (Some(a), Some(blo), Some(bhi), Some(bn))
            if bhi.compareTo(blo) > 0 && bn.signum > 0 =>
          val w = bhi.subtract(blo).divide(bn, java.math.MathContext.DECIMAL128)
          Some(Inversion(a.name, (mn, mx) =>
            (toBigDec(mn), toBigDec(mx)) match {
              case (Some(lo), Some(hi)) =>
                val lowSide = if (lo.compareTo(java.math.BigDecimal.ONE) >= 0)
                  Some(blo.add(
                    lo.subtract(java.math.BigDecimal.valueOf(2)).multiply(w)))
                else None
                val highSide = if (hi.compareTo(bn) <= 0)
                  Some(blo.add(hi.add(java.math.BigDecimal.ONE).multiply(w)))
                else None
                (lowSide, highSide) match {
                  case (Some(l), Some(h)) => Some(numericBetween(a, l, h))
                  case (Some(l), None) => Some(numericLowBound(a, l))
                  case (None, Some(h)) => Some(numericHighBound(a, h))
                  case _ => None
                }
              case _ => None
            }))
        case _ => None
      }

    case _ => None
  }

  /** Unwrap a seconds-since-epoch view of a timestamp column:
    * `unix_timestamp(ts)` — the format argument is irrelevant for a
    * timestamp input (seconds truncation, monotone). */
  private def unixSecondsOf(e: Expression): Option[AttributeReference] = e match {
    case ut: UnixTimestamp => ut.timeExp match {
      case a: AttributeReference if a.dataType == TimestampType => Some(a)
      case _ => None
    }
    // the analyzer's numeric-widening cast around the long seconds
    // (e.g. `unix_timestamp(ts) / 3600` casts to double) — exact for
    // any epoch-seconds value, monotone either way
    case Cast(inner, LongType | DoubleType | _: DecimalType, _, _) =>
      unixSecondsOf(inner)
    case _ => None
  }

  private def epochSecondBucketBounds(column: String, n: java.math.BigDecimal)(
      mn: Any, mx: Any): Option[S.Filter] =
    for { lo <- toBigDec(mn); hi <- toBigDec(mx) } yield between(
      column,
      instantAtSecondsClamped(
        lo.subtract(java.math.BigDecimal.ONE).multiply(n),
        java.math.RoundingMode.FLOOR),
      instantAtSecondsClamped(
        hi.add(java.math.BigDecimal.valueOf(2)).multiply(n),
        java.math.RoundingMode.CEILING))

  /** Clamped to the INT64-micros-representable range (the table
    * format's timestamp domain), never the wider Instant.MIN/MAX — a
    * bound the scan layer can't convert must still stay OUTSIDE the
    * data range. */
  private def instantAtSecondsClamped(
      s: java.math.BigDecimal, rm: java.math.RoundingMode): java.time.Instant = {
    val v = s.setScale(0, rm)
    val minS = java.math.BigDecimal.valueOf(Long.MinValue / 1000000L + 1)
    val maxS = java.math.BigDecimal.valueOf(Long.MaxValue / 1000000L - 1)
    java.time.Instant.ofEpochSecond(v.max(minS).min(maxS).longValue())
  }

  private def yearToInt(v: Any): Option[Int] = v match {
    case n: Number => Some(n.intValue())
    case _ => None
  }

  /** Numeric bounds rendered in the source column's own domain —
    * whole-number widened (FLOOR low, CEILING high: strictly outward,
    * so integral columns compare exactly and fractional ones keep a
    * superset). */
  /** One-sided variants of [[numericBetween]] (r17, the width_bucket
    * edge buckets): same outward widening and long-CLAMP discipline. */
  private def numericLowBound(
      a: AttributeReference, lo: java.math.BigDecimal): S.Filter =
    S.GreaterThanOrEqual(a.name,
      renderNumeric(a, lo.setScale(0, java.math.RoundingMode.FLOOR)))

  private def numericHighBound(
      a: AttributeReference, hi: java.math.BigDecimal): S.Filter =
    S.LessThanOrEqual(a.name,
      renderNumeric(a, hi.setScale(0, java.math.RoundingMode.CEILING)))

  /** A widened decimal rendered in the column's own domain (the
    * long-CLAMP rationale lives at [[numericBetween]]). */
  private def renderNumeric(a: AttributeReference, v: java.math.BigDecimal): Any =
    a.dataType match {
      case FloatType | DoubleType => java.lang.Double.valueOf(v.doubleValue())
      case _: DecimalType => v
      case _ =>
        val minL = java.math.BigDecimal.valueOf(Long.MinValue)
        val maxL = java.math.BigDecimal.valueOf(Long.MaxValue)
        java.lang.Long.valueOf(v.max(minL).min(maxL).longValue())
    }

  private def numericBetween(
      a: AttributeReference,
      lo: java.math.BigDecimal, hi: java.math.BigDecimal): S.Filter = {
    val loW = lo.setScale(0, java.math.RoundingMode.FLOOR)
    val hiW = hi.setScale(0, java.math.RoundingMode.CEILING)
    a.dataType match {
      case FloatType | DoubleType =>
        between(a.name, java.lang.Double.valueOf(loW.doubleValue()),
          java.lang.Double.valueOf(hiW.doubleValue()))
      case _: DecimalType => between(a.name, loW, hiW)
      case _ =>
        // CLAMP, never wrap: BigDecimal.longValue() of an
        // out-of-range value wraps modulo 2^64, which could move a
        // bound INSIDE the data range and un-keep files (correctness,
        // not tightness). Long.{Min,Max} keep the interval a superset.
        val minL = java.math.BigDecimal.valueOf(Long.MinValue)
        val maxL = java.math.BigDecimal.valueOf(Long.MaxValue)
        between(a.name,
          java.lang.Long.valueOf(loW.max(minL).min(maxL).longValue()),
          java.lang.Long.valueOf(hiW.max(minL).min(maxL).longValue()))
    }
  }
}
