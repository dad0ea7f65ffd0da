package graft.engine

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Cast, Divide, Expression, Floor, IntegralDivide,
  Literal, TruncDate, TruncTimestamp, Year}
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

  /** A positive numeric literal's exact decimal value. */
  private def posLit(e: Expression): Option[java.math.BigDecimal] = e match {
    case Literal(v, _) =>
      toBigDec(v).filter(_.signum > 0)
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

    case _ => None
  }

  private def yearToInt(v: Any): Option[Int] = v match {
    case n: Number => Some(n.intValue())
    case _ => None
  }

  /** Numeric bounds rendered in the source column's own domain —
    * whole-number widened (FLOOR low, CEILING high: strictly outward,
    * so integral columns compare exactly and fractional ones keep a
    * superset). */
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
