package graft.engine

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.{sources => S}
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit pins of the inverse-bounds registry (r17). The registry
  * feeds FILE-LEVEL pruning of MV refresh scans, so a wrong entry is a
  * correctness bug, not a tightness bug — the negative tests (the
  * non-monotone calendar extractors MUST return None) matter as much
  * as the positives. Every positive asserts the inverted interval is a
  * SUPERSET of the touched bucket's true source range. */
class InvertibleKeyBoundsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** The ANALYZED (not optimized) expression for a SQL projection over
    * typed null columns — exactly the shape the MV tiers hand the
    * registry (RuntimeReplaceable wrappers and coercion casts intact). */
  private def exprOf(sqlExpr: String): Expression = {
    val df = spark.range(1).selectExpr(
      "cast(null as timestamp) as ts", "cast(null as date) as dt",
      "cast(null as double) as x", "cast(null as bigint) as xl",
      "cast(null as int) as xi")
      .selectExpr(sqlExpr)
    df.queryExecution.analyzed match {
      case Project(list, _) => list.head match {
        case Alias(child, _) => child
        case e => e
      }
      case other => fail(s"unexpected analyzed shape: $other")
    }
  }

  private def boundsOf(f: S.Filter): (Any, Any) = f match {
    case S.And(S.GreaterThanOrEqual(_, lo), S.LessThanOrEqual(_, hi)) => (lo, hi)
    case other => fail(s"expected closed-interval And, got $other")
  }

  private def instant(s: String): java.time.Instant =
    java.time.Instant.parse(s)

  test("to_date(ts) inverts through its RuntimeReplaceable replacement") {
    val inv = InvertibleKeyBounds.invert(exprOf("to_date(ts)"))
      .getOrElse(fail("to_date(ts) must be invertible (alias of cast-to-date)"))
    assert(inv.column === "ts")
    val f = inv.bounds(
      java.sql.Date.valueOf("2024-03-10"), java.sql.Date.valueOf("2024-03-12"))
      .getOrElse(fail("date values must convert"))
    val (lo, hi) = boundsOf(f)
    // superset of every instant whose session-zone date is in range,
    // for any zone: [d_min − 1d, d_max + 2d] in UTC
    assert(lo.asInstanceOf[java.time.Instant]
      .compareTo(instant("2024-03-09T00:00:00Z")) <= 0)
    assert(hi.asInstanceOf[java.time.Instant]
      .compareTo(instant("2024-03-13T00:00:00Z")) >= 0)
  }

  test("unix_timestamp(ts) div n: epoch-second hour buckets invert") {
    val inv = InvertibleKeyBounds.invert(exprOf("unix_timestamp(ts) div 3600"))
      .getOrElse(fail("unix_timestamp(ts) div 3600 must be invertible"))
    assert(inv.column === "ts")
    // hour bucket of 2024-01-15T10:xx:xxZ = 1705312800 / 3600 = 473698
    val v = 1705312800L / 3600
    val f = inv.bounds(v, v).getOrElse(fail("long bucket values must convert"))
    val (lo, hi) = boundsOf(f)
    assert(lo.asInstanceOf[java.time.Instant]
      .compareTo(instant("2024-01-15T10:00:00Z")) <= 0)
    assert(hi.asInstanceOf[java.time.Instant]
      .compareTo(instant("2024-01-15T11:00:00Z")) >= 0)
    // and the interval is BOUNDED (a few buckets wide), not a full scan
    assert(java.time.Duration.between(
      lo.asInstanceOf[java.time.Instant], hi.asInstanceOf[java.time.Instant])
      .getSeconds <= 5L * 3600)
  }

  test("floor(unix_timestamp(ts) / n): the float-division spelling inverts too") {
    val inv = InvertibleKeyBounds.invert(exprOf("floor(unix_timestamp(ts) / 86400)"))
      .getOrElse(fail("floor(unix_timestamp(ts) / 86400) must be invertible " +
        "(coercion casts around the seconds and the literal)"))
    assert(inv.column === "ts")
    val day = 1705276800L / 86400 // 2024-01-15T00:00:00Z
    val f = inv.bounds(day, day).getOrElse(fail("bucket values must convert"))
    val (lo, hi) = boundsOf(f)
    assert(lo.asInstanceOf[java.time.Instant]
      .compareTo(instant("2024-01-15T00:00:00Z")) <= 0)
    assert(hi.asInstanceOf[java.time.Instant]
      .compareTo(instant("2024-01-16T00:00:00Z")) >= 0)
  }

  test("width_bucket: interior buckets invert; edge buckets go one-sided") {
    val inv = InvertibleKeyBounds.invert(exprOf("width_bucket(x, 0, 100, 10)"))
      .getOrElse(fail("width_bucket over literal ascending bounds must invert"))
    assert(inv.column === "x")
    // buckets 2..3 hold [10, 30): superset required
    val (lo, hi) = boundsOf(inv.bounds(2L, 3L).getOrElse(fail("must bound")))
    assert(lo.asInstanceOf[java.lang.Double] <= 10.0)
    assert(hi.asInstanceOf[java.lang.Double] >= 30.0)
    // bucket 0 (below lo): no finite lower bound — one-sided ≤
    inv.bounds(0L, 2L) match {
      case Some(S.LessThanOrEqual(_, h)) =>
        assert(h.asInstanceOf[java.lang.Double] >= 20.0)
      case other => fail(s"expected one-sided upper bound, got $other")
    }
    // bucket n+1 (≥ hi): one-sided ≥
    inv.bounds(9L, 11L) match {
      case Some(S.GreaterThanOrEqual(_, l)) =>
        assert(l.asInstanceOf[java.lang.Double] <= 80.0)
      case other => fail(s"expected one-sided lower bound, got $other")
    }
    // both edges touched: nothing to bound — None, never a guess
    assert(inv.bounds(0L, 11L).isEmpty)
  }

  test("width_bucket boundary guards: descending bounds and long columns " +
    "keep the full scan") {
    // descending (lo > hi) is legal SQL but the inversion is not registered
    assert(InvertibleKeyBounds.invert(exprOf("width_bucket(x, 100, 0, 10)")).isEmpty)
    // a LONG column's coercion cast-to-double can round by more than
    // the one-bucket pad near 2^63 — must NOT invert
    assert(InvertibleKeyBounds.invert(exprOf("width_bucket(xl, 0, 100, 10)")).isEmpty)
    // a 32-bit integral column's cast is exact — inverts
    assert(InvertibleKeyBounds.invert(exprOf("width_bucket(xi, 0, 100, 10)")).isDefined)
  }

  test("x div n now inverts with the analyzer's literal-coercion cast intact") {
    val inv = InvertibleKeyBounds.invert(exprOf("xl div 7"))
      .getOrElse(fail("xl div 7 must invert (the INT literal is cast to BIGINT " +
        "at analysis; posLit must see through it)"))
    assert(inv.column === "xl")
    val (lo, hi) = boundsOf(inv.bounds(10L, 10L).getOrElse(fail("must bound")))
    assert(lo.asInstanceOf[java.lang.Long] <= 70L)
    assert(hi.asInstanceOf[java.lang.Long] >= 76L)
  }

  test("NEGATIVE: non-monotone calendar extractors must return None") {
    // month(ts)=3 holds rows in EVERY year — min/max of touched values
    // bound nothing; a registry entry here would silently un-keep files
    for (e <- Seq("month(ts)", "month(dt)", "dayofweek(dt)", "dayofmonth(dt)",
      "hour(ts)", "minute(ts)", "second(ts)", "quarter(dt)", "weekofyear(dt)",
      "dayofyear(dt)")) {
      assert(InvertibleKeyBounds.invert(exprOf(e)).isEmpty,
        s"$e is NOT monotone in the source column and must not invert")
    }
    // and genuinely opaque expressions stay opaque
    assert(InvertibleKeyBounds.invert(
      exprOf("length(cast(xl as string))")).isEmpty)
  }

  test("year(dt) remains invertible (monotone, unlike the sub-year extractors)") {
    val inv = InvertibleKeyBounds.invert(exprOf("year(dt)"))
      .getOrElse(fail("year(date) must invert"))
    val (lo, hi) = boundsOf(inv.bounds(2023, 2024).getOrElse(fail("must bound")))
    assert(!lo.asInstanceOf[java.time.LocalDate].isAfter(
      java.time.LocalDate.of(2023, 1, 1)))
    assert(!hi.asInstanceOf[java.time.LocalDate].isBefore(
      java.time.LocalDate.of(2024, 12, 31)))
  }
}
