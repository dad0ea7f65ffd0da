package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TransformsSpec extends AnyFunSuite {
  import IType._
  import Transform._

  // Hash test vectors from the PUBLIC Iceberg table spec, Appendix B
  // (https://iceberg.apache.org/spec/#appendix-b-32-bit-hash-requirements).
  test("bucket hash matches Iceberg spec appendix B vectors") {
    assert(Bucket(16).hash(34) === 2017239379)
    assert(Bucket(16).hash(34L) === 2017239379)
    assert(Bucket(16).hash("iceberg") === 1210000089)
    assert(Bucket(16).hash(Array[Byte](0, 1, 2, 3)) === -188683207)
    assert(Bucket(16).hash(17486) === -653330422) // date 2017-11-16 as days
    assert(Bucket(16).hash(new java.math.BigDecimal("14.20")) === -500754589)
    assert(Bucket(16).hash(
      java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")) === 1488055340)
  }

  test("bucket number is positive mod") {
    val b = Bucket(16)
    assert(b(34) === (2017239379 & Integer.MAX_VALUE) % 16)
    assert(b("iceberg") === (1210000089 & Integer.MAX_VALUE) % 16)
    // negative hash still yields a bucket in [0, n)
    val neg = b(Array[Byte](0, 1, 2, 3))
    assert(neg >= 0 && neg < 16)
  }

  test("truncate semantics per spec") {
    val t = Truncate(10)
    assert(t(1) === 0)
    assert(t(-1) === -10)
    assert(t(11) === 10)
    assert(t(1L) === 0L)
    assert(t(-1L) === -10L)
    assert(Truncate(4)("iceberg") === "iceb")
    assert(Truncate(4)("ice") === "ice")
    assert(Truncate(2)(new java.math.BigDecimal("10.65")) ===
      new java.math.BigDecimal("10.64"))
  }

  test("type compatibility") {
    assert(Identity.canTransform(TString))
    assert(!Bucket(4).canTransform(TFloat))  // float bucketing forbidden by spec
    assert(!Bucket(4).canTransform(TDouble))
    assert(Bucket(4).canTransform(TDecimal(10, 2)))
    assert(Day.canTransform(TDate) && Day.canTransform(TTimestamp))
    assert(!Hour.canTransform(TDate))
    assert(!Truncate(4).canTransform(TDate))
    assert(Void.canTransform(TStruct(Nil)))
  }

  test("parse round-trip") {
    for (t <- Seq[Transform](Identity, Bucket(16), Truncate(4), Year, Month, Day, Hour, Void))
      assert(Transform.parse(t.wireName) === Right(t))
    assert(Transform.parse("nope").isLeft)
  }

  // Vectors from the public Iceberg spec's partition-transform examples:
  // 2017-11-16 = day 17486, year 47, month 574; 2017-11-16T22:31:08 UTC
  // = hour 17486*24+22 = 419686. Negatives round toward -inf.
  test("time transforms: epoch-ordinal values per spec") {
    val d = java.time.LocalDate.of(2017, 11, 16)
    assert(d.toEpochDay === 17486L)
    assert(Day(d) === 17486)
    assert(Year(d) === 47)
    assert(Month(d) === 574)
    val ts = java.time.OffsetDateTime.parse("2017-11-16T22:31:08Z")
    val micros = ts.toInstant.getEpochSecond * 1000000L
    assert(Hour(micros) === 419686)
    assert(Day(micros) === 17486)
    assert(Year(micros) === 47)
    assert(Month(micros) === 574)
  }

  test("time transforms: negatives floor toward -inf") {
    val d = java.time.LocalDate.of(1969, 12, 31) // day -1
    assert(Day(d) === -1)
    assert(Year(d) === -1)
    assert(Month(d) === -1)
    assert(Year(java.time.LocalDate.of(1969, 1, 1)) === -1)
    assert(Year(java.time.LocalDate.of(1968, 12, 31)) === -2)
    assert(Month(java.time.LocalDate.of(1969, 11, 30)) === -2)
    // one microsecond before the epoch is in hour/day -1
    assert(Hour(-1L) === -1)
    assert(Day(-1L) === -1)
    // exactly the epoch boundary is ordinal 0
    assert(Hour(0L) === 0)
    assert(Year(java.time.LocalDate.of(1970, 1, 1)) === 0)
  }

  test("hour transform rejects dates") {
    intercept[IllegalArgumentException](Hour(17486))
  }

  test("transform family dedup names") {
    assert(Bucket(4).dedupName === Bucket(16).dedupName)
    assert(Truncate(2).dedupName === Truncate(8).dedupName)
    assert(Bucket(4).dedupName !== Truncate(4).dedupName)
  }
}
