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

  test("transform family dedup names") {
    assert(Bucket(4).dedupName === Bucket(16).dedupName)
    assert(Truncate(2).dedupName === Truncate(8).dedupName)
    assert(Bucket(4).dedupName !== Truncate(4).dedupName)
  }
}
