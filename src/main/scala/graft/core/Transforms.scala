package graft.core

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.charset.StandardCharsets

/** Iceberg partition transforms, re-implemented from the PUBLIC Iceberg
  * table spec (https://iceberg.apache.org/spec/#partition-transforms).
  *
  * The reference exercises identity/day/bucket(N)/truncate(W)
  * (partition_binder.rs:281-299, test_spark.py:257). We implement the
  * full public set so partition evolution and pruning work across all
  * of them. `eval` gives the transform's value semantics used by the
  * data plane for partition pruning and path layout.
  */
sealed trait Transform {
  /** Wire name, e.g. "bucket[16]". */
  def wireName: String
  /** Can this transform be applied to a column of type `t`? */
  def canTransform(t: IType): Boolean
  /** Result type of the transform given a source type. */
  def resultType(source: IType): IType
  /** Transform family key used for redundancy dedup: bucket[4] and
    * bucket[16] on the same source are redundant "bucket" siblings
    * (reference dedup_name behavior, partition_binder.rs:107,212-227). */
  def dedupName: String = wireName
}

object Transform {
  import IType._

  case object Identity extends Transform {
    val wireName = "identity"
    def canTransform(t: IType): Boolean = t.isPrimitive
    def resultType(source: IType): IType = source
  }

  /** Murmur3-x86-32 based bucketing per the Iceberg spec appendix B. */
  final case class Bucket(numBuckets: Int) extends Transform {
    val wireName = s"bucket[$numBuckets]"
    override def dedupName: String = "bucket"
    def canTransform(t: IType): Boolean = t match {
      case TInt | TLong | TDate | TTime | TTimestamp | TTimestamptz |
           TString | TUuid | TBinary | _: TDecimal | _: TFixed => true
      case _ => false
    }
    def resultType(source: IType): IType = TInt

    def hash(value: Any): Int = value match {
      case i: Int => Murmur3.hashLong(i.toLong)
      case l: Long => Murmur3.hashLong(l)
      case s: String => Murmur3.hashBytes(s.getBytes(StandardCharsets.UTF_8))
      case b: Array[Byte] => Murmur3.hashBytes(b)
      case d: java.math.BigDecimal => Murmur3.hashBytes(d.unscaledValue.toByteArray)
      case u: java.util.UUID =>
        val bb = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
        bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
        Murmur3.hashBytes(bb.array())
      case other => throw new IllegalArgumentException(s"cannot bucket $other")
    }
    /** Bucket number: positive-mod of the 32-bit hash. */
    def apply(value: Any): Int = (hash(value) & Integer.MAX_VALUE) % numBuckets
  }

  /** Width-truncation: ints round toward -inf, strings/binary prefix. */
  final case class Truncate(width: Int) extends Transform {
    val wireName = s"truncate[$width]"
    override def dedupName: String = "truncate"
    def canTransform(t: IType): Boolean = t match {
      case TInt | TLong | TString | TBinary | _: TDecimal => true
      case _ => false
    }
    def resultType(source: IType): IType = source
    def apply(value: Any): Any = value match {
      case i: Int => i - java.lang.Math.floorMod(i, width)
      case l: Long => l - java.lang.Math.floorMod(l, width.toLong)
      case s: String => if (s.length <= width) s else s.substring(0, width)
      case b: Array[Byte] => b.take(width)
      case d: java.math.BigDecimal =>
        val unscaled = d.unscaledValue
        val w = java.math.BigInteger.valueOf(width.toLong)
        new java.math.BigDecimal(unscaled.subtract(unscaled.mod(w)), d.scale)
      case other => throw new IllegalArgumentException(s"cannot truncate $other")
    }
  }

  sealed abstract class TimeTransform(val wireName: String) extends Transform {
    def canTransform(t: IType): Boolean = t match {
      case TDate | TTimestamp | TTimestamptz => true
      case _ => false
    }
    def resultType(source: IType): IType = TInt

    /** Ordinal for a date given as days since 1970-01-01. */
    def fromDays(days: Int): Int
    /** Ordinal for a timestamp given as microseconds since the epoch. */
    def fromMicros(micros: Long): Int =
      fromDays(Math.toIntExact(Math.floorDiv(micros, TimeTransform.MicrosPerDay)))

    /** Partition value for pruning / path layout. Accepts the storage
      * representations (Int days, Long micros) and java.time values. */
    final def apply(value: Any): Int = value match {
      case days: Int => fromDays(days)
      case micros: Long => fromMicros(micros)
      case d: java.time.LocalDate => fromDays(Math.toIntExact(d.toEpochDay))
      case i: java.time.Instant =>
        fromMicros(Math.addExact(
          Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
      case o: java.time.OffsetDateTime => apply(o.toInstant)
      case other => throw new IllegalArgumentException(
        s"cannot apply $wireName to $other")
    }
  }
  object TimeTransform {
    val MicrosPerHour = 3600000000L
    val MicrosPerDay = 86400000000L
    private val Epoch = java.time.LocalDate.ofEpochDay(0)
    /** Floor-style ordinal of the calendar unit containing `days`: e.g.
      * 1969-12-31 is in year -1, month -1 (negatives round toward -inf,
      * matching the public Iceberg spec's year/month examples). */
    private[Transform] def daysToUnit(days: Int, unit: java.time.temporal.ChronoUnit): Int =
      if (days >= 0) unit.between(Epoch, Epoch.plusDays(days.toLong)).toInt
      else unit.between(Epoch, Epoch.plusDays(days + 1L)).toInt - 1
  }
  /** Years since 1970 (ordinal). */
  case object Year extends TimeTransform("year") {
    def fromDays(days: Int): Int =
      TimeTransform.daysToUnit(days, java.time.temporal.ChronoUnit.YEARS)
  }
  /** Months since 1970-01. */
  case object Month extends TimeTransform("month") {
    def fromDays(days: Int): Int =
      TimeTransform.daysToUnit(days, java.time.temporal.ChronoUnit.MONTHS)
  }
  /** Days since 1970-01-01; result conventionally typed as date. */
  case object Day extends TimeTransform("day") {
    override def resultType(source: IType): IType = TDate
    def fromDays(days: Int): Int = days
  }
  /** Hours since 1970-01-01T00. Not applicable to date columns. */
  case object Hour extends TimeTransform("hour") {
    override def canTransform(t: IType): Boolean = t match {
      case TTimestamp | TTimestamptz => true
      case _ => false
    }
    def fromDays(days: Int): Int =
      throw new IllegalArgumentException("hour transform does not apply to dates")
    override def fromMicros(micros: Long): Int =
      Math.toIntExact(Math.floorDiv(micros, TimeTransform.MicrosPerHour))
  }

  /** Always-null transform; the only one allowed on non-primitives. */
  case object Void extends Transform {
    val wireName = "void"
    def canTransform(t: IType): Boolean = true
    def resultType(source: IType): IType = source
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def parse(s: String): Either[String, Transform] = s match {
    case "identity" => Right(Identity)
    case "year" => Right(Year)
    case "month" => Right(Month)
    case "day" => Right(Day)
    case "hour" => Right(Hour)
    case "void" => Right(Void)
    case BucketRe(n) => Right(Bucket(n.toInt))
    case TruncateRe(w) => Right(Truncate(w.toInt))
    case other => Left(s"unknown transform: $other")
  }
}

/** Murmur3 x86 32-bit, seed 0 — the hash mandated by the public Iceberg
  * spec (appendix B) for bucket transforms. Self-contained so the pure
  * core has no Spark/Guava dependency.
  */
object Murmur3 {
  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  def hashLong(v: Long): Int = {
    // Iceberg hashes long as the little-endian 8-byte representation.
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(v)
    hashBytes(bb.array())
  }

  def hashBytes(data: Array[Byte], seed: Int = 0): Int = {
    val nblocks = data.length / 4
    var h1 = seed
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tailStart = nblocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tailStart + 2) & 0xff) << 16
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 2 =>
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 1 =>
        k1 ^= data(tailStart) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b; h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35; h1 ^= h1 >>> 16
    h1
  }
}
