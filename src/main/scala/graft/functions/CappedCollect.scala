package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Occupancy-capped collect: gathers at most `cap + 1` input values per
  * group inside a regular two-phase hash aggregate. A result of size
  * `cap + 1` is the OVER-CAP SENTINEL — the group's true size exceeds
  * the cap and the caller drops it (`size(...) <= cap` keeps exactly
  * the groups whose collected list is COMPLETE).
  *
  * This replaces the `count(*) over (partition by key)` + filter +
  * re-aggregate occupancy-cap idiom everywhere a posting list is
  * df/occupancy-capped (LSH hot buckets, shingle document frequency):
  * the window form funnels EVERY row of a key into one task and
  * buffers the whole partition before the count is known — a
  * billion-row boilerplate bucket at corpus scale becomes one spilling
  * task that exists only to be discarded. This aggregate caps the
  * state at `cap + 1` values PER MAPPER during the partial (map-side)
  * phase, so a hot key ships at most `(cap + 1) × mappers` values
  * through the shuffle and never sorts, while cold keys pay one hash
  * aggregate — strictly less work at every scale, and the 100 TB
  * degradation mode is "bounded extra shuffle rows" instead of "one
  * task sorts the flood".
  *
  * Collection order is nondeterministic (hash-aggregate merge order);
  * callers needing determinism sort the (≤ cap+1 element) result with
  * `sort_array`. Implemented as a NATIVE `TypedImperativeAggregate`
  * over raw catalyst values — the same construct as Spark's own
  * `collect_list` (an `ObjectHashAggregate`, zero per-row encoder
  * work, not a `ScalaUDF` — the plan audit's interpreted-closure ban
  * does not apply); a first cut as an `Aggregator`-based `udaf` paid
  * ~40% on the dedup family in per-row `Row` boxing.
  */
final case class CappedCollectAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  // saturating: cap = Int.MaxValue means "uncapped" (cap+1 would
  // overflow negative and collect nothing)
  private val lim = if (cap == Int.MaxValue) Int.MaxValue else cap + 1

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length < lim) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      a: mutable.ArrayBuffer[Any], b: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (a.length < lim && i < b.length) { a += b(i); i += 1 }
    a
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  // ser/de through one UnsafeProjection over array<child.dataType> —
  // the stock Collect buffer codec
  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))
  private lazy val row = new UnsafeRow(1)

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(obj))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buffer = createAggregationBuffer()
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, x: Any) => buffer += x)
    buffer
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectAgg =
    copy(child = newChild)

  override def defaultResult: Option[Literal] =
    Option(Literal.create(Array.empty[Any], dataType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "capped_collect"
}

/** Growable primitive buffer for [[CappedCollectLongsAgg]] — an
  * `Array[Long]` plus fill length, so the per-group aggregation state
  * never boxes. */
final class LongsBuffer(var arr: Array[Long], var len: Int) {
  def append(v: Long, lim: Int): Unit = {
    if (len == arr.length) {
      val grown = new Array[Long](math.min(math.max(arr.length * 2, 8), math.max(lim, 8)))
      System.arraycopy(arr, 0, grown, 0, len)
      arr = grown
    }
    arr(len) = v
    len += 1
  }
}

/** LONG-specialized capped collect — identical semantics to
  * [[CappedCollectAgg]] (≤ cap+1 values per group, size cap+1 is the
  * over-cap sentinel) with primitive `Array[Long]` state: no per-row
  * boxing or `copyValue`, serialization is a bulk byte copy, and the
  * result array materializes through
  * `UnsafeArrayData.fromPrimitiveArray` (zero boxing end-to-end).
  * Every dedup-family posting list collects doc ids (longs), so this
  * is the hot path; the generic form stays for struct payloads.
  * Measured at sf0.1: the generic form's boxed buffers cost the
  * n-gram df-cap stage ~35% — this form closes that gap while keeping
  * the map-side-capped, sort-free shuffle shape that wins at 10×. */
final case class CappedCollectLongsAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsBuffer]
    with UnaryLike[Expression] {

  private val lim = if (cap == Int.MaxValue) Int.MaxValue else cap + 1

  // initial capacity 2, not cap: on Zipfian key streams (shingle df,
  // LSH buckets) almost every key collects 1-2 values — at millions of
  // distinct keys per task, an 8-slot initial buffer is ~4× the
  // allocation traffic for slots that never fill; the doubling growth
  // path absorbs the hot minority
  override def createAggregationBuffer(): LongsBuffer =
    new LongsBuffer(new Array[Long](math.min(lim, 2)), 0)

  override def update(buf: LongsBuffer, input: InternalRow): LongsBuffer = {
    if (buf.len < lim) {
      val v = child.eval(input)
      if (v != null) buf.append(v.asInstanceOf[Long], lim)
    }
    buf
  }

  override def merge(a: LongsBuffer, b: LongsBuffer): LongsBuffer = {
    var i = 0
    while (a.len < lim && i < b.len) { a.append(b.arr(i), lim); i += 1 }
    a
  }

  override def eval(buf: LongsBuffer): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf.arr, buf.len))

  override def serialize(obj: LongsBuffer): Array[Byte] = {
    val bytes = new Array[Byte](obj.len * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(obj.arr, 0, obj.len)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): LongsBuffer = {
    val n = bytes.length / 8
    val arr = new Array[Long](math.max(n, 1))
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(arr, 0, n)
    new LongsBuffer(arr, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectLongsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectLongsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectLongsAgg =
    copy(child = newChild)

  override def defaultResult: Option[Literal] =
    Option(Literal.create(Array.empty[Long], dataType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "capped_collect_longs"
}

object CappedCollect {

  /** `of(cap)(col)` → array of at most `cap + 1` input values
    * (unordered; nulls skipped). `size <= cap` ⇔ the list is the
    * group's COMPLETE value set; `size == cap + 1` ⇔ over-cap, drop
    * the group. Any input type — pass `struct(...)` for multi-column
    * payloads. */
  def of(cap: Int)(c: Column): Column =
    GraftShims.column(
      CappedCollectAgg(GraftShims.expression(c), cap).toAggregateExpression())

  /** LONG-specialized form — same contract, primitive state
    * ([[CappedCollectLongsAgg]]). The input column must be LongType. */
  def longs(cap: Int)(c: Column): Column =
    GraftShims.column(
      CappedCollectLongsAgg(GraftShims.expression(c), cap).toAggregateExpression())
}
