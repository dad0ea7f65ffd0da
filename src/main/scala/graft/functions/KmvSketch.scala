package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch over pre-hashed keys as
  * a native aggregate: keep the k SMALLEST DISTINCT hash values seen;
  * if the hashes are uniform on [0, 2^60), the k-th smallest kept value
  * estimates the distinct count as `(k-1) · 2^60 / kth` (Bar-Yossef et
  * al., "Counting distinct elements in a data stream", RANDOM 2002).
  *
  * Why a sketch: exact COUNT(DISTINCT token) shuffles VOCABULARY-scale
  * rows — billions of keys at open-domain corpus scale — while this
  * state is ≤ k longs per group regardless of input size. Map-side
  * partials merge by sorted-merge-dedup-truncate, fully commutative/
  * associative, so the result is BIT-DETERMINISTIC under any
  * partitioning or retry order — which is what makes it oracle-checkable:
  * DuckDB recomputes the identical k smallest distinct md5-hashes in
  * SQL (row_number over sorted distinct hashes), something
  * engine-native HLL sketches (approx_count_distinct) can never match
  * across engines. Unlike HLL the sketch also supports set operations:
  * union = merge, and intersection estimates via the inclusion rule on
  * the merged k-th minimum.
  *
  * The eval result is the sorted kept array itself (array<bigint>), so
  * callers derive `n_kept = size(sk)`, `kth = element_at(sk, k)`, and
  * the estimate in plain SQL — one sketch, many readouts.
  */
final case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketchAgg.Buffer]
    with UnaryLike[Expression] {
  import KmvSketchAgg.Buffer

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def createAggregationBuffer(): Buffer = new Buffer(new Array[Long](k), 0)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(x: Buffer, y: Buffer): Buffer = {
    var i = 0
    while (i < y.size) { x.insert(y.values(i)); i += 1 }
    x
  }

  override def eval(buf: Buffer): Any =
    UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOfRange(buf.values, 0, buf.size))

  override def serialize(obj: Buffer): Array[Byte] = {
    val bytes = new Array[Byte](4 + obj.size * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(obj.size)
    bb.asLongBuffer().put(obj.values, 0, obj.size)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val size = bb.getInt()
    val values = new Array[Long](k)
    bb.asLongBuffer().get(values, 0, size)
    new Buffer(values, size)
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {
  /** Sorted distinct k-smallest buffer. `values(0 until size)` is the
    * kept set in ascending order; capacity is fixed at k. */
  final class Buffer(val values: Array[Long], var size: Int) {
    def insert(v: Long): Unit = {
      val k = values.length
      // fast reject: full and not smaller than the current maximum
      if (size == k && v >= values(size - 1)) return
      var idx = java.util.Arrays.binarySearch(values, 0, size, v)
      if (idx >= 0) return // already kept — KMV is over DISTINCT values
      idx = -(idx + 1)
      val last = math.min(size, k - 1)
      System.arraycopy(values, idx, values, idx + 1, last - idx)
      values(idx) = v
      if (size < k) size += 1
    }
  }
}

object KmvSketch {
  /** `of(k)(hashCol)` → the sorted k smallest distinct hash values as
    * array<bigint>. Input must be the 60-bit portable hash (LongType)
    * so a DuckDB oracle reproduces the identical array. */
  def of(k: Int)(c: Column): Column =
    GraftShims.column(
      KmvSketchAgg(GraftShims.expression(c), k).toAggregateExpression())
}
