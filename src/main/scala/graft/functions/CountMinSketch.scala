package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Count-min sketch over pre-hashed keys as a native aggregate: a
  * `depth × width` grid of counters; each input increments one counter
  * per row (bucket via a universal hash of the 60-bit key), and a
  * key's estimate is the MIN over its row counters — an overestimate
  * by at most the collision mass, never an undercount.
  *
  * Why a sketch: exact token counts shuffle VOCABULARY-scale rows — a
  * web corpus has billions of distinct tokens, so "how often do these
  * 50 watchlist terms appear" pays a billion-key aggregation for a
  * 50-row answer. The sketch state is FIXED (`depth·width` longs,
  * ~256 KB at the defaults) regardless of corpus size: map-side
  * partials merge by ELEMENTWISE SUM — fully commutative/associative,
  * so results are bit-deterministic under any partitioning/retry
  * order (unlike top-k sketches such as SpaceSaving, whose eviction
  * order leaks into the answer) — and the shuffle carries one grid
  * per mapper, bounded by parallelism, never by data.
  *
  * Buckets derive from the key with the SAME universal-hash family the
  * MinHash pipeline uses (`(a_r·(h mod p) + b_r) mod p mod width`,
  * constants from the portable md5 — [[graft.llm.Portable]]), so a
  * DuckDB oracle rebuilds the identical grid in SQL and point queries
  * are plain `least(element_at(...))` over the sketch array — no
  * query-side expression needed.
  */
final case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    a: Array[Long],
    b: Array[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && width >= 1 && a.length == depth && b.length == depth,
    s"cms_sketch needs $depth hash constants, got ${a.length}/${b.length}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long] % p
      var r = 0
      while (r < depth) {
        buf(r * width + (((a(r) * x + b(r)) % p) % width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(obj: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](obj.length * 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().put(obj)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val arr = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(arr)
    arr
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)

  override def defaultResult: Option[Literal] =
    Option(Literal.create(new Array[Long](depth * width), dataType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"
}

object CmsSketch {
  /** `of(depth, width, a, b, p)(hashCol)` → the full `depth·width`
    * counter grid as one array<long> (row r at offsets `[r·width,
    * (r+1)·width)`). The input column must be the 60-bit portable hash
    * of the key (LongType). Estimate in SQL:
    * `least over r of element_at(sk, r·width + (a_r·(h%p)+b_r)%p%width + 1)`. */
  def of(depth: Int, width: Int, a: Array[Long], b: Array[Long], p: Long)(
      c: Column): Column =
    GraftShims.column(
      CmsSketchAgg(GraftShims.expression(c), depth, width, a, b, p)
        .toAggregateExpression())
}
