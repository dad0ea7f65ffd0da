package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, RowEncoder}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** Bounded top-K aggregate: keeps the K largest rows per group inside a
  * regular hash aggregate, so the partial (map-side) state per group is
  * O(K) and the shuffle carries at most K rows per group per mapper.
  *
  * This replaces the classic `row_number().over(Window.partitionBy(g))`
  * + `filter(rank <= k)` pattern for low-cardinality `g`: the window
  * form funnels an entire group into ONE task (a 5-value key over a
  * billion-row table means 5 tasks sorting ~200M rows each), while this
  * aggregator stays a two-phase parallel aggregate — every input
  * partition reduces locally to ≤K rows per group, and only those
  * survivors shuffle. Same shape the reference delegates to its query
  * engine for "top N per key" (the reference itself has no operator for
  * this; it is pure Spark surface).
  *
  * Ordering: descending by `ord`, ties broken ascending by `tie` —
  * i.e. the row set equal to
  * `ROW_NUMBER() OVER (ORDER BY ord DESC, tie ASC) <= k`.
  *
  * Rows are carried as (ord, tie, payload...) structs; the buffer is a
  * small sorted Vector (K ≤ ~100 intended; for larger K a binary heap
  * would win, but top-N use cases are small-K by definition).
  */
object TopK {

  /** Sort key: primary Double descending, tie-break Long ascending. */
  private def lt(aOrd: Double, aTie: Long, bOrd: Double, bTie: Long): Boolean =
    aOrd > bOrd || (aOrd == bOrd && aTie < bTie)

  private final class TopKAgg(k: Int, rowSchema: StructType)
      extends Aggregator[Row, Seq[Row], Seq[Row]] {
    override def zero: Seq[Row] = Vector.empty

    private def insert(buf: Seq[Row], r: Row): Seq[Row] = {
      // buf kept sorted best-first; bail fast when r loses to the k-th.
      if (buf.size >= k && !lt(r.getDouble(0), r.getLong(1),
          buf.last.getDouble(0), buf.last.getLong(1))) buf
      else {
        val i = buf.indexWhere(b =>
          lt(r.getDouble(0), r.getLong(1), b.getDouble(0), b.getLong(1)))
        val at = if (i < 0) buf.size else i
        (buf.take(at) :+ r) ++ buf.drop(at).take(k - at - 1)
      }
    }

    override def reduce(buf: Seq[Row], row: Row): Seq[Row] = insert(buf, row)
    override def merge(a: Seq[Row], b: Seq[Row]): Seq[Row] = b.foldLeft(a)(insert)
    override def finish(buf: Seq[Row]): Seq[Row] = buf

    private val seqEnc: Encoder[Seq[Row]] = AgnosticEncoders.IterableEncoder(
      scala.reflect.classTag[Seq[Row]], RowEncoder.encoderFor(rowSchema),
      containsNull = false, lenientSerialization = false)
    override def bufferEncoder: Encoder[Seq[Row]] = seqEnc
    override def outputEncoder: Encoder[Seq[Row]] = seqEnc
  }

  /** Column form: `top_k(k, ord, tie, payload...)` → array of the K best
    * (ord DESC, tie ASC) rows as structs shaped like `rowSchema`, best
    * first. `rowSchema`'s first field must be DoubleType (the ordering
    * key), second LongType (the tie-break); the argument columns are
    * passed positionally to match it.
    */
  def topK(k: Int, rowSchema: StructType)(cols: Column*): Column =
    udaf(new TopKAgg(k, rowSchema), RowEncoder.encoderFor(rowSchema)).apply(cols: _*)
}
