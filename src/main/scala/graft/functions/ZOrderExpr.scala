package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, col}
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering value for multi-column file layout.
  *
  * Rewriting a table sorted by ONE column gives tight per-file min/max
  * bounds on that column and useless bounds on every other; a filter on
  * the second column then prunes nothing. Interleaving the bit patterns
  * of per-column QUANTILE RANKS gives every clustered column locality:
  * after `repartitionByRange + sortWithinPartitions` on the z-value,
  * each file covers a small hyper-rectangle of the value space, so the
  * manifest-stats pruning ([[graft.engine.StatsPruning]]) skips files
  * for selective predicates on ANY clustered column — the multi-
  * dimensional complement of the one-column sort, same trick as
  * Iceberg/Delta's zorder rewrites.
  *
  * Scale shape: cut points come from ONE `approxQuantile` pass (a
  * distributed sketch, same cost as a min/max scan); each row then pays
  * k binary searches over ≤255-entry arrays inside whole-stage codegen.
  * Quantile buckets (not equal-width) keep the grid balanced under
  * arbitrary value skew — every bucket holds ~1/256 of the rows by
  * construction, so no z-range hotspots.
  */
object ZOrderHelper {
  /** Bucket of v within the sorted DISTINCT cut array: the number of
    * cuts <= v, in 0..cuts.length (builder dedupes, so binarySearch's
    * "some equal index" is unambiguous). */
  def bucket(cuts: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  /** Morton code: bit i of column j's bucket lands at position i*k+j.
    * Nulls take bucket 0 (cluster together at the low end, like NULLS
    * FIRST in a sort). */
  def zValue(vals: ArrayData, cuts: Array[Array[Double]]): Long = {
    val k = cuts.length
    var z = 0L
    var j = 0
    while (j < k) {
      val b = if (vals.isNullAt(j)) 0 else bucket(cuts(j), vals.getDouble(j))
      var i = 0
      while (i < ZOrder.Bits) {
        z |= ((b >> i) & 1L) << (i * k + j)
        i += 1
      }
      j += 1
    }
    z
  }
}

/** zvalue(array(col1, ..., colk)) with per-column quantile cuts baked
  * in as a literal — codegen'd, no shuffle, no UDF. */
final case class ZValue(child: Expression, cuts: Array[Array[Double]])
    extends UnaryExpression {
  private val helperRef = ZOrderHelper.getClass.getName.stripSuffix("$")

  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"zvalue expects array<double>, got ${dt.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    ZOrderHelper.zValue(a.asInstanceOf[ArrayData], cuts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zcuts", cuts, "double[][]")
    defineCodeGen(ctx, ev, a => s"$helperRef.zValue($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): ZValue = copy(child = c)
}

object ZOrder {
  /** Bits per clustered column: 256 quantile buckets — far finer than
    * any realistic file count per partition, coarse enough that the
    * sketch pass stays one small driver result. */
  val Bits = 8

  /** The z-value Column for `cols` over `df`, bounds resolved NOW via
    * one distributed quantile-sketch pass. Numeric columns natively;
    * date/timestamp columns (r16 — TIME is the most common clustering
    * key in practice) go through their ordinal representation (epoch
    * day / epoch micros), which preserves order — exactly what the
    * quantile cuts need. */
  def clusterColumn(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size <= 7, s"zorder supports at most 7 columns, got ${cols.size}")
    val ordinal: Map[String, Column] = cols.map { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType] ||
        dt == DateType || dt == TimestampType || dt == TimestampNTZType,
        s"zorder column $c must be numeric, date, or timestamp, got ${dt.catalogString}")
      c -> (dt match {
        case DateType => col(c).cast(IntegerType).cast(DoubleType)
        case TimestampType =>
          // true epoch MICROS (r17): cast-to-long is epoch SECONDS,
          // which clusters correctly but truncates sub-second order.
          // Precision boundary: the immediate cast to double is exact
          // only while |epoch micros| ≤ 2^53 (~year 1684..2255);
          // beyond that the rounding is non-strictly monotone, so
          // distinct extreme timestamps can collapse to one ordinal —
          // harmless for quantile-cut clustering (cuts stay ordered),
          // just not micro-exact at the extremes
          org.apache.spark.sql.functions.unix_micros(col(c)).cast(DoubleType)
        case TimestampNTZType =>
          // epoch SECONDS — cast(ntz AS long); order-preserving, which
          // is all the quantile cuts need (unix_micros takes TZ input)
          col(c).cast(LongType).cast(DoubleType)
        case _ => col(c).cast(DoubleType)
      })
    }.toMap
    // the sketch runs over the ordinal projection so cuts live in the
    // same domain the z-value evaluates in
    val probs = (1 until (1 << Bits)).map(_.toDouble / (1 << Bits)).toArray
    val ordinalNames = cols.map(c => s"__zord_$c")
    val ordinalDf = df.select(cols.map(c => ordinal(c).as(s"__zord_$c")): _*)
    val cuts: Array[Array[Double]] = ordinalDf.stat
      .approxQuantile(ordinalNames.toArray, probs, 0.001)
      .map(_.distinct.sorted)
    GraftShims.column(ZValue(
      GraftShims.expression(array(cols.map(ordinal): _*)),
      cuts))
  }
}
