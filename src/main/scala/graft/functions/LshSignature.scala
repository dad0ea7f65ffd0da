package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signatures as ONE native expression: for a
  * d-dim vector, computes all `tables` bucket ids (each `bits` sign
  * bits) in a single pass — `tables*bits*d` fused multiply-adds per row
  * inside whole-stage codegen, no explode, no join, no shuffle.
  *
  * Replaces the relational formulation (posexplode(embedding) ⋈
  * broadcast plane table → two hash aggregates) that moved n·tables·
  * bits·d intermediate rows through an exchange; the hyperplane matrix
  * is row-independent, so it rides along as a codegen reference object
  * instead.
  *
  * Per-plane dots accumulate in strict ascending element order — the
  * exact left fold the DuckDB oracle evaluates (`list_reduce`), so
  * signatures agree bit-for-bit, not merely in sign.
  *
  * Matrix layout: plane m's coefficient for element i (0-based) at
  * `matrix(m*d + i)`; plane m feeds bit `m % bits` of bucket
  * `m / bits`.
  */
final case class LshSignature(
    child: Expression, matrix: Array[Double], tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_signature"

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_signature expects array<float|double>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshSignatureHelper.sign(input.asInstanceOf[ArrayData], matrix, tables, bits,
      elementType == FloatType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LshSignatureHelper.getClass.getName.stripSuffix("$")
    val matrixRef = ctx.addReferenceObj("lshMatrix", matrix, "double[]")
    val isFloat = elementType == FloatType
    defineCodeGen(ctx, ev, c =>
      s"$helper.sign($c, $matrixRef, $tables, $bits, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object LshSignatureHelper {
  def sign(arr: ArrayData, w: Array[Double], tables: Int, bits: Int,
      isFloat: Boolean): ArrayData = {
    val dim = arr.numElements()
    val out = new Array[Long](tables)
    val planes = tables * bits
    var m = 0
    while (m < planes) {
      val base = m * dim
      var dot = 0.0d
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += w(base + i) * x
        i += 1
      }
      if (dot >= 0) out(m / bits) |= 1L << (m % bits)
      m += 1
    }
    new GenericArrayData(out)
  }
}

object LshSignature {
  /** Column form: all per-table bucket ids for `vec`. */
  def of(vec: Column, matrix: Array[Double], tables: Int, bits: Int): Column =
    GraftShims.column(LshSignature(GraftShims.expression(vec), matrix, tables, bits))
}
