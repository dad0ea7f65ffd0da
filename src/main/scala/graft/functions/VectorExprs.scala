package graft.functions

import graft.llm.Portable
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector math for the similarity/dedup operators. Each
  * expression is one codegen'd helper call per row — a tight JVM loop
  * instead of interpreted higher-order-function lambdas (`zip_with` +
  * `aggregate` cost ~3-15µs per ELEMENT invocation; these cost
  * nanoseconds per element).
  *
  * Determinism contract: every accumulation runs in strict ascending
  * element order — exactly the left fold the DuckDB oracles evaluate
  * via `list_reduce` — so results agree bit-for-bit, with elements cast
  * float→double before multiplying as both engines' SQL does.
  */
private[functions] object VectorExprHelper {
  @inline private def at(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += at(a, i, af) * at(b, i, bf); i += 1 }
    acc
  }

  def normSq(a: ArrayData, af: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n) { val x = at(a, i, af); acc += x * x; i += 1 }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double =
    dot(a, b, af, bf) / (math.sqrt(normSq(a, af)) * math.sqrt(normSq(b, bf)))

  /** Deterministic ±10% per-element perturbation keyed on
    * (vec_id, element index) through the portable 60-bit md5 hash:
    * y_i = x_i * (1 + (H("n|id|i") % 21 - 10) / 100). */
  def perturb(id: Long, a: ArrayData, af: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val hh = Portable.h(s"n|$id|$i") % 21 - 10
      out(i) = at(a, i, af) * (1.0d + hh.toDouble / 100.0d)
      i += 1
    }
    new GenericArrayData(out)
  }

  def toDouble(a: ArrayData, af: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = at(a, i, af); i += 1 }
    new GenericArrayData(out)
  }
}

private[functions] trait VecInput { self: Expression =>
  protected def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  protected def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType
  /** Generated code calls the object's STATIC FORWARDERS on the plain
    * class (Spark's own codegen idiom, cf. DateTimeUtils call sites):
    * `Helper$.MODULE$` is not resolvable by Janino from a dotted name. */
  protected val helperRef: String =
    VectorExprHelper.getClass.getName.stripSuffix("$")
}

/** Σ aᵢ·bᵢ in ascending order (the oracle's left fold). */
final case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VecInput {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && vecOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprHelper.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"$helperRef.dot($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** Σ aᵢ² in ascending order. */
final case class VectorNormSq(child: Expression)
    extends UnaryExpression with VecInput {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm_sq"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm_sq expects array<float|double>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    VectorExprHelper.normSq(a.asInstanceOf[ArrayData], isFloat(child.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.normSq($a, ${isFloat(child.dataType)})")
  override protected def withNewChildInternal(c: Expression): VectorNormSq =
    copy(child = c)
}

/** dot(a,b) / (√normSq(a) · √normSq(b)) — same scalar combination the
  * oracle applies to its three folds. */
final case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression with VecInput {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && vecOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects array<float|double> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprHelper.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"$helperRef.cosine($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorCosine =
    copy(left = l, right = r)
}

/** Deterministic near-duplicate generator (see
  * [[VectorExprHelper.perturb]]); left = vec id (int/long), right =
  * embedding. */
final case class VectorPerturb(left: Expression, right: Expression)
    extends BinaryExpression with VecInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_perturb"
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == LongType || left.dataType == IntegerType) && vecOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_perturb expects (int|bigint, array<float|double>), got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  private def idAsLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }
  override protected def nullSafeEval(id: Any, a: Any): Any =
    VectorExprHelper.perturb(idAsLong(id), a.asInstanceOf[ArrayData],
      isFloat(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, a) =>
      s"$helperRef.perturb((long) $id, $a, ${isFloat(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorPerturb =
    copy(left = l, right = r)
}

/** array<float> → array<double> (union-compat with computed double
  * vectors, minus the interpreted `transform` lambda). */
final case class VectorToDouble(child: Expression)
    extends UnaryExpression with VecInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_to_double"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_to_double expects array<float|double>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    VectorExprHelper.toDouble(a.asInstanceOf[ArrayData], isFloat(child.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.toDouble($a, ${isFloat(child.dataType)})")
  override protected def withNewChildInternal(c: Expression): VectorToDouble =
    copy(child = c)
}

object VectorExprs {
  private def c(e: Expression): Column = GraftShims.column(e)
  private def x(col: Column): Expression = GraftShims.expression(col)
  def dot(a: Column, b: Column): Column = c(VectorDot(x(a), x(b)))
  def normSq(a: Column): Column = c(VectorNormSq(x(a)))
  def cosine(a: Column, b: Column): Column = c(VectorCosine(x(a), x(b)))
  def perturb(id: Column, a: Column): Column = c(VectorPerturb(x(id), x(a)))
  def toDouble(a: Column): Column = c(VectorToDouble(x(a)))
}
