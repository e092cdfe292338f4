package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared kernel: sequential left-fold dot product over numeric
  * ArrayData — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)` (same accumulation order, 0.0 + x == x exactly), which
  * is also what the DuckDB oracle's `list_reduce` computes. Separate
  * object so Janino-generated code calls the static forwarder.
  * Assumes non-null elements (engine arrays are dense vectors). */
object VecDotKernel {
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = dotDF(b, a)
}

/** Native codegen'd dot product (SURVEY §2.10 ladder (b): custom
  * `Expression` where it measurably beats composing built-ins). The
  * built-in composition `aggregate(zip_with(...))` evaluates
  * INTERPRETED — higher-order functions never enter whole-stage codegen
  * and box every element — and it is the innermost loop of every
  * similarity operator (brute-force top-k, IVF training/assignment, LSH
  * projections). The kernel is a branch-free primitive loop over
  * ArrayData; same float semantics as the composition (sequential fold,
  * per-element widening to double).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t // non-array: fails at kernel selection below
  }

  /** Kernel picked at plan time from the child element types. */
  private lazy val kernel: String = (elem(left), elem(right)) match {
    case (DoubleType, DoubleType) => "dotDD"
    case (FloatType, FloatType)   => "dotFF"
    case (DoubleType, FloatType)  => "dotDF"
    case (FloatType, DoubleType)  => "dotFD"
    case (l, r) => throw new IllegalArgumentException(
      s"vec_dot requires array<float|double> inputs, got $l / $r")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dotDD" => VecDotKernel.dotDD(x, y)
      case "dotFF" => VecDotKernel.dotFF(x, y)
      case "dotDF" => VecDotKernel.dotDF(x, y)
      case "dotFD" => VecDotKernel.dotFD(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecDotKernel.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
