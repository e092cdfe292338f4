package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  /** Null-tolerant variant for arrays whose TYPE admits null elements
    * (the session-registered SQL `vec_dot` can receive
    * `array(1.0d, NULL)`): any null element nulls the whole result,
    * exactly like the `aggregate(zip_with(...))` composition it
    * replaces (null product → null fold). Boxed return: null = NULL.
    * The engine's own dense-vector columns are containsNull = false and
    * never pay this branchier loop — kernel choice is plan-time. */
  def dotNullable(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
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
  // nullable even over non-null children: mismatched-length arrays
  // yield null, matching the composition (zip_with pads the shorter
  // side with null, which nulls the whole fold)
  override def nullable: Boolean = true

  /** Bad argument types fail at ANALYSIS (e.g. decimal array literals
    * via the SQL `vec_dot`), not at codegen/eval. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == DoubleType || t == FloatType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> on both sides, " +
          s"got ${l.catalogString} / ${r.catalogString}")
    }

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Kernel picked at plan time from the child element types
    * (exhaustive — checkInputDataTypes admits only float/double). */
  private lazy val kernel: String = (elem(left), elem(right)) match {
    case (DoubleType, DoubleType) => "dotDD"
    case (FloatType, FloatType)   => "dotFF"
    case (DoubleType, FloatType)  => "dotDF"
    case _                        => "dotFD"
  }

  /** True when either child's array TYPE admits null elements — then
    * the dense kernels (getDouble on a null slot reads garbage or
    * NPEs) are unsound and the null-probing variant runs instead.
    * Plan-time: the engine's own vector columns are
    * containsNull = false and keep the branch-free loop. */
  private lazy val mayHaveNullElements =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  private lazy val (leftFloat, rightFloat) =
    (elem(left) == FloatType, elem(right) == FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else if (mayHaveNullElements)
      VecDotKernel.dotNullable(x, y, leftFloat, rightFloat)
    else kernel match {
      case "dotDD" => VecDotKernel.dotDD(x, y)
      case "dotFF" => VecDotKernel.dotFF(x, y)
      case "dotDF" => VecDotKernel.dotDF(x, y)
      case "dotFD" => VecDotKernel.dotFD(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (mayHaveNullElements) {
      // fresh name: two vec_dots in one codegen'd stage must not
      // declare the same Java local
      val r = ctx.freshName("vecDotBoxed")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() == $b.numElements()) {
          java.lang.Double $r = graft.functions.VecDotKernel
            .dotNullable($a, $b, $leftFloat, $rightFloat);
          if ($r == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $r.doubleValue(); }
        } else {
          ${ev.isNull} = true;
        }""")
    }
    else
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() == $b.numElements()) {
          ${ev.value} = graft.functions.VecDotKernel.$kernel($a, $b);
        } else {
          ${ev.isNull} = true;
        }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
