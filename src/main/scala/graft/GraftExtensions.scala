package graft

import graft.functions.{IntersectSizeLong, Md5Long60, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.BinaryType

/** Engine extension point (SURVEY.md §7 ladder (c):
  * `SparkSessionExtensions`): registers the engine's native expressions
  * into the session's function registry so they are usable from SQL as
  * well as the Column API. Installed via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity gate: a wrong argument count must fail analysis with a
    * named message, not surface as the registry's raw
    * IndexOutOfBoundsException from `children(1)`. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.size != n)
        throw new IllegalArgumentException(
          s"$name requires exactly $n argument(s), got ${children.size}")
      build(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the kernel consumes raw bytes; casting the argument to binary at
    // build time makes md5long60(string_col) work from SQL (UTF-8 bytes)
    // and turns un-castable argument types into an ANALYSIS error instead
    // of an execution-time ClassCastException
    ext.injectFunction((
      FunctionIdentifier("md5long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5long60"),
      arity("md5long60", 1)(c => Md5Long60(Cast(c.head, BinaryType)))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      arity("vec_dot", 2)(c => VecDot(c.head, c(1)))))
    ext.injectFunction((
      FunctionIdentifier("intersect_size_long"),
      new ExpressionInfo(classOf[IntersectSizeLong].getName,
        "intersect_size_long"),
      arity("intersect_size_long", 2)(c => IntersectSizeLong(c.head, c(1)))))
  }
}
