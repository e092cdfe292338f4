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
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the kernel consumes raw bytes; casting the argument to binary at
    // build time makes md5long60(string_col) work from SQL (UTF-8 bytes)
    // and turns un-castable argument types into an ANALYSIS error instead
    // of an execution-time ClassCastException
    ext.injectFunction((
      FunctionIdentifier("md5long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5long60"),
      (children: Seq[Expression]) => Md5Long60(Cast(children.head, BinaryType))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("intersect_size_long"),
      new ExpressionInfo(classOf[IntersectSizeLong].getName,
        "intersect_size_long"),
      (children: Seq[Expression]) =>
        IntersectSizeLong(children.head, children(1))))
  }
}
