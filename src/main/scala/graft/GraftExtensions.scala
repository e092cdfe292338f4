package graft

import graft.functions.Md5Long60
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SURVEY.md §7 ladder (c):
  * `SparkSessionExtensions`): registers the engine's native expressions
  * into the session's function registry so they are usable from SQL as
  * well as the Column API. Installed via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("md5long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5long60"),
      (children: Seq[Expression]) => Md5Long60(children.head)))
  }
}
