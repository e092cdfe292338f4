package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import java.security.MessageDigest

/** Shared kernel: 60-bit hash = value of the first 15 hex nibbles of
  * md5(bytes), i.e. the first 8 digest bytes big-endian >>> 4.
  * Identical to `conv(substring(md5(x), 1, 15), 16, 10)` and to DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` — but computed without the
  * hex-string round trip. Separate object (not the expression's
  * companion) so Janino-generated code can call the static forwarder. */
object Md5Hash {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Native Catalyst expression for the engine-portable 60-bit md5 hash
  * (SURVEY.md §2.10 ladder: custom `Expression` with `doGenCode` where
  * it measurably beats composing built-ins — here it skips the
  * 32-char hex string materialization + base-16 string parse that
  * `conv(substring(md5(x),1,15),16,10)` pays per call, on the hottest
  * primitive of the dedup/fingerprint operators).
  *
  * Registered as SQL function `md5long60` via [[graft.GraftExtensions]].
  */
case class Md5Long60(child: Expression) extends UnaryExpression {
  // analysis-time contract like VecDot/IntersectSizeLong (the SQL
  // registration casts to binary; Column-API misuse fails named here,
  // not as an executor-side ClassCastException)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5long60 requires binary input, got ${t.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5long60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}
