package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Tree-reduced element-wise vector mean — the PRODUCTION path for
  * per-group embedding centroids (q87/q109's per-source monitor
  * shape). The buffer is (count, element-wise sum): d+1 doubles per
  * group however large the group, merged associatively, so partial
  * aggregation runs map-side and across the shuffle (SURVEY §2.10:
  * custom aggregates are reserved for exactly these mergeable-state
  * cases). This is the shape that survives a 10⁹-vector source domain
  * at 100 TB — where the order-pinned sorted-collect_list fold (kept
  * as the ORACLE-verification mode because it is bit-portable to
  * DuckDB) materializes the whole group into one row and OOMs a
  * single task.
  *
  * Float addition is not bit-associative, so this mean is NOT
  * bit-portable across partitionings; equality with the pinned fold is
  * asserted within 1e-9 (`VecMeanSpec`) — the engine's standing
  * exact-vs-approx split (cf. q38 brute force vs q39/q50 ANN).
  */
final class VecMean(dims: Int)
    extends Aggregator[Seq[Double], VecMean.Buf, Seq[Double]] {
  import VecMean.Buf

  override def zero: Buf = Buf(0L, new Array[Double](dims))

  override def reduce(b: Buf, x: Seq[Double]): Buf = {
    if (x == null) return b // null vector: skip, like built-in avg
    require(x.length == dims,
      s"vector of ${x.length} dims where the aggregate expects $dims")
    var i = 0
    while (i < dims) { b.s(i) += x(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dims) { a.s(i) += b.s(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0L) null
    else {
      val out = new Array[Double](dims)
      var i = 0
      while (i < dims) { out(i) = b.s(i) / b.n; i += 1 }
      out.toSeq
    }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object VecMean {
  /** (count, element-wise sum) — the bounded per-group state. Fields
    * are mutated in place by reduce/merge (each group gets a fresh
    * instance from `zero`; the docs-sanctioned typed-Aggregator
    * pattern). */
  final case class Buf(var n: Long, s: Array[Double])
}
