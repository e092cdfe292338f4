package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY.md §2.10: custom aggregates are
  * reserved for mergeable-state cases): numerically stable streaming
  * variance via Welford/Chan's parallel update. The buffer (n, mean,
  * M2) merges associatively, so partial aggregation works map-side and
  * across shuffle — the property any distributed sketch needs.
  * Matches `var_samp` semantics (spec-verified against the built-in). */
object WelfordVariance
    extends Aggregator[Double, (Long, Double, Double), java.lang.Double] {

  override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)

  override def reduce(b: (Long, Double, Double),
      x: Double): (Long, Double, Double) = {
    val (n, mean, m2) = b
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    (n1, mean1, m2 + d * (x - mean1))
  }

  override def merge(a: (Long, Double, Double),
      b: (Long, Double, Double)): (Long, Double, Double) = {
    val (na, ma, m2a) = a
    val (nb, mb, m2b) = b
    if (na == 0) b
    else if (nb == 0) a
    else {
      val n = na + nb
      val d = mb - ma
      (n, ma + d * nb / n, m2a + m2b + d * d * na * nb / n)
    }
  }

  // NULL (not NaN) below two samples: var_samp returns NULL there
  // (spark.sql.legacy.statisticalAggregate=false, the default, and
  // DuckDB agrees), and the header's parity claim has to hold on
  // singleton groups too — NaN would also poison downstream arithmetic
  // where NULL propagates as absence
  override def finish(b: (Long, Double, Double)): java.lang.Double =
    if (b._1 < 2) null else b._3 / (b._1 - 1)

  override def bufferEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
