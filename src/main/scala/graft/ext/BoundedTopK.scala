package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** (value, id) pair ranked by value DESC with id ASC tie-break. */
final case class ScoredId(v: Double, id: Long)

/** Bounded top-k partial aggregate — the scalable top-k-per-key.
  *
  * A window `row_number() <= k` sorts EVERY row of every key through
  * the shuffle; this Aggregator's buffer holds at most k pairs per
  * partition and merges capped buffers — O(k) state per key and
  * map-side combine, the same mergeable-partial property that makes
  * count/sum/HLL scale (SURVEY §2.10: custom aggregates are reserved
  * for exactly these mergeable-state cases). At 100 TB the shuffle
  * carries |keys|·k pairs instead of every row.
  *
  * Deterministic total order (value DESC, id ASC) so results — and the
  * DuckDB oracle's row_number mirror — are reproducible. The per-reduce
  * re-sort is O(k log k) on a ≤ k+1 buffer; chase with a binary insert
  * if k ever grows past sketch size. */
class BoundedTopK(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def cap(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortBy(x => (-x.v, x.id)).take(k)
  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    cap(b :+ a)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    cap(a ++ b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
