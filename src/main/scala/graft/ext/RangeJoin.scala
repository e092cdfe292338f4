package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — the scalable composition for
  * "point falls inside [start, end)" joins, which Spark would otherwise
  * execute as a broadcast-nested-loop over the inequality.
  *
  * Each range explodes into the fixed-width time buckets it overlaps;
  * points compute their single bucket; the join becomes an equi-join on
  * the bucket key (shuffle-partitionable, AQE-coalescible) followed by
  * the exact range predicate. Cost: |ranges| × (span/width) exploded
  * rows — pick `bucketSeconds` near the typical range span so ranges
  * explode into O(1) buckets. Standard time-series/interval layout.
  */
object RangeJoin {

  // Microsecond arithmetic, not unix_timestamp: second-truncation is
  // safe for POINTS (bucket boundaries are whole seconds, so
  // floor(trunc(t)/w) == floor(t/w)) but NOT for the exclusive range
  // END — a range ending at 10:00:00.500 covers part of the 10:00
  // bucket, while trunc(end)-1 lands the last bucket at 09:59 and the
  // equi-join silently misses every point in the uncovered bucket.
  // events.ts carries microsecond precision, so the mismatch is real.
  // The cast makes NTZ columns acceptable too: unix_micros requires
  // TIMESTAMP (unlike the coercing unix_timestamp), and under the
  // engine's fixed UTC session zone NTZ→TIMESTAMP is instant-identity.
  private def micros(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  private def bucketOf(ts: Column, width: Long): Column =
    floor(micros(ts) / (width * 1000000L))

  /** Join `points` (timestamp `pointTs`) to `ranges` ([startCol,
    * endCol) exclusive-end) on containment. */
  def pointInRange(points: DataFrame, pointTs: String,
      ranges: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val pb = points.withColumn("__bucket",
      bucketOf(col(pointTs), bucketSeconds))
    // Guard degenerate ranges BEFORE sequence(): with end <= start the
    // bucket bounds invert and sequence(a, b < a) COUNTS DOWN — an
    // empty interval would explode into two spurious buckets, and a
    // data-error inverted range (end years before start) into
    // span/width rows, a shuffle blowup for output the exact predicate
    // discards anyway. The correct bucket set for end <= start (end
    // exclusive ⇒ the interval contains nothing) is empty: explode()
    // drops the NULL-array rows.
    val rb = ranges.withColumn("__bucket",
      explode(when(col(endCol) > col(startCol), sequence(
        bucketOf(col(startCol), bucketSeconds),
        // end is exclusive: the bucket of (end - 1µs) is the last
        // overlapped — microsecond-exact, so a fractional-second end
        // still emits its final bucket (and a same-bucket sub-second
        // interval can no longer produce a descending sequence)
        floor((micros(col(endCol)) - 1) /
          (bucketSeconds * 1000000L))))))
    pb.join(rb, "__bucket")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bucket")
  }
}
