package graft.ext

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter pattern made an
  * explicit operator.
  *
  * A selective dimension's join keys are folded into ONE bloom filter
  * (mergeable partial aggregation, so the build is a map-side sketch
  * merge like HLL), the ~MB filter ships to the driver and back out as a
  * literal (exactly how Spark's own InjectRuntimeFilter broadcasts its
  * bloom subquery result), and the fact side is pruned MAP-SIDE before
  * its shuffle. False positives only — an exact semi join downstream
  * keeps the result exact, the bloom just cuts shuffle volume by the
  * dimension's selectivity. That is the 100 TB win: where the dimension
  * is too big to broadcast (else BHJ already avoids the fact shuffle),
  * the bloom is what keeps the sort-merge join's exchange small.
  *
  * Uses Spark's own BloomFilterAggregate / BloomFilterMightContain
  * catalyst expressions (the pair behind spark.sql.optimizer.runtime.
  * bloomFilter) over xxhash64 keys — codegen'd, no UDFs.
  */
object BloomPrune {

  /** Build the serialized bloom over `key` (expected cardinality sizes
    * the bit array; the driver round trip is one ~MB binary — the same
    * pattern as a broadcast runtime filter). */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(key)), expectedItems)
    df.select(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
  }

  /** Pruning predicate: might-contain test of `key` against the built
    * filter (false positives possible, false negatives not). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(lit(bloom)),
      GraftColumnBridge.expression(xxhash64(key))))
}
