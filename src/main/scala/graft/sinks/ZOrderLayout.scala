package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional skipping.
  *
  * A table range-partitioned and sorted on ONE key skips files only for
  * predicates on that key — a predicate on any other column touches
  * every file. Interleaving the bits of two (or more) keys into one
  * z-value and laying the table out by it gives every file a tight
  * min/max envelope in BOTH dimensions, so parquet footer stats prune
  * files/row-groups for box predicates on either key (~√f of files for
  * a 1-D slice instead of all f). This is the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER, built here from public primitives:
  * a bit-interleave expression + repartitionByRange + sortWithinPartitions.
  *
  * The z-value is pure integer bit math (shift/and/add) — codegen'd,
  * engine-portable (a SQL oracle reproduces it with the same shifts),
  * and computed map-side at write time. The write-time range shuffle is
  * paid once and amortized over every subsequent pruned scan, like
  * [[BucketedTables]] for joins.
  */
object ZOrderLayout {

  /** Morton interleave of the low `bits` bits of non-negative `x` and
    * `y`: x's bit i lands at position 2i, y's at 2i+1.
    *
    * bits is bounded 1..31: 0 would crash the reduce on an empty list,
    * and 2*31+1 = 63 is the last shift keeping z non-negative — at
    * bits = 32 the sign bit flips for rows with y's top grid bit set,
    * range-partitioning them FIRST and overlapping every file envelope
    * (the silent-pruning-loss class the domain guards below exist to
    * prevent). */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31,
      s"zvalue bits must be in 1..31, got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same interleave as DuckDB SQL (for oracles). */
  def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Write `df` z-ordered on (`xCol`, `yCol`) into `files` files at
    * `path`: range-partition by z-value (balanced file sizes via
    * sampled range bounds), sort within each file so row groups get
    * tight stats too, drop the transient z column.
    *
    * Both keys are first SCALED onto the full 2^bits grid
    * (`key * 2^bits div (max+1)`): raw interleaving lets the wider
    * domain's high bits dominate the curve — with a 16-bit orderkey and
    * an 11-bit partkey the "z" order degenerates into an orderkey sort
    * and buys no partkey locality (measured: every file still spans the
    * partkey range). The two max() lookups are metadata-cheap (parquet
    * footer stats at scale); real table formats keep them in the
    * catalog. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      files: Int, path: String): Unit = {
    // validate BEFORE paying the min/max aggregate below
    require(bits >= 1 && bits <= 31,
      s"writeZOrdered bits must be in 1..31, got $bits")
    val r = df.agg(max(col(xCol)), max(col(yCol)),
      min(col(xCol)), min(col(yCol))).head
    // Empty input: max() is NULL and there is nothing to order — write
    // the empty frame as-is (a maintenance pass over an empty partition
    // must no-op, not NPE on the null aggregate).
    if (r.isNullAt(0) || r.isNullAt(1)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    // getAs[Number]: accept INT/SMALLINT keys, not just LONG
    val (xm, ym) = (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
    val grid = 1L << bits
    // Domain guards — violations would not throw, they would SILENTLY
    // produce overlapping file envelopes (the pruning this writer
    // exists for, lost without a symptom): a negative key scales to a
    // negative grid position whose sign bit corrupts the interleave,
    // and a max key over Long.MaxValue/grid wraps the scale-up multiply
    // in non-ANSI mode (e.g. z-ordering raw 60-bit md5 hashes at
    // bits=16). Map such keys into [0, 2^63/grid) first.
    val (xn, yn) = (r.getAs[Number](2).longValue, r.getAs[Number](3).longValue)
    require(xn >= 0 && yn >= 0,
      s"writeZOrdered requires non-negative keys (min $xCol=$xn, " +
        s"min $yCol=$yn) — shift or hash-fold negative domains first")
    require(xm <= Long.MaxValue / grid && ym <= Long.MaxValue / grid,
      s"writeZOrdered key max (${math.max(xm, ym)}) * 2^$bits would " +
        "overflow the BIGINT scale-up — reduce bits or pre-scale the key")
    // CAST to BIGINT before the scale-up multiply: an INT key times the
    // grid would wrap silently in non-ANSI mode and corrupt z-values
    val zs = zvalue(
      expr(s"(CAST($xCol AS BIGINT) * $grid) div ${xm + 1}"),
      expr(s"(CAST($yCol AS BIGINT) * $grid) div ${ym + 1}"), bits)
    df.withColumn("__z", zs)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
