package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregation keys (prompt/SURVEY scale
  * posture: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting covers joins; for AGGREGATIONS over a
  * pathological hot key, two-phase salted aggregation bounds any single
  * task's share of the hot key to 1/`salts`: phase 1 aggregates on
  * (key, salt) — salt derived deterministically from a secondary column
  * so re-runs are reproducible — phase 2 merges the partials on key.
  * Works for any algebraic aggregate (sum/count/min/max; avg via
  * sum+count pair). */
object Skew {

  /** Deterministic salt in [0, salts): hash of a secondary column —
    * NOT random, so results and re-runs are reproducible. */
  def saltCol(secondary: Column, salts: Int): Column =
    pmod(xxhash64(secondary), lit(salts))

  /** Two-phase salted sum/count per key. Returns (key, sum, count). */
  def saltedSumCount(df: DataFrame, key: String, value: String,
      secondary: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(col(secondary), salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__n")).as("n"))
}
