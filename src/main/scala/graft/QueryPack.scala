package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Contract (see SparkEntry): every key in `queries` SHOULD have a matching
  * DuckDB-runnable SQL in `oracles` with IDENTICAL output column names —
  * the driver sorts columns by name before hashing. Queries whose semantics
  * aren't SQL-expressible omit the oracle (driver falls back to a
  * rows-only check).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
