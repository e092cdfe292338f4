package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md / FIXTURES.md §6). One parquet file per table under
  * `sfDir`. All reads go through here so every query benefits from the
  * same conventions (column pruning happens downstream via select).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts normalization: every engine query sees TimestampType.
    *
    * The driver's generator has shipped the column two ways: parquet
    * TIMESTAMP(NANOS), which Spark 4 refuses to read as a timestamp
    * (sessions set spark.sql.legacy.parquet.nanosAsLong=true, see
    * GraftSession, and the long nanos are converted with exact integer
    * division — DIV, not double `/`, which loses precision above 2^53),
    * and plain timestamp[us] with isAdjustedToUTC=false, which Spark 4
    * reads as TIMESTAMP_NTZ. The NTZ cast to TimestampType is wall-clock
    * under the session zone; sessions pin UTC, so both paths yield the
    * same instants and downstream collects see java.sql.Timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
