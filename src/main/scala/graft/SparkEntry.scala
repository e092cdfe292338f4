package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AdvancedQueries, CleanseQueries, CoreQueries, CurationQueries, DedupQueries, MultimodalQueries, SimilarityQueries, StreamingQueries, TextQueries, XmlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryPack]] in the engine. Each query name maps to an
  * operator family from SURVEY.md §2 (or a north-star extension); each has a
  * DuckDB oracle unless the op isn't SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries,
    CleanseQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    XmlQueries,
    StreamingQueries,
    MultimodalQueries,
    AdvancedQueries,
    CurationQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q01_agg_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
