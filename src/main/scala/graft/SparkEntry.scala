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

  /** Duplicate-name guard: `toMap` keeps the LAST entry, so a name
    * collision across packs would silently shrink the query surface —
    * the r6 silent-vanish class, caught rounds later by artifact_diff
    * instead of at startup. Fail the very first access instead. */
  private def assembled[V](what: String,
      parts: Seq[Seq[(String, V)]]): Map[String, V] = {
    val all = parts.flatten
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
    require(dups.isEmpty,
      s"duplicate $what across packs: ${dups.mkString(", ")} — " +
        "toMap would silently drop an implementation")
    all.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    assembled("query names", packs.map(_.queries.toSeq))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    assembled("oracle names", packs.map(_.oracles.toSeq))
}
