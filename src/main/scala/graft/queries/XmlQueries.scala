package graft.queries

import graft.{QueryPack, Tables}
import graft.sources.XmlMeas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle coverage for the 32.435 XML flatten (SURVEY.md §2.1 S3 — the
  * reference's core transformation). The query synthesizes one XML
  * document per `nation` row (covering every FIXTURES.md §1 edge case:
  * NIL r-value, empty r-value, `p` without a measType → UNKNOWN_p,
  * measObjLdn without '=', multiple measInfo per file), runs the real
  * `XmlMeas.flatten`, and the oracle computes the expected EAV rows
  * directly from `nation`.
  */
object XmlQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_xml_flatten" -> ((s, d) => {
      val k = col("n_nationkey").cast("string")
      val r = col("n_regionkey").cast("string")
      val xml = concat(
        lit("<measCollecFile xmlns=\"http://www.3gpp.org/ftp/specs/archive/32_series/32.435#measCollec\">"),
        lit("<fileHeader><measCollec beginTime=\"2025-04-13T10:00:00Z\"/></fileHeader>"),
        lit("<measData>"),
        lit("<managedElement localDn=\"SubNetwork=TN,ManagedElement=ME"), k, lit("\"/>"),
        lit("<measInfo measInfoId=\"MI_A\">"),
        lit("<job jobId=\"job-"), k, lit("\"/>"),
        lit("<granPeriod duration=\"PT900S\" endTime=\"2025-04-13T10:15:00Z\"/>"),
        lit("<measType p=\"1\">KPI_ALPHA</measType>"),
        lit("<measType p=\"2\">KPI_BETA</measType>"),
        // even keys carry a second '=' in the first field ("…NODE4=S1,…"
        // → nodeid NODE4); the oracle derives nodeid as 'NODE' || k
        lit("<measValue measObjLdn=\"eNodeB=NODE"), k,
        when(col("n_nationkey") % 2 === 0, lit("=S1")).otherwise(lit("")),
        lit(",Cell="), r, lit("\">"),
        lit("<r p=\"1\">"), (col("n_nationkey") * 1.5).cast("string"), lit("</r>"),
        lit("<r p=\"2\">NIL</r>"),
        lit("<r p=\"3\">"), r, lit("</r>"),
        lit("</measValue></measInfo>"),
        lit("<measInfo measInfoId=\"MI_B\">"),
        lit("<job jobId=\"job-"), k, lit("\"/>"),
        lit("<granPeriod duration=\"PT900S\" endTime=\"2025-04-13T10:15:00Z\"/>"),
        lit("<measType p=\"1\">KPI_GAMMA</measType>"),
        lit("<measValue measObjLdn=\"PLAIN"), k, lit("\">"),
        lit("<r p=\"1\"></r>"),
        lit("</measValue></measInfo>"),
        lit("</measData></measCollecFile>"))
      val docs = Tables.nation(s, d)
        .select(col("n_nationkey").as("fid"), xml.as("xml"))
      XmlMeas.flatten(docs, "xml", "fid")
        .withColumnRenamed("fileId", "fid")
        .orderBy(col("fid"), col("measInfoId"), col("kpiId"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q41_xml_flatten" ->
      """WITH n AS (SELECT n_nationkey AS k, n_regionkey AS r,
        |  'eNodeB=NODE' || n_nationkey ||
        |    (CASE WHEN n_nationkey % 2 = 0 THEN '=S1' ELSE '' END) ||
        |    ',Cell=' || n_regionkey AS ldn FROM nation),
        |rows AS (
        |  SELECT k, 'MI_A' AS mi, '1' AS kpiId, 'KPI_ALPHA' AS kpiName,
        |         k * 1.5 AS kpiValue, 'NODE' || k AS nodeid,
        |         ldn AS measObjLdn FROM n
        |  UNION ALL
        |  SELECT k, 'MI_A', '2', 'KPI_BETA', 0.0, 'NODE' || k, ldn FROM n
        |  UNION ALL
        |  SELECT k, 'MI_A', '3', 'UNKNOWN_3', r::DOUBLE, 'NODE' || k, ldn FROM n
        |  UNION ALL
        |  SELECT k, 'MI_B', '1', 'KPI_GAMMA', 0.0, '', 'PLAIN' || k FROM n)
        |SELECT k AS fid, '2025-04-13T10:00:00Z' AS beginTime,
        |  'SubNetwork=TN,ManagedElement=ME' || k AS localDn,
        |  mi AS measInfoId, 'job-' || k AS jobId, 'PT900S' AS granPeriod,
        |  '2025-04-13T10:15:00Z' AS endTime, measObjLdn, nodeid,
        |  kpiId, kpiName, kpiValue
        |FROM rows ORDER BY fid, measInfoId, kpiId""".stripMargin
  )
}
