package graft.queries

import graft.{QueryPack, Tables}
import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full training-data curation funnel as ONE composed pipeline —
  * the end-to-end shape a 100 TB corpus actually runs, built entirely
  * from the engine's own operators: language-ID filter → quality-score
  * filter → exact dedup (canonical = min doc_id per content hash) →
  * near-dup dedup (MinHash-LSH pairs → connected components → keep the
  * cluster representative). The query reports the funnel: documents
  * surviving each stage. Every stage is oracle-mirrored in DuckDB, so
  * the composition (not just the parts) is hash-verified.
  *
  * Scale posture: stages 1–2 are map-side scans; exact dedup shuffles
  * once on the content hash; near-dup reuses the guarded LSH layout
  * over the (much smaller) survivor set — the standard funnel ordering
  * precisely because each stage shrinks the input to the next. */
object CurationQueries extends QueryPack {

  private val QualityMin = 0.55
  private val K = 16
  private val Bands = 4

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_curation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("predicted", TextAnalysis.langId(col("text")))
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .cache()
      val langKeep = docs.filter(col("predicted") === "en")
      val qualKeep = langKeep.filter(col("q") >= QualityMin)
      val exactKeep = qualKeep
        .withColumn("minid",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text").cast("binary")))))
        .filter(col("doc_id") === col("minid")).drop("minid")
      val pairs = Dedup.minhashLshPairs(exactKeep, "doc_id", "text",
        shingleN = 3, k = K, bands = Bands, threshold = 0.8)
      val labels = Dedup.connectedComponents(pairs.select(col("a_id"), col("b_id")))
        .withColumnRenamed("id", "doc_id")
      val nearKeep = exactKeep.join(labels, Seq("doc_id"), "left")
        .filter(col("comp").isNull || col("comp") === col("doc_id"))
      val stages = Seq(
        (0, "raw", docs), (1, "lang_en", langKeep),
        (2, s"quality_ge_$QualityMin", qualKeep),
        (3, "exact_dedup", exactKeep), (4, "near_dup_canonical", nearKeep))
      stages.map { case (i, name, df) =>
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i).as("stage"), lit(name).as("name"), col("n_docs"))
      }.reduce(_ unionAll _).orderBy(col("stage"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q61_curation" -> {
      val (scoreCols, caseExpr) = TextQueries.predictedSql
      s"""WITH RECURSIVE scored AS (SELECT doc_id, text,
         |    ${TextQueries.qualitySql} AS q,
         |$scoreCols
         |  FROM documents),
         |base AS (SELECT doc_id, text, q, $caseExpr AS predicted FROM scored),
         |lk AS (SELECT * FROM base WHERE predicted = 'en'),
         |qk AS (SELECT * FROM lk WHERE q >= $QualityMin),
         |ek AS (SELECT doc_id, text FROM (
         |  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS mid
         |  FROM qk) t WHERE doc_id = mid),
         |${DedupQueries.minhashPairsCtes("ek")},
         |verts AS (SELECT a_id AS id FROM np UNION SELECT b_id FROM np),
         |und AS (SELECT a_id AS src, b_id AS dst FROM np
         |  UNION SELECT b_id, a_id FROM np),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
         |compx AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |nk AS (SELECT e.doc_id FROM ek e LEFT JOIN compx c ON e.doc_id = c.id
         |  WHERE c.comp IS NULL OR c.comp = e.doc_id)
         |SELECT 0 AS stage, 'raw' AS name, count(*) AS n_docs FROM documents
         |UNION ALL SELECT 1, 'lang_en', count(*) FROM lk
         |UNION ALL SELECT 2, 'quality_ge_$QualityMin', count(*) FROM qk
         |UNION ALL SELECT 3, 'exact_dedup', count(*) FROM ek
         |UNION ALL SELECT 4, 'near_dup_canonical', count(*) FROM nk
         |ORDER BY stage""".stripMargin
    }
  )
}
