package graft.queries

import graft.{QueryPack, Tables}
import graft.ext.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle coverage for the multimodal plumbing (SURVEY.md §0): the
  * documents table stands in for a media corpus (text bytes as the
  * opaque binary payload, lang as the media kind). The decode stub's
  * features are md5-derived, so the DuckDB oracle recomputes the whole
  * mapPartitions pipeline relationally.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- decode → resize → per-kind feature aggregate ----
    "q43_media_features" -> ((s, d) => {
      val media = Multimodal.asMedia(
        Tables.documents(s, d), "doc_id", "lang", "text")
      val feats = Multimodal.resizeStub(Multimodal.decodeFeatures(media), 256)
      feats.groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("sum_bytes"),
          round(avg(col("out_width")), 4).as("avg_w"),
          round(avg(col("out_height")), 4).as("avg_h"))
        .orderBy(col("kind"))
    }),

    // ---- frame sampling: 1→n explode with per-frame hashes ----
    "q44_frame_sample" -> ((s, d) => {
      val media = Multimodal.asMedia(
        Tables.documents(s, d).filter(col("doc_id") % 25 === 0),
        "doc_id", "lang", "text")
      Multimodal.sampleFrames(media, 4).toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q43_media_features" ->
      """WITH f AS (SELECT lang AS kind, octet_length(encode(text)) AS n_bytes,
        |    16 + ('0x' || substr(md5(text), 1, 15))::BIGINT % 1024 AS width,
        |    16 + (('0x' || substr(md5(text), 1, 15))::BIGINT >> 10) % 1024 AS height
        |  FROM documents),
        |r AS (SELECT kind, n_bytes,
        |    CAST(floor(width * least(1.0, 256 / greatest(width, height))) AS INTEGER) AS out_w,
        |    CAST(floor(height * least(1.0, 256 / greatest(width, height))) AS INTEGER) AS out_h
        |  FROM f)
        |SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
        |  round(avg(out_w), 4) AS avg_w, round(avg(out_h), 4) AS avg_h
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin,

    "q44_frame_sample" ->
      """SELECT doc_id AS media_id, ff.i AS frame_idx,
        |  ('0x' || substr(md5(text || ff.i::VARCHAR), 1, 15))::BIGINT AS frame_hash
        |FROM documents, (VALUES (0), (1), (2), (3)) AS ff(i)
        |WHERE doc_id % 25 = 0
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
