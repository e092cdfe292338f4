package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka JSON source (SURVEY.md §2.1 S6 — the engine-side analogue of
  * the reference's Logstash consumer over topics
  * `xmlt_fast,xmlt,csv,xmlhard`, logstash.conf:2-9).
  *
  * The physical connector (`format("kafka")`) resolves from the cluster
  * classpath at runtime; the payload-parsing stage ([[parse]]) is plain
  * engine code — unit-testable against static frames with the same
  * (key, value, topic) binary shape Kafka produces.
  */
object KafkaJsonSource {

  /** Exact option map [[stream]] hands the kafka connector — factored
    * out so the subscription contract is spec-testable without a broker
    * (KafkaContractSpec). */
  def kafkaReadOptions(bootstrap: String, topics: Seq[String]): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","))

  /** Streaming subscription over one or more topics, JSON-decoded. */
  def stream(spark: SparkSession, bootstrap: String, topics: Seq[String],
      schema: StructType): DataFrame =
    parse(spark.readStream.format("kafka")
      .options(kafkaReadOptions(bootstrap, topics))
      .load(), schema)

  /** Kafka's wire columns → typed rows: value JSON decoded with the
    * fixed schema (schema-on-read projection per SURVEY §1.3 — fields
    * absent from `schema` are dropped, the reference's P3 pattern),
    * `topic` retained for downstream routing (K3). */
  def parse(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(col("topic"),
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), schema).as("r"))
      .select(col("topic"), col("key"), col("r.*"))
}
