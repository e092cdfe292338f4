package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, md5}

/** ES-analogue index store (SURVEY.md §2.2 serving seam).
  *
  * The reference ships each Kafka topic into its own Elasticsearch
  * index (logstash.conf:21-46), after a filter block decorates every
  * event with its source topic (logstash.conf:13-19). The engine
  * analogue keeps the routing table and the metadata columns but lands
  * in parquet: each index is a directory of columnar files under a
  * common root, written through [[TopicRouter]] exactly like the other
  * sinks. Readers get per-index isolation (scan only the index you
  * query) plus parquet column pruning — the lakehouse counterpart of
  * an index per topic. Swapping the format string back to a search
  * sink is a one-line change at the sink seam; the routing and
  * decoration semantics live here and are what the spec pins.
  */
object IndexStore {

  /** The reference's routing table, topic → index name
    * (logstash.conf:21-46). */
  val ReferenceRouting: Map[String, String] = Map(
    "xmlt_fast" -> "filesxmlonly",
    "xmlt"      -> "filesgziphere",
    "csv"       -> "filescsv",
    "xmlhard"   -> "xmlhardware")

  /** Logstash's mutate filter copies the consumer-metadata topic into a
    * `kafka_topic` field (logstash.conf:13-19), and ES assigns each
    * document an `_id`. Analogue: `kafka_topic` from the routing
    * column, `doc_id` = md5 of the serialized payload — content-stable,
    * so replayed batches produce identical ids and downstream dedup
    * (q34-style groupBy on doc_id) restores exactly-once. */
  def decorate(df: DataFrame, topicCol: String,
      valueCol: String = "value"): DataFrame =
    df.withColumn("kafka_topic", col(topicCol))
      .withColumn("doc_id", md5(col(valueCol).cast("binary")))

  /** Per-topic sinks for [[TopicRouter.route]]: each routed subset is
    * decorated and appended under `root/<index>/`. Append mode is the
    * at-least-once contract all flow sinks share; doc_id makes replays
    * detectable. */
  def sinks(root: String, routing: Map[String, String] = ReferenceRouting,
      topicCol: String = "topic"): Map[String, DataFrame => Unit] =
    routing.map { case (topic, index) =>
      topic -> ((df: DataFrame) =>
        decorate(df, topicCol).write.mode("append").parquet(s"$root/$index"))
    }

  /** Read one index back (the serving-side analogue of an index query). */
  def index(s: SparkSession, root: String, name: String): DataFrame =
    s.read.parquet(s"$root/$name")
}
