package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.input_file_name
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming file-source pipeline (SURVEY.md §2.1 S1/S2, §2.8 ST1-ST9):
  * schema'd json/csv directory source with per-file micro-batching and
  * optional source-managed archiving, a transform stage, and a
  * `foreachBatch` sink hook — drained with `Trigger.AvailableNow` (the
  * modern `trigger(once)`) under a checkpoint.
  *
  * Delivery contract (same as the reference, SURVEY §2.8): exactly-once
  * on the file source via checkpoint + archive; at-least-once into
  * external sinks whose writes aren't transactional (Kafka).
  */
final case class FilePipelineConfig(
    inputDir: String,
    schema: StructType,
    format: String = "json",           // "json" | "csv"
    multiline: Boolean = true,         // reference reads JSON-array files
    header: Boolean = true,            // CSV flow
    maxFilesPerTrigger: Option[Int] = Some(1), // ST6
    checkpointDir: String,
    archiveDir: Option[String] = None, // ST7 cleanSource=archive
    provenanceCol: Option[String] = Some("input_file")) // F9

object FilePipeline {

  /** Build the streaming source DataFrame. */
  def source(spark: SparkSession, cfg: FilePipelineConfig): DataFrame = {
    var r = spark.readStream.schema(cfg.schema)
    cfg.maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r = cfg.format match {
      case "json" => r.option("multiline", cfg.multiline)
      case "csv"  => r.option("header", cfg.header)
      case other  => throw new IllegalArgumentException(s"format: $other")
    }
    cfg.archiveDir.foreach { d =>
      r = r.option("cleanSource", "archive").option("sourceArchiveDir", d)
    }
    val df = r.format(cfg.format).load(cfg.inputDir)
    cfg.provenanceCol.fold(df)(c => df.withColumn(c, input_file_name()))
  }

  /** Drain everything currently in the input dir through `transform`
    * into `sink`, then stop (reference ST2 trigger-once DAG semantics).
    * Blocks until the drain completes. */
  def drainAvailable(spark: SparkSession, cfg: FilePipelineConfig,
      transform: DataFrame => DataFrame,
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val q = source(spark, cfg).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // O3 branch-if-empty. The probe is an extra job per batch, but
        // a BOUNDED one — isEmpty is limit(1), which short-circuits
        // after the first row, it does not rescan the batch — and it
        // keeps no-data batches (watermark-advance triggers) from
        // writing empty output files. Persisting the batch around
        // probe+sink was considered and NOT taken: r5 measured cache()
        // overhead on small map-only batches costing more than the
        // re-evaluation it saves (BASELINE.md r5 row).
        if (!batch.isEmpty) sink(transform(batch), id)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cfg.checkpointDir)
      .start()
    q.awaitTermination()
    q
  }

  /** Continuous variant (reference ST3): default ASAP micro-batches;
    * caller owns the returned query's lifecycle. */
  def runContinuous(spark: SparkSession, cfg: FilePipelineConfig,
      transform: DataFrame => DataFrame,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    source(spark, cfg).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // same bounded limit(1) probe as drainAvailable — see there
        if (!batch.isEmpty) sink(transform(batch), id)
      }
      .option("checkpointLocation", cfg.checkpointDir)
      .start()
}
