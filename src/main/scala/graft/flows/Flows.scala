package graft.flows

import graft.model.Schemas
import graft.sinks.KafkaJsonSink
import graft.sources.XmlMeas
import graft.streaming.{FileLifecycle, FilePipeline, FilePipelineConfig}
import graft.transforms.Cleanse
import graft.runtime.Runner
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four pipelines as engine entry points (SURVEY.md §3)
  * — what a user of the reference runs today, re-expressed as one-JVM
  * Spark flows. Each drain is idempotent-by-lifecycle: backup (md5
  * dedup) → process → move-to-processed → completeness audit, with the
  * at-least-once-to-sink contract documented in SURVEY §2.8.
  *
  * The sink is injected (`DataFrame => Unit` over the JSON payload) so
  * production wires `KafkaJsonSink.writeKafka(_, topic, bootstrap)` and
  * tests wire a file sink — the payload shape is identical.
  */
object Flows {

  final case class FlowDirs(input: String, processed: String, backup: String)

  final case class FlowReport(files: Int, rows: Long, ok: Boolean,
      remaining: Int)

  private def lifecycle(spark: SparkSession) =
    new FileLifecycle(spark.sparkContext.hadoopConfiguration)

  /** Shared XML drain: flatten every *.xml in `dirs.input`, project the
    * flow's variant columns, publish, then backup+move each file. */
  private def xmlDrain(spark: SparkSession, dirs: FlowDirs,
      variant: Seq[String], sink: DataFrame => Unit,
      nowMillis: Long): FlowReport = {
    val fl = lifecycle(spark)
    val files = fl.auditRemaining(new Path(dirs.input), "*.xml")
    if (files.isEmpty) return FlowReport(0, 0L, ok = true, remaining = 0)
    val flat = XmlMeas.readAndFlatten(spark, dirs.input)
    var rows = 0L
    // O3 branch-if-empty; O5 retry around the publish
    val ran = Runner.runIfNonEmpty(flat) { df =>
      val projected = df.select(variant.map(col): _*)
      Runner.retry(3) {
        rows = projected.count()
        sink(KafkaJsonSink.payload(projected, exclude = Set.empty))
      }
    }
    files.foreach { f =>
      fl.backupDeduped(f, new Path(dirs.backup), nowMillis)
      fl.moveProcessed(f, new Path(dirs.processed), nowMillis)
    }
    val remaining = fl.auditRemaining(new Path(dirs.input), "*.xml").size
    FlowReport(files.size, rows, ok = ran || rows == 0, remaining)
  }

  /** Flow 2 — xml_fast (reference Dag2 + mypy/xmlonly.py → topic
    * xmlt_fast): 10-field EAV with nodeid, kpiValue already double. */
  def xmlFast(spark: SparkSession, dirs: FlowDirs, sink: DataFrame => Unit,
      nowMillis: Long = System.currentTimeMillis()): FlowReport =
    xmlDrain(spark, dirs, Schemas.kpiXmlFast.fieldNames.toSeq, sink, nowMillis)

  /** Flow 3 — gzip (Dag3 + mypy/streaming.py → topic xmlt): gunzip
    * stage first, then the 9-field variant (schema-on-read drops
    * nodeid, SURVEY §1.3 P3). */
  def gzipXml(spark: SparkSession, gzipInput: String, dirs: FlowDirs,
      sink: DataFrame => Unit,
      nowMillis: Long = System.currentTimeMillis()): FlowReport = {
    val fl = lifecycle(spark)
    fl.gunzipAll(new Path(gzipInput), new Path(dirs.input),
      new Path(dirs.processed), nowMillis)
    xmlDrain(spark, dirs, Schemas.kpiGzip.fieldNames.toSeq, sink, nowMillis)
  }

  /** Flow 4 — hardware (Dag4 + mypy/xmlhard.py → topic xmlhard):
    * localDn from managedElement, raw measObjLdn (no nodeid). */
  def hardware(spark: SparkSession, dirs: FlowDirs, sink: DataFrame => Unit,
      nowMillis: Long = System.currentTimeMillis()): FlowReport =
    xmlDrain(spark, dirs, Schemas.kpiHardware.fieldNames.toSeq, sink, nowMillis)

  /** Flow 1 — CSV cell-KPIs (Dag1 + mypy/preprocessproduce.py → topic
    * csv): streaming drain with the 69-col schema, full cleanse chain,
    * batch-id key, source-managed archive (ST7). */
  def csvCells(spark: SparkSession, inputDir: String, checkpointDir: String,
      archiveDir: String, sink: DataFrame => Unit): Unit = {
    val cfg = FilePipelineConfig(inputDir = inputDir,
      schema = Schemas.cellKpi69, format = "csv",
      checkpointDir = checkpointDir, archiveDir = Some(archiveDir),
      provenanceCol = None)
    FilePipeline.drainAvailable(spark, cfg,
      transform = Cleanse.cellKpiChain,
      sink = (df, batchId) => sink(KafkaJsonSink.payload(df,
        exclude = Set.empty, keyExpr = Some(lit(batchId.toString)))))
  }
}
