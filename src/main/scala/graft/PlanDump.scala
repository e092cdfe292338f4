package graft

import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round instrumentation: dump `.explain("formatted")` for
  * every registered query to one file per query, so plan shape (Exchange
  * count, join strategy, PushedFilters/ReadSchema, WholeStageCodegen
  * spans) can be diffed before/after a change and committed as evidence
  * (plans/r21/). Building a batch query's DataFrame is lazy — nothing
  * executes — but the streaming queries drain their fixture micro-batches
  * before returning the final batch aggregate, so a full dump costs one
  * streaming pass (the captured plan is that final aggregate's).
  *
  *   runMain graft.PlanDump <sfDir> <outDir> [nameSubstring]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_plans"
    val only = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) =>
        val body =
          try fn(spark, sfDir).queryExecution.explainString(mode)
          catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), body)
        println(s"[plandump] $name -> $outDir/$name.txt")
      }
    GraftSession.close(spark)
    spark.stop()
  }
}
