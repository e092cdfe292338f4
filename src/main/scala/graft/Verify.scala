package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: only dump queries whose name contains it (local
    // iteration aid — the driver always calls with exactly 2 args)
    val only = args.drop(2).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    // A throwing query must not abort the dump (the driver needs the other
    // results), but it must also not VANISH: r6's testdata regen broke
    // three queries and the only trace was a stderr line nobody kept —
    // the driver's correctness run just shrank 109→106 with every row
    // green. Failures now land in outDir/_failed.json next to the results
    // and in a final stdout summary line.
    val failed = scala.collection.mutable.SortedMap.empty[String, String]
    var dumped = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        dumped += 1
      }
      catch { case e: Throwable =>
        failed(name) = String.valueOf(e.getMessage)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_failed.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // stop Spark BEFORE the summary line (Bench's convention): its
    // shutdown log noise must land ahead of the one line a driver
    // keeping a fixed-size stdout TAIL needs to retain — printed last,
    // the summary survives; printed first, it scrolls out (the r6
    // blindspot Bench already fixed for itself)
    GraftSession.close(spark) // release registry-cached standing frames
    spark.stop()
    println(s"[verify] dumped $dumped queries, ${failed.size} failed" +
      (if (failed.isEmpty) "" else failed.keys.mkString(" (", ", ", ")")))
  }
}
