package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance pass every streaming sink
  * eventually needs: micro-batch appends (q42/q73/q101-style) leave
  * hundreds of KB-sized part files per day, and at 100 TB the scan's
  * task-per-file overhead and footer reads dominate before a byte of
  * data is touched.
  *
  * `compact` rewrites a parquet directory into `numFiles` RANGE-
  * CLUSTERED files: `repartitionByRange` gives each output file a
  * disjoint span of the cluster key and `sortWithinPartitions` orders
  * rows inside it, so every file's parquet min/max footer stats become
  * tight and non-overlapping — a point or range predicate on the key
  * then prunes to one file (the same write-time-shuffle-for-read-time-
  * pruning trade as BucketedTables and ZOrderLayout, one dimension,
  * zero read-path cooperation needed). Content is preserved exactly
  * (CompactionSpec asserts set equality and the disjoint-span
  * invariant). Output lands in `outDir`; the swap (atomic rename /
  * table-format commit) is deployment-specific and stays with the
  * caller. */
object Compaction {

  def compact(s: SparkSession, inDir: String, outDir: String,
      clusterCol: String, numFiles: Int): Unit =
    s.read.parquet(inDir)
      .repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(outDir)

  /** Part files of a parquet directory (the metric compaction moves). */
  def partFiles(dir: String): Seq[java.io.File] =
    // listFiles() is null (not empty) for a missing/unreadable dir
    Option(new java.io.File(dir).listFiles()).fold(Seq.empty[java.io.File])(
      _.filter(f => f.getName.endsWith(".parquet") && f.length() > 0).toSeq)
}
