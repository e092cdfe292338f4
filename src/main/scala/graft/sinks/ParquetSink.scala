package graft.sinks

import org.apache.spark.sql.DataFrame

/** Columnar sink with layout control (scale posture): partitioning by a
  * low-cardinality column gives readers partition pruning (only
  * matching directories are scanned — verify with `PartitionFilters`
  * in the read plan); `sortWithinPartitions` on a frequent filter key
  * improves parquet row-group min/max skipping. */
object ParquetSink {

  def writePartitioned(df: DataFrame, dir: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(df.col): _*)
      else df
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }
}
