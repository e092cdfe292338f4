package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state (SURVEY.md §2.8 ST10 — greenfield relative to
  * the reference): per-key accumulators over `mapGroupsWithState`.
  * State lives in the checkpointed state store, partitioned by key —
  * the pattern scales to arbitrary keyed-state operators (sessionizers,
  * online aggregates, stream dedup) and survives query restarts.
  */
object Stateful {

  final case class KeyedTotals(key: Long, n: Long, total: Double)

  /** Accumulate count+sum per key across micro-batches. Emits the
    * updated totals for every key touched in the batch (update-mode
    * semantics; pair with foreachBatch or an update-mode sink). */
  def runningTotals(df: DataFrame, keyCol: String,
      valCol: String): Dataset[KeyedTotals] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("long").as("_1"),
        col(valCol).cast("double").as("_2"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), KeyedTotals](
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          KeyedTotals(key, n, s)
      }
  }
}
