package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Observability surface for stateful streaming (SURVEY.md §2.8 ST10):
  * per-operator state-store metrics distilled from
  * `StreamingQueryProgress.stateOperators` — the numbers a production
  * runner exports and alerts on. The two that matter at 100 TB:
  * `rowsTotal` growing monotonically across batches means the watermark
  * is NOT bounding state (the unbounded-state killer); `commitTimeMs`
  * is the per-batch floor that state-partition sizing controls (see
  * `StreamingQueries.streamSession` — 4 stores per side per partition
  * make over-partitioned tiny batches commit-bound). Specs
  * regression-guard both instead of trusting the sizing convention. */
object StateMetrics {

  final case class StoreMetrics(
      operator: String,
      rowsTotal: Long,        // rows held in state after the final batch
      rowsUpdatedTotal: Long, // summed over batches: state writes (adds)
      rowsDroppedByWatermark: Long, // summed: late arrivals discarded
      memoryUsedBytes: Long,  // peak across batches
      commitTimeMsTotal: Long, // summed store-commit wall time
      shufflePartitions: Long, // state partitioning pinned at first start
      storeInstances: Long)

  /** Aggregate per-operator metrics across a query's retained progress
    * events (call after the drain; `recentProgress` keeps the last 100
    * batches, far above any AvailableNow drain here). */
  def collect(q: StreamingQuery): Seq[StoreMetrics] =
    q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      .groupBy(_.operatorName)
      .map { case (op, ps) =>
        StoreMetrics(
          operator = op,
          rowsTotal = ps.last.numRowsTotal,
          rowsUpdatedTotal = ps.map(_.numRowsUpdated).sum,
          rowsDroppedByWatermark = ps.map(_.numRowsDroppedByWatermark).sum,
          memoryUsedBytes = ps.map(_.memoryUsedBytes).max,
          commitTimeMsTotal = ps.map(_.commitTimeMs).sum,
          shufflePartitions = ps.map(_.numShufflePartitions).max,
          storeInstances = ps.map(_.numStateStoreInstances).max)
      }.toSeq.sortBy(_.operator)
}
