package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state (SURVEY.md §2.8 ST10 — greenfield relative to
  * the reference): per-key accumulators over `mapGroupsWithState`.
  * State lives in the checkpointed state store, partitioned by key —
  * the pattern scales to arbitrary keyed-state operators (sessionizers,
  * online aggregates, stream dedup) and survives query restarts.
  */
object Stateful {

  final case class KeyedTotals(key: Long, n: Long, total: Double)

  final case class Session(key: Long, n: Long, total: Double,
      start: java.sql.Timestamp, end: java.sql.Timestamp)

  /** Event-time sessionizer over `flatMapGroupsWithState`: events extend
    * the key's open session; a COMPLETED session is emitted only once
    * the event-time timeout (the inactivity gap, tracked against the
    * watermark) fires. This is the custom-state generalization of
    * `session_window` — arbitrary per-session payloads and emission
    * policy. The watermark is applied here (after the projection —
    * renaming a column drops its watermark metadata); append mode. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, gapMs: Long,
      watermarkDelay: String = "1 minute"): Dataset[Session] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("long").as("_1"),
        col(tsCol).cast("timestamp").as("_2"),
        col(valCol).cast("double").as("_3"))
      .withWatermark("_2", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            // inactivity gap elapsed (watermark passed end + gap):
            // emit the completed session and clear
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var cur = state.getOption
            val completed = Seq.newBuilder[Session]
            sorted.foreach { case (_, ts, v) =>
              cur match {
                case Some(s) if ts.getTime - s.end.getTime < gapMs =>
                  // out-of-order merge (cross-batch, still above watermark):
                  // extend BOTH bounds so start is the earliest contributor
                  cur = Some(s.copy(n = s.n + 1, total = s.total + v,
                    start = if (ts.before(s.start)) ts else s.start,
                    end = if (ts.after(s.end)) ts else s.end))
                case Some(s) => // gap exceeded within the batch
                  completed += s
                  cur = Some(Session(key, 1, v, ts, ts))
                case None =>
                  cur = Some(Session(key, 1, v, ts, ts))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapMs)
            }
            completed.result().iterator
          }
      }
  }

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

  /** [[runningTotals]] on Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes mapGroupsWithState: named
    * typed state handles (ValueState here; ListState/MapState for
    * richer shapes) in the RocksDB state store, per-state TTL, and
    * timers decoupled from the output mode. Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the running session (the TWS operator
    * rejects the default HDFS-backed store). */
  def runningTotalsTws(df: DataFrame, keyCol: String,
      valCol: String): Dataset[KeyedTotals] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("long").as("_1"),
        col(valCol).cast("double").as("_2"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new TotalsProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}

/** transformWithState processor backing [[Stateful.runningTotalsTws]]:
  * one ValueState cell per key, updated per batch, emitting the running
  * total after each input group (Update-mode semantics identical to the
  * mapGroupsWithState variant — StatefulSpec drains both through the
  * same fixture and asserts the same totals). */
class TotalsProcessor
    extends StatefulProcessor[Long, (Long, Double), Stateful.KeyedTotals] {
  @transient private var totals: ValueState[Stateful.KeyedTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState("totals",
      Encoders.product[Stateful.KeyedTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[Stateful.KeyedTotals] = {
    val cur =
      if (totals.exists()) totals.get()
      else Stateful.KeyedTotals(key, 0L, 0.0)
    val upd = rows.foldLeft(cur)((a, r) =>
      a.copy(n = a.n + 1, total = a.total + r._2))
    totals.update(upd)
    Iterator.single(upd)
  }
}
