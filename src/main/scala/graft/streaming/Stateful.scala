package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{coalesce, col, count, lit, when}
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

  /** Keyed state of [[sessionize]]: ALL of the key's sessions still
    * inside the watermark horizon, disjoint and gap-separated. */
  final case class SessionSet(sessions: Seq[Session])

  /** Event-time sessionizer over `flatMapGroupsWithState`: events merge
    * into any session within the inactivity gap of their timestamp; a
    * session is emitted only once the watermark passes its end + gap —
    * the point where no admissible event can extend or merge it. This
    * is the custom-state generalization of `session_window` — arbitrary
    * per-session payloads and emission policy — with the same output
    * contract: results depend only on the event set and the watermark,
    * never on how micro-batches slice the arrivals. That requires
    * keeping EVERY in-horizon session in state, not just the latest:
    * a single-session state must either misfile an out-of-order event
    * that precedes the open session by more than the gap, or emit the
    * older session early where a later above-watermark event could
    * still have merged into it. Events below the watermark are dropped
    * (session_window's late-data contract; flatMapGroupsWithState does
    * not pre-filter them). The watermark is applied here (after the
    * projection — renaming a column drops its watermark metadata);
    * append mode. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, gapMs: Long,
      watermarkDelay: String = "1 minute",
      // observed-metric names must be unique per query — override when
      // composing two instances in one plan (checkAnalysis rejects dups)
      metricName: String = "graft_sessionize_dropped"): Dataset[Session] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("long").as("_1"),
        col(tsCol).cast("timestamp").as("_2"),
        coalesce(col(valCol).cast("double"), lit(0.0)).as("_3"))
      // a row whose key or timestamp casts to null cannot be keyed or
      // placed in time — and a null reaching the primitive-tuple
      // encoder / ts.getTime below kills the QUERY, which checkpoint
      // replay then re-kills on every restart (one malformed record =
      // permanently wedged flow; cleansing routes such rows to the
      // dead-letter path upstream, q107). Null values fold to 0 per
      // the NIL→0 contract. Drops are observed (dropped_rows metric).
      // count(when(...)), not sum: a zero-input micro-batch (routine
      // for watermark/timer-only triggers) still emits the metric row,
      // and count reads 0 there where sum reads NULL
      .observe(metricName,
        count(when(col("_1").isNull || col("_2").isNull, lit(1)))
          .as("dropped_rows"))
      .filter(col("_1").isNotNull && col("_2").isNotNull)
      .withWatermark("_2", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionSet, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionSet]) =>
          val wm = state.getCurrentWatermarkMs()
          val standing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged =
            if (state.hasTimedOut) standing
            else {
              // each admissible event is a unit session; sort-and-sweep
              // merges chains transitively (an event can bridge two
              // standing sessions into one)
              val units = rows
                .filter(_._2.getTime >= wm) // drop below-watermark lates
                .map { case (_, ts, v) => Session(key, 1, v, ts, ts) }
              (standing ++ units).sortBy(s => (s.start.getTime, s.end.getTime))
                .foldLeft(List.empty[Session]) {
                  case (cur :: done, s)
                      if s.start.getTime - cur.end.getTime < gapMs =>
                    cur.copy(n = cur.n + s.n, total = cur.total + s.total,
                      end = if (s.end.after(cur.end)) s.end else cur.end
                    ) :: done
                  case (acc, s) => s :: acc
                }.reverse
            }
          // a session is final once the watermark passes end + gap
          val (done, open) = merged.partition(_.end.getTime + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(SessionSet(open))
            state.setTimeoutTimestamp(open.map(_.end.getTime).min + gapMs)
          } else state.remove()
          done.sortBy(_.start.getTime).iterator
      }
  }

  /** Shared totals prelude: cast to (key, value), observe null-key
    * drops (see sessionize: null key = poison pill; count() so a
    * zero-input micro-batch reads 0, not sum's NULL), filter them. */
  private def keyedVals(df: DataFrame, keyCol: String, valCol: String,
      metricName: String): Dataset[(Long, Double)] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("long").as("_1"),
        coalesce(col(valCol).cast("double"), lit(0.0)).as("_2"))
      .observe(metricName,
        count(when(col("_1").isNull, lit(1))).as("dropped_rows"))
      .filter(col("_1").isNotNull)
      .as[(Long, Double)]
  }

  /** Accumulate count+sum per key across micro-batches. Emits the
    * updated totals for every key touched in the batch (update-mode
    * semantics; pair with foreachBatch or an update-mode sink). */
  def runningTotals(df: DataFrame, keyCol: String, valCol: String,
      metricName: String = "graft_totals_dropped"): Dataset[KeyedTotals] = {
    import df.sparkSession.implicits._
    keyedVals(df, keyCol, valCol, metricName)
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
  def runningTotalsTws(df: DataFrame, keyCol: String, valCol: String,
      metricName: String = "graft_totals_tws_dropped"): Dataset[KeyedTotals] = {
    import df.sparkSession.implicits._
    keyedVals(df, keyCol, valCol, metricName)
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
