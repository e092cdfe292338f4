package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults.
  *
  * Scale posture: AQE on (runtime coalescing + skew-join splitting), a
  * shuffle-partition count matched to local cores here but meant to be
  * overridden to ~2-3× total cores on a real cluster, and the legacy
  * nanos conf so TIMESTAMP(NANOS) parquet (events.ts) is readable.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Retire an engine session: evict every standing frame the registry
    * caches on its behalf (the LSH pair set, IVF cells, admission
    * bloom/index, funnel stages, ...) so its pinned executor memory is
    * actually released. A long-lived process that drops one session
    * (`newSession` clones, notebook rotation) calls this instead of —
    * or before — `SparkSession.stop`; stopping the whole SparkContext
    * also works, but only because the sweep on the next build path
    * reaps stopped sessions, which a still-running context never
    * triggers for a merely-abandoned session. Returns entries evicted. */
  def close(s: SparkSession): Int = graft.runtime.FrameCache.evictSession(s)
}
