package graft.queries

import graft.ext.Dedup
import graft.sinks.ArtifactStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The STANDING corpus [[Dedup.NearDupIndex]] pattern, shared by every
  * consumer (q105's streaming admission gate, q80's incremental-dedup
  * batch): memoized per (session, dir, name) with FrameCache ownership
  * (teardown eviction releases the cached member frames) and the
  * ArtifactStore persistence seam — save on build, load on restart,
  * warn-and-rebuild on a stale snapshot, never wedge. One
  * implementation, so index parameters, eviction, and the
  * stale-artifact path cannot drift between consumers.
  *
  * At cluster scale this is the materialize-once-per-corpus-snapshot
  * pattern: the index's two member frames are tables persisted with the
  * snapshot; the FrameCache entry is the in-session analogue. */
object StandingNearDup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val cache = graft.runtime.FrameCache.of[
      (SparkSession, String, String), Dedup.NearDupIndex](
    "standing-neardup-index", k => Some(k._1))(v => { v.unpersist(); () })

  /** The standing index named `name` over `corpus` (must expose
    * (doc_id, text)); `name` is both the memo key and the
    * [[ArtifactStore]] artifact name. `corpus` is only evaluated on a
    * memo miss. */
  def index(s: SparkSession, d: String, name: String)
      (corpus: => DataFrame): Dedup.NearDupIndex =
    cache.get((s, d, name)) {
      val c = corpus
      val dirOpt = ArtifactStore.configuredDir(s, name, d)
      // fingerprint THIS session's corpus once (one cheap aggregate);
      // it gates the load AND stamps the save
      lazy val snap = ArtifactStore.snapshot(c, Seq("doc_id", "text"))
      def build(origin: String): Dedup.NearDupIndex = {
        val idx = Dedup.buildNearDupIndex(c, "doc_id", "text")
        dirOpt.foreach { dir =>
          ArtifactStore.saveNearDupIndex(idx, dir, snap)
          ArtifactStore.lastOrigin(name) = origin
        }
        idx
      }
      dirOpt match {
        case Some(dir) if ArtifactStore.exists(dir) =>
          // restart path: load skips the corpus fold. A STALE artifact
          // (rolled corpus snapshot) must not wedge the pipeline:
          // rebuild and overwrite it.
          try {
            val r = ArtifactStore.loadNearDupIndex(s, dir, snap)
            ArtifactStore.lastOrigin(name) = "loaded"
            r
          } catch {
            case e @ (_: IllegalArgumentException
                | _: java.io.FileNotFoundException) =>
              log.warn(s"stale/incompatible near-dup index at $dir " +
                s"(${e.getMessage}) — rebuilding for the current snapshot")
              build("rebuilt")
          }
        case _ => build("built")
      }
    }
}
