package graft.sinks

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.ext.Dedup

/** Persisted index artifacts — the build-once / load-anywhere seam for
  * the engine's standing structures.
  *
  * The in-memory memo caches (the LSH pair frame, the IVF inverted
  * index, the q101 corpus bloom, the q105 [[Dedup.NearDupIndex]]) are
  * the fast path WITHIN a session; at cluster scale the same artifacts
  * are tables/blobs persisted next to the corpus snapshot so a
  * restarted job (or a different job entirely) loads them instead of
  * re-deriving: an index over 100 TB of documents is hours of work, the
  * load is a metadata open. Each artifact is parquet (frames) or a raw
  * blob (sketch binaries) plus a `meta.properties` sidecar pinning the
  * build parameters, so a probe against a loaded index runs with
  * EXACTLY the build-time configuration — mismatched parameters are the
  * classic way a restored index silently returns different candidates.
  *
  * Round-trip fidelity: long/double/array columns survive parquet
  * bit-for-bit, and the sketch blobs are byte-identical — so probes
  * against a loaded artifact return bit-identical answers to probes
  * against the freshly built one (asserted in ArtifactLifecycleSpec).
  */
object ArtifactStore {

  // ---- meta sidecar -------------------------------------------------
  private def writeMeta(dir: String, kv: Map[String, String]): Unit = {
    new File(dir).mkdirs()
    val p = new java.util.Properties()
    kv.foreach { case (k, v) => p.setProperty(k, v) }
    val out = new FileOutputStream(s"$dir/meta.properties")
    try p.store(out, null) finally out.close()
  }

  private def readMeta(dir: String): Map[String, String] = {
    val p = new java.util.Properties()
    val in = new FileInputStream(s"$dir/meta.properties")
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }

  // ---- MinHash-LSH near-dup index (q105's standing corpus index) ----

  /** Persist a built [[Dedup.NearDupIndex]]: both member frames as
    * parquet plus the (k, bands, threshold) build parameters. */
  def saveNearDupIndex(idx: Dedup.NearDupIndex, dir: String): Unit = {
    idx.hashes.write.mode("overwrite").parquet(s"$dir/hashes")
    idx.guardedBands.write.mode("overwrite").parquet(s"$dir/bands")
    writeMeta(dir, Map("kind" -> "neardup", "k" -> idx.k.toString,
      "bands" -> idx.bands.toString, "threshold" -> idx.threshold.toString))
  }

  /** Load a persisted near-dup index into `s` (typically a session that
    * did NOT build it). Member frames are cached on load — the standing-
    * index lifecycle the build path uses. */
  def loadNearDupIndex(s: SparkSession, dir: String): Dedup.NearDupIndex = {
    val m = readMeta(dir)
    require(m.get("kind").contains("neardup"), s"$dir is not a near-dup index")
    Dedup.nearDupIndexFromParts(
      s.read.parquet(s"$dir/hashes"),
      s.read.parquet(s"$dir/bands"),
      m("k").toInt, m("bands").toInt, m("threshold").toDouble)
  }

  // ---- Corpus bloom (q101's exact-dedup prefilter) ------------------

  /** Persist a serialized bloom filter (the one-blob artifact a
    * streaming admission job rebuilds today on every restart). */
  def saveBloom(bloom: Array[Byte], dir: String,
      expectedItems: Long = -1L): Unit = {
    new File(dir).mkdirs()
    Files.write(Paths.get(s"$dir/bloom.bin"), bloom)
    writeMeta(dir, Map("kind" -> "bloom",
      "expectedItems" -> expectedItems.toString))
  }

  def loadBloom(dir: String): Array[Byte] = {
    require(readMeta(dir).get("kind").contains("bloom"),
      s"$dir is not a bloom artifact")
    Files.readAllBytes(Paths.get(s"$dir/bloom.bin"))
  }

  // ---- IVF inverted index (q50/q111's standing cell index) ----------

  /** Persist the IVF artifacts: the exploded (vec_id, ne, cell) inverted
    * index as parquet and the trained centroid matrix as a (cell_idx,
    * vals) frame — doubles round-trip parquet exactly, so probe-side
    * cell assignment against the loaded centroids is bit-identical. */
  def saveIvfIndex(cells: DataFrame, centroids: Seq[Array[Double]],
      dir: String): Unit = {
    val s = cells.sparkSession
    import s.implicits._
    cells.write.mode("overwrite").parquet(s"$dir/cells")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell_idx", "vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    writeMeta(dir, Map("kind" -> "ivf", "k" -> centroids.size.toString,
      "dims" -> centroids.headOption.map(_.length).getOrElse(0).toString))
  }

  /** Load the IVF artifacts; the cell index is cached on load (it is
    * the frame every probe joins against). */
  def loadIvfIndex(s: SparkSession, dir: String)
      : (DataFrame, Seq[Array[Double]]) = {
    val m = readMeta(dir)
    require(m.get("kind").contains("ivf"), s"$dir is not an IVF index")
    val cells = s.read.parquet(s"$dir/cells").cache()
    val cents = s.read.parquet(s"$dir/centroids")
      .orderBy(col("cell_idx")).collect()
      .map(r => r.getSeq[Double](r.fieldIndex("vals")).toArray).toSeq
    require(cents.size == m("k").toInt,
      s"centroid count ${cents.size} != saved k ${m("k")}")
    (cells, cents)
  }
}
