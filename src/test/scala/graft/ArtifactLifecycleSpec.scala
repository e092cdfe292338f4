package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ext.{BloomPrune, Dedup, Similarity}
import graft.queries.SimilarityQueries
import graft.sinks.ArtifactStore

/** The persisted index-artifact lifecycle (VERDICT r4 #5): each
  * standing structure is BUILT and SAVED in one session, then LOADED
  * and PROBED in a fresh session (`newSession()` — separate session
  * state, so nothing can leak through the in-memory memo caches), and
  * the probe answers must be bit-identical to probing the freshly
  * built artifact. This is the restart story: a 100 TB index is hours
  * to build and a metadata open to load. */
class ArtifactLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  private val sf = "/root/testdata/sf0.001"
  private def docs(s: org.apache.spark.sql.SparkSession) =
    s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))

  test("near-dup index: build+save, load+probe in a fresh session — identical pairs") {
    val dir = Files.createTempDirectory("graft_art_nd_").toString
    // delta = shifted-id copies of every 17th doc: guaranteed jacc=1.0
    // hits against the corpus, so the equality below is never vacuous
    val delta = docs(spark).filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val built = Dedup.buildNearDupIndex(docs(spark), "doc_id", "text")
    ArtifactStore.saveNearDupIndex(built, dir)
    val want = built.probe(delta, "doc_id", "text")
      .orderBy(col("d_id"), col("c_id")).collect().map(_.toSeq).toSeq
    built.unpersist()
    assert(want.nonEmpty, "probe found no pairs — test would be vacuous")

    val fresh = spark.newSession()
    val loaded = ArtifactStore.loadNearDupIndex(fresh, dir)
    val deltaF = docs(fresh).filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val got = loaded.probe(deltaF, "doc_id", "text")
      .orderBy(col("d_id"), col("c_id")).collect().map(_.toSeq).toSeq
    loaded.unpersist()
    assert(got == want)
  }

  test("loading an artifact as the wrong kind fails fast on the meta sidecar") {
    val dir = Files.createTempDirectory("graft_art_kind_").toString
    ArtifactStore.saveBloom(Array[Byte](1, 2, 3), dir)
    val e = intercept[IllegalArgumentException] {
      ArtifactStore.loadNearDupIndex(spark, dir)
    }
    assert(e.getMessage.contains("not a near-dup index"))
  }

  test("corpus bloom: saved blob loads byte-identical and splits a batch identically") {
    val dir = Files.createTempDirectory("graft_art_bl_").toString
    val corpusKeys = docs(spark).filter(col("doc_id") % 7 =!= 3)
      .select(md5(col("text").cast("binary")).as("ck")).distinct()
    val bloom = BloomPrune.buildBloom(corpusKeys, col("ck"), 100000L)
    ArtifactStore.saveBloom(bloom, dir, 100000L)

    val fresh = spark.newSession()
    val loadedBloom = ArtifactStore.loadBloom(dir)
    assert(java.util.Arrays.equals(bloom, loadedBloom),
      "bloom blob changed across save/load")
    // end-to-end: the map-side split a fresh session computes with the
    // loaded blob equals the builder session's split
    def split(s: org.apache.spark.sql.SparkSession, b: Array[Byte]) = {
      val batch = docs(s).filter(col("doc_id") % 7 === 3)
        .withColumn("ck", md5(col("text").cast("binary")))
      val hit = BloomPrune.mightContain(b, col("ck"))
      (batch.filter(!hit).count(), batch.filter(hit).count())
    }
    assert(split(fresh, loadedBloom) == split(spark, bloom))
  }

  test("IVF index: build+save, load+search in a fresh session — identical top-k") {
    val dir = Files.createTempDirectory("graft_art_ivf_").toString
    val (cells, cents) = SimilarityQueries.ivfArtifacts(spark, sf)
    ArtifactStore.saveIvfIndex(cells, cents, dir)

    def topk(cand: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cos"), 6).desc, col("vec_id"))
      cand.withColumn("cos", Similarity.dot(col("qe"), col("ne")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("q_id"), col("rk")).collect().map(_.toSeq).toSeq
    }
    val probeFilter = col("vec_id") % 101 === 7
    val want = topk(SimilarityQueries.ivfCandidatesFrom(cells, cents,
      SimilarityQueries.preppedEmbeddings(spark, sf).filter(probeFilter)))
    assert(want.nonEmpty, "no IVF candidates — test would be vacuous")

    val fresh = spark.newSession()
    val (lCells, lCents) = ArtifactStore.loadIvfIndex(fresh, dir)
    assert(lCents.size == cents.size &&
      lCents.zip(cents).forall { case (a, b) => a.sameElements(b) },
      "centroid matrix changed across save/load")
    val got = topk(SimilarityQueries.ivfCandidatesFrom(lCells, lCents,
      SimilarityQueries.preppedEmbeddings(fresh, sf).filter(probeFilter)))
    lCells.unpersist()
    assert(got == want)
  }
}
