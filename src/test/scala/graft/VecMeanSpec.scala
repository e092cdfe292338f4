package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The production tree-reduced per-source mean ([[graft.ext.VecMean]])
  * against the oracle-verified order-pinned fold: same group counts,
  * element-wise equal within 1e-9. This is the exact-vs-approx
  * contract for the one plan that could not survive an unbounded group
  * at 100× — the fold stays the verification mode, the aggregate is
  * what a cluster runs (GraftSession.clusterBuilder sets
  * spark.graft.exactMeans=false). */
class VecMeanSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  private val sf = "/root/testdata/sf0.001"

  test("tree-reduced means match the pinned fold within 1e-9, per source") {
    val e = SimilarityQueries.sourcedEmbeddings(spark, sf)
    def bySource(exact: Boolean): Map[String, (Long, Seq[Double])] =
      SimilarityQueries.sourceMeans(e, exact).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Double](2))))
        .toMap
    val fold = bySource(exact = true)
    val tree = bySource(exact = false)
    assert(fold.nonEmpty && fold.keySet === tree.keySet)
    fold.foreach { case (src, (n, fm)) =>
      val (tn, tm) = tree(src)
      assert(tn === n, s"group count drift for source $src")
      assert(tm.length === fm.length)
      fm.zip(tm).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
          s"mean drift for source $src: fold=$a tree=$b")
      }
    }
  }

  test("VecMean skips null vectors and handles singleton groups") {
    import spark.implicits._
    val vm = udaf(new graft.ext.VecMean(2))
    val df = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)),
        ("b", Seq(5.0, 6.0))).toDF("source", "ne")
      .unionByName(Seq(("b", null.asInstanceOf[Seq[Double]]))
        .toDF("source", "ne"))
    val out = df.groupBy($"source").agg(vm($"ne").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") === Seq(2.0, 3.0))
    assert(out("b") === Seq(5.0, 6.0)) // the null vector contributes nothing
  }

  test("VecMean fails loudly on a dimension mismatch") {
    import spark.implicits._
    val vm = udaf(new graft.ext.VecMean(3))
    val bad = Seq(("a", Seq(1.0, 2.0))).toDF("source", "ne")
      .groupBy($"source").agg(vm($"ne").as("m"))
    val ex = intercept[Exception] { bad.collect() }
    // the require's message must be in the cause chain — any other
    // exception (e.g. a later index error) is NOT failing loudly
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("expects 3"),
      s"expected the dimension require to fire, got: $msgs")
  }
}
