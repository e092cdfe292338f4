package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  test("VecDot is bit-identical to the aggregate(zip_with) composition it replaced") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("f", "d")
    val composed = df.select(
      aggregate(zip_with(col("f"), col("d"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("c"),
      aggregate(zip_with(col("f"), col("f"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("cf"))
    val native = df.select(
      Similarity.dot(col("f"), col("d")).as("c"),
      Similarity.dot(col("f"), col("f")).as("cf"))
    // bitwise equality, not tolerance: same sequential fold order
    val a = composed.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val b = native.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("vec_dot registered in SQL and survives codegen over many rows") {
    spark.sql("SELECT 1").collect() // force session init
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(r.getDouble(0) === 11.0)
    val n = spark.range(10000)
      .select(Similarity.dot(
        array(col("id").cast("double"), lit(1.0)),
        array(lit(2.0), col("id").cast("double"))).as("d"))
      .filter(col("d") === col("d")).count()
    assert(n === 10000L)
  }

  test("VecDot edge semantics: length mismatch → null (like the composition); bad types fail analysis") {
    // mismatched lengths: zip_with pads with null, nulling the fold —
    // the kernel must agree (null, not a truncated partial dot)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("c"))
    val native = df.select(Similarity.dot(col("a"), col("b")).as("c"))
    assert(composed.head.isNullAt(0) && native.head.isNullAt(0))
    // wrong element type (decimal literals in SQL) → analysis-time error
    spark.sql("SELECT 1").collect() // force session init
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(ex.getMessage.contains("vec_dot"))
  }

  test("SQL kernel arity errors are named, not raw IndexOutOfBounds") {
    spark.sql("SELECT 1").collect() // force session init
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("vec_dot") &&
      e.getMessage.contains("argument"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT md5long60()").collect()
    }
    assert(e2.getMessage.contains("md5long60") &&
      e2.getMessage.contains("argument"))
  }

  test("vec_dot null ELEMENT → NULL, like the composition; nullable-typed non-null arrays still compute") {
    // the SQL registration exposes the kernel to arbitrary arrays: a
    // null slot must null the result (aggregate(zip_with) semantics),
    // not read garbage through getDouble
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d")
      .head
    assert(r.isNullAt(0))
    // containsNull=true TYPE with all-non-null VALUES takes the
    // null-probing kernel and must still compute the exact dot
    val r2 = spark.sql(
      "SELECT vec_dot(array(1.0D, IF(1=2, CAST(NULL AS DOUBLE), 2.0D)), " +
        "array(3.0D, 4.0D)) AS d").head
    assert(r2.getDouble(0) === 11.0)
  }

  test("cosine: orthogonal → 0, identical → 1, opposite → -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)
    ).toDF("a", "b", "want")
      .select(Similarity.cosine(col("a"), col("b")).as("got"), col("want"))
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("lshBucket: deterministic, in range, identical vectors collide") {
    val v = Seq.fill(64)(scala.util.Random.nextFloat())
    val df = Seq(v, v).toDF("embedding")
      .select(Similarity.lshBucket(col("embedding"), 8, 64).as("b"))
    val bs = df.collect().map(_.getInt(0))
    assert(bs(0) === bs(1))
    assert(bs(0) >= 0 && bs(0) < 256)
  }

  test("bruteForceTopK ranks the true nearest neighbour first") {
    val corpus = Similarity.withNormalized(Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f))
    ).toDF("vec_id", "embedding"), "embedding")
    val queries = corpus.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("ne").as("qe"))
    val top = Similarity.bruteForceTopK(corpus, queries, 2)
      .orderBy("rn").collect()
    assert(top(0).getLong(2) === 1L) // closest to (1,0,0) is (0.9,0.1,0)
    assert(top.length === 2)
  }

  test("trainKmeans: deterministic unit centroids; empty cells keep init") {
    // two tight clusters around x-axis and y-axis in 4 dims
    val pts = Seq(
      (0L, Seq(1f, 0.1f, 0f, 0f)), (2L, Seq(1f, -0.1f, 0f, 0f)),
      (4L, Seq(0.9f, 0f, 0.1f, 0f)),
      (1L, Seq(0f, 0f, 1f, 0.1f)), (3L, Seq(0f, 0.1f, 1f, 0f)),
      (5L, Seq(0f, 0f, 0.9f, -0.1f)))
    val df = Similarity.withNormalized(
      pts.toDF("vec_id", "embedding"), "embedding")
      .select(col("vec_id"), col("ne"))
    val c1 = Similarity.trainKmeans(df, 2, 2, 4)
    val c2 = Similarity.trainKmeans(df, 2, 2, 4)
    assert(c1.map(_.toSeq) === c2.map(_.toSeq)) // bit-identical across runs
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12) // unit-normalized
    }
    // init = vectors of the 2 smallest vec_ids (0 → x-cluster, 1 → z-cluster);
    // after 2 iterations each centroid stays in its cluster's halfspace
    assert(c1(0)(0) > 0.8 && c1(1)(2) > 0.8)
  }

  test("trainPq: deterministic per-subspace codebooks; codes hit the nearest centroid; ADC matches LUT sum") {
    // two clusters per 2-dim subspace (4 dims, 2 subspaces)
    val pts = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)), (1L, Seq(0f, 1f, 1f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)), (3L, Seq(0.1f, 0.9f, 0.9f, 0.1f)))
    val df = Similarity.withNormalized(
      pts.toDF("vec_id", "embedding"), "embedding")
      .select(col("vec_id"), col("ne"))
    val cb1 = Similarity.trainPq(df, 2, 2, 2, 4)
    val cb2 = Similarity.trainPq(df, 2, 2, 2, 4)
    assert(cb1.map(_.map(_.toSeq)) === cb2.map(_.map(_.toSeq))) // bit-identical
    assert(cb1.size === 2 && cb1.forall(_.size === 2) &&
      cb1.forall(_.forall(_.length === 2)))
    val coded = df
      .withColumn("codes", Similarity.pqCodes(col("ne"), cb1, 4))
      .withColumn("luts", Similarity.pqLuts(col("ne"), cb1, 4))
      .withColumn("adc", Similarity.adcScore(col("codes"), col("luts"), 2))
      .collect()
    coded.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.length === 2 && codes.forall(c => c >= 0 && c < 2))
      // self-ADC = sum of dots against the vector's OWN assigned
      // centroids — recompute driver-side from the codebooks
      val ne = r.getSeq[Double](r.fieldIndex("ne"))
      val expect = (0 until 2).map { m =>
        val ce = cb1(m)(codes(m))
        (0 until 2).map(j => ne(m * 2 + j) * ce(j)).sum
      }.sum
      assert(math.abs(r.getDouble(r.fieldIndex("adc")) - expect) < 1e-9)
    }
    // clustered inputs → same-cluster rows share codes, cross-cluster differ
    val byId = coded.map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("codes"))).toMap
    assert(byId(0L) === byId(2L) && byId(1L) === byId(3L))
    assert(byId(0L) !== byId(1L))
  }

  test("pqCodes bound-slice rewrite is bit-identical to the inline dist2 composition") {
    // r21 guard: pqCodes binds the subvector slice + its self-dot once
    // per (row, subspace) and hoists centroid self-dots to plan time;
    // every distance must stay the same left-associated double chain as
    // the pre-r21 inline dist2 shape (kept here as the reference), so
    // the argmin codes compare EXACTLY — at production codebook size.
    val rnd = new scala.util.Random(21)
    val dims = 64; val subs = 16; val k = 64; val subD = dims / subs
    val cb: Seq[Seq[Array[Double]]] =
      Seq.fill(subs)(Seq.fill(k)(Array.fill(subD)(rnd.nextDouble() * 2 - 1)))
    val df = Seq.fill(100)(Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
      .map(Tuple1(_)).toDF("ne")
    val naive = array(cb.zipWithIndex.map { case (cs, m) =>
      Similarity.argminIdx(transform(typedLit(cs.map(_.toSeq)),
        ce => Similarity.dist2(slice(col("ne"), m * subD + 1, subD), ce)))
    }: _*)
    val mismatches = df
      .select(Similarity.pqCodes(col("ne"), cb, dims).as("a"), naive.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches === 0L)
  }

  test("topCells ranks by rounded dot desc with index tie-break") {
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val df = Seq(Seq(1.0, 0.0)).toDF("ne")
      .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
      .select(Similarity.topCells(col("dots"), 3).as("cells"))
    // cents 0 and 2 tie at dot=1 → index order; cent 1 (dot=0) last
    assert(df.head.getSeq[Int](0) === Seq(0, 2, 1))
  }

  test("planeComponent matches the SQL md5 definition") {
    // the independent reference: the documented SQL-portable definition
    // ('0x'||substr(md5(p||','||i),1,15))::BIGINT % 2, re-derived here
    // via the hex parse so a drift in Md5Hash or the "p,i" seed format
    // actually FAILS (a ±1/both-signs check alone passes for any
    // non-constant sign function)
    def sqlDef(p: Int, i: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p,$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      if (BigInt(hex, 16).testBit(0)) 1.0 else -1.0
    }
    val mismatches = for {
      p <- 0 until 8; i <- 0 until 64
      if Similarity.planeComponent(p, i) != sqlDef(p, i)
    } yield (p, i)
    assert(mismatches.isEmpty, s"diverged from SQL definition at $mismatches")
    val all = for (p <- 0 until 8; i <- 0 until 64) yield Similarity.planeComponent(p, i)
    assert(all.toSet === Set(1.0, -1.0)) // both signs occur
  }
}
