package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star per SURVEY.md §0):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH bucketing as the approximate scale path.
  *
  * Scale design:
  *  - cosine / projections are per-row higher-order array expressions
  *    (zip_with + sequential aggregate fold) — no UDFs, map-side only.
  *  - brute-force top-k BROADCASTS the (small) query set against the
  *    corpus scan: one pass, no shuffle of the corpus, then a top-k
  *    window per query. Exact, O(|corpus|·|queries|) — the baseline.
  *  - LSH: each vector gets an n-plane sign bucket computed map-side
  *    against LITERAL hyperplane arrays (no per-row hashing); search is
  *    an equi-join on bucket — the approximate path that survives 100 TB
  *    (candidates per query ≈ corpus / 2^planes).
  *  - Hyperplane components are ±1 derived from md5("p,i") bit 0 — the
  *    same value an external oracle recomputes in SQL (engine-portable,
  *    see [[Hashing]]).
  *
  * The sequential fold (init 0.0) makes the double result bit-identical
  * to any engine that folds left-to-right, since 0.0 + x == x exactly.
  */
object Similarity {

  /** Dot product in double precision, sequential left fold — the native
    * codegen'd [[graft.functions.VecDot]] kernel. Bit-identical to the
    * built-in composition `aggregate(zip_with(a, b, x*y), 0.0, +)` it
    * replaced (same accumulation order), but a primitive loop instead
    * of an interpreted higher-order chain — this is the innermost loop
    * of every similarity operator. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.VecDot(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** ±1 hyperplane component p,i — bit 0 of the engine-portable 60-bit
    * md5 hash of "p,i" (same value as SQL
    * ('0x'||substr(md5(p||','||i),1,15))::BIGINT % 2). */
  def planeComponent(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p,$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    if (BigInt(hex, 16).testBit(0)) 1.0 else -1.0
  }

  /** Literal ±1 hyperplane array for plane `p` (evaluated once at plan
    * time — zero per-row hashing cost). */
  def planeLit(p: Int, dims: Int): Column =
    array((0 until dims).map(i => lit(planeComponent(p, i))): _*)

  /** Sign-of-projection LSH bucket id in [0, 2^planes). */
  def lshBucket(emb: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      when(dot(emb, planeLit(p, dims)) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")

  /** Append a unit-normalized copy (`outCol`) of `embCol`. The norm is
    * materialized as its own column first: referencing a norm EXPRESSION
    * inside the per-element lambda would recompute the full dot product
    * per element (Catalyst inlines nested expressions). After this,
    * cosine between two unit vectors is a single O(d) dot — 3× cheaper
    * than dot/(|a|·|b|) per pair, and the norms are paid once per row
    * at scan time instead of once per candidate pair. */
  def withNormalized(df: DataFrame, embCol: String,
      outCol: String = "ne"): DataFrame =
    df.withColumn("__nrm", norm(col(embCol)))
      .withColumn(outCol,
        transform(col(embCol), x => x.cast("double") / col("__nrm")))
      .drop("__nrm")

  /** k×d centroid matrix as ONE nested literal array column — the IVF
    * assignment primitive. Centroids are plan-time literals (k·d doubles
    * — ~50 KB at k=96, d=64 — independent of corpus size), so cell
    * assignment is a pure per-row expression: NO crossJoin expansion, NO
    * shuffle, NO window. This replaces the round-2 corpus×centroids
    * window argmax, which shuffled the whole expanded frame by vec_id. */
  private def centsLit(cents: Seq[Array[Double]]): Column =
    typedLit(cents.map(_.toSeq))

  /** Per-row dot products against the literal centroid matrix (one
    * array element per centroid). Materialize with withColumn before
    * consuming (Catalyst inlines nested higher-order expressions). */
  def centroidDots(ne: Column, cents: Seq[Array[Double]]): Column =
    transform(centsLit(cents), ce => dot(ne, ce))

  /** Top-`m` centroid indices from a MATERIALIZED dots column, ranked by
    * rounded dot desc with index tie-break — the same total order the
    * SQL oracle's `ORDER BY round(dot,6) DESC, c` produces. */
  def topCells(dots: Column, m: Int): Column =
    transform(
      slice(array_sort(transform(dots, (d, i) =>
        struct((-round(d, 6)).as("nd"), i.as("c")))), 1, m),
      s => s.getField("c"))

  /** Lloyd k-means over a (vec_id, ne) sample, engine-portable: every
    * float operation is a deterministic sequential fold so an external
    * SQL oracle reproduces the centroids BIT-FOR-BIT:
    *  - init = normalized vectors of the k smallest vec_ids;
    *  - assignment = argmax rounded dot, centroid-index tie-break
    *    (map-side expression against the literal centroid matrix);
    *  - update = members sorted by vec_id, element-wise sequential sum
    *    (0.0-init fold == SQL list_reduce's x1-init for +), divide by
    *    count, renormalize; empty cells keep their previous centroid.
    *
    * Scale posture: the sample is aggregated on executors; only the k×d
    * centroid matrix is collected per iteration (MLlib KMeans' own
    * pattern — driver traffic is independent of corpus size). */
  def trainKmeans(sample: DataFrame, k: Int, iters: Int,
      dims: Int): Seq[Array[Double]] = {
    def vecs(df: DataFrame, c: String): Seq[Array[Double]] =
      df.collect().map(_.getAs[scala.collection.Seq[Double]](c).toArray).toSeq
    var cents = vecs(sample.orderBy(col("vec_id")).limit(k).select(col("ne")), "ne")
    require(cents.size == k, s"sample smaller than k=$k")
    val zero = typedLit(Seq.fill(dims)(0.0))
    for (_ <- 0 until iters) {
      val upd = sample
        .withColumn("dots", centroidDots(col("ne"), cents))
        .withColumn("cell", element_at(topCells(col("dots"), 1), 1))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("vec_id"), col("ne")))).as("vs"),
          count(lit(1)).as("cnt"))
        .withColumn("ssum", aggregate(
          transform(col("vs"), v => v.getField("ne")), zero,
          (acc, x) => zip_with(acc, x, _ + _)))
        .withColumn("mean", transform(col("ssum"), _ / col("cnt")))
        .withColumn("nrm", sqrt(dot(col("mean"), col("mean"))))
        .select(col("cell"), transform(col("mean"), _ / col("nrm")).as("ce"))
      val updMap = upd.collect()
        .map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Double]]("ce").toArray)
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) => updMap.getOrElse(i, old) }
    }
    cents
  }

  /** Exact brute-force cosine top-k over PRE-NORMALIZED vectors:
    * broadcast `queries` (q_id, qe) against the corpus (vec_id, ne),
    * rank per query. Rank key is cosine rounded to 6dp with id
    * tie-break so ordering is reproducible across engines. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val pairs = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qe"), col("ne")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
  }
}
