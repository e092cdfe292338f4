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

  /** Dot product in double precision, sequential left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

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

  /** IVF assignment: each vector joins its nearest centroid's inverted
    * list (argmax cosine over the broadcast centroid set, deterministic
    * tie-break on centroid id). With unit vectors, cosine = dot. At
    * scale the centroid set stays small (broadcast) while the corpus
    * partitions by cell — queries then probe only `nprobe` cells. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(round(dot(col("ne"), col("ce")), 6).desc, col("c_id"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("ne"), col("c_id").as("cell"))
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
