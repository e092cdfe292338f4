package graft.queries

import graft.{QueryPack, Tables}
import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star similarity search over `embeddings` (SURVEY.md §0):
  * exact brute-force cosine top-k, LSH-bucketed approximate top-k, and
  * embedding-cosine near-pair mining. Vectors are unit-normalized once
  * at scan time (cosine per pair = one dot); oracles reproduce every
  * hash and fold bit-for-bit in DuckDB.
  */
object SimilarityQueries extends QueryPack {

  private val Dims = 64      // embeddings.embedding is 64-dim (FIXTURES.md §6)
  private val AnnPlanes = 4  // 16 buckets for top-k search (recall-tuned, see q57)
  private val PairPlanes = 4 // 16 buckets for pair mining

  /** (vec_id, ne [, bucket]) — normalized corpus, optional LSH bucket. */
  private def prepped(s: SparkSession, d: String, planes: Int = 0): DataFrame = {
    val base = Similarity.withNormalized(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .repartition(s.sparkContext.defaultParallelism),
      "embedding")
    val withB = if (planes > 0) base.withColumn("bucket",
      Similarity.lshBucket(col("embedding"), planes, Dims)) else base
    withB.drop("embedding")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Exact baseline: brute-force cosine top-3 per query vector ----
    "q38_cosine_topk" -> ((s, d) => {
      val e = prepped(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("ne").as("qe"))
      Similarity.bruteForceTopK(e, q, 3)
        .orderBy(col("q_id"), col("rn"))
    }),

    // ---- Approximate scale path: top-3 within the sign-LSH bucket.
    //      Plane count tuned by measurement (q57): 8 planes gave 256
    //      buckets ≈ 2 vectors each on this corpus → 3% recall; 4
    //      planes (16 buckets) reaches ~27% at 16× candidate pruning. ----
    "q39_ann_lsh" -> ((s, d) => {
      val e = prepped(s, d, AnnPlanes)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("ne").as("qe"),
          col("bucket").as("qb"))
      val pairs = e.join(broadcast(q),
          col("bucket") === col("qb") && col("vec_id") =!= col("q_id"))
        .withColumn("cos", Similarity.dot(col("qe"), col("ne")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cos"), 6).desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("vec_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // ---- IVF ANN: sampled centroids → inverted lists → 2-probe search.
    //      The second approximate scale path next to LSH (q39): cells
    //      partition the corpus; a query scans only its nprobe nearest
    //      cells' lists. ----
    "q50_ann_ivf" -> ((s, d) => {
      val e = prepped(s, d)
      val cents = e.filter(col("vec_id") % 40 === 7)
        .select(col("vec_id").as("c_id"), col("ne").as("ce"))
      val assigned = Similarity.ivfAssign(e, cents)
      val qs = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("ne").as("qe"))
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(round(Similarity.dot(col("qe"), col("ce")), 6).desc, col("c_id"))
      val probes = qs.crossJoin(broadcast(cents))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("q_id"), col("qe"), col("c_id").as("cell"))
      val cand = probes.join(assigned, "cell")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", Similarity.dot(col("qe"), col("ne")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cos"), 6).desc, col("vec_id"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("vec_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // ---- Embedding-cosine near-pair mining via 4-plane LSH buckets.
    //      Candidates come from the guarded pairsFromBuckets (q36
    //      pattern): the normalized vector rides the groupBy inside the
    //      id struct, so the bucket lineage is computed ONCE and the
    //      maxBucket guard caps any degenerate bucket — essential here
    //      because sign-LSH buckets are NOT hash-uniform on real
    //      embeddings (a hot bucket would make a raw self-join
    //      quadratic). ----
    "q40_embedding_pairs" -> ((s, d) => {
      val e = prepped(s, d, PairPlanes)
      val rows = e.select(struct(col("vec_id"), col("ne")).as("vn"),
        col("bucket"))
      graft.ext.Dedup.pairsFromBuckets(rows, Seq("bucket"), "vn")
        .withColumn("cos", Similarity.dot(col("a_id.ne"), col("b_id.ne")))
        .filter(col("cos") >= 0.35)
        .select(col("a_id.vec_id").as("a_id"), col("b_id.vec_id").as("b_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- ANN quality evaluation: recall of the approximate paths
    //      against the exact brute-force top-3 (the metric an ANN
    //      deployment is judged by). Composes the three queries. ----
    "q57_ann_recall" -> ((s, d) => {
      val bf = queries("q38_cosine_topk")(s, d)
        .select(col("q_id"), col("vec_id"))
      val lsh = queries("q39_ann_lsh")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("lsh_hit"))
      val ivf = queries("q50_ann_ivf")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("ivf_hit"))
      bf.join(lsh, Seq("q_id", "vec_id"), "left")
        .join(ivf, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("lsh_hit"), lit(0))).as("n_lsh"),
          sum(coalesce(col("ivf_hit"), lit(0))).as("n_ivf"))
        .select(col("n_true"), col("n_lsh"), col("n_ivf"),
          round(col("n_lsh").cast("double") / col("n_true"), 4).as("recall_lsh"),
          round(col("n_ivf").cast("double") / col("n_true"), 4).as("recall_ivf"))
    })
  )

  // ---------------------------------------------------------------- oracles

  /** Sequential-fold dot product (matches Spark's aggregate with 0.0
    * init: 0.0 + x1 == x1 exactly, so list_reduce's x1-init agrees). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"

  /** Projection onto the ±1 md5-derived hyperplane `p` (i is 1-based in
    * SQL, the plane component uses the 0-based dim index). */
  private def projSql(e: String, p: Int): String =
    s"list_reduce(list_transform(generate_series(1, len($e)), " +
      s"i -> $e[i]::DOUBLE * (CASE WHEN ('0x' || substr(md5('$p,' || (i-1)::VARCHAR), 1, 15))::BIGINT % 2 = 1 " +
      s"THEN 1.0 ELSE -1.0 END)), (acc, x) -> acc + x)"

  private def bucketSql(e: String, planes: Int): String =
    (0 until planes)
      .map(p => s"(CASE WHEN ${projSql(e, p)} >= 0 THEN ${1 << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Normalized-corpus CTEs: nrm materialized, then unit vectors (same
    * two-step float math as the Spark side). */
  private def preppedCte(planes: Int): String = {
    val bucketCol =
      if (planes > 0) s",\n    ${bucketSql("embedding", planes)} AS bucket"
      else ""
    s"""raw AS (SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nrm$bucketCol
       |  FROM embeddings),
       |e AS (SELECT vec_id,
       |    list_transform(embedding, x -> x::DOUBLE / nrm) AS ne
       |    ${if (planes > 0) ", bucket" else ""}
       |  FROM raw)""".stripMargin
  }

  override def oracles: Map[String, String] = {
    val base = baseOracles
    val q57 =
      s"""WITH bf AS (${base("q38_cosine_topk")}),
         |lshq AS (${base("q39_ann_lsh")}),
         |ivfq AS (${base("q50_ann_ivf")}),
         |j AS (SELECT bf.q_id, bf.vec_id,
         |    CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END AS lh,
         |    CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END AS ih
         |  FROM bf
         |  LEFT JOIN lshq l ON bf.q_id = l.q_id AND bf.vec_id = l.vec_id
         |  LEFT JOIN ivfq i ON bf.q_id = i.q_id AND bf.vec_id = i.vec_id)
         |SELECT count(*) AS n_true,
         |  CAST(sum(lh) AS BIGINT) AS n_lsh, CAST(sum(ih) AS BIGINT) AS n_ivf,
         |  round(sum(lh)::DOUBLE / count(*), 4) AS recall_lsh,
         |  round(sum(ih)::DOUBLE / count(*), 4) AS recall_ivf
         |FROM j""".stripMargin
    base + ("q57_ann_recall" -> q57)
  }

  private def baseOracles: Map[String, String] = Map(
    "q38_cosine_topk" ->
      s"""WITH ${preppedCte(0)},
         |q AS (SELECT vec_id AS q_id, ne AS qe FROM e WHERE vec_id % 50 = 0),
         |p AS (SELECT q_id, vec_id, ${dotSql("qe", "ne")} AS c
         |  FROM q, e WHERE vec_id != q_id),
         |r AS (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY round(c, 6) DESC, vec_id) AS rn FROM p)
         |SELECT q_id, CAST(rn AS INTEGER) AS rn, vec_id, round(c, 4) AS cos
         |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    "q39_ann_lsh" ->
      s"""WITH ${preppedCte(AnnPlanes)},
         |q AS (SELECT vec_id AS q_id, ne AS qe, bucket AS qb
         |  FROM e WHERE vec_id % 50 = 0),
         |p AS (SELECT q_id, vec_id, ${dotSql("qe", "ne")} AS c
         |  FROM q JOIN e ON e.bucket = q.qb AND e.vec_id != q.q_id),
         |r AS (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY round(c, 6) DESC, vec_id) AS rn FROM p)
         |SELECT q_id, CAST(rn AS INTEGER) AS rn, vec_id, round(c, 4) AS cos
         |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    "q50_ann_ivf" ->
      s"""WITH ${preppedCte(0)},
         |cents AS (SELECT vec_id AS c_id, ne AS ce FROM e WHERE vec_id % 40 = 7),
         |assign AS (SELECT vec_id, ne, cell FROM (
         |  SELECT e.vec_id, e.ne, c.c_id AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY round(${dotSql("e.ne", "c.ce")}, 6) DESC, c.c_id) AS rn
         |  FROM e, cents c) t WHERE rn = 1),
         |probes AS (SELECT q_id, qe, cell FROM (
         |  SELECT e.vec_id AS q_id, e.ne AS qe, c.c_id AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY round(${dotSql("e.ne", "c.ce")}, 6) DESC, c.c_id) AS rn
         |  FROM e, cents c WHERE e.vec_id % 50 = 0) t WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id, ${dotSql("p.qe", "a.ne")} AS c
         |  FROM probes p JOIN assign a ON p.cell = a.cell
         |  WHERE a.vec_id != p.q_id),
         |r AS (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY round(c, 6) DESC, vec_id) AS rn FROM cand)
         |SELECT q_id, CAST(rn AS INTEGER) AS rn, vec_id, round(c, 4) AS cos
         |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    "q40_embedding_pairs" ->
      s"""WITH ${preppedCte(PairPlanes)},
         |bc AS (SELECT bucket FROM e GROUP BY bucket
         |  HAVING count(*) BETWEEN 2 AND ${graft.ext.Dedup.DefaultMaxBucket}),
         |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${dotSql("a.ne", "b.ne")} AS c
         |  FROM bc JOIN e a ON a.bucket = bc.bucket
         |    JOIN e b ON b.bucket = bc.bucket AND a.vec_id < b.vec_id)
         |SELECT a_id, b_id, round(c, 4) AS cos FROM p
         |WHERE c >= 0.35 ORDER BY a_id, b_id""".stripMargin
  )
}
