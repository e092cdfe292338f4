package graft.queries

import graft.{QueryPack, Tables}
import graft.ext.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** North-star similarity search over `embeddings` (SURVEY.md §0):
  * exact brute-force cosine top-k, two approximate paths (multi-table
  * multi-probe sign-LSH and k-means-trained IVF with multi-assignment),
  * embedding-cosine near-pair mining, and MEASURED index quality
  * (recall in q57, candidate pruning in q59). Vectors are unit-
  * normalized once at scan time (cosine per pair = one dot); oracles
  * reproduce every hash, fold and k-means iteration bit-for-bit in
  * DuckDB (all float math is sequential-fold, order-pinned).
  *
  * Index parameters are recall-tuned against the exact baseline
  * (BASELINE.md records the measurements): IVF (k=96 cells, 3 Lloyd
  * iterations on the vec_id%2 sample, 2-cell assignment, 12-cell probe)
  * reaches recall ~0.80 at ~4.4× candidate pruning. LSH (12 tables ×
  * 8 planes, each probed at home + the 4 lowest-margin bit flips)
  * reaches 0.65-0.72 at ~4.4× — lifted from 0.43 (r3's 2×4+1 config)
  * by spending the same candidate budget on more independent tables at
  * deeper buckets. PQ (q65) compresses to 96-bit codes and re-ranks an
  * ADC shortlist — recall 0.92-0.96. Sizing rule at scale: buckets/
  * table (2^AnnPlanes) and IVF cells are capacity knobs sized to
  * corpus/target-bucket-size, like shuffle partitions — the layout
  * (map-side encode, broadcast probes, bucket equi-join) is what's
  * fixed, not the keyspace.
  */
object SimilarityQueries extends QueryPack {

  private val Dims = 64       // embeddings.embedding is 64-dim (FIXTURES.md §6)
  // Evaluation query budget: the recall/cost queries sample a FIXED
  // number of query vectors (~TargetQueries) by deriving the id modulus
  // from the corpus count — so the exact brute-force baseline they
  // compare against costs O(n · TargetQueries) at ANY corpus size. A
  // proportional set (the old fixed `% 50`) made the eval itself
  // O(n²/50): correct at sf0.1, quadratic at 100×. At sf0.1 (n = 5,000)
  // the derived modulus IS 50, so measured recalls are comparable across
  // rounds. The modulus (not a top-N) keeps the set deterministic and
  // cheap to mirror in SQL.
  private val TargetQueries = 100
  private val AnnPlanes = 8   // planes per LSH table → 256 buckets/table
  private val AnnTables = 12  // table t uses global planes t*AnnPlanes+j
  private val AnnFlips = 4    // extra probes/table: flip the 4 lowest-margin bits
  private val PairPlanes = 4  // 16 buckets for pair mining (q40)
  private val PqSubs = 16     // PQ subspaces (4 dims each)
  private val PqK = 64        // centroids per subquantizer → 6 bits × 16 = 96-bit code
  private val PqIters = 2     // Lloyd iterations per subquantizer
  private val PqRerank = 30   // ADC shortlist size re-ranked with exact dots
  private val IvfK = 96       // IVF cells
  private val IvfIters = 3    // Lloyd iterations
  private val SemTau = 0.3    // SemDeDup within-cluster cosine threshold
  private val IvfAssignN = 2  // corpus multi-assignment (top-2 cells)
  private val IvfProbes = 12  // query probes (top-12 cells)

  /** (vec_id, ne [, bucket]) — normalized corpus, optional LSH bucket.
    *
    * Memoized AND CACHED per (dir, planes): the cache is a
    * MATERIALIZATION BARRIER, not just a speedup. Without it,
    * CollapseProject inlines the `ne` normalization (itself a
    * higher-order expression) into every lambda that consumes it —
    * measured 80 s for the IVF cell assignment at sf0.1 (the norm fold
    * re-evaluated per centroid × per element, ~800k interpreted ops per
    * row) vs < 1 s against the materialized column. Joins/exchanges act
    * as barriers implicitly (q38's crossJoin is why brute force never
    * hit this); single-stage projection pipelines like the index
    * builders need one explicitly. */
  // keyed on the SESSION too: a cached DataFrame is bound to the
  // session that built it — a stopped/recreated SparkSession in the
  // same JVM must get a fresh frame, not a stale handle
  private val prepCache = graft.runtime.FrameCache.of[
      (SparkSession, String, Int), DataFrame](
    "prepped-embeddings", k => Some(k._1))(v => { v.unpersist(); () })
  private def prepped(s: SparkSession, d: String, planes: Int = 0): DataFrame =
    prepCache.get((s, d, planes))({
      val base = Similarity.withNormalized(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
          .repartition(s.sparkContext.defaultParallelism),
        "embedding")
      val withB = if (planes > 0) base.withColumn("bucket",
        Similarity.lshBucket(col("embedding"), planes, Dims)) else base
      withB.drop("embedding").cache()
    })

  /** Trained IVF centroids, memoized per data dir — training is
    * deterministic, so q50/q57/q59 (and repeated bench runs) share one
    * training pass instead of re-running Lloyd each time. When a
    * persisted IVF artifact exists for the session, the FIRST centroid
    * consumer routes through [[corpusCells]] so the artifact's
    * build-time matrix seeds this memo — without this, an IVF query
    * that touches centroids before cells (q69/q73/q79) would re-run
    * Lloyd training in a restarted process even though the artifact
    * carries the matrix. */
  private val centCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Array[Double]]]
  private def trainCentroids(s: SparkSession, d: String): Seq[Array[Double]] =
    centCache.getOrElseUpdate(d, Similarity.trainKmeans(
      prepped(s, d).filter(col("vec_id") % 2 === 0), IvfK, IvfIters, Dims))
  private def centroids(s: SparkSession, d: String): Seq[Array[Double]] =
    centCache.getOrElse(d, {
      import graft.sinks.ArtifactStore
      if (ArtifactStore.configuredDir(s, "ivf-index", d)
          .exists(ArtifactStore.exists)) {
        corpusCells(s, d) // load (or rebuild) seeds the memo
        centCache.getOrElse(d, trainCentroids(s, d))
      } else trainCentroids(s, d)
    })

  /** Trained PQ codebooks, memoized per data dir (plain doubles — not
    * session-bound, same lifecycle as [[centroids]]). */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Seq[Array[Double]]]]
  private def pqCodebooks(s: SparkSession, d: String): Seq[Seq[Array[Double]]] =
    pqCache.getOrElseUpdate(d, Similarity.trainPq(
      prepped(s, d).filter(col("vec_id") % 2 === 0), PqSubs, PqK, PqIters, Dims))

  /** On-disk (vec_id, ne) parquet staging of the normalized corpus —
    * the q73 stream's input. Memoized per data dir like the streaming
    * fixtures (holds only a path, safe across session restarts). */
  private val ingestFixCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ingestFixture(s: SparkSession, d: String): String =
    ingestFixCache.getOrElseUpdate(d, {
      val tmp = Files.createTempDirectory("graft_ingest_in_").toString
      prepped(s, d).select(col("vec_id"), col("ne"))
        .write.mode("overwrite").parquet(tmp)
      tmp
    })

  /** Query-set modulus: corpus_count / TargetQueries (≥1), memoized per
    * dir (a pure count — parquet metadata, no scan). Spark filter and
    * DuckDB oracle ([[qModSql]]) derive the same number. */
  private val modCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def queryModulus(s: SparkSession, d: String): Long =
    modCache.getOrElseUpdate(d,
      math.max(1L, Tables.embeddings(s, d).count() / TargetQueries))

  /** Marks the ~TargetQueries evaluation query vectors. */
  private def isQuery(s: SparkSession, d: String): Column =
    col("vec_id") % queryModulus(s, d) === 0

  /** The `n` plane indices with the smallest rounded |projection| — the
    * least confident bits, each flipped for one extra probe
    * (multi-probe LSH; ties broken by plane index, same as the oracle's
    * exclusion chain). */
  private def flipIdxs(pj: Column, n: Int): Column =
    transform(slice(array_sort(transform(pj, (p, i) =>
      struct(round(abs(p), 6).as("ap"), i.as("j")))), 1, n), s => s.getField("j"))

  /** Distinct (q_id, qe, vec_id, ne) LSH candidates: `AnnTables` tables,
    * each probed at the home bucket plus the one-bit margin flip. All
    * projections/buckets are map-side expressions; the only shuffle is
    * the (t, bucket) equi-join against the BROADCAST probe set. */
  /** Candidate frames are memoized AND CACHED per (session, dir):
    * q39/q57/q59 consume the LSH candidates and q50/q57/q59/q64/q69 the
    * IVF candidates — without the cache each consumer re-runs the
    * multi-table probe joins (~1 s each at sf0.1). */
  private val candCache = graft.runtime.FrameCache.of[
      (SparkSession, String, String), DataFrame](
    "ann-candidates", k => Some(k._1))(v => { v.unpersist(); () })
  private def lshCandidates(s: SparkSession, d: String): DataFrame =
    candCache.get((s, d, "lsh"))(buildLshCandidates(s, d).cache())
  private def ivfCandidates(s: SparkSession, d: String): DataFrame =
    candCache.get((s, d, "ivf"))(buildIvfCandidates(s, d).cache())

  /** Exact brute-force top-3, memoized AND CACHED like the candidate
    * frames: it is the ground truth that FIVE evaluation queries
    * (q57/q62/q64/q65/q69) join against — uncached, each consumer
    * re-ran the O(corpus × TargetQueries) scan + window, the single
    * most expensive frame in the pack and the one whose cost grows
    * linearly with corpus size. */
  private def bruteForceTop3(s: SparkSession, d: String): DataFrame =
    candCache.get((s, d, "bf")) {
      val e = prepped(s, d)
      val q = e.filter(isQuery(s, d))
        .select(col("vec_id").as("q_id"), col("ne").as("qe"))
      Similarity.bruteForceTopK(e, q, 3).cache()
    }

  private def buildLshCandidates(s: SparkSession, d: String): DataFrame = {
    var e = prepped(s, d)
    for (t <- 0 until AnnTables) {
      e = e.withColumn(s"pj$t", array((0 until AnnPlanes).map(j =>
          Similarity.dot(col("ne"),
            Similarity.planeLit(t * AnnPlanes + j, Dims))): _*))
        .withColumn(s"b$t", (0 until AnnPlanes).map(j =>
          when(element_at(col(s"pj$t"), j + 1) >= 0, lit(1 << j))
            .otherwise(lit(0))).reduce(_ + _))
    }
    val idx = e.select(col("vec_id"), col("ne"),
      explode(array((0 until AnnTables).map(t =>
        struct(lit(t).as("t"), col(s"b$t").as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("ne"), col("tb.t"), col("tb.bucket"))
    var q = e.filter(isQuery(s, d))
    for (t <- 0 until AnnTables)
      q = q.withColumn(s"f$t", flipIdxs(col(s"pj$t"), AnnFlips))
    val flipMask = typedLit(Seq.tabulate(AnnPlanes)(1 << _))
    val probes = q.select(col("vec_id").as("q_id"), col("ne").as("qe"),
      explode(array((0 until AnnTables).flatMap(t =>
        struct(lit(t).as("t"), col(s"b$t").as("bucket")) +:
          (1 to AnnFlips).map(k =>
            struct(lit(t).as("t"),
              col(s"b$t").bitwiseXOR(
                element_at(flipMask, element_at(col(s"f$t"), k) + 1))
                .as("bucket")))): _*)).as("tb"))
      .select(col("q_id"), col("qe"), col("tb.t"), col("tb.bucket"))
    idx.join(broadcast(probes), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qe"), col("vec_id"), col("ne"))
      .distinct()
  }

  /** Distinct (q_id, qe, vec_id, ne) IVF candidates: corpus indexed in
    * its top-`IvfAssignN` cells, queries probe their top-`IvfProbes`
    * cells. Assignment is a pure map-side expression against the
    * literal centroid matrix (no crossJoin/window); the only shuffle is
    * the cell equi-join against the BROADCAST probe set. */
  /** The standing IVF inverted index: every corpus vector exploded to
    * its top-[[IvfAssignN]] cells — memoized AND CACHED per (session,
    * dir) because it serves BOTH the batch candidate build and the
    * q111 streaming search (at cluster scale: the cell-partitioned
    * index table q73 materializes). */
  private val cellsCache = graft.runtime.FrameCache.frames("ivf-cells")
  private def corpusCells(s: SparkSession, d: String): DataFrame =
    cellsCache.get((s, d))({
      import graft.sinks.ArtifactStore
      // fingerprint THIS session's corpus once (one cheap aggregate);
      // it gates the load AND stamps the save — the same hoist the two
      // sibling standing consumers use, so the gate and the stamp can
      // never scan twice or drift apart on the rebuild path
      lazy val snap = ivfSnapshot(s, d)
      ArtifactStore.standing(s, "ivf-index", d)({
        // trainCentroids, NOT centroids: the public accessor consults
        // the artifact dir and would recurse back into this build
        val cents = trainCentroids(s, d)
        val cells = prepped(s, d)
          .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
          .withColumn("cells", Similarity.topCells(col("dots"), IvfAssignN))
          .select(col("vec_id"), col("ne"), explode(col("cells")).as("cell"))
          .cache()
        (cells, cents)
      })({ case ((cells, cents), dir) =>
        ArtifactStore.saveIvfIndex(cells, cents, dir, snap)
      })({ dir =>
        // restart path: load cells AND centroids together (the probe
        // must assign against the exact build-time matrix), seeding
        // the centroid memo so every IVF consumer shares them
        val (cells, cents) = ArtifactStore.loadIvfIndex(s, dir, snap)
        centCache.put(d, cents)
        (cells, cents)
      })._1
    })

  /** Fingerprint of the raw embedding corpus the IVF artifacts index. */
  private def ivfSnapshot(s: SparkSession, d: String)
      : graft.sinks.ArtifactStore.CorpusSnapshot =
    graft.sinks.ArtifactStore.snapshot(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      Seq("vec_id", "embedding"))

  private def buildIvfCandidates(s: SparkSession, d: String): DataFrame =
    ivfCandidatesFrom(corpusCells(s, d), centroids(s, d),
      prepped(s, d).filter(isQuery(s, d)))

  /** IVF candidates from EXPLICIT index artifacts — the seam that lets
    * a session probe a loaded ([[graft.sinks.ArtifactStore]]) index it
    * did not build; [[buildIvfCandidates]] is this applied to the
    * in-memory artifacts. `queries` is a (vec_id, ne) frame. */
  private[graft] def ivfCandidatesFrom(cells: DataFrame,
      cents: Seq[Array[Double]], queries: DataFrame): DataFrame = {
    val probes = queries
      .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
      .withColumn("cells", Similarity.topCells(col("dots"), IvfProbes))
      .select(col("vec_id").as("q_id"), col("ne").as("qe"),
        explode(col("cells")).as("cell"))
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qe"), col("vec_id"), col("ne"))
      .distinct()
  }

  /** The standing IVF artifacts (inverted index + centroid matrix) for
    * `d` — what [[graft.sinks.ArtifactStore.saveIvfIndex]] persists. */
  private[graft] def ivfArtifacts(s: SparkSession, d: String)
      : (DataFrame, Seq[Array[Double]]) =
    (corpusCells(s, d), centroids(s, d))

  /** The normalized (vec_id, ne) corpus frame (spec probe-set seam). */
  private[graft] def preppedEmbeddings(s: SparkSession, d: String): DataFrame =
    prepped(s, d)

  /** The (vec_id, ne, source) frame q87/q109 aggregate per source —
    * normalized corpus vectors tagged with their document's source.
    * Null vectors are excluded HERE, at the shared frame, so the whole
    * q87/q109 surface (both mean modes, q109's outer n_vecs/outlier
    * counts, and the DuckDB oracle CTEs, which carry the matching
    * `ne IS NOT NULL`) agrees on the denominator — not just the two
    * engine modes between themselves. */
  private[graft] def sourcedEmbeddings(s: SparkSession, d: String): DataFrame =
    prepped(s, d).filter(col("ne").isNotNull)
      .join(Tables.documents(s, d)
        .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))

  /** Per-source (source, n_vecs, mean) centroid table — the frame q87
    * reports and q109 scores against. Two modes (VERDICT r8 #1):
    *
    *  - `exact = true` (the local/Verify default): ORDER-PINNED
    *    sequential fold — array_sort(collect_list(struct(vec_id, ne)))
    *    then aggregate/zip_with, the trainKmeans update shape. DuckDB
    *    reproduces the doubles bit-for-bit, which is what hash-exact
    *    oracle verification needs — but it materializes each source
    *    group into ONE row: fine at eval scale, an executor OOM at a
    *    10⁹-vector source domain.
    *  - `exact = false` (the PRODUCTION mode; clusterBuilder's
    *    default, or spark.graft.exactMeans=false): tree-reduced
    *    [[graft.ext.VecMean]] — (count, sum[d]) state per group,
    *    map-side partials, bounded at any group size. Not bit-portable
    *    across partitionings; equal to the fold within 1e-9
    *    (`VecMeanSpec`), the engine's exact-vs-approx split (cf. q38
    *    brute vs q39/q50). Plan shape pinned in `PlanPostureSpec`
    *    (no collect_list; ObjectHashAggregate partials). */
  private[graft] def sourceMeans(e: DataFrame, exact: Boolean): DataFrame = {
    // Null vectors are excluded UP FRONT so the two modes cannot
    // diverge on them: the fold's zip_with would null the whole
    // group's sum off one null element while VecMean skips it — and
    // n_vecs must match the mean's denominator in both modes.
    val nn = e.filter(col("ne").isNotNull)
    if (exact) {
      val zero = typedLit(Seq.fill(Dims)(0.0))
      nn.groupBy(col("source"))
        .agg(count(lit(1)).as("n_vecs"),
          array_sort(collect_list(struct(col("vec_id"), col("ne")))).as("vs"))
        .withColumn("ssum", aggregate(
          transform(col("vs"), v => v.getField("ne")), zero,
          (acc, x) => zip_with(acc, x, _ + _)))
        .withColumn("mean", transform(col("ssum"), _ / col("n_vecs")))
        .select(col("source"), col("n_vecs"), col("mean"))
    } else {
      val vecMean = udaf(new graft.ext.VecMean(Dims))
      nn.groupBy(col("source"))
        .agg(count(lit(1)).as("n_vecs"), vecMean(col("ne")).as("mean"))
    }
  }

  /** Oracle-exact means unless the session opts into the production
    * tree-reduced path (spark.graft.exactMeans=false — what
    * [[graft.GraftSession.clusterBuilder]] presets). */
  private def exactMeans(s: SparkSession): Boolean =
    s.conf.get("spark.graft.exactMeans", "true").toBoolean

  /** Top-k per query over PRE-SCORED (q_id, vec_id, cos) rows,
    * cross-engine total order (rounded cosine desc, vec_id tie-break). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Top-k per query over a (q_id, qe, vec_id, ne) candidate frame.
    * The cosine is computed MAP-SIDE while the vectors are in hand and
    * the frame is projected to (q_id, vec_id, cos) before the window's
    * exchange (r21, guide §2.3): the 2×64-double payloads never cross
    * a shuffle — same rows, same ranking, 16-byte keys + one double
    * instead of ~1 KB per row. */
  private def topK(cand: DataFrame, k: Int): DataFrame =
    rankTopK(
      cand.withColumn("cos", Similarity.dot(col("qe"), col("ne")))
        .select(col("q_id"), col("vec_id"), col("cos")), k)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Exact baseline: brute-force cosine top-3 per query vector ----
    "q38_cosine_topk" -> ((s, d) =>
      bruteForceTop3(s, d).orderBy(col("q_id"), col("rn"))),

    // ---- ANN path 1: multi-table multi-probe sign-LSH top-3 ----
    "q39_ann_lsh" -> ((s, d) => topK(lshCandidates(s, d), 3)),

    // ---- ANN path 2: k-means IVF, multi-assign + multi-probe top-3 ----
    "q50_ann_ivf" -> ((s, d) => topK(ivfCandidates(s, d), 3)),

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
      val bf = bruteForceTop3(s, d)
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
    }),

    // ---- Int8 scalar quantization: per-vector max-abs scale, each
    //      component rounded to [-127,127] — the 4× memory/bandwidth
    //      compression a 100 TB embedding store runs. The query ranks
    //      brute-force top-3 on QUANTIZED cosines and reports recall
    //      against the float exact top-3, so the compression's quality
    //      cost is a measured number like the index recalls. ----
    "q62_int8_recall" -> ((s, d) => {
      val e = prepped(s, d)
        .withColumn("scale", aggregate(col("ne"), lit(0.0),
          (m, x) => greatest(m, abs(x))))
        .withColumn("q8", transform(col("ne"),
          x => round(x * 127.0 / col("scale"))))
      val q = e.filter(isQuery(s, d))
        .select(col("vec_id").as("q_id"), col("q8").as("qq8"),
          col("scale").as("qscale"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cosq"), 6).desc, col("vec_id"))
      val top = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosq", Similarity.dot(col("qq8"), col("q8"))
          * col("qscale") * col("scale") / (127.0 * 127.0))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      bruteForceTop3(s, d)
        .select(col("q_id"), col("vec_id"))
        .join(top, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .select(col("n_true"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_true"), 4).as("recall_q8"))
    }),

    // ---- The deployed configuration: IVF pruning over INT8-compressed
    //      inverted lists (candidates from the index, scored on the
    //      quantized vectors) — ~4.4× compute pruning × 4× memory
    //      compression, with the COMBINED recall measured against the
    //      float exact baseline. ----
    "q64_ivf_int8_recall" -> ((s, d) => {
      val q8x = prepped(s, d)
        .withColumn("scale", aggregate(col("ne"), lit(0.0),
          (m, x) => greatest(m, abs(x))))
        .withColumn("q8", transform(col("ne"),
          x => round(x * 127.0 / col("scale"))))
        .select(col("vec_id"), col("scale"), col("q8"))
      val qz = q8x.select(col("vec_id").as("q_id"), col("q8").as("qq8"),
        col("scale").as("qscale"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cosq"), 6).desc, col("vec_id"))
      val top = ivfCandidates(s, d).select(col("q_id"), col("vec_id"))
        .join(broadcast(qz), "q_id")
        .join(q8x, "vec_id")
        .withColumn("cosq", Similarity.dot(col("qq8"), col("q8"))
          * col("qscale") * col("scale") / (127.0 * 127.0))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      bruteForceTop3(s, d)
        .select(col("q_id"), col("vec_id"))
        .join(top, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .select(col("n_true"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_true"), 4)
            .as("recall_ivf_q8"))
    }),

    // ---- Product quantization (ADC): the 100 TB embedding-store scan
    //      path. Corpus vectors are encoded once into PqSubs argmin
    //      codes (16 × 6 bits = 12 bytes vs 256 bytes of float32 —
    //      ~21× compression); each query precomputes per-subspace LUTs
    //      of dots against the codebooks, so scoring a candidate is
    //      PqSubs array lookups instead of a 64-dim dot. The ADC
    //      top-PqRerank shortlist is then re-ranked with exact float
    //      dots — the standard two-stage PQ deployment — and BOTH
    //      stages' recall vs the float exact top-3 is reported
    //      (recall_adc shows what the codes alone buy; recall_pq what
    //      the deployment gets: 0.96 @ sf0.01, 0.92 @ sf0.1). ----
    "q65_pq_recall" -> ((s, d) => {
      val cb = pqCodebooks(s, d)
      val e = prepped(s, d)
      val coded = e.select(col("vec_id"), col("ne"),
        Similarity.pqCodes(col("ne"), cb, Dims).as("codes"))
      val q = e.filter(isQuery(s, d))
        .select(col("vec_id").as("q_id"), col("ne").as("qe"),
          Similarity.pqLuts(col("ne"), cb, Dims).as("luts"))
      val wA = Window.partitionBy(col("q_id"))
        .orderBy(round(col("adc"), 6).desc, col("vec_id"))
      val short = coded.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("adc", Similarity.adcScore(col("codes"), col("luts"), PqSubs))
        .withColumn("ra", row_number().over(wA))
        .filter(col("ra") <= PqRerank)
      val wR = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cos"), 6).desc, col("vec_id"))
      val rr = short
        .withColumn("cos", Similarity.dot(col("qe"), col("ne")))
        .withColumn("rn", row_number().over(wR))
      val top3 = rr.filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      val adc3 = rr.filter(col("ra") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("ahit"))
      bruteForceTop3(s, d).select(col("q_id"), col("vec_id"))
        .join(top3, Seq("q_id", "vec_id"), "left")
        .join(adc3, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("ahit"), lit(0))).as("n_adc"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .select(col("n_true"), col("n_adc"), col("n_hit"),
          round(col("n_adc").cast("double") / col("n_true"), 4).as("recall_adc"),
          round(col("n_hit").cast("double") / col("n_true"), 4).as("recall_pq"))
    }),

    // ---- IVFPQ — the production ANN architecture at 100 TB: inverted
    //      lists carry the 96-bit PQ codes (attached at INDEX time, so
    //      candidate scoring needs no join back to the float corpus),
    //      queries probe their top cells and score candidates by ADC
    //      lookups, and only the top-PqRerank shortlist touches float
    //      vectors for the exact re-rank. ~4.4× candidate pruning ×
    //      ~21× list compression × O(16) per-candidate scoring, with
    //      the end-to-end recall measured against the float exact
    //      baseline. ----
    "q69_ivfpq_recall" -> ((s, d) => {
      val cb = pqCodebooks(s, d)
      val cents = centroids(s, d)
      val e = prepped(s, d)
      val idx = e
        .withColumn("codes", Similarity.pqCodes(col("ne"), cb, Dims))
        .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
        .withColumn("cells", Similarity.topCells(col("dots"), IvfAssignN))
        .select(col("vec_id"), col("ne"), col("codes"),
          explode(col("cells")).as("cell"))
      val probes = e.filter(isQuery(s, d))
        .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
        .withColumn("cells", Similarity.topCells(col("dots"), IvfProbes))
        .select(col("vec_id").as("q_id"), col("ne").as("qe"),
          Similarity.pqLuts(col("ne"), cb, Dims).as("luts"),
          explode(col("cells")).as("cell"))
      val wA = Window.partitionBy(col("q_id"))
        .orderBy(round(col("adc"), 6).desc, col("vec_id"))
      val short = idx.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .dropDuplicates("q_id", "vec_id") // multi-assign/probe dups carry identical payloads
        .withColumn("adc", Similarity.adcScore(col("codes"), col("luts"), PqSubs))
        .withColumn("ra", row_number().over(wA))
        .filter(col("ra") <= PqRerank)
      val wR = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cos"), 6).desc, col("vec_id"))
      val rr = short
        .withColumn("cos", Similarity.dot(col("qe"), col("ne")))
        .withColumn("rn", row_number().over(wR))
      val top3 = rr.filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      val adc3 = rr.filter(col("ra") <= 3)
        .select(col("q_id"), col("vec_id"), lit(1).as("ahit"))
      bruteForceTop3(s, d).select(col("q_id"), col("vec_id"))
        .join(top3, Seq("q_id", "vec_id"), "left")
        .join(adc3, Seq("q_id", "vec_id"), "left")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("ahit"), lit(0))).as("n_adc"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .select(col("n_true"), col("n_adc"), col("n_hit"),
          round(col("n_adc").cast("double") / col("n_true"), 4).as("recall_adc_ivf"),
          round(col("n_hit").cast("double") / col("n_true"), 4).as("recall_ivfpq"))
    }),

    // ---- Streaming index ingest — the 100 TB vector store's WRITE
    //      path: vectors arrive on a stream and are indexed online.
    //      IVF cell assignment (top-IvfAssignN) and the 96-bit PQ
    //      encode are pure map-side expressions against the trained
    //      literal codebooks, so ingest has NO shuffle, NO state store
    //      and NO join — each micro-batch appends straight into the
    //      inverted lists. The result audits the built index per cell
    //      (list size, membership + code checksums); the oracle
    //      rebuilds the same index relationally from the SAME training
    //      math, proving the streamed index is bit-identical to a
    //      batch rebuild (the property that lets a deployment mix
    //      batch bootstrap with streaming catch-up). ----
    "q73_stream_index_ingest" -> ((s, d) => {
      val cb = pqCodebooks(s, d)
      val cents = centroids(s, d)
      val in = ingestFixture(s, d)
      val tmp = Files.createTempDirectory("graft_ingest_run_").toString
      val schema = s.read.parquet(in).schema
      val q = s.readStream.schema(schema).parquet(in)
        .withColumn("codes", Similarity.pqCodes(col("ne"), cb, Dims))
        .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
        .withColumn("cells", Similarity.topCells(col("dots"), IvfAssignN))
        .select(col("vec_id"), element_at(col("codes"), 1).as("c0"),
          explode(col("cells")).as("cell"))
        .writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$tmp/out")
        }
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("cell").cast("long").as("cell"),
          col("c0").cast("long").as("c0"), col("vec_id"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("c0")).as("sum_code0"),
          sum(col("vec_id")).as("sum_vec_id"))
        .orderBy(col("cell"))
    }),

    // ---- ANN cost evaluation: candidate counts vs brute force — the
    //      measured pruning factor that, with q57's recall, makes the
    //      quality/cost tradeoff of both indexes a number, not a hope. ----
    "q59_ann_candidates" -> ((s, d) => {
      val e = prepped(s, d)
      val stats = e.agg(count(lit(1)).as("n"),
        sum(when(isQuery(s, d), 1).otherwise(0)).as("nq"))
      val lc = lshCandidates(s, d).agg(count(lit(1)).as("n_lsh"))
      val ic = ivfCandidates(s, d).agg(count(lit(1)).as("n_ivf"))
      stats.crossJoin(lc).crossJoin(ic)
        .withColumn("n_bf", col("nq") * (col("n") - 1))
        .select(col("n_bf"), col("n_lsh"), col("n_ivf"),
          round(col("n_bf").cast("double") / col("n_lsh"), 2).as("prune_lsh"),
          round(col("n_bf").cast("double") / col("n_ivf"), 2).as("prune_ivf"))
    }),

    // ---- SemDeDup (Abbas et al. '23): semantic dedup = k-means
    //      cluster the embeddings, then prune within-cluster near-
    //      duplicates. Reuses the trained IVF centroids; assignment is
    //      the same map-side literal-matrix argmax as the index build,
    //      pair comparisons stay WITHIN cells (pairsFromBuckets — one
    //      groupBy(cell), never an all-pairs scan), and a vector is
    //      pruned when it cosines ≥ τ with a LOWER-id cell-mate (keep-
    //      first — pair-local, no transitive closure, so the oracle
    //      reproduces it relationally). At 100 TB the cell count k
    //      scales with n, holding per-cell occupancy (and the O(Σ
    //      cell²) compare cost) constant per partition. ----
    "q79_semdedup" -> ((s, d) => {
      val cents = centroids(s, d)
      val cells = prepped(s, d)
        .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
        .withColumn("cell", element_at(Similarity.topCells(col("dots"), 1), 1))
        .select(col("vec_id"), col("ne"), col("cell"))
      val rows = cells.select(struct(col("vec_id"), col("ne")).as("vn"),
        col("cell"))
      val removed = graft.ext.Dedup.pairsFromBuckets(rows, Seq("cell"), "vn")
        .withColumn("cos", Similarity.dot(col("a_id.ne"), col("b_id.ne")))
        .filter(col("cos") >= SemTau)
        .select(col("b_id.vec_id").as("vec_id"))
        .distinct()
        .withColumn("rm", lit(1L))
      cells.join(removed, Seq("vec_id"), "left")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("rm").isNotNull, 1L).otherwise(0L)).as("n_removed"))
        .orderBy(col("cell"))
    }),

    // ---- Per-domain embedding centroids: the domain-drift /
    //      coherence monitor a corpus pipeline runs per source —
    //      centroid of the unit vectors, whose norm ∈ [0,1] measures
    //      domain coherence (≈1 when a source's docs all embed alike).
    //      The mean comes from [[sourceMeans]]: the order-pinned fold
    //      in oracle mode (bit-portable to DuckDB), the tree-reduced
    //      VecMean aggregate in production mode (bounded per-group
    //      state at any source size). ----
    "q87_domain_centroids" -> ((s, d) =>
      sourceMeans(sourcedEmbeddings(s, d), exactMeans(s))
        .select(col("source"), col("n_vecs"),
          round(sqrt(Similarity.dot(col("mean"), col("mean"))), 4)
            .as("coherence"),
          round(element_at(col("mean"), 1), 6).as("c0"))
        .orderBy(col("source"))),

    // ---- Embedding outlier detection: the data-cleaning tail of
    //      centroid assignment (SemDeDup prunes the TOO-CLOSE tail;
    //      this flags the TOO-FAR one — mislabeled/corrupted items a
    //      curation pass quarantines). Per source: q87's [[sourceMeans]]
    //      table (pinned fold in oracle mode, tree-reduced VecMean in
    //      production), then every vector scores cos(ne, mean/|mean|)
    //      map-side — the 20×d mean table BROADCASTS, the dot is the
    //      codegen'd VecDot kernel, and no corpus shuffle happens
    //      beyond the per-source rollup. Outlier bar cos < 0 (negative
    //      correlation with the domain center — ~5% of this corpus,
    //      measured); min/max are order-independent aggregates, so
    //      every output is engine-exact. ----
    "q109_embedding_outliers" -> ((s, d) => {
      val e = sourcedEmbeddings(s, d)
      val means = sourceMeans(e, exactMeans(s))
        .select(col("source"), col("mean"))
      e.join(broadcast(means), Seq("source"))
        .withColumn("cos", Similarity.dot(col("ne"), col("mean")) /
          sqrt(Similarity.dot(col("mean"), col("mean"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("cos") < OutlierCos, 1L).otherwise(0L))
            .as("n_outliers"),
          round(min(col("cos")), 4).as("min_cos"),
          round(max(col("cos")), 4).as("max_cos"))
        .orderBy(col("source"))
    }),

    // ---- Streaming ANN search: the ONLINE half of the index story
    //      (q73 streams the build; this streams the queries). Query
    //      vectors arrive raw in two waves; per micro-batch each is
    //      normalized and probed map-side against the PLAN-LITERAL
    //      centroids, the probe set broadcasts into the standing
    //      [[corpusCells]] inverted index (built once, cached — at
    //      cluster scale, q73's cell-partitioned table), and the
    //      per-batch top-3 appends to the result log. The corpus is
    //      never re-assigned and never shuffles; batch latency is
    //      O(|batch| probes × cell occupancy). The oracle is the BATCH
    //      IVF search over the same cohort — streaming the queries must
    //      not change a single answer. ----
    "q111_stream_ann_search" -> ((s, d) => {
      val inDir = annQueryFixture(s, d)
      // cells BEFORE centroids: on the artifact restart path the index
      // load seeds the centroid memo — the reverse order would re-train
      // the matrix the artifact already carries
      val idx = corpusCells(s, d)
      val cents = centroids(s, d)
      val tmp = Files.createTempDirectory("graft_annq_run_").toString
      val schema = s.read.parquet(inDir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val probes = Similarity.withNormalized(batch, "embedding")
            .withColumn("dots", Similarity.centroidDots(col("ne"), cents))
            .withColumn("cells", Similarity.topCells(col("dots"), IvfProbes))
            .select(col("vec_id").as("q_id"), col("ne").as("qe"),
              explode(col("cells")).as("cell"))
          // score map-side while the vectors are in hand, THEN dedupe
          // and rank on the narrow (q_id, vec_id, cos) rows (r21, guide
          // §2.3): multi-probe duplicates carry identical payloads, so
          // their cosines are identical and the deduped set is exactly
          // the pre-r21 distinct-then-score one — but neither the
          // distinct nor the window exchange ships the 2×64-double
          // payloads any more.
          val cand = idx.join(broadcast(probes), Seq("cell"))
            .filter(col("vec_id") =!= col("q_id"))
            .withColumn("cos", Similarity.dot(col("qe"), col("ne")))
            .select(col("q_id"), col("vec_id"), col("cos"))
            .distinct()
          val ranked = rankTopK(cand, 3).withColumn("wave", col("q_id") % 2)
          // Diagnostic seam (VERDICT r21 #5): foreachBatch plans never
          // reach PlanDump (they exist only per batch), so the evidence
          // that the distinct/rank exchanges carry (q_id, vec_id, cos)
          // and not the 2×64-double payloads is dumped here, env-gated,
          // and committed as plans/r22/q111_microbatch_after.txt.
          if (sys.env.contains("SPARK_GRAFT_DUMP_BATCH_PLANS"))
            println("[batchplan q111_stream_ann_search]\n" +
              ranked.queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          ranked.write.mode("append").parquet(s"$tmp/out")
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/chk")
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("wave"), col("q_id"), col("rn"), col("vec_id"),
          col("cos"))
        .orderBy(col("q_id"), col("rn"))
    })
  )

  /** Staged (vec_id, raw embedding) parquet of the evaluation cohort in
    * two wave files — the q111 stream input. Memoized per dir (paths
    * only, safe across session restarts). */
  private val annQueryFixCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def annQueryFixture(s: SparkSession, d: String): String =
    annQueryFixCache.getOrElseUpdate(d, {
      val tmp = Files.createTempDirectory("graft_annq_in_").toString
      val in = new java.io.File(s"$tmp/in"); in.mkdirs()
      val cohort = Tables.embeddings(s, d)
        .filter(isQuery(s, d)).select(col("vec_id"), col("embedding"))
      Seq(0, 1).foreach { w =>
        val st = s"$tmp/stage_$w"
        cohort.filter(col("vec_id") % 2 === w)
          .coalesce(1).write.mode("overwrite").parquet(st)
        val part = new java.io.File(st).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath,
          new java.io.File(in, f"00$w%s_wave.parquet").toPath)
      }
      s"$tmp/in"
    })

  private val OutlierCos = 0.0 // flag vectors anti-correlated with their domain

  // ---------------------------------------------------------------- oracles

  /** SQL mirror of [[queryModulus]]: corpus_count / TargetQueries, ≥1
    * (DuckDB `//` is integer division, same as JVM Long division for
    * non-negative operands). */
  private def qModSql: String =
    s"(SELECT greatest(1, count(*) // $TargetQueries) FROM embeddings)"

  /** Sequential-fold dot product (matches Spark's aggregate with 0.0
    * init: 0.0 + x1 == x1 exactly, so list_reduce's x1-init agrees). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"

  /** Squared L2 distance, mirroring [[Similarity.dist2]]'s exact
    * left-associated `|a|^2 - 2*(a.b) + |b|^2` expression. */
  private def d2Sql(a: String, b: String): String =
    s"(${dotSql(a, a)} - 2 * ${dotSql(a, b)} + ${dotSql(b, b)})"

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

  /** Multi-table multi-probe LSH candidate CTEs, ending in `endName`
    * (q_id, qe, vec_id, ne). Mirrors [[lshCandidates]] generically over
    * (AnnTables, AnnPlanes, AnnFlips): per-table projections, sign
    * buckets, and AnnFlips lowest-rounded-|margin| bit flips per table.
    * The flip chain uses DuckDB lateral aliases: f_k = first position
    * of the list min with positions f_0..f_{k-1} masked to 1e18 — the
    * same (abs, index) total order as the Spark array_sort. */
  private def lshCandCte(endName: String): String = {
    def pjList(t: Int) = (0 until AnnPlanes)
      .map(j => projSql("ne", t * AnnPlanes + j))
      .mkString("[", ",\n      ", "]")
    def bSql(pj: String) = (0 until AnnPlanes)
      .map(j => s"(CASE WHEN $pj[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString("(", " + ", ")")
    val ts = 0 until AnnTables
    val pjCols = ts.map(t => s"${pjList(t)} AS pj$t").mkString(",\n    ")
    val bCols = ts.map(t => s"${bSql(s"pj$t")} AS b$t").mkString(",\n    ")
    val caseB = ts.map(t => s"WHEN $t THEN b$t")
      .mkString("CASE tt.t ", " ", " END")
    val flipCols = ts.flatMap { t =>
      s"list_transform(pj$t, x -> round(abs(x), 6)) AS ap${t}_0" +:
        (0 until AnnFlips).flatMap { k =>
          val f = s"list_position(ap${t}_$k, list_min(ap${t}_$k)) - 1 AS f${t}_$k"
          if (k == AnnFlips - 1) Seq(f)
          else Seq(f, s"list_transform(generate_series(1, $AnnPlanes), " +
            s"i -> CASE WHEN i - 1 = f${t}_$k THEN 1e18 ELSE ap${t}_$k[i] END) " +
            s"AS ap${t}_${k + 1}")
        }
    }.mkString(",\n    ")
    val prbSelects = ts.flatMap { t =>
      s"SELECT q_id, qe, $t AS t, b$t AS bucket FROM qf" +:
        (0 until AnnFlips).map(k =>
          s"SELECT q_id, qe, $t, xor(b$t, 1 << f${t}_$k) FROM qf")
    }.mkString("\n  UNION ALL ")
    s"""px AS (SELECT vec_id, ne, $pjCols FROM e),
       |bx AS (SELECT vec_id, ne, ${ts.map(t => s"pj$t").mkString(", ")},
       |    $bCols FROM px),
       |lidx AS (SELECT vec_id, ne, tt.t, $caseB AS bucket
       |  FROM bx, (VALUES ${ts.map(t => s"($t)").mkString(", ")}) tt(t)),
       |qf AS (SELECT vec_id AS q_id, ne AS qe, ${ts.map(t => s"b$t").mkString(", ")},
       |    $flipCols
       |  FROM bx WHERE vec_id % $qModSql = 0),
       |prb AS ($prbSelects),
       |$endName AS (SELECT DISTINCT p.q_id, p.qe, i.vec_id, i.ne
       |  FROM prb p JOIN lidx i ON p.t = i.t AND p.bucket = i.bucket
       |  WHERE i.vec_id != p.q_id)""".stripMargin
  }

  /** Lloyd-training CTEs shared by the IVF and SemDeDup oracles:
    * `smp`, `c0` … `c<IvfIters>` (the trained centroids), mirroring
    * [[Similarity.trainKmeans]] with iterations unrolled. */
  private def kmeansTrainCtes: String = {
    def iter(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""a$i AS (SELECT vec_id, ne, c FROM (
         |  SELECT s.vec_id, s.ne, cc.c, row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY round(${dotSql("s.ne", "cc.ce")}, 6) DESC, cc.c) AS rn
         |  FROM smp s, $prev cc) t WHERE rn = 1),
         |m$i AS (SELECT c, list(ne ORDER BY vec_id) AS vs, count(*) AS cnt
         |  FROM a$i GROUP BY c),
         |s$i AS (SELECT c, cnt, list_reduce(vs,
         |    (a, b) -> list_transform(generate_series(1, $Dims), j -> a[j] + b[j])) AS ssum
         |  FROM m$i),
         |n$i AS (SELECT c, list_transform(ssum, x -> x / cnt) AS mean FROM s$i),
         |w$i AS (SELECT c, mean, sqrt(${dotSql("mean", "mean")}) AS nrm FROM n$i),
         |c$i AS (SELECT p.c, coalesce(list_transform(w.mean, x -> x / w.nrm), p.ce) AS ce
         |  FROM $prev p LEFT JOIN w$i w ON p.c = w.c)""".stripMargin
    }
    s"""smp AS (SELECT vec_id, ne FROM e WHERE vec_id % 2 = 0),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, ne AS ce
       |  FROM smp ORDER BY vec_id LIMIT $IvfK),
       |${(1 to IvfIters).map(iter).mkString(",\n")}""".stripMargin
  }

  /** k-means IVF candidate CTEs, ending in `endName` (q_id, qe, vec_id,
    * ne). Mirrors [[ivfCandidates]]; every float op is the same
    * sequential fold, so the centroids are bit-identical across
    * engines. */
  private def ivfCandCte(endName: String): String = {
    s"""$kmeansTrainCtes,
       |iidx AS (SELECT vec_id, ne, c AS cell FROM (
       |  SELECT e.vec_id, e.ne, cc.c, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${dotSql("e.ne", "cc.ce")}, 6) DESC, cc.c) AS rn
       |  FROM e, c$IvfIters cc) t WHERE rn <= $IvfAssignN),
       |iprb AS (SELECT q_id, qe, cell FROM (
       |  SELECT e.vec_id AS q_id, e.ne AS qe, cc.c AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${dotSql("e.ne", "cc.ce")}, 6) DESC, cc.c) AS rn
       |  FROM e, c$IvfIters cc WHERE e.vec_id % $qModSql = 0) t WHERE rn <= $IvfProbes),
       |$endName AS (SELECT DISTINCT p.q_id, p.qe, i.vec_id, i.ne
       |  FROM iprb p JOIN iidx i ON p.cell = i.cell
       |  WHERE i.vec_id != p.q_id)""".stripMargin
  }

  /** PQ CTEs mirroring [[Similarity.trainPq]] + [[queries]]' q65 with
    * the per-subspace Lloyd iterations unrolled: subvector rows
    * (m, vec_id, sub) via a VALUES cross join, argmin-[[d2Sql]]
    * assignment with centroid-index tie-break, sequential-fold mean
    * update, then corpus codes (`codesp`: vec_id, cds[m+1]) and query
    * LUTs (`qpv`: q_id, vv[m+1][c+1]) for the fixed-order ADC sum. */
  private def pqCte: String = {
    val subD = Dims / PqSubs
    def sub(v: String) = s"$v[mm.m * $subD + 1 : mm.m * $subD + $subD]"
    def iter(i: Int): String = {
      val prev = s"pc${i - 1}"
      s"""pa$i AS (SELECT m, vec_id, sub, c FROM (
         |  SELECT s.m, s.vec_id, s.sub, cc.c, row_number() OVER (PARTITION BY s.m, s.vec_id
         |      ORDER BY round(${d2Sql("s.sub", "cc.ce")}, 6) ASC, cc.c) AS rn
         |  FROM psub s JOIN $prev cc ON s.m = cc.m) t WHERE rn = 1),
         |pm$i AS (SELECT m, c, list(sub ORDER BY vec_id) AS vs, count(*) AS cnt
         |  FROM pa$i GROUP BY m, c),
         |ps$i AS (SELECT m, c, cnt, list_reduce(vs,
         |    (a, b) -> list_transform(generate_series(1, $subD), j -> a[j] + b[j])) AS ssum
         |  FROM pm$i),
         |pc$i AS (SELECT p.m, p.c, coalesce(list_transform(s.ssum, x -> x / s.cnt), p.ce) AS ce
         |  FROM $prev p LEFT JOIN ps$i s ON p.m = s.m AND p.c = s.c)""".stripMargin
    }
    s"""mm AS (SELECT * FROM (VALUES ${(0 until PqSubs).map(m => s"($m)").mkString(", ")}) t(m)),
       |psmp AS (SELECT vec_id, ne FROM e WHERE vec_id % 2 = 0),
       |psub AS (SELECT mm.m, s.vec_id, ${sub("s.ne")} AS sub FROM psmp s, mm),
       |pc0 AS (SELECT m, rn - 1 AS c, sub AS ce FROM (
       |  SELECT m, sub, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
       |  FROM psub) t WHERE rn <= $PqK),
       |${(1 to PqIters).map(iter).mkString(",\n")},
       |csub AS (SELECT mm.m, e.vec_id, ${sub("e.ne")} AS sub FROM e, mm),
       |pcode AS (SELECT m, vec_id, c AS code FROM (
       |  SELECT s.m, s.vec_id, cc.c, row_number() OVER (PARTITION BY s.m, s.vec_id
       |      ORDER BY round(${d2Sql("s.sub", "cc.ce")}, 6) ASC, cc.c) AS rn
       |  FROM csub s JOIN pc$PqIters cc ON s.m = cc.m) t WHERE rn = 1),
       |codesp AS (SELECT vec_id, list(code ORDER BY m) AS cds FROM pcode GROUP BY vec_id),
       |qs AS (SELECT vec_id AS q_id, ne AS qe FROM e WHERE vec_id % $qModSql = 0),
       |qsub AS (SELECT q.q_id, mm.m, ${sub("q.qe")} AS sub FROM qs q, mm),
       |qlv AS (SELECT q.q_id, q.m, cc.c, ${dotSql("q.sub", "cc.ce")} AS lv
       |  FROM qsub q JOIN pc$PqIters cc ON q.m = cc.m),
       |qlp AS (SELECT q_id, m, list(lv ORDER BY c) AS vals FROM qlv GROUP BY q_id, m),
       |qpv AS (SELECT q_id, list(vals ORDER BY m) AS vv FROM qlp GROUP BY q_id)""".stripMargin
  }

  /** Shared top-3 tail over a candidate CTE named `cand`. */
  private def topKSql(candCtes: String): String =
    s"""WITH ${preppedCte(0)},
       |$candCtes,
       |cc AS (SELECT q_id, vec_id, ${dotSql("qe", "ne")} AS c FROM cand),
       |r AS (SELECT q_id, vec_id, c, row_number() OVER (
       |    PARTITION BY q_id ORDER BY round(c, 6) DESC, vec_id) AS rn FROM cc)
       |SELECT q_id, CAST(rn AS INTEGER) AS rn, vec_id, round(c, 4) AS cos
       |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin

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
    val q59 =
      s"""WITH ${preppedCte(0)},
         |${lshCandCte("lcand")},
         |${ivfCandCte("icand")},
         |st AS (SELECT count(*) AS n,
         |    sum(CASE WHEN vec_id % $qModSql = 0 THEN 1 ELSE 0 END) AS nq FROM e),
         |lc AS (SELECT count(*) AS n_lsh FROM lcand),
         |ic AS (SELECT count(*) AS n_ivf FROM icand)
         |SELECT CAST(st.nq * (st.n - 1) AS BIGINT) AS n_bf,
         |  CAST(lc.n_lsh AS BIGINT) AS n_lsh, CAST(ic.n_ivf AS BIGINT) AS n_ivf,
         |  round((st.nq * (st.n - 1))::DOUBLE / lc.n_lsh, 2) AS prune_lsh,
         |  round((st.nq * (st.n - 1))::DOUBLE / ic.n_ivf, 2) AS prune_ivf
         |FROM st, lc, ic""".stripMargin
    val q62 =
      s"""WITH ${preppedCte(0)},
         |sc AS (SELECT vec_id, ne,
         |    list_reduce(list_transform(ne, x -> abs(x)), (a, b) -> greatest(a, b)) AS scale
         |  FROM e),
         |q8x AS (SELECT vec_id, scale,
         |    list_transform(ne, x -> round(x * 127.0 / scale)) AS q8 FROM sc),
         |qs AS (SELECT vec_id AS q_id, q8 AS qq8, scale AS qscale
         |  FROM q8x WHERE vec_id % $qModSql = 0),
         |p AS (SELECT q_id, vec_id,
         |    ${dotSql("qq8", "q8")} * qscale * scale / (127.0 * 127.0) AS cosq
         |  FROM qs, q8x WHERE vec_id != q_id),
         |r AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (
         |      PARTITION BY q_id ORDER BY round(cosq, 6) DESC, vec_id) AS rn
         |  FROM p) t WHERE rn <= 3),
         |bf AS (${base("q38_cosine_topk")}),
         |j AS (SELECT bf.q_id, bf.vec_id,
         |    CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS h
         |  FROM bf LEFT JOIN r ON bf.q_id = r.q_id AND bf.vec_id = r.vec_id)
         |SELECT count(*) AS n_true, CAST(sum(h) AS BIGINT) AS n_hit,
         |  round(sum(h)::DOUBLE / count(*), 4) AS recall_q8 FROM j""".stripMargin
    val q64 =
      s"""WITH ${preppedCte(0)},
         |${ivfCandCte("icand")},
         |sc AS (SELECT vec_id, ne,
         |    list_reduce(list_transform(ne, x -> abs(x)), (a, b) -> greatest(a, b)) AS scale
         |  FROM e),
         |q8x AS (SELECT vec_id, scale,
         |    list_transform(ne, x -> round(x * 127.0 / scale)) AS q8 FROM sc),
         |p AS (SELECT c.q_id, c.vec_id,
         |    ${dotSql("qz.q8", "cz.q8")} * qz.scale * cz.scale / (127.0 * 127.0) AS cosq
         |  FROM icand c JOIN q8x qz ON c.q_id = qz.vec_id
         |    JOIN q8x cz ON c.vec_id = cz.vec_id),
         |r AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (
         |      PARTITION BY q_id ORDER BY round(cosq, 6) DESC, vec_id) AS rn
         |  FROM p) t WHERE rn <= 3),
         |bf AS (${base("q38_cosine_topk")}),
         |j AS (SELECT bf.q_id, bf.vec_id,
         |    CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS h
         |  FROM bf LEFT JOIN r ON bf.q_id = r.q_id AND bf.vec_id = r.vec_id)
         |SELECT count(*) AS n_true, CAST(sum(h) AS BIGINT) AS n_hit,
         |  round(sum(h)::DOUBLE / count(*), 4) AS recall_ivf_q8 FROM j""".stripMargin
    val adcExpr = (1 to PqSubs).map(m => s"q.vv[$m][c.cds[$m] + 1]").mkString(" + ")
    val q65 =
      s"""WITH ${preppedCte(0)},
         |$pqCte,
         |pp AS (SELECT q.q_id, c.vec_id, $adcExpr AS adc
         |  FROM qpv q, codesp c WHERE c.vec_id != q.q_id),
         |sl AS (SELECT q_id, vec_id, ra FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY round(adc, 6) DESC, vec_id) AS ra FROM pp) t
         |  WHERE ra <= $PqRerank),
         |rrk AS (SELECT s.q_id, s.vec_id, row_number() OVER (PARTITION BY s.q_id
         |      ORDER BY round(${dotSql("qs.qe", "ex.ne")}, 6) DESC, s.vec_id) AS rn
         |  FROM sl s JOIN qs ON s.q_id = qs.q_id JOIN e ex ON s.vec_id = ex.vec_id),
         |t3 AS (SELECT q_id, vec_id FROM rrk WHERE rn <= 3),
         |a3 AS (SELECT q_id, vec_id FROM sl WHERE ra <= 3),
         |bf AS (${base("q38_cosine_topk")}),
         |j AS (SELECT bf.q_id, bf.vec_id,
         |    CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS h,
         |    CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS ah
         |  FROM bf LEFT JOIN t3 t ON bf.q_id = t.q_id AND bf.vec_id = t.vec_id
         |  LEFT JOIN a3 a ON bf.q_id = a.q_id AND bf.vec_id = a.vec_id)
         |SELECT count(*) AS n_true, CAST(sum(ah) AS BIGINT) AS n_adc,
         |  CAST(sum(h) AS BIGINT) AS n_hit,
         |  round(sum(ah)::DOUBLE / count(*), 4) AS recall_adc,
         |  round(sum(h)::DOUBLE / count(*), 4) AS recall_pq FROM j""".stripMargin
    val q69 =
      s"""WITH ${preppedCte(0)},
         |${ivfCandCte("icand")},
         |$pqCte,
         |scq AS (SELECT ic.q_id, ic.vec_id, $adcExpr AS adc
         |  FROM icand ic JOIN qpv q ON ic.q_id = q.q_id
         |    JOIN codesp c ON ic.vec_id = c.vec_id),
         |sl AS (SELECT q_id, vec_id, ra FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY round(adc, 6) DESC, vec_id) AS ra FROM scq) t
         |  WHERE ra <= $PqRerank),
         |rrk AS (SELECT s.q_id, s.vec_id, row_number() OVER (PARTITION BY s.q_id
         |      ORDER BY round(${dotSql("qs.qe", "ex.ne")}, 6) DESC, s.vec_id) AS rn
         |  FROM sl s JOIN qs ON s.q_id = qs.q_id JOIN e ex ON s.vec_id = ex.vec_id),
         |rr3 AS (SELECT q_id, vec_id FROM rrk WHERE rn <= 3),
         |ad3 AS (SELECT q_id, vec_id FROM sl WHERE ra <= 3),
         |bf AS (${base("q38_cosine_topk")}),
         |j AS (SELECT bf.q_id, bf.vec_id,
         |    CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS h,
         |    CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS ah
         |  FROM bf LEFT JOIN rr3 t ON bf.q_id = t.q_id AND bf.vec_id = t.vec_id
         |  LEFT JOIN ad3 a ON bf.q_id = a.q_id AND bf.vec_id = a.vec_id)
         |SELECT count(*) AS n_true, CAST(sum(ah) AS BIGINT) AS n_adc,
         |  CAST(sum(h) AS BIGINT) AS n_hit,
         |  round(sum(ah)::DOUBLE / count(*), 4) AS recall_adc_ivf,
         |  round(sum(h)::DOUBLE / count(*), 4) AS recall_ivfpq FROM j""".stripMargin
    // The streamed index audit: rebuild the same IVF lists (iidx) and
    // PQ codes (codesp) relationally and aggregate the identical
    // per-cell stats — membership and code checksums included, so any
    // divergence between streamed and batch index construction hashes.
    val q73 =
      s"""WITH ${preppedCte(0)},
         |${ivfCandCte("icand")},
         |$pqCte,
         |j AS (SELECT i.cell, i.vec_id, c.cds[1] AS c0
         |  FROM iidx i JOIN codesp c ON i.vec_id = c.vec_id)
         |SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n_vecs,
         |  CAST(sum(c0) AS BIGINT) AS sum_code0,
         |  CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
         |FROM j GROUP BY cell ORDER BY cell ASC NULLS FIRST""".stripMargin
    val q79 =
      s"""WITH ${preppedCte(0)},
         |$kmeansTrainCtes,
         |cells AS (SELECT vec_id, ne, c AS cell FROM (
         |  SELECT e.vec_id, e.ne, cc.c, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${dotSql("e.ne", "cc.ce")}, 6) DESC, cc.c) AS rn
         |  FROM e, c$IvfIters cc) t WHERE rn = 1),
         |bc AS (SELECT cell FROM cells GROUP BY cell
         |  HAVING count(*) BETWEEN 2 AND ${graft.ext.Dedup.DefaultMaxBucket}),
         |rm AS (SELECT DISTINCT b.vec_id
         |  FROM bc JOIN cells a ON a.cell = bc.cell
         |    JOIN cells b ON b.cell = bc.cell AND a.vec_id < b.vec_id
         |  WHERE ${dotSql("a.ne", "b.ne")} >= $SemTau)
         |SELECT CAST(cells.cell AS INTEGER) AS cell, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN rm.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed
         |FROM cells LEFT JOIN rm ON cells.vec_id = rm.vec_id
         |GROUP BY cells.cell ORDER BY cell ASC NULLS FIRST""".stripMargin
    val q87 =
      s"""WITH ${preppedCte(0)},
         |s0 AS (SELECT e.vec_id, e.ne, d.source
         |  FROM e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE e.ne IS NOT NULL),
         |g AS (SELECT source, count(*) AS n_vecs,
         |    list(ne ORDER BY vec_id) AS vs FROM s0 GROUP BY source),
         |f AS (SELECT source, n_vecs, list_reduce(vs,
         |    (a, b) -> list_transform(generate_series(1, $Dims), j -> a[j] + b[j]))
         |    AS ssum FROM g),
         |m AS (SELECT source, n_vecs,
         |    list_transform(ssum, x -> x / n_vecs) AS mean FROM f)
         |SELECT source, n_vecs,
         |  round(sqrt(${dotSql("mean", "mean")}), 4) AS coherence,
         |  round(mean[1], 6) AS c0
         |FROM m ORDER BY source ASC NULLS FIRST""".stripMargin
    val q109 =
      s"""WITH ${preppedCte(0)},
         |s0 AS (SELECT e.vec_id, e.ne, d.source
         |  FROM e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE e.ne IS NOT NULL),
         |g AS (SELECT source, count(*) AS nv,
         |    list(ne ORDER BY vec_id) AS vs FROM s0 GROUP BY source),
         |f AS (SELECT source, nv, list_reduce(vs,
         |    (a, b) -> list_transform(generate_series(1, $Dims), j -> a[j] + b[j]))
         |    AS ssum FROM g),
         |m AS (SELECT source,
         |    list_transform(ssum, x -> x / nv) AS mean FROM f),
         |sc AS (SELECT s0.source,
         |    ${dotSql("s0.ne", "m.mean")} / sqrt(${dotSql("m.mean", "m.mean")})
         |      AS cos
         |  FROM s0 JOIN m ON s0.source = m.source)
         |SELECT source, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN cos < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers,
         |  round(min(cos), 4) AS min_cos, round(max(cos), 4) AS max_cos
         |FROM sc GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin
    // streaming the queries must return the BATCH index's exact
    // answers — q111's oracle is q50's with the wave column added
    val q111 =
      s"""WITH ${preppedCte(0)},
         |${ivfCandCte("cand")},
         |cc AS (SELECT q_id, vec_id, ${dotSql("qe", "ne")} AS c FROM cand),
         |r AS (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY round(c, 6) DESC, vec_id) AS rn FROM cc)
         |SELECT CAST(q_id % 2 AS BIGINT) AS wave, q_id,
         |  CAST(rn AS INTEGER) AS rn, vec_id, round(c, 4) AS cos
         |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
    base + ("q57_ann_recall" -> q57) + ("q59_ann_candidates" -> q59) +
      ("q62_int8_recall" -> q62) + ("q64_ivf_int8_recall" -> q64) +
      ("q65_pq_recall" -> q65) + ("q69_ivfpq_recall" -> q69) +
      ("q73_stream_index_ingest" -> q73) + ("q79_semdedup" -> q79) +
      ("q87_domain_centroids" -> q87) +
      ("q109_embedding_outliers" -> q109) +
      ("q111_stream_ann_search" -> q111)
  }

  private def baseOracles: Map[String, String] = Map(
    "q38_cosine_topk" ->
      s"""WITH ${preppedCte(0)},
         |q AS (SELECT vec_id AS q_id, ne AS qe FROM e WHERE vec_id % $qModSql = 0),
         |p AS (SELECT q_id, vec_id, ${dotSql("qe", "ne")} AS c
         |  FROM q, e WHERE vec_id != q_id),
         |r AS (SELECT q_id, vec_id, c, row_number() OVER (
         |    PARTITION BY q_id ORDER BY round(c, 6) DESC, vec_id) AS rn FROM p)
         |SELECT q_id, CAST(rn AS INTEGER) AS rn, vec_id, round(c, 4) AS cos
         |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    "q39_ann_lsh" -> topKSql(lshCandCte("cand")),

    "q50_ann_ivf" -> topKSql(ivfCandCte("cand")),

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
