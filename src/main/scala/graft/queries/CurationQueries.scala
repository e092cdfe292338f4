package graft.queries

import graft.{QueryPack, Tables}
import graft.ext.{Dedup, Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation: the full funnel (q61), plus the two
  * assignment ops every corpus build runs downstream of it —
  * deterministic hash train/val/test split (q66) and per-domain quota
  * sampling (q67).
  *
  * The full training-data curation funnel as ONE composed pipeline —
  * the end-to-end shape a 100 TB corpus actually runs, built entirely
  * from the engine's own operators: language-ID filter → quality-score
  * filter → exact dedup (canonical = min doc_id per content hash) →
  * near-dup dedup (MinHash-LSH pairs → connected components → keep the
  * cluster representative). The query reports the funnel: documents
  * surviving each stage. Every stage is oracle-mirrored in DuckDB, so
  * the composition (not just the parts) is hash-verified.
  *
  * Scale posture: stages 1–2 are map-side scans; exact dedup shuffles
  * once on the content hash; near-dup reuses the guarded LSH layout
  * over the (much smaller) survivor set — the standard funnel ordering
  * precisely because each stage shrinks the input to the next. */
object CurationQueries extends QueryPack {

  // Quality gate in integer BASIS POINTS of the raw score
  // (floor(raw*10000) >= 5500, q92/q100's convention): gating on the
  // ROUNDED score compared a round(x,4) double, the half-boundary
  // rounding TextAnalysis documents as non-portable (~1 doc in 500
  // flips its 4th decimal between engines); the floored integer of the
  // bit-identical raw chain cannot flip.
  private val QualityMinBp = 5500L
  private val QualityLabel = s"quality_ge_${QualityMinBp / 10000.0}"
  private val SplitSeed = 13  // hash-family seed for the train/val/test split
  private val QuotaSeed = 17  // independent seed for quota sampling
  private val SampleSeed = 23 // independent seed for weighted sampling (q92)
  private val Quota = 20      // max docs kept per source domain

  /** Deterministic 80/10/10 split assignment (seeded hash mod 100 —
    * stable across partitionings, unlike seeded rand()); ONE definition
    * shared by q66 and q72 so the fractions/seed cannot drift apart. */
  private def splitCol: Column = {
    val h = Hashing.md5Long(SplitSeed, col("doc_id").cast("string")) % 100
    when(h < 80, "train").when(h < 90, "val").otherwise("test")
  }
  private val PackBudget = 256 // token budget per training sequence (q68)
  private val DeconN = 4       // decontamination n-gram length (q70)
  private val EvalMod = 97     // doc_id % EvalMod == 0 marks the held-out eval set

  /** The funnel's stage frames, shared by q61 (stage counts) and q72
    * (downstream corpus build over the survivors). Memoized per
    * (session, dir): building nearKeep runs the connected-components
    * driver loop (real jobs, not just a plan), so q61 and q72 must not
    * each pay it — the cluster-scale analogue is materializing the
    * survivor set once per snapshot. */
  // value = (every frame this entry CACHED, the five stage frames) —
  // the pair pipeline's internal shingle-hash frame is cached too
  // (ADVICE r5), so the eviction hook owns the full materialized lineage
  private val funnelCache = graft.runtime.FrameCache.of[
      (SparkSession, String),
      (Seq[DataFrame], (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame))](
    "curation-funnel", k => Some(k._1))(
    v => v._1.foreach(_.unpersist()))
  private def funnelFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    funnelCache.get((s, d))(buildFunnelFrames(s, d))._2

  private def buildFunnelFrames(s: SparkSession, d: String)
      : (Seq[DataFrame], (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)) = {
    // r22 (guide §2.3, VERDICT r21 #7): project to the three columns the
    // funnel actually reads BEFORE the round-robin exchange and the
    // cache — the old frame shipped and pinned lang/n_chars that no
    // consumer (q61 counts, q72 split/source/tokens) ever touches.
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("predicted", TextAnalysis.langId(col("text")))
      .withColumn("qbp",
        floor(TextAnalysis.qualityScoreRaw(col("text")) * 10000).cast("long"))
      .cache()
    val langKeep = docs.filter(col("predicted") === "en")
    val qualKeep = langKeep.filter(col("qbp") >= QualityMinBp)
    val exactKeep = qualKeep
      .withColumn("minid",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text").cast("binary")))))
      .filter(col("doc_id") === col("minid")).drop("minid")
    val (pairs, sh) = Dedup.minhashLshPairsWithLineage(exactKeep, "doc_id",
      "text", shingleN = 3, k = DedupQueries.K, bands = DedupQueries.Bands,
      threshold = 0.8)
    val labels = Dedup.connectedComponents(pairs.select(col("a_id"), col("b_id")))
      .withColumnRenamed("id", "doc_id")
    val nearKeep = exactKeep.join(labels, Seq("doc_id"), "left")
      .filter(col("comp").isNull || col("comp") === col("doc_id"))
    (Seq(docs, sh), (docs, langKeep, qualKeep, exactKeep, nearKeep))
  }

  /** Oracle CTE chain reproducing the funnel through `nk` (the near-dup
    * canonical survivor ids) — the SQL twin of [[funnelFrames]]. */
  private def funnelCtes: String = {
    val (scoreCols, caseExpr) = TextQueries.predictedSql
    s"""scored AS (SELECT doc_id, text,
       |    CAST(floor(${TextQueries.qualitySqlRaw} * 10000) AS BIGINT) AS qbp,
       |$scoreCols
       |  FROM documents),
       |base AS (SELECT doc_id, text, qbp, $caseExpr AS predicted FROM scored),
       |lk AS (SELECT * FROM base WHERE predicted = 'en'),
       |qk AS (SELECT * FROM lk WHERE qbp >= $QualityMinBp),
       |ek AS (SELECT doc_id, text FROM (
       |  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS mid
       |  FROM qk) t WHERE doc_id = mid),
       |${DedupQueries.minhashPairsCtes("ek")},
       |verts AS (SELECT a_id AS id FROM np UNION SELECT b_id FROM np),
       |und AS (SELECT a_id AS src, b_id AS dst FROM np
       |  UNION SELECT b_id, a_id FROM np),
       |reach(id, r) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
       |compx AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       |nk AS (SELECT e.doc_id FROM ek e LEFT JOIN compx c ON e.doc_id = c.id
       |  WHERE c.comp IS NULL OR c.comp = e.doc_id)""".stripMargin
  }

  /** Greedy first-fit packing fold over a doc-ordered `ds` array of
    * (doc_id, toks) structs: acc = [completed_packs, fill]. Shared by
    * q68 (whole corpus) and q72 (funnel survivors per split). */
  private def packFold: org.apache.spark.sql.Column = aggregate(
    transform(col("ds"), x => x.getField("toks")),
    array(lit(0L), lit(0L)),
    (acc, t) => when(
      element_at(acc, 2) + t > PackBudget && element_at(acc, 2) > 0,
      array(element_at(acc, 1) + 1, t.cast("long")))
      .otherwise(array(element_at(acc, 1), element_at(acc, 2) + t)))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_curation" -> ((s, d) => {
      val (docs, langKeep, qualKeep, exactKeep, nearKeep) = funnelFrames(s, d)
      val stages = Seq(
        (0, "raw", docs), (1, "lang_en", langKeep),
        (2, QualityLabel, qualKeep),
        (3, "exact_dedup", exactKeep), (4, "near_dup_canonical", nearKeep))
      stages.map { case (i, name, df) =>
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i).as("stage"), lit(name).as("name"), col("n_docs"))
      }.reduce(_ unionAll _).orderBy(col("stage"))
    }),

    // ---- Deterministic train/val/test split: a document's split is a
    //      pure function of its id (seeded 60-bit md5 mod 100 → 80/10/10)
    //      — stable under reruns, re-shards and text edits, and
    //      computable map-side at any scale; the only shuffle is the
    //      3-row partial aggregate. The standard alternative (rand()
    //      with a seed) is NOT stable across partitionings. ----
    "q66_data_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split", splitCol)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    }),

    // ---- Per-domain quota sampling: keep at most `Quota` docs per
    //      source, chosen by seeded-hash rank (deterministic "random"
    //      sample, doc_id tie-break) — the domain-mixing cap every
    //      curation pipeline applies before training. One shuffle
    //      (window per source); at 100 TB the parallelism unit is the
    //      domain, which is exactly how quota jobs are sharded in
    //      practice — a pathologically hot domain would be pre-thinned
    //      with an approximate hash threshold before the exact rank,
    //      at the cost of exactness this oracle-checked op keeps. ----
    "q67_domain_quota" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h", Hashing.md5Long(QuotaSeed, col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("source"))
        .agg(sum(when(col("rk") <= Quota, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rk") > Quota, 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("rk") <= Quota, col("n_chars")).otherwise(0L)).as("kept_chars"))
        .orderBy(col("source"))
    }),

    // ---- Token-budget sequence packing: greedy first-fit of docs
    //      (ordered by doc_id) into PackBudget-token training sequences,
    //      per source — the "how many context windows does this corpus
    //      fill" accounting every pretraining run needs. Greedy packing
    //      is inherently sequential, so the unit of parallelism is the
    //      packing shard (source here; (source, shard) when a domain
    //      outgrows one task — a pack never spans shards by design, so
    //      sharding changes the answer only at shard boundaries). The
    //      fold is integer-exact: acc = [completed_packs, fill]; a doc
    //      that would overflow a non-empty pack closes it; an oversized
    //      doc gets its own (overflowed) pack. ----
    "q68_token_packing" -> ((s, d) => {
      val packs = packFold
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("toks"))
        .groupBy(col("source"))
        .agg(array_sort(collect_list(struct(col("doc_id"), col("toks")))).as("ds"),
          count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (element_at(packs, 1) + 1).as("n_packs"))
        .orderBy(col("source"))
    }),

    // ---- Benchmark decontamination: flag training docs sharing any
    //      distinct DeconN-gram with the held-out eval set (the overlap
    //      scrub every pretraining corpus runs against its benchmark
    //      suites). The eval set's shingle hashes are tiny (benchmarks
    //      are MBs, not TBs) → BROADCAST left-semi join against the
    //      map-side-exploded training shingles; no corpus shuffle. The
    //      60-bit md5 shingle hash makes the probe set compact and the
    //      comparison engine-portable. ----
    "q70_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          Dedup.distinctShingles(col("text"), DeconN).as("sh"))
        .withColumn("hs", transform(col("sh"), x => Hashing.md5Long(x)))
      val evalSet = docs.filter(col("doc_id") % EvalMod === 0)
        .select(explode(col("hs")).as("h")).distinct()
      val train = docs.filter(col("doc_id") % EvalMod =!= 0)
      val contaminated = train
        .select(col("doc_id"), col("source"), explode(col("hs")).as("h"))
        .join(broadcast(evalSet), Seq("h"), "left_semi")
        .select(col("doc_id"), col("source")).distinct()
      train.groupBy(col("source")).agg(count(lit(1)).as("n_train"))
        .join(contaminated.groupBy(col("source"))
          .agg(count(lit(1)).as("n_contaminated")), Seq("source"), "left")
        .select(col("source"), col("n_train"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .orderBy(col("source"))
    }),

    // ---- The corpus build end-to-end: funnel survivors → deterministic
    //      train/val/test split → token-budget packing, reported per
    //      split. This is the composition a pretraining corpus actually
    //      ships through — curation (q61) feeding assignment (q66) and
    //      context-window accounting (q68) in ONE oracle-checked plan.
    //      Packing shards on (split, source) — parallelism unit = the
    //      domain within a split, packs never span shards — then the
    //      per-split report sums shard counts; every sum is integer. ----
    "q72_corpus_build" -> ((s, d) => {
      val (_, _, _, _, nearKeep) = funnelFrames(s, d)
      val packs = packFold
      nearKeep
        .withColumn("split", splitCol)
        .select(col("split"), col("source"), col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("toks"))
        .groupBy(col("split"), col("source"))
        .agg(array_sort(collect_list(struct(col("doc_id"), col("toks")))).as("ds"),
          count(lit(1)).as("nd"), sum(col("toks")).as("nt"))
        .select(col("split"), col("nd"), col("nt"),
          (element_at(packs, 1) + 1).as("np"))
        .groupBy(col("split"))
        .agg(sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"),
          sum(col("np")).as("n_packs"))
        .orderBy(col("split"))
    }),

    // ---- Quality-weighted deterministic sampling: keep each doc with
    //      probability ∝ its quality score, decided by HASH, not
    //      rand() — stable under reruns, re-shards, and task retries
    //      (the property seeded rand() loses the moment partitioning
    //      changes). thr = round(q·10⁴); keep ⇔ md5(seed|id) mod 10⁴
    //      < thr. Per-row map-side; one rollup shuffle. thr comes from
    //      the UNROUNDED score via floor — engines' round(x,4) half-up
    //      disagrees on half-boundary doubles (measured: 1 doc in 500),
    //      while the raw double and its floor are bit-identical. ----
    "q92_weighted_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("thr",
          floor(TextAnalysis.qualityScoreRaw(col("text")) * 10000).cast("long"))
        .withColumn("keep",
          Hashing.md5Long(SampleSeed, col("doc_id").cast("string")) % 10000
            < col("thr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("thr")).as("sum_thr"),
          sum(when(col("keep"), col("thr")).otherwise(0L)).as("sum_thr_kept"))
        .orderBy(col("source"))
    }),

    // ---- Data card: the one-row-per-source corpus summary a dataset
    //      release ships — volume, duplication, language mix, length
    //      and quality distribution. One scan + one aggregation; every
    //      fractional metric is a ratio of INTEGER aggregates (counts,
    //      basis-point quality floors, token sums) divided once, so the
    //      card hash-compares exactly where naive float means would
    //      drift with summation order. ----
    "q100_data_card" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          Dedup.contentKey(col("text")).as("ck"),
          (TextAnalysis.langId(col("text")) === "en").as("is_en"),
          TextAnalysis.wsTokenCount(col("text")).cast("long").as("toks"),
          floor(TextAnalysis.qualityScoreRaw(col("text")) * 10000)
            .cast("long").as("qbp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("ck")).as("n_distinct"),
          sum(when(col("is_en"), 1L).otherwise(0L)).as("n_en"),
          sum(col("toks")).as("sum_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("qbp")).as("sum_qbp"))
        .select(col("source"), col("n_docs"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 4)
            .as("dup_frac"),
          round(col("n_en").cast("double") / col("n_docs"), 4).as("en_frac"),
          round(col("sum_tokens").cast("double") / col("n_docs"), 2)
            .as("avg_tokens"),
          col("min_chars"), col("max_chars"),
          round(col("sum_qbp").cast("double") / col("n_docs") / 10000.0, 4)
            .as("avg_quality"))
        .orderBy(col("source"))
    }),

    // ---- Temperature-based mixture weights: the data-mixing step of
    //      pretraining (upsample small sources, damp large ones) —
    //      w_i ∝ n_i^τ over per-source token counts, allocated against
    //      a fixed token budget. τ = 0.5 deliberately: sqrt is
    //      CORRECTLY ROUNDED under IEEE-754 in every engine, so the
    //      weights hash bit-identically, while a general pow(x, τ) is
    //      at the mercy of each libm's last ulp (the q75 rational-idf
    //      principle applied to temperatures). The normalizer folds
    //      sqrt terms in SOURCE-NAME order (array_sort → left fold, ==
    //      DuckDB list ORDER BY + list_reduce) — float summation made
    //      order-deterministic the same way q68's packing fold is.
    //      Shape at scale: one token-count aggregation, one 20-row
    //      fold, map-side arithmetic — the allocation is floor()ed off
    //      identical doubles, so budgets reconcile exactly. ----
    "q108_mixture_weights" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tokens"))
      val norm = per.agg(aggregate(
        transform(
          array_sort(collect_list(struct(col("source"),
            sqrt(col("n_tokens")).as("sq")))),
          x => x.getField("sq")),
        lit(0.0), (acc, x) => acc + x).as("S"))
      per.crossJoin(norm)
        .withColumn("weight", round(sqrt(col("n_tokens")) / col("S"), 4))
        .withColumn("alloc_tokens",
          floor(lit(MixBudget) * sqrt(col("n_tokens")) / col("S"))
            .cast("long"))
        .select(col("source"), col("n_tokens"), col("weight"),
          col("alloc_tokens"))
        .orderBy(col("source"))
    })
  )

  private val MixBudget = 1000000.0 // tokens allocated across sources

  override def oracles: Map[String, String] = Map(
    "q61_curation" ->
      s"""WITH RECURSIVE $funnelCtes
         |SELECT 0 AS stage, 'raw' AS name, count(*) AS n_docs FROM documents
         |UNION ALL SELECT 1, 'lang_en', count(*) FROM lk
         |UNION ALL SELECT 2, '$QualityLabel', count(*) FROM qk
         |UNION ALL SELECT 3, 'exact_dedup', count(*) FROM ek
         |UNION ALL SELECT 4, 'near_dup_canonical', count(*) FROM nk
         |ORDER BY stage""".stripMargin,

    "q66_data_split" ->
      s"""WITH hx AS (SELECT n_chars,
         |    ${DedupQueries.h(s"'$SplitSeed|' || doc_id::VARCHAR")} % 100 AS hh
         |  FROM documents),
         |sx AS (SELECT CASE WHEN hh < 80 THEN 'train' WHEN hh < 90 THEN 'val'
         |    ELSE 'test' END AS split, n_chars FROM hx)
         |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM sx GROUP BY split ORDER BY split ASC NULLS FIRST""".stripMargin,

    "q67_domain_quota" ->
      s"""WITH hx AS (SELECT source, doc_id, n_chars,
         |    ${DedupQueries.h(s"'$QuotaSeed|' || doc_id::VARCHAR")} AS h
         |  FROM documents),
         |rk AS (SELECT source, n_chars, row_number() OVER (
         |    PARTITION BY source ORDER BY h, doc_id) AS rk FROM hx)
         |SELECT source,
         |  CAST(sum(CASE WHEN rk <= $Quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN rk > $Quota THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN rk <= $Quota THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM rk GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin,

    // list_reduce folds left with x1 as init, so the [0,0] accumulator
    // is PREPENDED and every token becomes a [0, t] pair (uniform
    // element type — DuckDB lambdas cannot mix list and scalar args).
    "q68_token_packing" ->
      s"""WITH tk AS (SELECT source, doc_id,
         |    len(string_split(text, ' ')) AS toks FROM documents),
         |g AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(toks) AS BIGINT) AS n_tokens,
         |    list_reduce(
         |      list_prepend([0::BIGINT, 0::BIGINT],
         |        list( [0::BIGINT, toks::BIGINT] ORDER BY doc_id)),
         |      (acc, x) -> CASE WHEN acc[2] + x[2] > $PackBudget AND acc[2] > 0
         |        THEN [acc[1] + 1, x[2]] ELSE [acc[1], acc[2] + x[2]] END) AS st
         |  FROM tk GROUP BY source)
         |SELECT source, n_docs, n_tokens, st[1] + 1 AS n_packs
         |FROM g ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q70_decontamination" ->
      s"""WITH dd AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT doc_id, source, unnest(list_distinct(
         |    CASE WHEN len(tk) >= $DeconN THEN list_transform(
         |      generate_series(1, len(tk) - ${DeconN - 1}),
         |      i -> array_to_string(tk[i:i+${DeconN - 1}], ' '))
         |    ELSE []::VARCHAR[] END)) AS s FROM dd),
         |hs AS (SELECT doc_id, source,
         |    ${DedupQueries.h("s")} AS h FROM sh),
         |ev AS (SELECT DISTINCT h FROM hs WHERE doc_id % $EvalMod = 0),
         |tr AS (SELECT source FROM documents WHERE doc_id % $EvalMod != 0),
         |ct AS (SELECT DISTINCT hs.doc_id, hs.source FROM hs JOIN ev USING (h)
         |  WHERE hs.doc_id % $EvalMod != 0),
         |tc AS (SELECT source, count(*) AS n_train FROM tr GROUP BY source),
         |cc AS (SELECT source, count(*) AS n_contaminated FROM ct GROUP BY source)
         |SELECT tc.source, CAST(tc.n_train AS BIGINT) AS n_train,
         |  CAST(coalesce(cc.n_contaminated, 0) AS BIGINT) AS n_contaminated
         |FROM tc LEFT JOIN cc ON tc.source = cc.source
         |ORDER BY tc.source ASC NULLS FIRST""".stripMargin,

    "q72_corpus_build" ->
      s"""WITH RECURSIVE $funnelCtes,
         |sv AS (SELECT d.doc_id, d.source, d.text
         |  FROM documents d JOIN nk ON d.doc_id = nk.doc_id),
         |tk AS (SELECT source, doc_id,
         |    len(string_split(text, ' '))::BIGINT AS toks,
         |    CASE WHEN hh < 80 THEN 'train' WHEN hh < 90 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (SELECT *,
         |    ${DedupQueries.h(s"'$SplitSeed|' || doc_id::VARCHAR")} % 100 AS hh
         |    FROM sv) t),
         |g AS (SELECT split, source, count(*) AS nd,
         |    CAST(sum(toks) AS BIGINT) AS nt,
         |    list_reduce(
         |      list_prepend([0::BIGINT, 0::BIGINT],
         |        list( [0::BIGINT, toks] ORDER BY doc_id)),
         |      (acc, x) -> CASE WHEN acc[2] + x[2] > $PackBudget AND acc[2] > 0
         |        THEN [acc[1] + 1, x[2]] ELSE [acc[1], acc[2] + x[2]] END) AS st
         |  FROM tk GROUP BY split, source)
         |SELECT split, CAST(sum(nd) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(st[1] + 1) AS BIGINT) AS n_packs
         |FROM g GROUP BY split ORDER BY split ASC NULLS FIRST""".stripMargin,

    "q92_weighted_sample" ->
      s"""WITH q AS (SELECT source, doc_id,
         |    CAST(floor(${TextQueries.qualitySqlRaw} * 10000) AS BIGINT) AS thr
         |  FROM documents),
         |k AS (SELECT source, thr,
         |    ${DedupQueries.h(s"'$SampleSeed|' || doc_id::VARCHAR")}
         |      % 10000 < thr AS keep
         |  FROM q)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(thr) AS BIGINT) AS sum_thr,
         |  CAST(sum(CASE WHEN keep THEN thr ELSE 0 END) AS BIGINT) AS sum_thr_kept
         |FROM k GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q100_data_card" -> {
      val (scoreCols, caseExpr) = TextQueries.predictedSql
      s"""WITH sc AS (SELECT source, n_chars, md5(text) AS ck,
         |    len(string_split(text, ' '))::BIGINT AS toks,
         |    CAST(floor(${TextQueries.qualitySqlRaw} * 10000) AS BIGINT) AS qbp,
         |$scoreCols
         |  FROM documents),
         |p AS (SELECT source, n_chars, ck, toks, qbp,
         |    ($caseExpr) = 'en' AS is_en FROM sc),
         |g AS (SELECT source, count(*) AS n_docs,
         |    count(DISTINCT ck) AS n_distinct,
         |    sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS n_en,
         |    sum(toks) AS sum_tokens,
         |    min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         |    sum(qbp) AS sum_qbp
         |  FROM p GROUP BY source)
         |SELECT source, n_docs,
         |  round(1.0 - n_distinct::DOUBLE / n_docs, 4) AS dup_frac,
         |  round(n_en::DOUBLE / n_docs, 4) AS en_frac,
         |  round(sum_tokens::DOUBLE / n_docs, 2) AS avg_tokens,
         |  min_chars, max_chars,
         |  round(sum_qbp::DOUBLE / n_docs / 10000.0, 4) AS avg_quality
         |FROM g ORDER BY source ASC NULLS FIRST""".stripMargin
    },

    "q108_mixture_weights" ->
      s"""WITH per AS (SELECT source,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |s AS (SELECT list_reduce(
         |    list(sqrt(n_tokens::DOUBLE) ORDER BY source),
         |    (a, b) -> a + b) AS S FROM per)
         |SELECT source, n_tokens,
         |  round(sqrt(n_tokens::DOUBLE) / s.S, 4) AS weight,
         |  CAST(floor($MixBudget * sqrt(n_tokens::DOUBLE) / s.S) AS BIGINT)
         |    AS alloc_tokens
         |FROM per, s ORDER BY source ASC NULLS FIRST""".stripMargin
  )
}
