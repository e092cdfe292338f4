package graft.queries

import graft.{QueryPack, Tables}
import graft.ext.{Dedup, Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star deduplication operators over `documents` (SURVEY.md §0):
  * exact/canonical, MinHash+LSH, SimHash, shingle-Jaccard with
  * fingerprint-based candidate generation. Every hash is md5-derived
  * (plus Carter–Wegman linear permutations for MinHash) so the DuckDB
  * oracle reproduces results bit-for-bit.
  *
  * Perf conventions (measured at sf0.1): intermediate hash ARRAYS are
  * materialized with withColumn before any lambda consumes them —
  * Catalyst inlines nested higher-order expressions into every
  * reference, which turns O(n) per-row work into O(n²) otherwise.
  */
object DedupQueries extends QueryPack {

  // private[queries]: the curation funnel (q61/q72) runs the SAME LSH
  // configuration and its oracle embeds minhashPairsCtes below — one
  // constant pair keeps a retune from silently desynchronizing them
  private[queries] val K = 16      // minhash signature length
  private[queries] val Bands = 4   // LSH bands (4 rows per band)
  // SimHash banding: 60-bit signature split into 4×15-bit chunks —
  // hamming ≤ 3 ⇒ the pair shares ≥1 chunk (pigeonhole), and the bucket
  // keyspace is 4·2^15 = 131,072, wide enough that per-bucket occupancy
  // stays selective as the corpus grows (8-bit chunks gave a 1,024-bucket
  // keyspace → O(n²/1024) candidate growth — a measured scale-killer at
  // sf0.1 already). 60 bits, not 64: token hashes are md5Long = 60-bit
  // (the portable-BIGINT ceiling), so signature bits 60–63 would be
  // identically zero — a nominal 64/16 split would leave the top chunk
  // with 12 bits of real entropy, 8× worse than four full 15-bit chunks.
  private val SimBits = 60
  private val ChunkBits = 15
  private val NChunks = 4
  // q77 segment width (tokens per pseudo-line; corpus has no newlines)
  private val SegW = 10

  /** Verified MinHash near-dup pairs over the full corpus, memoized AND
    * CACHED per (session, dir): four queries consume the same pair set
    * (q35 listing, q60 clustering, q97 provenance matrix, q98 size
    * histogram) — without this each re-ran the shingle→signature→
    * band→verify pipeline from the scan (~0.9 s each at sf0.1). The
    * cluster-scale analogue is materializing the pair table to storage
    * once per corpus snapshot and fanning analyses out from it. */
  // value = (cached pair frame, cached internal shingle-hash frame) —
  // the eviction hook must drop BOTH (ADVICE r5: unpersisting only the
  // pair frame left the lineage's materialized hash frame pinned)
  private val pairsCache = graft.runtime.FrameCache.of[
      (SparkSession, String), (DataFrame, DataFrame)](
    "dedup-pairs", k => Some(k._1))(
    v => { v._1.unpersist(); v._2.unpersist(); () })
  private def corpusPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.get((s, d)) {
      val (pairs, sh) = Dedup.minhashLshPairsWithLineage(
        Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, k = K, bands = Bands, threshold = 0.8)
      (pairs.cache(), sh)
    }._1

  /** Per-(session, dir) single-query scratch frames (q37's shingle-hash
    * frame, q76's) — registered so teardown eviction releases them: a
    * bare per-invocation `.cache()` pins the frame for the session's
    * lifetime with no owner (the r5-ADVICE leak class; CacheManager
    * plan-dedup keeps repeat invocations to ONE entry, but nothing
    * could ever drop it). */
  private val scratchCache = graft.runtime.FrameCache.of[
      (SparkSession, String, String), DataFrame](
    "dedup-scratch", k => Some(k._1))(v => { v.unpersist(); () })

  /** Corpus-wide connected-component labels over [[corpusPairs]],
    * memoized AND CACHED per (session, dir) — r21: q60 (cluster sizes)
    * and q98 (size histogram) each re-ran the identical CC driver loop
    * (real jobs per iteration, not just a plan) over the same cached
    * pair frame. The label table is exactly the "persisted label table
    * of the snapshot" the incremental path (q106) reads at cluster
    * scale — materialize it once per snapshot, fan analyses out from
    * it (the corpusPairs pattern one level up). */
  private val labelsCache = graft.runtime.FrameCache.frames("dedup-labels")
  private def corpusLabels(s: SparkSession, d: String): DataFrame =
    labelsCache.get((s, d))(
      Dedup.connectedComponents(
        corpusPairs(s, d).select(col("a_id"), col("b_id"))).cache())

  /** q106's delta-batch membership (the q105 ingest cohort) — hoisted
    * so the standing-label memo below and the query body cannot drift
    * apart on what "yesterday's corpus" means. */
  private def q106InDelta(c: Column): Column = c % 9 === 4

  /** q106's STANDING label table — connected components over the
    * non-delta edges, memoized AND CACHED per (session, dir). The
    * query's own contract (see q106) is that standing labels are
    * "recomputed here; at cluster scale, read from the snapshot's
    * label table" — this memo is that snapshot table's in-memory
    * analogue (exactly [[corpusLabels]] one cohort down), so repeat
    * invocations measure the incremental path instead of re-running
    * yesterday's batch CC driver loop every time. First build still
    * pays the full loop; the oracle still checks the final clustering
    * against the batch transitive closure over the FULL graph. */
  private val standingLabelsCache =
    graft.runtime.FrameCache.frames("dedup-standing-labels")
  /** Spec seam (PlanPostureSpec): the memo is plan-invisible behind the
    * CC localCheckpoint, so the spec asserts the artifact directly. */
  private[graft] def standingLabelsPeek(
      s: SparkSession, d: String): Option[DataFrame] =
    standingLabelsCache.peek((s, d))
  private def q106StandingLabels(s: SparkSession, d: String): DataFrame =
    standingLabelsCache.get((s, d))(
      Dedup.connectedComponents(
        corpusPairs(s, d).select(col("a_id"), col("b_id"))
          .filter(!q106InDelta(col("a_id")) && !q106InDelta(col("b_id"))))
        .cache())

  /** q80's STANDING corpus band index — the nightly-ingest shape
    * builds the corpus index once per snapshot and probes every delta
    * batch against it. A per-invocation `minhashLshPairsAcross` call
    * rebuilt (and, worse, left behind two unowned cached member
    * frames) on every run — the r5-ADVICE leak class, found again by
    * review. Shares [[StandingNearDup]] with q105's streaming gate, so
    * q80 also gets the artifact save/load restart seam. */
  private def q80CorpusIndex(s: SparkSession, d: String): Dedup.NearDupIndex =
    StandingNearDup.index(s, d, "q80-neardup",
        shingleN = 3, k = K, bands = Bands, threshold = 0.8) {
      Tables.documents(s, d).filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), col("text"))
    }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Exact + canonical (bag-of-words) dedup via hash groupBy ----
    "q34_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"),
          Dedup.contentKey(col("text")).as("ck"),
          Dedup.bagOfWordsKey(col("text")).as("bk"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("ck")).as("n_exact"),
          countDistinct(col("bk")).as("n_bow"))
        .orderBy(col("lang"))
    }),

    // ---- MinHash + LSH banding near-dup pairs, Jaccard-verified ----
    "q35_minhash_lsh" -> ((s, d) => {
      corpusPairs(s, d).orderBy(col("a_id"), col("b_id"))
    }),

    // ---- SimHash near-dup pairs via chunk banding + Hamming verify.
    //      The simhash rides through the bucket groupBy inside the id
    //      struct (an 8-byte payload), so the verify needs no rejoin
    //      and the signature lineage is computed exactly once. The
    //      (doc_id, sim) sketch frame is cached per (session, dir) —
    //      r21: it is the per-snapshot signature artifact (8 bytes/doc;
    //      q104's mediaDhashFrame is the same shape for media), and
    //      rebuilding it re-paid the full tokenize+md5 corpus pass on
    //      every invocation. Projected to (doc_id, text) before the
    //      round-robin exchange (guide §2.3). ----
    "q36_simhash" -> ((s, d) => {
      val docs = scratchCache.get((s, d, "q36-sim"))(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("th", Dedup.tokenHashes(col("text")))
          .select(col("doc_id"),
            Dedup.simhashFromHashes(col("th"), SimBits).as("sim"))
          .cache())
      val chunks = docs.select(
        struct(col("doc_id"), col("sim")).as("ds"),
        posexplode(Dedup.simhashChunks(col("sim"), ChunkBits, NChunks))
          .as(Seq("c", "ck")))
      Dedup.pairsFromBuckets(chunks, Seq("c", "ck"), "ds")
        .withColumn("ham", Dedup.hamming(col("a_id.sim"), col("b_id.sim")))
        .filter(col("ham") <= 3)
        .select(col("a_id.doc_id").as("a_id"), col("b_id.doc_id").as("b_id"),
          col("ham"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- Near-dup CLUSTERING: MinHash-LSH pairs → connected
    //      components → cluster sizes + canonical (min-id)
    //      representative. The component label is a deterministic
    //      fixpoint, so the DuckDB oracle reproduces it with a
    //      recursive transitive closure. This is the dedup endgame a
    //      curation pipeline runs: keep one doc per cluster. ----
    "q60_dedup_clusters" -> ((s, d) => {
      corpusLabels(s, d)
        .groupBy(col("comp").as("cluster"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("cluster"))
    }),

    // ---- Incremental cluster maintenance: the standing dedup-cluster
    //      table updated by a delta batch WITHOUT re-traversing the
    //      accumulated graph. The near-dup edge set splits on delta
    //      membership (doc_id % 9 = 4, the q105 ingest cohort): edges
    //      between standing docs collapse into yesterday's labels
    //      (read from the per-snapshot standing-label memo — at cluster
    //      scale, the snapshot's persisted label table), and only
    //      delta-touching edges propagate —
    //      standing labels enter as contraction edges, so iterations
    //      are bounded by the DELTA graph's diameter. The result is
    //      EXACT (star-replacement preserves connectivity; DedupSpec
    //      asserts equality with a cold run), which is why the oracle
    //      is the plain transitive closure over the full graph.
    //      n_new_docs shows which clusters the batch grew. ----
    "q106_incremental_cc" -> ((s, d) => {
      val pairs = corpusPairs(s, d).select(col("a_id"), col("b_id"))
      def inDelta(c: Column) = q106InDelta(c)
      val deltaEdges = pairs
        .filter(inDelta(col("a_id")) || inDelta(col("b_id")))
      // standing labels come from the per-snapshot memo (r21) — the
      // production shape this query documents: only delta-touching
      // edges are traversed per batch, yesterday's labels are READ
      val standing = q106StandingLabels(s, d)
      Dedup.connectedComponentsIncremental(standing, deltaEdges)
        .groupBy(col("comp").as("cluster"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(inDelta(col("id")), 1L).otherwise(0L)).as("n_new_docs"))
        .orderBy(col("cluster"))
    }),

    // ---- Shingle-Jaccard near-dups, candidates via shared winnowing
    //      fingerprints (equi-join — no all-pairs scan) ----
    "q37_ngram_jaccard" -> ((s, d) => {
      // cached: the shingle-hash frame feeds the distinct-hash branch and
      // the fingerprint branch — uncached, each re-runs the md5 scan.
      // Projected to (doc_id, h) on BOTH sides of the repartition
      // exchange (guide §2.3 project-before-exchange): a cache() pins
      // every column it is handed, so the old full-row frame froze
      // text/lang/source/n_chars into the InMemoryRelation and dragged
      // them through the round-robin shuffle — 5-column scan + 6-column
      // cache for a pipeline that only ever reads (doc_id, h).
      val hsh = scratchCache.get((s, d, "q37-hsh"))(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            TextAnalysis.shingleHashes(col("text"), 3).as("h"))
          .cache())
      // sorted once per doc (r22): the jaccard kernel re-sorted both
      // arrays per candidate pair — presorting turns ~434k pair-side
      // sorts into 15k doc-side ones (isolated noop-sink stage: the
      // jacc stage 2.35–2.53 → 1.26–1.50 s; jaccard is a set measure,
      // so the output is bit-identical)
      val sh = hsh.select(col("doc_id"),
        array_sort(array_distinct(col("h"))).as("hs"))
      val fps = hsh.select(col("doc_id"),
        explode(TextAnalysis.fingerprintsFromHashes(col("h"), 4)).as("fp"))
      val cand = Dedup.pairsFromBuckets(fps, Seq("fp"), "doc_id")
      cand
        .join(sh.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        // size-ratio prune: jacc = |A∩B|/|A∪B| ≤ min/max, so jacc ≥ 0.6
        // requires 10·min ≥ 6·max — an integer-exact guard (no boundary
        // pair can be lost) that removes ~35% of candidates (measured
        // sf0.1: 334k → 217k) before the intersect pays for them
        .filter(least(size(col("ha")), size(col("hb"))) * 10 >=
          greatest(size(col("ha")), size(col("hb"))) * 6)
        .withColumn("jacc", Dedup.jaccard(col("ha"), col("hb")))
        .filter(col("jacc") >= 0.6)
        .select(col("a_id"), col("b_id"), round(col("jacc"), 4).as("jacc"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- Signature-only vs verified dedup decisions — the measured
    //      justification for the exact-Jaccard verify stage. Over the
    //      LSH candidates, compare accepting on the signature estimate
    //      (matched components / K ≥ 0.8) against the exact hashed-
    //      shingle Jaccard ≥ 0.8: band-selected pairs are precisely the
    //      pairs whose estimate is biased HIGH (they collided because
    //      their signatures agree), so sig-only acceptance keeps ~98%
    //      of true near-dups but only ~51% precision (sf0.1) — the
    //      verify join doubles precision for one extra equi-join.
    //      Every quantity is a ratio of integers computed identically
    //      in both engines, so unlike the HLL/percentile sketches this
    //      evaluation hash-compares EXACTLY. ----
    "q76_minhash_decision" -> ((s, d) => {
      val par = s.sparkContext.defaultParallelism
      val sh = scratchCache.get((s, d, "q76-sh"))(
        Tables.documents(s, d).repartition(par)
          .withColumn("shs", Dedup.distinctShingles(col("text"), 3))
          // sorted for the same per-pair-sort reason as q37/
          // shingleHashFrame (r22); sig (min over elements) and jacc
          // (set measure) are order-independent
          .withColumn("hs", array_sort(array_distinct(
            transform(col("shs"), x => Hashing.md5Long(x)))))
          .select(col("doc_id").as("id"), col("hs"))
          .cache())
      val sig = sh.filter(size(col("hs")) > 0)
        .withColumn("bh", transform(col("hs"), x => x % Dedup.MinhashP))
        .select(col("id"), Dedup.minhashSignature(col("bh"), K).as("sig"))
      val bandRows = sig.select(col("id"),
        posexplode(Dedup.lshBandHashes(col("sig"), K, Bands)).as(Seq("band", "bh")))
      val cand = Dedup.pairsFromBuckets(bandRows, Seq("band", "bh"), "id")
      cand
        .join(sig.select(col("id").as("a_id"), col("sig").as("sa")), "a_id")
        .join(sig.select(col("id").as("b_id"), col("sig").as("sb")), "b_id")
        .join(sh.select(col("id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(sh.select(col("id").as("b_id"), col("hs").as("hb")), "b_id")
        .withColumn("m", size(filter(zip_with(col("sa"), col("sb"),
          (x, y) => x === y), b => b)))
        .withColumn("est", col("m").cast("double") / K)
        .withColumn("jacc", Dedup.jaccard(col("ha"), col("hb")))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("est") >= 0.8, 1L).otherwise(0L)).as("n_est_pos"),
          sum(when(col("jacc") >= 0.8, 1L).otherwise(0L)).as("n_true_pos"),
          sum(when(col("est") >= 0.8 && col("jacc") >= 0.8, 1L).otherwise(0L))
            .as("n_both"))
        .select(col("n_pairs"), col("n_est_pos"), col("n_true_pos"),
          col("n_both"),
          round(col("n_both").cast("double") / col("n_est_pos"), 4)
            .as("precision_sig"),
          round(col("n_both").cast("double") / col("n_true_pos"), 4)
            .as("recall_sig"))
    }),

    // ---- Dedup planner: the HLL pre-estimator a 100 TB run fires
    //      BEFORE paying the exact-dedup shuffle — approx_count_distinct
    //      of the content hash is one map-side sketch merge (no
    //      wide shuffle of the hashes themselves), and its duplicate-
    //      fraction estimate decides whether the exact stage pays for
    //      itself. Engines' HLL sketches differ, so (q18's pattern) the
    //      oracle checks the ESTIMATOR against a bound — each engine's
    //      estimate must land within 10% of exact — while the exact
    //      fraction and the go/no-go decision compare bit-for-bit. ----
    "q74_dedup_planner" -> ((s, d) => {
      val exd = col("exact_distinct").cast("double")
      Tables.documents(s, d)
        .select(col("source"), md5(col("text").cast("binary")).as("ck"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("ck")).as("exact_distinct"),
          approx_count_distinct(col("ck"), 0.02).as("est"))
        .select(col("source"), col("n_docs"), col("exact_distinct"),
          round(lit(1.0) - exd / col("n_docs"), 4).as("dup_frac"),
          (abs(col("est") - col("exact_distinct")).cast("double") / exd
            <= 0.10).as("est_within_10pct"),
          (lit(1.0) - exd / col("n_docs") > 0.05).as("dedup_pays"))
        .orderBy(col("source"))
    }),

    // ---- Segment-level exact dedup (CCNet-style duplicate-span
    //      removal): split each doc into fixed-width token segments,
    //      hash each segment, keep only the corpus-wide FIRST occurrence
    //      (min (doc_id, seg_idx)) of every distinct segment, reassemble
    //      the surviving text. The testdata corpus has no newlines, so
    //      the "line" unit is a deterministic 10-token window — the
    //      plumbing (explode → hash → global first-occurrence → rebuild)
    //      is exactly the at-scale shape: per-row segmentation map-side,
    //      ONE shuffle on the uniform 60-bit segment hash (map-side
    //      partial min compresses duplicate groups), one hash join back,
    //      one per-doc regroup. No windows over the full corpus, no
    //      driver collection. ----
    "q77_segment_dedup" -> ((s, d) => {
      val segArr = expr(
        s"""transform(sequence(0, (size(words) + ${SegW - 1}) div $SegW - 1),
           |  j -> array_join(slice(words, j * $SegW + 1, $SegW), ' '))""".stripMargin)
      val segs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), col("source"),
          posexplode(segArr).as(Seq("seg_idx", "seg")))
        .withColumn("hs", Hashing.md5Long(col("seg")))
      val firsts = segs.groupBy(col("hs"))
        .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first_occ"))
      val perDoc = segs.join(firsts, Seq("hs"))
        .withColumn("keep",
          struct(col("doc_id"), col("seg_idx")) === col("first_occ"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("segs_kept"),
          (sum(length(col("seg"))) + count(lit(1)) - 1).as("chars_in"),
          length(array_join(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg")), " ")).cast("long").as("chars_kept"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_segs")).as("n_segs"),
          sum(col("segs_kept")).as("segs_kept"),
          sum(col("chars_in")).as("chars_in"),
          sum(col("chars_kept")).as("chars_kept"),
          sum(when(col("segs_kept") === col("n_segs"), 1L).otherwise(0L))
            .as("docs_intact"))
        .orderBy(col("source"))
    }),

    // ---- Cross-source duplication matrix: verified near-dup pairs
    //      rolled up by (source, source) — which domains copy which,
    //      the provenance signal that decides scrape-dedup priorities.
    //      Pure reuse: the q35 pair machinery + two dimension joins. ----
    "q97_cross_source_dups" -> ((s, d) => {
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      corpusPairs(s, d)
        .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
        .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
        .select(least(col("sa"), col("sb")).as("s1"),
          greatest(col("sa"), col("sb")).as("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("s1"), col("s2"))
    }),

    // ---- Dedup cluster-size histogram: how much of the near-dup mass
    //      sits in big cliques vs pairs — the number that picks between
    //      keep-one-per-cluster and more aggressive collapse. ----
    "q98_cluster_sizes" -> ((s, d) => {
      corpusLabels(s, d)
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("sz"))
    }),

    // ---- Incremental dedup: admit a delta batch against the standing
    //      corpus — the nightly-ingest path. Stage 1: exact content-key
    //      anti join (delta hash vs corpus hash set). Stage 2: MinHash-
    //      LSH near-dup of the exact survivors AGAINST THE CORPUS ONLY
    //      (Dedup.minhashLshPairsAcross — delta band rows probe the
    //      corpus band index; within-corpus pairs are never computed,
    //      so per-batch cost is O(|delta|) signatures + a bucket
    //      equi-join, not a corpus re-dedup). Delta = doc_id % 7 = 3 (coprime with the
    //      20-source assignment, so every source contributes delta docs),
    //      so the oracle rebuilds both sides. ----
    "q80_incremental_dedup" -> ((s, d) => {
      val isDelta = col("doc_id") % 7 === 3
      val docs = Tables.documents(s, d)
      val delta = docs.filter(isDelta)
        .select(col("doc_id"), col("source"), col("text"),
          Dedup.contentKey(col("text")).as("ck"))
      val corpus = docs.filter(!isDelta)
      val corpusKeys = corpus
        .select(Dedup.contentKey(col("text")).as("ck")).distinct()
      val exactSurv = delta.join(corpusKeys, Seq("ck"), "left_anti")
      val nearIds = q80CorpusIndex(s, d)
        .probe(exactSurv, "doc_id", "text", shingleN = 3)
        .select(col("d_id").as("doc_id")).distinct()
        .withColumn("nd", lit(1L))
      delta.select(col("doc_id"), col("source"))
        .join(exactSurv.select(col("doc_id"), lit(1L).as("es")),
          Seq("doc_id"), "left")
        .join(nearIds, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_delta"),
          sum(when(col("es").isNull, 1L).otherwise(0L)).as("n_exact_dup"),
          sum(when(col("es").isNotNull && col("nd").isNotNull, 1L)
            .otherwise(0L)).as("n_near_dup"),
          sum(when(col("es").isNotNull && col("nd").isNull, 1L)
            .otherwise(0L)).as("n_admitted"))
        .orderBy(col("source"))
    })
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB fragment: engine-portable 60-bit md5 hash of a SQL expr
    * (private[queries] — the ONE definition every oracle interpolates,
    * so a hash-shape change cannot miss a hand-inlined copy). */
  private[queries] def h(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Shared CTE: doc_id + distinct 3-token shingles over `src`. */
  private def ShinglesCte(src: String = "documents", sfx: String = ""): String =
    s"""d$sfx AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $src),
       |sh$sfx AS (SELECT doc_id, list_distinct(
       |  CASE WHEN len(tk) >= 3 THEN list_transform(generate_series(1, len(tk) - 2),
       |    i -> array_to_string(tk[i:i+2], ' '))
       |  ELSE [] END) AS sh FROM d$sfx)""".stripMargin

  /** Jaccard over the distinct 60-bit hash arrays (matches the Spark
    * side, which verifies on hashes — see Dedup.minhashLshPairs). */
  private val JaccSql =
    """len(list_intersect(sa.hs, sb.hs))::DOUBLE
      | / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))""".stripMargin

  /** CTE deriving distinct shingle-hash arrays from the shingle CTE. */
  private def hsCte(sfx: String = ""): String =
    s"hsx$sfx AS (SELECT doc_id, list_distinct(list_transform(sh, s -> ${h("s")})) AS hs FROM sh$sfx)"

  /** CTE chain `src` shingle hashes → MinHash signatures → LSH band
    * rows (`bands<sfx>`: doc_id, b, bh) — one side of a pairing. */
  private def bandsCtes(sfx: String): String = {
    val p = Dedup.MinhashP
    val sigExprs = (0 until K).map(j =>
      s"list_min(list_transform(bh, b -> (${Dedup.minhashA(j)} * b + ${Dedup.minhashB(j)}) % $p))")
      .mkString(",\n    ")
    val bandVals = (0 until Bands).map(b => s"($b)").mkString(", ")
    s"""bhx$sfx AS (SELECT doc_id, hs, list_transform(hs, x -> x % $p) AS bh
       |  FROM hsx$sfx WHERE len(hs) > 0),
       |sig$sfx AS (SELECT doc_id, [
       |    $sigExprs] AS sig
       |  FROM bhx$sfx),
       |bands$sfx AS (SELECT doc_id, bb.b,
       |    ${h(s"array_to_string(list_transform(sig[bb.b*${K / Bands}+1:bb.b*${K / Bands}+${K / Bands}], v -> v::VARCHAR), ',')")} AS bh
       |  FROM sig$sfx, (VALUES $bandVals) AS bb(b))""".stripMargin
  }

  /** Shared CTE chain: `src` → shingles → MinHash signatures → LSH
    * bands → guarded candidates → Jaccard-verified pairs, ending in
    * `np` (a_id, b_id, jacc ≥ 0.8). Used by q35 (pair listing), q60
    * (clustering over the same pairs), and q61 (curation funnel over
    * the post-filter survivor set). */
  private[queries] def minhashPairsCtes(src: String = "documents"): String = {
    s"""${ShinglesCte(src)},
       |${hsCte()},
       |${bandsCtes("")},
       |bc AS (SELECT b, bh FROM bands GROUP BY b, bh
       |  HAVING count(*) BETWEEN 2 AND ${Dedup.DefaultMaxBucket}),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bc JOIN bands a ON a.b = bc.b AND a.bh = bc.bh
       |    JOIN bands b ON b.b = bc.b AND b.bh = bc.bh
       |    AND a.doc_id < b.doc_id),
       |j AS (SELECT a_id, b_id, $JaccSql AS jacc
       |  FROM cand JOIN hsx sa ON a_id = sa.doc_id JOIN hsx sb ON b_id = sb.doc_id),
       |np AS (SELECT a_id, b_id, jacc FROM j WHERE jacc >= 0.8)""".stripMargin
  }

  /** CTE chain for the INCREMENTAL pairing (q80): delta survivors `esv`
    * probe the corpus's band index; guard on CORPUS bucket occupancy
    * only (mirrors [[Dedup.minhashLshPairsAcross]]). Ends in `ndx`
    * (d_id of delta docs with a verified corpus near-dup). */
  private[queries] def crossMinhashCtes: String =
    s"""${ShinglesCte("esv", "n")},
       |${hsCte("n")},
       |${bandsCtes("n")},
       |${ShinglesCte("corpus", "c")},
       |${hsCte("c")},
       |${bandsCtes("c")},
       |bcg AS (SELECT b, bh FROM bandsc GROUP BY b, bh
       |  HAVING count(*) <= ${Dedup.DefaultMaxBucket}),
       |candx AS (SELECT DISTINCT a.doc_id AS d_id, b.doc_id AS c_id
       |  FROM bandsn a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh
       |    JOIN bcg g ON b.b = g.b AND b.bh = g.bh),
       |jx AS (SELECT d_id, c_id, $JaccSql AS jacc
       |  FROM candx JOIN hsxn sa ON d_id = sa.doc_id
       |    JOIN hsxc sb ON c_id = sb.doc_id),
       |ndx AS (SELECT DISTINCT d_id FROM jx WHERE jacc >= 0.8)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q34_exact_dedup" ->
      s"""SELECT lang, count(*) AS n,
         |  count(DISTINCT md5(text)) AS n_exact,
         |  count(DISTINCT ${h("array_to_string(list_sort(string_split(text, ' ')), ' ')")}) AS n_bow
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q35_minhash_lsh" ->
      s"""WITH ${minhashPairsCtes()}
         |SELECT a_id, b_id, round(jacc, 4) AS jacc FROM np
         |ORDER BY a_id, b_id""".stripMargin,

    "q60_dedup_clusters" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         |verts AS (SELECT a_id AS id FROM np UNION SELECT b_id FROM np),
         |und AS (SELECT a_id AS src, b_id AS dst FROM np
         |  UNION SELECT b_id, a_id FROM np),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
         |compx AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
         |SELECT comp AS cluster, count(*) AS n_docs FROM compx
         |GROUP BY comp ORDER BY cluster""".stripMargin,

    // the incremental engine path must equal the batch transitive
    // closure over the full graph — the oracle IS that batch run
    "q106_incremental_cc" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         |verts AS (SELECT a_id AS id FROM np UNION SELECT b_id FROM np),
         |und AS (SELECT a_id AS src, b_id AS dst FROM np
         |  UNION SELECT b_id, a_id FROM np),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
         |compx AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
         |SELECT comp AS cluster, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN id % 9 = 4 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new_docs
         |FROM compx GROUP BY comp ORDER BY cluster""".stripMargin,

    "q36_simhash" -> {
      val bitExprs = (0 until SimBits).map(b =>
        s"(CASE WHEN len(list_filter(h, x -> (x >> $b) % 2 = 1)) * 2 - len(h) > 0 THEN (1::BIGINT << $b) ELSE 0 END)")
        .mkString("\n    + ")
      val chunkVals = (0 until NChunks).map(c => s"($c)").mkString(", ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |th AS (SELECT doc_id, list_transform(tk, t -> ${h("t")}) AS h FROM d),
         |sim AS (SELECT doc_id, $bitExprs AS sim FROM th),
         |chunks AS (SELECT doc_id, sim, cc.c, (sim >> (cc.c * $ChunkBits)) & ${(1 << ChunkBits) - 1} AS ck
         |  FROM sim, (VALUES $chunkVals) AS cc(c)),
         |bc AS (SELECT c, ck FROM chunks GROUP BY c, ck
         |  HAVING count(*) BETWEEN 2 AND ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS ham
         |  FROM bc JOIN chunks a ON a.c = bc.c AND a.ck = bc.ck
         |    JOIN chunks b ON b.c = bc.c AND b.ck = bc.ck
         |    AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, ham FROM cand WHERE ham <= 3
         |ORDER BY a_id, b_id""".stripMargin
    },

    "q37_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |hraw AS (SELECT doc_id,
         |  CASE WHEN len(tk) >= 3 THEN list_transform(generate_series(1, len(tk) - 2),
         |    i -> ${h("array_to_string(tk[i:i+2], ' ')")})
         |  ELSE [] END AS h FROM d),
         |hsx AS (SELECT doc_id, list_distinct(h) AS hs FROM hraw),
         |w AS (SELECT doc_id, list_distinct(
         |  CASE WHEN len(h) >= 4 THEN list_transform(generate_series(1, len(h) - 3),
         |         i -> list_min(h[i:i+3]))
         |       WHEN len(h) > 0 THEN [list_min(h)]
         |       ELSE [] END) AS fps FROM hraw),
         |e AS (SELECT doc_id, unnest(fps) AS fp FROM w),
         |bc AS (SELECT fp FROM e GROUP BY fp
         |  HAVING count(*) BETWEEN 2 AND ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bc JOIN e a ON a.fp = bc.fp JOIN e b ON b.fp = bc.fp
         |    AND a.doc_id < b.doc_id),
         |j AS (SELECT a_id, b_id, $JaccSql AS jacc
         |  FROM cand JOIN hsx sa ON a_id = sa.doc_id JOIN hsx sb ON b_id = sb.doc_id)
         |SELECT a_id, b_id, round(jacc, 4) AS jacc FROM j
         |WHERE jacc >= 0.6 ORDER BY a_id, b_id""".stripMargin,

    "q76_minhash_decision" ->
      s"""WITH ${minhashPairsCtes()},
         |mx AS (SELECT c.a_id, c.b_id,
         |    len(list_filter(generate_series(1, $K),
         |      i -> sa.sig[i] = sb.sig[i])) AS m, jj.jacc
         |  FROM cand c JOIN sig sa ON c.a_id = sa.doc_id
         |    JOIN sig sb ON c.b_id = sb.doc_id
         |    JOIN j jj ON c.a_id = jj.a_id AND c.b_id = jj.b_id),
         |x AS (SELECT m, jacc, m::DOUBLE / $K AS est FROM mx)
         |SELECT count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN est >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_est_pos,
         |  CAST(sum(CASE WHEN jacc >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pos,
         |  CAST(sum(CASE WHEN est >= 0.8 AND jacc >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |  round(sum(CASE WHEN est >= 0.8 AND jacc >= 0.8 THEN 1 ELSE 0 END)::DOUBLE
         |    / sum(CASE WHEN est >= 0.8 THEN 1 ELSE 0 END), 4) AS precision_sig,
         |  round(sum(CASE WHEN est >= 0.8 AND jacc >= 0.8 THEN 1 ELSE 0 END)::DOUBLE
         |    / sum(CASE WHEN jacc >= 0.8 THEN 1 ELSE 0 END), 4) AS recall_sig
         |FROM x""".stripMargin,

    "q74_dedup_planner" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS exact_distinct,
        |  round(1.0 - count(DISTINCT md5(text))::DOUBLE / count(*), 4) AS dup_frac,
        |  abs(approx_count_distinct(md5(text)) - count(DISTINCT md5(text)))::DOUBLE
        |    / count(DISTINCT md5(text)) <= 0.10 AS est_within_10pct,
        |  (1.0 - count(DISTINCT md5(text))::DOUBLE / count(*)) > 0.05 AS dedup_pays
        |FROM documents GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q77_segment_dedup" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words
         |  FROM documents),
         |sj AS (SELECT doc_id, source, words,
         |    unnest(range((len(words) + ${SegW - 1}) // $SegW)) AS j FROM w),
         |seg AS (SELECT doc_id, source, j AS seg_idx,
         |    array_to_string(words[(j * $SegW + 1):(j * $SegW + $SegW)], ' ') AS seg
         |  FROM sj),
         |k AS (SELECT doc_id, source, seg_idx, seg,
         |    row_number() OVER (PARTITION BY ${h("seg")}
         |      ORDER BY doc_id, seg_idx) AS rn FROM seg),
         |per_doc AS (SELECT doc_id, source,
         |    count(*) AS n_segs,
         |    sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS segs_kept,
         |    sum(len(seg)) + count(*) - 1 AS chars_in,
         |    coalesce(len(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
         |      ORDER BY seg_idx)), 0) AS chars_kept
         |  FROM k GROUP BY doc_id, source)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_segs) AS BIGINT) AS n_segs,
         |  CAST(sum(segs_kept) AS BIGINT) AS segs_kept,
         |  CAST(sum(chars_in) AS BIGINT) AS chars_in,
         |  CAST(sum(chars_kept) AS BIGINT) AS chars_kept,
         |  CAST(sum(CASE WHEN segs_kept = n_segs THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_intact
         |FROM per_doc GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q97_cross_source_dups" ->
      s"""WITH ${minhashPairsCtes()}
         |SELECT least(da.source, db.source) AS s1,
         |  greatest(da.source, db.source) AS s2,
         |  count(*) AS n_pairs
         |FROM np JOIN documents da ON np.a_id = da.doc_id
         |  JOIN documents db ON np.b_id = db.doc_id
         |GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin,

    "q98_cluster_sizes" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         |verts AS (SELECT a_id AS id FROM np UNION SELECT b_id FROM np),
         |und AS (SELECT a_id AS src, b_id AS dst FROM np
         |  UNION SELECT b_id, a_id FROM np),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.src, reach.r FROM und u JOIN reach ON u.dst = reach.id),
         |compx AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |cz AS (SELECT comp, count(*) AS sz FROM compx GROUP BY comp)
         |SELECT sz, count(*) AS n_clusters FROM cz
         |GROUP BY sz ORDER BY sz""".stripMargin,

    "q80_incremental_dedup" ->
      s"""WITH delta AS (SELECT doc_id, source, text FROM documents
         |  WHERE doc_id % 7 = 3),
         |corpus AS (SELECT doc_id, source, text FROM documents
         |  WHERE doc_id % 7 != 3),
         |esv AS (SELECT d.* FROM delta d
         |  WHERE md5(d.text) NOT IN (SELECT md5(text) FROM corpus)),
         |$crossMinhashCtes
         |SELECT dl.source, count(*) AS n_delta,
         |  CAST(sum(CASE WHEN e.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_exact_dup,
         |  CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND n.d_id IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
         |  CAST(sum(CASE WHEN e.doc_id IS NOT NULL AND n.d_id IS NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
         |FROM delta dl LEFT JOIN esv e ON dl.doc_id = e.doc_id
         |  LEFT JOIN ndx n ON dl.doc_id = n.d_id
         |GROUP BY dl.source ORDER BY dl.source ASC NULLS FIRST""".stripMargin
  )
}
