package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star per
  * SURVEY.md §0): exact, bag-of-words canonical, MinHash+LSH, SimHash.
  *
  * Scale design:
  *  - Signatures (MinHash, SimHash, canonical keys) are pure per-row
  *    array expressions — computed map-side during the scan, no shuffle,
  *    no UDFs, whole-stage-codegen'd.
  *  - Candidate generation is an equi-join on LSH band hashes (or SimHash
  *    chunks) — the ONLY shuffle, keyed on band buckets which are
  *    uniformly distributed by construction (md5), so no skew.
  *  - Pairwise verification (exact Jaccard / Hamming) runs only on
  *    candidates, never all-pairs. This is the standard web-scale layout
  *    (Broder's shingling + banding; Charikar's SimHash chunks).
  *
  * All hashes via [[Hashing.md5Long]] → bit-for-bit reproducible in any
  * engine with md5 (DuckDB oracle recomputes everything).
  */
object Dedup {

  /** Exact-content key (md5 hex) for hash-groupBy dedup. */
  def contentKey(c: Column): Column = md5(c.cast("binary"))

  /** Order-insensitive canonical key: hash of the sorted token list.
    * Catches docs that are permutations of the same bag of words. */
  def bagOfWordsKey(c: Column): Column =
    Hashing.md5Long(concat_ws(" ", array_sort(TextAnalysis.tokens(c))))

  /** Distinct `n`-token shingle strings (empty array when < n tokens). */
  def distinctShingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: k independent permutations approximated by k
    * seeded hash families; element j = min over shingles of h_j. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(shingles, s => Hashing.md5Long(j, s)))): _*)

  /** LSH band hashes: signature split into `bands` rows-per-band groups,
    * each group hashed to one bucket key. Docs sharing any band bucket
    * become candidate pairs. */
  def lshBandHashes(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      Hashing.md5Long(concat_ws(",",
        transform(slice(sig, b * rows + 1, rows), v => v.cast("string"))))
    }: _*)
  }

  /** Exact Jaccard between two distinct-element array columns, computed
    * with an engine-portable formula (|A∩B| via membership filter;
    * |A∪B| = |A|+|B|-|A∩B|). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(filter(a, x => array_contains(b, x)))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** 32-bit SimHash over the token multiset: bit b is set iff tokens
    * whose hash has bit b outnumber those that don't (sign of the ±1
    * weight sum, expressed as 2·|set| − n > 0). */
  def simhash(text: Column, bits: Int = 32): Column = {
    val th = transform(TextAnalysis.tokens(text), t => Hashing.md5Long(t))
    (0 until bits).map { b =>
      val setCnt = size(filter(th, h => shiftright(h, b) % 2 === 1))
      when(setCnt * 2 - size(th) > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash chunk keys for candidate banding: `nChunks` groups of
    * `chunkBits` bits; docs agreeing on any chunk are candidates (a pair
    * within Hamming distance d < nChunks must share ≥1 chunk). */
  def simhashChunks(sh: Column, chunkBits: Int, nChunks: Int): Column =
    array((0 until nChunks).map(c =>
      shiftright(sh, c * chunkBits) % (1L << chunkBits)): _*)

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Full MinHash-LSH near-dup pair pipeline: shingle → signature → band
    * → bucket self-join → exact-Jaccard verify. Returns (a_id, b_id,
    * jacc) for pairs with Jaccard ≥ `threshold`. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      distinctShingles(col(textCol), shingleN).as("sh"))
    val sig = sh.filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))
    val bandRows = sig.select(col("id"),
      posexplode(lshBandHashes(col("sig"), k, bands)).as(Seq("band", "bh")))
    val cand = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val verified = cand
      .join(sh.select(col("id"), col("sh").as("sha")), col("a_id") === col("id")).drop("id")
      .join(sh.select(col("id"), col("sh").as("shb")), col("b_id") === col("id")).drop("id")
      .withColumn("jacc", jaccard(col("sha"), col("shb")))
      .filter(col("jacc") >= threshold)
    verified.select(col("a_id"), col("b_id"), round(col("jacc"), 4).as("jacc"))
  }
}
