package graft

import graft.ext.Skew
import org.apache.spark.sql.functions._

/** Skew measurement harness: a synthetic hot key (~90% of lineitem rows
  * on one key, the rest spread over 999) driving the engine's two skew
  * tools — [[Skew.saltedSumCount]] for aggregations and AQE skew-join
  * splitting for joins — against their unmitigated baselines. Prints
  * one JSON line; BASELINE.md records the numbers AND the conclusions
  * (salting is NOT needed where map-side partial aggregation already
  * compresses the hot key; it pays where partials can't compress —
  * distinct-style aggregates — and AQE covers join skew).
  */
object SkewBench {

  private def timed(f: => Long): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best2(f: => Long): Double = math.min(timed(f), timed(f))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    // 90% of rows share key 0; the rest spread over 999 keys. Inflated
    // 20× (12M rows at sf0.1, ~10.8M on the hot key) so the hot task is
    // long enough to dominate — at sf0.1's raw 600k rows every strategy
    // finishes sub-second and the comparison measures noise.
    // Cold keys are % 999 + 1 (range 1..999, disjoint from hot key 0):
    // the earlier % 1000 of the already-%10-filtered orderkeys could
    // only produce multiples of 10 — ~99 distinct cold keys, with the
    // 0 residue silently folding into the hot key — so the measured
    // distribution was 10× coarser than the one documented here.
    val skewed = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").as("v"))
      .withColumn("rep", explode(typedLit((1 to 20).toArray)))
      .withColumn("k",
        when(col("l_orderkey") % 10 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 999 + 1))
      .withColumn("l_partkey", col("l_partkey") * 100 + col("rep"))
      // MEASURED prerequisite for AQE skew splitting: the splitter
      // slices a hot reduce partition by MAPPER ranges, so a 3-mapper
      // single-file scan gives it nothing to slice (skew=false, no
      // speedup). The engine's repartition-small-scans convention is
      // what unlocks it.
      .repartition(cpus)
    skewed.cache()
    val n = skewed.count()

    // Aggregation: sum/count partials compress the hot key map-side, so
    // plain should match or beat salted — measured, not assumed.
    val plainSum = best2(
      skewed.groupBy("k").agg(sum("v"), count(lit(1))).count())
    val saltedSum = best2(
      Skew.saltedSumCount(skewed, "k", "v", "l_partkey").count())

    // Distinct-style aggregation: no map-side compression of the hot
    // key — the two-phase (k, value) pre-aggregate is the skew fix.
    val plainDistinct = best2(
      skewed.groupBy("k").agg(countDistinct("l_partkey")).count())
    val twoPhaseDistinct = best2(
      skewed.groupBy("k", "l_partkey").agg(count(lit(1)))
        .groupBy("k").agg(count(lit(1))).count())

    // Join skew: force sort-merge (hot key 0 lands in one task) and
    // measure AQE skew splitting against the unmitigated plan.
    val dim = spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 7 % 100).as("w"))
    def joinCount(): Long = skewed.join(dim, "k")
      .select(count(col("w") + col("v"))).collect().head.getLong(0)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // scale AQE's skew thresholds to this dataset: the defaults trigger
    // at 256 MB partitions (real-cluster sizes); the local hot
    // partition's compressed shuffle bytes are far smaller, so without
    // this the splitter never engages and the bench measures nothing
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      (8L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (4L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val smjNoAqe = best2(joinCount())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val smjAqe = best2(joinCount())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

    def f(x: Double) = f"$x%.3f"
    println(s"""{"metric":"skew_bench","rows":$n,""" +
      s""""plain_sum":${f(plainSum)},"salted_sum":${f(saltedSum)},""" +
      s""""plain_distinct":${f(plainDistinct)},"twophase_distinct":${f(twoPhaseDistinct)},""" +
      s""""smj_no_aqe":${f(smjNoAqe)},"smj_aqe":${f(smjAqe)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
