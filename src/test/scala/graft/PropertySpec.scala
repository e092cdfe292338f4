package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.sources.XmlMeas
import graft.transforms.Cleanse
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property-based invariants (SURVEY.md §5 test plan #2): cleanse
  * idempotence, flatten row-count/name-totality invariants, dedup
  * signature invariants. Uses raw ScalaCheck (the scalatest bridge
  * isn't in the offline dependency cache). */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  private def holds(n: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf("the", "a", "nil", "NIL", "data", "kpi", "x9")
  private val text = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))

  test("cleanse nil-normalization is idempotent: clean(clean(x)) == clean(x)") {
    holds(10)(Prop.forAll(
      Gen.listOfN(20, Gen.oneOf(" NIL ", "nil", "5.5", "", "ok", "NiL"))) {
      vals =>
        val df = vals.toDF("v")
        val once = Cleanse.nilNormalizedToZero("v")(df)
          .collect().map(_.getString(0)).toSeq
        val twice = Cleanse.nilNormalizedToZero("v")(
          Cleanse.nilNormalizedToZero("v")(df))
          .collect().map(_.getString(0)).toSeq
        once == twice
    })
  }

  test("flatten invariants: |rows| = Σ|r|; every kpiName resolved or UNKNOWN_") {
    holds(8)(Prop.forAll(Gen.chooseNum(0, 4), Gen.chooseNum(0, 4)) {
      (nTypes, nRs) =>
        val types = (1 to nTypes)
          .map(p => s"""<measType p="$p">N$p</measType>""").mkString
        val rs = (1 to nRs)
          .map(p => s"""<r p="$p">$p.5</r>""").mkString
        val xml =
          s"""<measCollecFile><fileHeader><measCollec beginTime="t"/></fileHeader>
             |<measData><measInfo measInfoId="M">$types
             |<measValue measObjLdn="a=b">$rs</measValue>
             |</measInfo></measData></measCollecFile>""".stripMargin
        val rows = XmlMeas.flatten(Seq((1, xml)).toDF("fid", "xml"), "xml", "fid")
          .collect()
        rows.length == nRs && rows.forall { r =>
          val name = r.getAs[String]("kpiName")
          val p = r.getAs[String]("kpiId").toInt
          if (p <= nTypes) name == s"N$p" else name == s"UNKNOWN_$p"
        }
    })
  }

  test("NIL never survives the sentinel cast; numeric strings round-trip") {
    holds(10)(Prop.forAll(
      Gen.listOfN(20, Gen.oneOf("NIL", "1", "2.25", "-3.5"))) { vals =>
      val out = Cleanse.sentinelToZeroCast("v")(vals.toDF("v"))
        .collect().map(_.getDouble(0)).toSeq
      out == vals.map(v => if (v == "NIL") 0.0 else v.toDouble)
    })
  }

  test("minhash signature: length and range invariants") {
    holds(12)(Prop.forAll(text) { t =>
      val toks = t.trim.split(" ").count(_.nonEmpty)
      toks < 3 || {
        val sig = Seq(t).toDF("text")
          .withColumn("sh", Dedup.distinctShingles(col("text"), 3))
          .withColumn("bh", Dedup.baseHashes(col("sh")))
          .select(Dedup.minhashSignature(col("bh"), 8).as("sig"))
          .head.getSeq[Long](0)
        sig.length == 8 && sig.forall(v => v >= 0 && v < Dedup.MinhashP)
      }
    })
  }

  test("fingerprints are a deduplicated subset of shingle hashes") {
    holds(12)(Prop.forAll(text) { t =>
      val r = Seq(t).toDF("text")
        .withColumn("h", TextAnalysis.shingleHashes(col("text"), 3))
        .select(col("h"), TextAnalysis.fingerprintsFromHashes(col("h"), 4).as("fp"))
        .head
      val h = r.getSeq[Long](0).toSet
      val fp = r.getSeq[Long](1)
      fp.toSet.subsetOf(h) && fp.distinct.length == fp.length
    })
  }

  test("sizeRatioGuard is sound: no pair with jaccard >= t is ever pruned") {
    // random distinct-element sets with forced overlap so high-jaccard
    // pairs actually occur, driven through the REAL guard Column
    val setGen = for {
      base <- Gen.chooseNum(1, 40)
      extra <- Gen.chooseNum(0, 25)
    } yield ((1 to base) ++ (100 to 100 + extra)).map(_.toLong)
    for (t <- Seq(0.6, 0.8)) {
      holds(40)(Prop.forAll(setGen, setGen) { (a, b) =>
        val row = Seq((a, b)).toDF("ha", "hb")
          .select(Dedup.jaccard(col("ha"), col("hb")).as("j"),
            Dedup.sizeRatioGuard(col("ha"), col("hb"), t).as("g"))
          .head
        // soundness: guard may only prune pairs that CANNOT reach t
        !(row.getDouble(0) >= t) || row.getBoolean(1)
      })
    }
    // and it does real work: a 10-vs-100 size mismatch is pruned
    val pruned = Seq(((1L to 10L).toSeq, (1L to 100L).toSeq)).toDF("ha", "hb")
      .select(Dedup.sizeRatioGuard(col("ha"), col("hb"), 0.6)).head.getBoolean(0)
    assert(!pruned)
  }

  test("pointInRange: empty and inverted ranges contribute zero buckets, not a countdown") {
    // sequence(a, b) with b < a counts DOWN: an unguarded empty range
    // [t, t) exploded into two spurious buckets and an inverted range
    // (end before start — a data error) into span/width rows. Both must
    // yield the empty bucket set: with exclusive end, nothing can ever
    // fall inside.
    val points = Seq("2025-03-01 10:15:00", "2025-03-01 11:00:00")
      .toDF("p").select(to_timestamp(col("p")).as("p_ts"))
    val ranges = Seq(
        ("ok", "2025-03-01 10:00:00", "2025-03-01 10:30:00"),
        ("empty", "2025-03-01 11:00:00", "2025-03-01 11:00:00"),
        // inverted by a year — with 60 s buckets an unguarded explode
        // is ~525k rows for this one row
        ("inverted", "2025-03-01 12:00:00", "2024-03-01 12:00:00"))
      .toDF("tag", "s", "e")
      .select(col("tag"), to_timestamp(col("s")).as("s_ts"),
        to_timestamp(col("e")).as("e_ts"))
    val got = graft.ext.RangeJoin
      .pointInRange(points, "p_ts", ranges, "s_ts", "e_ts",
        bucketSeconds = 60)
      .select(col("tag")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("ok"))
  }

  test("pointInRange: fractional-second range end still emits its final bucket") {
    // unix_timestamp truncates to seconds: with a range ending at
    // 10:00:00.500, trunc(end)-1 computed the last bucket as 09:59 and
    // the equi-join silently missed every point in the 10:00 bucket.
    // Microsecond bucket arithmetic must match the exact predicate.
    val points = Seq("2025-03-01 10:00:00.200").toDF("p")
      .select(to_timestamp(col("p")).as("p_ts"))
    val ranges = Seq(("frac", "2025-03-01 09:59:30", "2025-03-01 10:00:00.500"))
      .toDF("tag", "s", "e")
      .select(col("tag"), to_timestamp(col("s")).as("s_ts"),
        to_timestamp(col("e")).as("e_ts"))
    val got = graft.ext.RangeJoin
      .pointInRange(points, "p_ts", ranges, "s_ts", "e_ts",
        bucketSeconds = 60)
      .select(col("tag")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("frac"))
  }
}
