package graft

import graft.sources.XmlMeas
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** FIXTURES.md §1 sample + edge cases (NIL/NULL/empty values, UNKNOWN_p
  * fallback, nodeid without '=', missing managedElement/job/granPeriod,
  * multiple measInfo). */
class XmlMeasSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  private val sample =
    """<measCollecFile xmlns="http://www.3gpp.org/ftp/specs/archive/32_series/32.435#measCollec">
      |  <fileHeader><measCollec beginTime="2025-04-13T10:00:00Z"/></fileHeader>
      |  <measData>
      |    <managedElement localDn="SubNetwork=TN,ManagedElement=ME1"/>
      |    <measInfo measInfoId="LTE_Cell">
      |      <job jobId="job-1"/>
      |      <granPeriod duration="PT900S" endTime="2025-04-13T10:15:00Z"/>
      |      <measType p="1">FT_RRC_SUCCESS_RATE</measType>
      |      <measType p="2">FT_S1_SUCCESS_RATE</measType>
      |      <measValue measObjLdn="eNodeB=NODE42,Cell=7">
      |        <r p="1">99.7</r>
      |        <r p="2">NIL</r>
      |      </measValue>
      |    </measInfo>
      |  </measData>
      |</measCollecFile>""".stripMargin

  private def flat(xml: String) =
    XmlMeas.flatten(Seq((1, xml)).toDF("fid", "xml"), "xml", "fid")

  test("FIXTURES sample: header join, dictionary, NIL→0, nodeid") {
    val rows = flat(sample).orderBy("kpiId").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getAs[String]("beginTime") === "2025-04-13T10:00:00Z")
    assert(r1.getAs[String]("localDn") === "SubNetwork=TN,ManagedElement=ME1")
    assert(r1.getAs[String]("measInfoId") === "LTE_Cell")
    assert(r1.getAs[String]("jobId") === "job-1")
    assert(r1.getAs[String]("granPeriod") === "PT900S")
    assert(r1.getAs[String]("endTime") === "2025-04-13T10:15:00Z")
    assert(r1.getAs[String]("nodeid") === "NODE42")
    assert(r1.getAs[String]("kpiName") === "FT_RRC_SUCCESS_RATE")
    assert(r1.getAs[Double]("kpiValue") === 99.7)
    assert(rows(1).getAs[Double]("kpiValue") === 0.0) // NIL → 0
  }

  test("junk r-value cleanses to null; missing r@p keeps the UNKNOWN_ marker") {
    // Pre-fix, BOTH failed: under ANSI (Spark 4 default) the bare
    // cast("double") THREW CAST_INVALID_INPUT on "N/A" (killing the
    // whole drain on one malformed file), and null-propagating concat
    // made the missing-@p fallback NULL instead of "UNKNOWN_".
    val xml =
      """<measCollecFile>
        |<fileHeader><measCollec beginTime="t0"/></fileHeader>
        |<measData><measInfo measInfoId="M">
        |<measType p="1">A</measType>
        |<measValue measObjLdn="n=1">
        |<r p="1">N/A</r><r>5</r>
        |</measValue></measInfo></measData></measCollecFile>""".stripMargin
    val rows = flat(xml).orderBy(col("kpiId").asc_nulls_last).collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("kpiValue"))) // junk → null
    val noP = rows(1)
    assert(noP.isNullAt(noP.fieldIndex("kpiId")))
    assert(noP.getAs[String]("kpiName") === "UNKNOWN_")
    assert(noP.getAs[Double]("kpiValue") === 5.0)
  }

  test("readAndFlatten reads a literal path with glob metacharacters") {
    // spark.read glob-interprets input paths: pre-fix, reading the
    // listed path x[1].xml silently returned x1.xml's content (data
    // loss: x[1].xml published never, x1.xml twice). Paths are now
    // glob-escaped, so the bracket file's OWN rows come back.
    val dir = java.nio.file.Files.createTempDirectory("xmlglob_")
    java.nio.file.Files.writeString(dir.resolve("x[1].xml"), sample)
    java.nio.file.Files.writeString(dir.resolve("x1.xml"),
      sample.replace("99.7", "11.1"))
    val rows = XmlMeas.readAndFlatten(spark,
        Seq(dir.resolve("x[1].xml").toString))
      .orderBy("kpiId").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("kpiValue") === 99.7) // NOT x1.xml's 11.1
  }

  test("UNKNOWN_p fallback, NULL/empty values, no '=' in measObjLdn") {
    val xml =
      """<measCollecFile>
        |<fileHeader><measCollec beginTime="t0"/></fileHeader>
        |<measData><measInfo measInfoId="M">
        |<measType p="1">A</measType>
        |<measValue measObjLdn="PLAIN">
        |<r p="1">NULL</r><r p="2"></r><r p="9">7</r>
        |</measValue></measInfo></measData></measCollecFile>""".stripMargin
    val rows = flat(xml).orderBy("kpiId").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Double]("kpiValue")).toSeq === Seq(0.0, 0.0, 7.0))
    assert(rows(2).getAs[String]("kpiName") === "UNKNOWN_9")
    assert(rows.forall(_.getAs[String]("nodeid") === ""))
    assert(rows.forall(r => r.getAs[String]("localDn") == null)) // no managedElement
  }

  test("malformed measType dictionary cleanses: duplicate p last-wins, null p dropped") {
    // map_from_entries throws on duplicate/null keys by default — one
    // malformed file must cleanse (reference Python dict semantics:
    // later assignment wins), never kill the whole drain
    val xml =
      """<measCollecFile>
        |<fileHeader><measCollec beginTime="t0"/></fileHeader>
        |<measData><measInfo measInfoId="M">
        |<measType p="1">OLD_NAME</measType>
        |<measType>NO_P_ATTR</measType>
        |<measType p="1">NEW_NAME</measType>
        |<measValue measObjLdn="PLAIN"><r p="1">5</r></measValue>
        |</measInfo></measData></measCollecFile>""".stripMargin
    val rows = flat(xml).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("kpiName") === "NEW_NAME") // last wins
    assert(rows.head.getAs[Double]("kpiValue") === 5.0)
  }

  test("a good measType followed ONLY by a null-@p entry keeps its name") {
    // The poison case for === inside the last-wins dedup: for the GOOD
    // entry, exists() over the following slice sees only the null-@p
    // entry — null === "1" is NULL, so exists returns NULL (no TRUE, one
    // NULL), !NULL stays NULL, and filter() drops the good entry. One
    // malformed trailing measType would UNKNOWN_-name every KPI before
    // it. Null-safe <=> makes exists() return plain false. Fails on the
    // pre-r10 === code.
    val xml =
      """<measCollecFile>
        |<fileHeader><measCollec beginTime="t0"/></fileHeader>
        |<measData><measInfo measInfoId="M">
        |<measType p="1">GOOD_NAME</measType>
        |<measType>TRAILING_NO_P</measType>
        |<measValue measObjLdn="PLAIN"><r p="1">5</r></measValue>
        |</measInfo></measData></measCollecFile>""".stripMargin
    val rows = flat(xml).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("kpiName") === "GOOD_NAME")
    assert(rows.head.getAs[Double]("kpiValue") === 5.0)
  }

  test("nodeid: second '=' inside the first measObjLdn field stops the capture") {
    // split('=')[1].split(',')[0] on "eNodeB=N1=S2,Cell=7" is "N1" — the
    // pre-r10 unanchored regex captured "N1=S2". Fails on that code.
    val xml =
      """<measCollecFile>
        |<fileHeader><measCollec beginTime="t0"/></fileHeader>
        |<measData><measInfo measInfoId="M">
        |<measType p="1">A</measType>
        |<measValue measObjLdn="eNodeB=N1=S2,Cell=7"><r p="1">1</r></measValue>
        |</measInfo></measData></measCollecFile>""".stripMargin
    val rows = flat(xml).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("nodeid") === "N1")
  }

  test("multiple measInfo / measValue explode to the full cross of r rows") {
    val xml =
      """<measCollecFile>
        |<fileHeader><measCollec beginTime="t0"/></fileHeader>
        |<measData>
        |<measInfo measInfoId="A"><measType p="1">X</measType>
        |<measValue measObjLdn="a=1"><r p="1">1</r></measValue>
        |<measValue measObjLdn="a=2"><r p="1">2</r></measValue></measInfo>
        |<measInfo measInfoId="B"><measType p="1">Y</measType>
        |<measValue measObjLdn="b=1"><r p="1">3</r><r p="1">4</r></measValue></measInfo>
        |</measData></measCollecFile>""".stripMargin
    val rows = flat(xml).collect()
    assert(rows.length === 4) // 2×1 + 1×2
    assert(rows.map(_.getAs[Double]("kpiValue")).sorted.toSeq === Seq(1.0, 2.0, 3.0, 4.0))
  }
}
