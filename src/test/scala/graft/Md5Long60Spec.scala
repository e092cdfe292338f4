package graft

import graft.ext.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class Md5Long60Spec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  test("expression equals the built-in composition on arbitrary strings") {
    val df = Seq("", "a", "abc", "the quick brown fox", "ünïcødé ✓")
      .toDF("s")
      .select(
        Hashing.md5Long(col("s")).as("fast"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("ref"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null propagates; registered in SQL via GraftExtensions") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(Hashing.md5Long(col("s")).as("h")).head
    assert(r.isNullAt(0))
    spark.sql("SELECT 1").collect() // force session init
    val sql = spark.sql(
      "SELECT md5long60(CAST('abc' AS BINARY)) AS h").head.getLong(0)
    assert(sql === 648541476951500027L)
    // the SQL surface coerces strings to binary at build time — a bare
    // string argument hashes its UTF-8 bytes instead of throwing a
    // ClassCastException at execution
    val str = spark.sql("SELECT md5long60('abc') AS h").head.getLong(0)
    assert(str === 648541476951500027L)
  }

  test("survives whole-stage codegen over many rows (no interpreter fallback)") {
    val n = spark.range(10000)
      .select(Hashing.md5Long(col("id").cast("string")).as("h"))
      .distinct().count()
    assert(n === 10000L) // 60-bit hash: no collisions expected at 10k
  }

  test("non-binary Column-API input fails at analysis, not at runtime") {
    // the SQL registration casts to binary; a raw expression over a
    // string must fail NAMED at analysis instead of an executor-side
    // ClassCastException (or a Janino failure) at first action
    import org.apache.spark.sql.GraftColumnBridge
    val bad = GraftColumnBridge.column(graft.functions.Md5Long60(
      GraftColumnBridge.expression(lit("abc"))))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s").select(bad).collect()
    }
    assert(e.getMessage.contains("binary"))
  }
}
