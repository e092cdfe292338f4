package graft

import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark = GraftSession.local(4)
}

class CoreQueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("every registered query runs and returns rows on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with 0 rows on sf0.001: $empties")
  }

  test("every oracle key has a registered query (column-NAME parity is enforced by oracle_check)") {
    // Honest title: this asserts key parity only. The column-name/type
    // contract between each Spark query and its DuckDB SQL cannot be
    // checked without executing the SQL — tools/oracle_check.py does
    // exactly that (COLUMN-MISMATCH / TYPE-SKEW rows) on every run.
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("q01 flagship aggregates are sane") {
    val df = SparkEntry.queries("q01_agg_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 1000, s"expected >1000 lineitems counted, got $total")
  }

  test("entry() smoke") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
