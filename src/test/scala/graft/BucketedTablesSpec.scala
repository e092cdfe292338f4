package graft

import graft.sinks.BucketedTables
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Regression guard for the r11 bucketed-table disk leak: rebuilds must
  * overwrite the ONE deterministic directory per source dir, not leak a
  * fresh temp copy of orders+lineitem per cache-eviction/session cycle
  * (the tables are EXTERNAL, so DROP TABLE removes only metadata). */
class BucketedTablesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  // Trailing slash = same parquet data as the suites that bucket
  // sf0.001, but a DISTINCT cache key / table tag, so dropping tables
  // here can't race a concurrently-running suite's q63.
  private val dir = "/root/testdata/sf0.001/"

  private def location(table: String): String =
    spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(col("col_name") === "Location")
      .head().getString(1)

  test("rebuild after catalog loss reuses the same external directory") {
    val (o1, l1) = BucketedTables.ensure(spark, dir)
    val (oLoc, lLoc) = (location(o1), location(l1))
    // Simulate the fresh-SharedState case ensure() validates against:
    // the memoized name no longer exists in the caller's catalog, so
    // the next ensure() must evict and rebuild.
    spark.sql(s"DROP TABLE $o1")
    val (o2, l2) = BucketedTables.ensure(spark, dir)
    assert((o2, l2) === (o1, l1), "rebuild changed the catalog names")
    assert(location(o2) === oLoc && location(l2) === lLoc,
      "rebuild leaked a fresh directory instead of overwriting in place")
    // and the rebuilt table is readable (overwrite left a whole copy)
    assert(spark.table(o2).count() > 0)
  }
}
