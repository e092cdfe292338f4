package graft

import graft.sinks.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  test("compaction: 64 small files → 4 range-clustered files, content-identical, disjoint key spans") {
    val in = Files.createTempDirectory("compact_in_").toString
    val out = Files.createTempDirectory("compact_out_").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // simulate a streaming sink's small-file debris
    docs.repartition(64).write.mode("overwrite").parquet(in)
    assert(Compaction.partFiles(in).size > 16)

    Compaction.compact(spark, in, out, "doc_id", 4)
    assert(Compaction.partFiles(out).size === 4)

    // content preserved exactly (both directions)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(b.count() === a.count())
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)

    // the pruning invariant: each output file holds a DISJOINT doc_id
    // span, so min/max footer stats make any key predicate one-file
    val spans = b.groupBy(input_file_name().as("f"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length === 4)
    spans.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"overlapping file spans: $hi1 >= $lo2")
    }

    // and Spark's reader actually skips: a point predicate scans one file
    val probe = b.filter(col("doc_id") === spans.head._1)
    assert(probe.select(input_file_name()).distinct().count() === 1L)
  }
}
