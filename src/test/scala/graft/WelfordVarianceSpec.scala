package graft

import graft.ext.WelfordVariance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WelfordVarianceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  test("matches var_samp across partitions (mergeable partial state)") {
    val data = (1 to 10000).map(i => (i % 7).toLong -> math.sin(i) * i)
    val df = data.toDF("k", "v").repartition(8) // force multi-partition merge
    val got = df.as[(Long, Double)].groupByKey(_._1)
      .mapValues(_._2)
      .agg(WelfordVariance.toColumn.name("wv"))
      .toDF("k", "wv")
    val want = df.groupBy("k").agg(var_samp(col("v")).as("vs"))
    val joined = got.join(want, "k").collect()
    assert(joined.length === 7)
    joined.foreach { r =>
      val (wv, vs) = (r.getAs[Double]("wv"), r.getAs[Double]("vs"))
      assert(math.abs(wv - vs) <= 1e-9 * math.max(1.0, math.abs(vs)))
    }
  }

  test("n<2 yields NULL like var_samp; singleton and empty behave") {
    // var_samp(singleton) is NULL (legacy.statisticalAggregate=false,
    // the default — DuckDB agrees); the parity claim must hold at n=1
    // too, and NULL propagates as absence where NaN poisons arithmetic
    val one = Seq(1L -> 5.0).toDF("k", "v").as[(Long, Double)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(WelfordVariance.toColumn.name("wv")).collect()
    assert(one.head._2 == null)
    val builtin = Seq(1L -> 5.0).toDF("k", "v")
      .groupBy("k").agg(org.apache.spark.sql.functions.var_samp("v"))
      .collect()
    assert(builtin.head.isNullAt(1))
    // zero-count PARTIAL state: 2 rows spread over 8 partitions force
    // merges with empty accumulators — n=0 state must merge as identity
    // (var_samp({5,7}) = 2 exactly), not crash or skew the result
    val sparse = Seq(1L -> 5.0, 1L -> 7.0).toDF("k", "v").repartition(8)
      .as[(Long, Double)].groupByKey(_._1).mapValues(_._2)
      .agg(WelfordVariance.toColumn.name("wv")).collect()
    assert(sparse.head._2 === 2.0)
    // fully empty input: no groups, no rows, no exception
    val none = Seq.empty[(Long, Double)].toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(WelfordVariance.toColumn.name("wv")).collect()
    assert(none.isEmpty)
  }
}
