package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-generated testdata contract AS THE ENGINE SEES IT.
  *
  * Why this exists: the driver regenerates /root/testdata between rounds
  * and has already shipped `events.ts` under three different parquet
  * encodings (TIMESTAMP(NANOS) → int64 under nanosAsLong, then plain
  * timestamp[us] → TIMESTAMP_NTZ). The r6→r7 regen silently broke
  * q58/q89/q99: `Verify` catches per-query exceptions, so the driver's
  * correctness run just shrank from 109 to 106 queries with no red row.
  * This spec turns the next such drift into a LOUD, named CI failure
  * pointing at the exact table/column, instead of three missing parquet
  * dumps. It asserts post-normalization types (what queries consume via
  * `Tables`), not raw parquet types, so a new encoding that the Tables
  * seam already normalizes correctly stays green.
  */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)
  private val sf = "/root/testdata/sf0.001"

  // session is shared across concurrently-running suites — never stop it
  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, got: Map[String, DataType],
                         want: (String, DataType)*): Unit =
    for ((name, tpe) <- want) {
      assert(got.contains(name), s"$table: column $name missing (have ${got.keys.toSeq.sorted})")
      assert(got(name) == tpe, s"$table.$name: expected $tpe, testdata now reads as ${got(name)}")
    }

  test("events: ts normalizes to TimestampType; value columns stable") {
    val got = fields(Tables.events(spark, sf))
    assertCols("events", got,
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
  }

  test("lineitem/orders: keys, measures and the date columns' read type") {
    val li = fields(Tables.lineitem(spark, sf))
    assertCols("lineitem", li,
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_returnflag" -> StringType)
    // Queries consume l_shipdate/o_orderdate as-read today (timestamp[us]
    // → TIMESTAMP_NTZ; oracle-green at r6). If the generator flips the
    // encoding again, this names the drift before Verify eats it.
    assert(Seq[DataType](TimestampNTZType, TimestampType, DateType).contains(li("l_shipdate")),
      s"lineitem.l_shipdate read as ${li("l_shipdate")} — new encoding, audit date-typed queries")
    val o = fields(Tables.orders(spark, sf))
    assertCols("orders", o,
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType)
    assert(o("o_orderdate") == li("l_shipdate"),
      "o_orderdate and l_shipdate encodings diverged — date joins/filters at risk")
  }

  test("dimensions: join-key types the broadcast joins rely on") {
    assertCols("region", fields(Tables.region(spark, sf)),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation", fields(Tables.nation(spark, sf)),
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
    assertCols("customer", fields(Tables.customer(spark, sf)),
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier", fields(Tables.supplier(spark, sf)),
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertCols("part", fields(Tables.part(spark, sf)),
      "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  }

  test("documents/embeddings: the dedup and ANN input contracts") {
    assertCols("documents", fields(Tables.documents(spark, sf)),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    val emb = fields(Tables.embeddings(spark, sf))
    assertCols("embeddings", emb, "vec_id" -> LongType, "label" -> IntegerType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true) ||
           emb("embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding read as ${emb("embedding")} — kernels expect array<float>")
  }
}
