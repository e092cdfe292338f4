package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage over the TPC-H-ish testdata.
  *
  * Capability surface per SURVEY.md §2.3–§2.7: projections, predicates,
  * equi-joins (broadcast + shuffle, semi/anti), aggregations (incl.
  * rollup/cube), window functions, sort/limit, set ops, distinct.
  * The reference itself has no joins/aggs (SURVEY §2.5/§2.6) — these are
  * the Spark built-ins the engine surfaces, exercised against the DuckDB
  * oracle.
  *
  * Determinism conventions (driver hash-compares):
  *  - every query ends in an explicit total order (unique tie-break key);
  *  - ASC NULLS FIRST everywhere (Spark default) and spelled out in the
  *    SQL (DuckDB defaults to NULLS LAST);
  *  - double aggregates rounded (sum→2dp, avg→4dp) on both sides so
  *    summation-order float noise can't flip the hash.
  */
object CoreQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Aggregation: TPC-H Q1 pricing summary (flagship) ----
    "q01_agg_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- Filter + projection (predicate/column pushdown to parquet) ----
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- Multi-way join, dims broadcast (customer⋈orders⋈nation⋈region) ----
    "q03_join_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("order_cnt"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- Left-semi join (EXISTS) ----
    "q04_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("active_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- Left-anti join (NOT EXISTS): customers with no 1995 order ----
    "q05_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val n = Tables.nation(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("idle_customers"))
        .orderBy(col("n_name"))
    }),

    // ---- Window: rank within partition (top-3 orders per customer) ----
    "q06_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        // Cast to long: Spark row_number() is int32, DuckDB's is int64 —
        // the driver hashes typed values, so the widths must agree.
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ---- Window: running aggregate ----
    "q07_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- Global sort + limit (top-k) ----
    "q08_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
    }),

    // ---- Set ops: UNION / EXCEPT (distinct semantics) ----
    // Customers active in 1995 (either half) but gone in 1996.
    "q09_set_union_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def active(from: String, to: String) =
        o.filter(col("o_orderdate") >= lit(from).cast("timestamp")
            && col("o_orderdate") < lit(to).cast("timestamp"))
          .select(col("o_custkey").as("custkey"))
      active("1995-01-01", "1995-07-01")
        .union(active("1995-07-01", "1996-01-01"))
        .except(active("1996-01-01", "1997-01-01"))
        .orderBy(col("custkey"))
    }),

    // ---- Set ops: INTERSECT ----
    "q10_set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(sup)
        .orderBy(col("nationkey"))
    }),

    // ---- ROLLUP grouping sets ----
    "q11_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    }),

    // ---- DISTINCT projection ----
    "q12_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // ---- JSON extraction (events.props) ----
    "q13_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    }),

    // ---- Event-time bucketing (batch analogue of tumbling window ST10) ----
    "q14_time_bucket" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ---- Conditional replace + cast (cleanse F1/F2 analogue: sentinel→0) ----
    "q15_case_cast" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("qty_cleansed",
          when(col("l_linestatus") === "F", lit(0.0))
            .otherwise(col("l_quantity").cast("double")))
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("qty_cleansed")), 2).as("sum_qty_cleansed"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- SQL surface: the same engine via spark.sql over temp views
    //      (correlated EXISTS + scalar subquery, Catalyst-planned) ----
    "q56_sql_api" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_customers,
          |  round(sum(c_acctbal), 2) AS sum_acctbal
          |FROM v_customer c
          |WHERE EXISTS (SELECT 1 FROM v_orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > (SELECT avg(o_totalprice)
          |                                      FROM v_orders))
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin)
    }),

    // ---- Correlated-style aggregation: avg filter subquery (having) ----
    "q16_having_avg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val avgPrice = o.agg(avg(col("o_totalprice")).as("ap"))
      o.groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(avgPrice))
        .filter(col("spend") > col("ap") * 2)
        .select(col("o_custkey"), col("spend"), col("n_orders"))
        .orderBy(col("o_custkey"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q01_agg_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice * l_discount, 4) AS disc_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_revenue" ->
      """SELECT r_name, n_name, count(*) AS order_cnt,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_mktsegment, count(*) AS active_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q05_anti_join" ->
      """SELECT n_name, count(*) AS idle_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate < TIMESTAMP '1996-01-01')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q06_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q07_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q09_set_union_except" ->
      """(SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1995-07-01'
        | UNION
        | SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-07-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01')
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |   AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY custkey""".stripMargin,

    "q10_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q11_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,

    "q12_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority
        |FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q13_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q14_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,

    "q15_case_cast" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN 0.0
        |                 ELSE CAST(l_quantity AS DOUBLE) END), 2) AS sum_qty_cleansed,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q56_sql_api" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > (SELECT avg(o_totalprice)
        |                                      FROM orders))
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q16_having_avg" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS spend,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING round(sum(o_totalprice), 2) >
        |  (SELECT avg(o_totalprice) FROM orders) * 2
        |ORDER BY o_custkey""".stripMargin
  )
}
