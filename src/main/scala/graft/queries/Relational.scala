package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational query corpus.
  *
  * Re-expresses, over the local TPC-H-ish fixture schema, every relational
  * construct exercised by the reference's 34-query streaming TPC-DS corpus
  * (see SURVEY.md §2.5; reference `emr-baseline-testing/queries` SQL files):
  * multi-way equi joins (q3.sql:28-33, q84.sql:26-40), SUM/AVG/COUNT/
  * COUNT(DISTINCT), HAVING (q6.sql, q8.sql), ROLLUP + GROUPING() (q18.sql,
  * q22.sql, q27.sql), UNION ALL (q71.sql, q76.sql), INTERSECT (q8.sql),
  * scalar/IN subqueries (q6.sql, q8.sql), ORDER BY + LIMIT (q3.sql:34),
  * CASE WHEN / BETWEEN / IN / LIKE / substr / concat / coalesce.
  *
  * All queries are declarative DataFrame plans — Catalyst does pushdown,
  * pruning, join selection (broadcast for the small dimension tables) and
  * whole-stage codegen. Aggregates over doubles are rounded in BOTH the
  * Spark plan and the DuckDB oracle so the FP summation order cannot flip
  * the hash compare.
  *
  * Scale notes (100 TB design stance): every query here shuffles only on
  * its natural keys; dimension joins (region/nation/customer/supplier/part)
  * are broadcast-able and hinted as such; fact-fact joins go through
  * sort-merge with AQE skew handling. No driver-side materialization.
  */
object Relational {

  /** Salted-join gate (value proof that the skew path is a plain inner
    * join): lineitem ⋈ orders on orderkey with a 8-way salt, rolled up
    * per order priority. The oracle is the unsalted join — identical
    * results required.
    */
  private def skewJoinDef(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = graft.Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedInnerJoin(li, ord, Seq("l_orderkey"), saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_join" -> skewJoinDef _,

    // TPC-H Q1 style pricing summary: full-scan agg with partial (map-side)
    // aggregation; 4-6 output groups.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3 style shipping priority: 3-way join (dim broadcast), agg,
    // top-N. Mirrors reference q3.sql:28-34.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 style: 6-way join across region/nation/customer/supplier/
    // orders/lineitem (reference q84.sql:26-40 is the 6-way analogue).
    "q5_region_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q6 style forecast: tight filter + single-row agg; the filters
    // must reach the parquet scan (PushedFilters).
    "q6_revenue_forecast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // ROLLUP + GROUPING() — reference q18.sql/q22.sql/q27.sql semantics.
    "q_rollup_nation" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"),
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    // UNION ALL of two aggregated branches — reference q71.sql/q76.sql.
    "q_union_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val hi = ord.filter(col("o_orderpriority") === "1-URGENT")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(lit("urgent").as("bucket"), col("n"), col("total"))
      val lo = ord.filter(col("o_orderpriority") === "5-LOW")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(lit("low").as("bucket"), col("n"), col("total"))
      hi.union(lo).orderBy(col("bucket"))
    }),

    // INTERSECT — reference q8.sql.
    "q_intersect_custkeys" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val f = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val o = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      f.intersect(o).orderBy(col("o_custkey"))
    }),

    // GROUP BY ... HAVING — reference q6.sql/q8.sql.
    "q_having_suppliers" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("total_qty"))
        .where(col("n_items") > 50)
        .orderBy(col("l_suppkey"))
    }),

    // IN subquery (Catalyst rewrites to left-semi join).
    "q_in_subquery" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val parts = t(s, dir, "part").filter(col("p_brand") === "Brand#12").select(col("p_partkey"))
      li.join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
    }),

    // Scalar subquery threshold.
    "q_scalar_subquery" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val threshold = ord.agg((avg(col("o_totalprice")) * 2).as("thr"))
      ord.crossJoin(broadcast(threshold))
        .filter(col("o_totalprice") > col("thr"))
        .agg(count(lit(1)).as("n_expensive"))
    }),

    // EXISTS → left-semi join (no driver-side loop, no shuffle of the big
    // side beyond the join itself).
    "q_exists_active_suppliers" -> ((s, dir) => {
      val supp = t(s, dir, "supplier")
      val recent = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("l_suppkey"))
      supp.join(recent, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // NOT EXISTS → left-anti join.
    "q_antijoin_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // COUNT(DISTINCT) — reference q46-family.
    "q_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // Scalar-function gauntlet: CASE WHEN / BETWEEN / IN list / LIKE /
    // substr / concat / coalesce (corpus-wide constructs).
    "q_case_scalar" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(
          when(col("o_totalprice").between(0, 50000), "small")
            .when(col("o_totalprice").between(50000, 150000), "mid")
            .otherwise("big").as("bucket"),
          concat(substring(col("o_orderpriority"), 1, 1), lit("-"),
            coalesce(col("o_orderstatus"), lit("?"))).as("prio_status"),
          col("o_orderpriority").like("%URGENT%").cast("int").as("is_urgent"))
        .groupBy(col("bucket"), col("prio_status"), col("is_urgent"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"), col("prio_status"), col("is_urgent"))
    }),

    // ORDER BY + LIMIT over raw (un-recomputed) doubles — exercises
    // TakeOrderedAndProject.
    "q_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // q18/q22-style composite: join + ROLLUP over two dims + HAVING-style
    // post-aggregation filter + grouping() disambiguation.
    "q_rollup_having" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .rollup(col("o_orderstatus"), col("l_returnflag"))
        .agg(round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"))
        .where(col("n") > 100)
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("l_returnflag"))
    }),

    // q76-style: three-branch UNION ALL with branch tags, re-aggregated.
    "q_union_three_way" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def branch(tag: String, cond: org.apache.spark.sql.Column) =
        li.filter(cond).select(lit(tag).as("channel"),
          col("l_extendedprice").as("price"))
      branch("returned", col("l_returnflag") === "R")
        .union(branch("accepted", col("l_returnflag") === "A"))
        .union(branch("none", col("l_returnflag") === "N"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("total"))
        .orderBy(col("channel"))
    }),

    // q8/q46-style composite: IN-subquery + countDistinct + HAVING.
    "q_composite_subquery_agg" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val bigSpenders = ord.groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
        .where(col("spend") > 300000)
        .select(col("o_custkey"))
      cust.join(bigSpenders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_custs"))
        .where(col("n_custs") > 5)
        .orderBy(col("c_mktsegment"))
    }),

    // LEFT OUTER join + agg — the reference corpus's q40 construct in
    // batch form (streaming form with dual watermarks is proven in
    // GraftSqlExtensionsSpec).
    "q_left_outer_join" -> ((s, dir) => {
      val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_quantity"))
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("l_orderkey")).as("n_matched"),
          round(sum(coalesce(col("l_quantity"), lit(0.0))), 2).as("qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // Ranking window function (beyond the reference corpus; free from
    // Spark — SURVEY.md §2.5 "absent" note).
    "q_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"))
        .filter(col("rnk") <= 5)
        .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
    }),
  )

  def oracles: Map[String, String] = Map(
    // the oracle is the UNSALTED join — the skew path must be invisible
    // in the result (l_quantity is integer-valued, so the sum is exact
    // under any addition order)
    "q_skew_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q6_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_rollup_nation" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_bal,
        |  CAST(grouping(r_name) AS INT) AS g_region,
        |  CAST(grouping(n_name) AS INT) AS g_nation
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q_union_priority" ->
      """SELECT * FROM (
        |  SELECT 'urgent' AS bucket, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'low' AS bucket, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |  FROM orders WHERE o_orderpriority = '5-LOW'
        |) ORDER BY bucket""".stripMargin,

    "q_intersect_custkeys" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |) ORDER BY o_custkey""".stripMargin,

    "q_having_suppliers" ->
      """SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING count(*) > 50
        |ORDER BY l_suppkey""".stripMargin,

    "q_in_subquery" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT count(*) AS n_expensive
        |FROM orders
        |WHERE o_totalprice > (SELECT 2 * avg(o_totalprice) FROM orders)""".stripMargin,

    "q_exists_active_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY s_suppkey""".stripMargin,

    "q_antijoin_idle_customers" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_case_scalar" ->
      """SELECT
        |  CASE WHEN o_totalprice BETWEEN 0 AND 50000 THEN 'small'
        |       WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 'mid'
        |       ELSE 'big' END AS bucket,
        |  substr(o_orderpriority, 1, 1) || '-' || coalesce(o_orderstatus, '?') AS prio_status,
        |  CAST(o_orderpriority LIKE '%URGENT%' AS INT) AS is_urgent,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_top_orders" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_rollup_having" ->
      """SELECT o_orderstatus, l_returnflag,
        |  round(avg(l_quantity), 4) AS avg_qty, count(*) AS n,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY ROLLUP(o_orderstatus, l_returnflag)
        |HAVING count(*) > 100
        |ORDER BY o_orderstatus ASC NULLS FIRST, l_returnflag ASC NULLS FIRST""".stripMargin,

    "q_union_three_way" ->
      """SELECT channel, count(*) AS n, round(sum(price), 2) AS total FROM (
        |  SELECT 'returned' AS channel, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT 'accepted' AS channel, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT 'none' AS channel, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'N'
        |)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_composite_subquery_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_custs
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders
        |  GROUP BY o_custkey
        |  HAVING round(sum(o_totalprice), 2) > 300000)
        |GROUP BY 1
        |HAVING count(*) > 5
        |ORDER BY 1""".stripMargin,

    "q_left_outer_join" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  count(l_orderkey) AS n_matched,
        |  round(sum(coalesce(l_quantity, 0)), 2) AS qty
        |FROM orders
        |LEFT OUTER JOIN (
        |  SELECT l_orderkey, l_quantity FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
        |) li ON o_orderkey = l_orderkey
        |WHERE o_orderstatus = 'P'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(rank() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
        |  FROM customer)
        |WHERE rnk <= 5
        |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,
  )
}
