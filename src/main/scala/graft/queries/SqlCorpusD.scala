package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference SQL-text corpus, continued (files 28–34 of 34; see
  * [[SqlCorpus]] for the porting contract).
  *
  * Shapes proven here (reference `emr-baseline-testing/queries/`):
  *  - q73.sql → q34 variant: CASE-ratio > 1, cnt band, ORDER BY cnt DESC
  *  - q76.sql → three stream legs UNION ALL'd with IS NULL channel
  *              filters (all-null key column), COUNT + SUM per group
  *  - q79.sql → derived agg with hidden group column, dim substr in the
  *              outer projection
  *  - q84.sql → APPEND-mode non-aggregated stream-dim join (no
  *              watermark, every joined row emits), concat() projection
  *  - q91.sql → GROUP BY carries two columns that are NOT projected
  *              (duplicate visible keys in the result), LIKE filter
  *  - q96.sql → bare global count(*) with time-of-day predicates
  *  - q99.sql → second day-difference bucket pivot over a different
  *              dim chain
  */
object SqlCorpusD {

  private def uid(): String = java.util.UUID.randomUUID().toString.replace("-", "")

  private def runPorted(s: SparkSession, script: String, sink: String): DataFrame = {
    graft.streaming.GraftSql.runScript(s, script)
    s.read.format("kv").option("path", sink).load()
  }

  private def header(job: String, ckpt: String): String =
    s"""CREATE DATABASE IF NOT EXISTS graft_corpus;
       |USE graft_corpus;
       |SET spark.sql.shuffle.partitions=4;
       |SET streaming.query.name=$job;
       |SET spark.sql.streaming.checkpointLocation.$job=$ckpt;""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q73.sql:23-52 — derived streaming count joined to customer after
    // the aggregate; CASE-ratio > 1 dim filter, cnt BETWEEN 1 AND 5,
    // ORDER BY cnt DESC.
    "q_sql_q73" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq73_$u/t"
      runPorted(s,
        s"""${header("g_q73_job", s"/tmp/graft_sqlq73ck_$u")}
           |DROP TABLE IF EXISTS g_q73_lineitem;
           |CREATE TABLE g_q73_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q73_orders;
           |CREATE TABLE g_q73_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q73_customer;
           |CREATE TABLE g_q73_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q73_supplier;
           |CREATE TABLE g_q73_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q73_nation;
           |CREATE TABLE g_q73_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q73_sink;
           |CREATE TABLE g_q73_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"c_name": {"type": "string"}, "c_mktsegment": {"type": "string"}, "c_acctbal": {"type": "double"}, "ticket": {"type": "bigint"}, "cnt": {"type": "bigint"}}}');
           |INSERT INTO g_q73_sink
           |SELECT
           |  c_name,
           |  c_mktsegment,
           |  c_acctbal,
           |  ticket,
           |  cnt
           |FROM
           |  (SELECT
           |    l_orderkey ticket,
           |    o_custkey cust_sk,
           |    CAST(count(*) AS BIGINT) cnt
           |  FROM g_q73_lineitem, g_q73_orders, g_q73_supplier, g_q73_nation
           |  WHERE g_q73_lineitem.l_orderkey = g_q73_orders.o_orderkey
           |    AND g_q73_lineitem.l_suppkey = g_q73_supplier.s_suppkey
           |    AND g_q73_supplier.s_nationkey = g_q73_nation.n_nationkey
           |    AND day(o_orderdate) BETWEEN 1 AND 2
           |    AND (g_q73_supplier.s_acctbal > 1000 OR
           |    g_q73_supplier.s_acctbal < 600)
           |    AND g_q73_supplier.s_suppkey >= 0
           |    AND CASE WHEN g_q73_supplier.s_nationkey > 0
           |    THEN
           |      g_q73_supplier.s_acctbal / g_q73_supplier.s_nationkey
           |        ELSE NULL END > 1
           |    AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
           |    AND n_name IN ('NATION_3', 'NATION_12', 'NATION_21', 'NATION_19')
           |  GROUP BY l_orderkey, o_custkey) dj, g_q73_customer
           |WHERE cust_sk = c_custkey
           |  AND cnt BETWEEN 1 AND 5
           |ORDER BY cnt DESC""".stripMargin, sink)
        .orderBy(col("ticket"))
    }),

    // q76.sql:23-69 — three stream legs UNION ALL'd, each with an
    // IS NULL filter on its channel key (made real via nullif), grouped
    // COUNT + SUM over the union.
    "q_sql_q76" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq76_$u/t"
      runPorted(s,
        s"""${header("g_q76_job", s"/tmp/graft_sqlq76ck_$u")}
           |DROP TABLE IF EXISTS g_q76_lineitem;
           |CREATE TABLE g_q76_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q76_orders;
           |CREATE TABLE g_q76_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q76_part;
           |CREATE TABLE g_q76_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q76_sink;
           |CREATE TABLE g_q76_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"channel": {"type": "string"}, "col_name": {"type": "bigint"}, "d_year": {"type": "bigint"}, "d_qoy": {"type": "bigint"}, "category": {"type": "string"}, "sales_cnt": {"type": "bigint"}, "sales_amt": {"type": "double"}}}');
           |INSERT INTO g_q76_sink
           |SELECT
           |  channel,
           |  col_name,
           |  d_year,
           |  d_qoy,
           |  category,
           |  CAST(COUNT(*) AS BIGINT) sales_cnt,
           |  round(SUM(ext_sales_price), 2) sales_amt
           |FROM (
           |       SELECT
           |         'store' AS channel,
           |         CAST(nullif(l_linenumber, 1) AS BIGINT) col_name,
           |         CAST(year(o_orderdate) AS BIGINT) d_year,
           |         CAST(quarter(o_orderdate) AS BIGINT) d_qoy,
           |         p_type category,
           |         l_extendedprice ext_sales_price
           |       FROM g_q76_lineitem, g_q76_part, g_q76_orders
           |       WHERE nullif(l_linenumber, 1) IS NULL
           |         AND l_orderkey = o_orderkey
           |         AND l_partkey = p_partkey
           |       UNION ALL
           |       SELECT
           |         'web' AS channel,
           |         CAST(nullif(l_linenumber, 2) AS BIGINT) col_name,
           |         CAST(year(o_orderdate) AS BIGINT) d_year,
           |         CAST(quarter(o_orderdate) AS BIGINT) d_qoy,
           |         p_type category,
           |         l_extendedprice ext_sales_price
           |       FROM g_q76_lineitem, g_q76_part, g_q76_orders
           |       WHERE nullif(l_linenumber, 2) IS NULL
           |         AND l_orderkey = o_orderkey
           |         AND l_partkey = p_partkey
           |       UNION ALL
           |       SELECT
           |         'catalog' AS channel,
           |         CAST(nullif(l_linenumber, 3) AS BIGINT) col_name,
           |         CAST(year(o_orderdate) AS BIGINT) d_year,
           |         CAST(quarter(o_orderdate) AS BIGINT) d_qoy,
           |         p_type category,
           |         l_extendedprice ext_sales_price
           |       FROM g_q76_lineitem, g_q76_part, g_q76_orders
           |       WHERE nullif(l_linenumber, 3) IS NULL
           |         AND l_orderkey = o_orderkey
           |         AND l_partkey = p_partkey) foo
           |GROUP BY channel, col_name, d_year, d_qoy, category
           |ORDER BY channel, col_name, d_year, d_qoy, category""".stripMargin, sink)
        .orderBy(col("channel"), col("col_name").asc_nulls_first, col("d_year"),
          col("d_qoy"), col("category"))
    }),

    // q79.sql:23-48 — derived agg keeps a hidden group column; the outer
    // projection substr()s a dim attribute carried through the subquery.
    "q_sql_q79" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq79_$u/t"
      runPorted(s,
        s"""${header("g_q79_job", s"/tmp/graft_sqlq79ck_$u")}
           |DROP TABLE IF EXISTS g_q79_lineitem;
           |CREATE TABLE g_q79_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q79_orders;
           |CREATE TABLE g_q79_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q79_customer;
           |CREATE TABLE g_q79_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q79_supplier;
           |CREATE TABLE g_q79_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q79_sink;
           |CREATE TABLE g_q79_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"cust_name": {"type": "string"}, "store": {"type": "string"}, "ticket": {"type": "bigint"}, "amt": {"type": "double"}, "profit": {"type": "double"}}}');
           |INSERT INTO g_q79_sink
           |SELECT
           |  c_name cust_name,
           |  substr(s_name, 1, 30) store,
           |  ticket,
           |  amt,
           |  profit
           |FROM
           |  (SELECT
           |    l_orderkey ticket,
           |    o_custkey cust_sk,
           |    g_q79_supplier.s_name,
           |    round(sum(l_discount), 2) amt,
           |    round(sum(l_tax), 2) profit
           |  FROM g_q79_lineitem, g_q79_orders, g_q79_supplier
           |  WHERE g_q79_lineitem.l_orderkey = g_q79_orders.o_orderkey
           |    AND g_q79_lineitem.l_suppkey = g_q79_supplier.s_suppkey
           |    AND (g_q79_supplier.s_acctbal > 3000 OR
           |    g_q79_supplier.s_suppkey > 5)
           |    AND day(o_orderdate) = 1
           |    AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
           |    AND g_q79_supplier.s_suppkey BETWEEN 2 AND 9
           |  GROUP BY l_orderkey, o_custkey, l_suppkey, s_name) ms, g_q79_customer
           |WHERE cust_sk = c_custkey
           |ORDER BY cust_name, store, profit""".stripMargin, sink)
        .orderBy(col("cust_name"), col("store"), col("ticket"), col("amt"), col("profit"))
    }),

    // q84.sql:23-40 — APPEND-mode NON-AGGREGATED stream-dim join: no
    // watermark, no state; every joined row emits. concat() projection,
    // band bounds on a numeric attribute.
    "q_sql_q84" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq84_$u/t"
      runPorted(s,
        s"""${header("g_q84_job", s"/tmp/graft_sqlq84ck_$u")}
           |DROP TABLE IF EXISTS g_q84_events;
           |CREATE TABLE g_q84_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q84_customer;
           |CREATE TABLE g_q84_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q84_nation;
           |CREATE TABLE g_q84_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q84_sink;
           |CREATE TABLE g_q84_sink USING kv OPTIONS (path '$sink', output.mode 'append',
           |  catalog '{"columns": {"customer_id": {"type": "string"}, "customername": {"type": "string"}}}');
           |INSERT INTO g_q84_sink
           |SELECT
           |  c_name AS customer_id,
           |  concat(c_name, ', ', n_name) AS customername
           |FROM g_q84_customer
           |  , g_q84_nation
           |  , g_q84_events
           |WHERE n_name = 'NATION_2'
           |  AND c_nationkey = n_nationkey
           |  AND value >= 10
           |  AND value <= 10 + 150
           |  AND user_id = c_custkey
           |  AND event_type = 'signup'""".stripMargin, sink)
        .orderBy(col("customer_id"))
    }),

    // q91.sql:23-45 — GROUP BY carries two columns that are NOT in the
    // projection (duplicate visible keys in the output), OR-of-AND dim
    // pair filter, LIKE prefix filter, agg-DESC order.
    "q_sql_q91" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq91_$u/t"
      runPorted(s,
        s"""${header("g_q91_job", s"/tmp/graft_sqlq91ck_$u")}
           |DROP TABLE IF EXISTS g_q91_lineitem;
           |CREATE TABLE g_q91_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q91_orders;
           |CREATE TABLE g_q91_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q91_customer;
           |CREATE TABLE g_q91_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q91_supplier;
           |CREATE TABLE g_q91_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q91_nation;
           |CREATE TABLE g_q91_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q91_sink;
           |CREATE TABLE g_q91_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"center": {"type": "string"}, "returns_loss": {"type": "double"}}}');
           |INSERT INTO g_q91_sink
           |SELECT
           |  s_name center,
           |  round(sum(l_extendedprice), 2) returns_loss
           |FROM
           |  g_q91_supplier, g_q91_lineitem, g_q91_orders, g_q91_customer, g_q91_nation
           |WHERE
           |  l_suppkey = s_suppkey
           |    AND l_orderkey = o_orderkey
           |    AND o_custkey = c_custkey
           |    AND c_nationkey = n_nationkey
           |    AND year(o_orderdate) = 1996
           |    AND month(o_orderdate) = 11
           |    AND ((c_mktsegment = 'BUILDING' AND o_orderstatus = 'F')
           |    OR (c_mktsegment = 'MACHINERY' AND o_orderstatus = 'O'))
           |    AND n_name LIKE 'NATION_1%'
           |    AND c_acctbal > -500
           |GROUP BY s_name, c_mktsegment, o_orderstatus
           |ORDER BY sum(l_extendedprice) DESC""".stripMargin, sink)
        .orderBy(col("center"), col("returns_loss"))
    }),

    // q96.sql:23-32 — bare global count(*) under time-of-day predicates,
    // ORDER BY the aggregate.
    "q_sql_q96" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq96_$u/t"
      runPorted(s,
        s"""${header("g_q96_job", s"/tmp/graft_sqlq96ck_$u")}
           |DROP TABLE IF EXISTS g_q96_events;
           |CREATE TABLE g_q96_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q96_customer;
           |CREATE TABLE g_q96_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q96_sink;
           |CREATE TABLE g_q96_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"cnt": {"type": "bigint"}}}');
           |INSERT INTO g_q96_sink
           |SELECT CAST(count(*) AS BIGINT) cnt
           |FROM g_q96_events, g_q96_customer
           |WHERE user_id = c_custkey
           |  AND hour(ts) = 20
           |  AND minute(ts) >= 30
           |  AND c_mktsegment = 'BUILDING'
           |ORDER BY count(*)""".stripMargin, sink)
        .orderBy(col("cnt"))
    }),

    // q103.sql:12-33 — streaming CTAS: CREATE TABLE ... USING <sink>
    // OPTIONS (output.mode 'append') AS SELECT, with TUMBLING + delay()
    // directly in the GROUP BY (window not projected). The CTAS executes
    // as catalog createTable + an AppendData the post-hoc rule rewrites
    // into the same streaming insert as the INSERT INTO form.
    "q_sql_q103" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq103_$u/t"
      runPorted(s,
        s"""${header("g_q103_job", s"/tmp/graft_sqlq103ck_$u")}
           |DROP TABLE IF EXISTS g_q103_events;
           |CREATE TABLE g_q103_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q103_customer;
           |CREATE TABLE g_q103_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q103_sink;
           |CREATE TABLE g_q103_sink
           |USING kv
           |OPTIONS (
           |path '$sink',
           |output.mode 'append') AS
           |SELECT
           |  CAST(c_nationkey AS BIGINT) brand_id,
           |  c_mktsegment brand,
           |  round(sum(value), 2) ext_price
           |FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, value
           |      FROM g_q103_events), g_q103_customer
           |WHERE user_id = c_custkey
           |  AND c_acctbal > 0
           |  AND delay(ts) < '2 minutes'
           |GROUP BY TUMBLING(ts, interval 1 minute), c_mktsegment, c_nationkey""".stripMargin, sink)
        .orderBy(col("brand_id"), col("brand"), col("ext_price"))
    }),

    // q99.sql:23-55 — day-difference bucket pivot over the customer dim
    // chain (whole-name substr group key).
    "q_sql_q99" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq99_$u/t"
      runPorted(s,
        s"""${header("g_q99_job", s"/tmp/graft_sqlq99ck_$u")}
           |DROP TABLE IF EXISTS g_q99_lineitem;
           |CREATE TABLE g_q99_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q99_orders;
           |CREATE TABLE g_q99_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q99_customer;
           |CREATE TABLE g_q99_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q99_sink;
           |CREATE TABLE g_q99_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"wh": {"type": "string"}, "sm_type": {"type": "string"}, "cc_name": {"type": "string"}, "30_days": {"type": "bigint"}, "31_60_days": {"type": "bigint"}, "61_90_days": {"type": "bigint"}, "91_120_days": {"type": "bigint"}, "over_120_days": {"type": "bigint"}}}');
           |INSERT INTO g_q99_sink
           |SELECT
           |  substr(c_name, 1, 20) wh,
           |  o_orderstatus sm_type,
           |  c_mktsegment cc_name,
           |  CAST(sum(CASE WHEN (datediff(l_shipdate, o_orderdate) <= 30)
           |    THEN 1
           |      ELSE 0 END) AS BIGINT) AS `30_days`,
           |  CAST(sum(CASE WHEN (datediff(l_shipdate, o_orderdate) > 30) AND
           |    (datediff(l_shipdate, o_orderdate) <= 60)
           |    THEN 1
           |      ELSE 0 END) AS BIGINT) AS `31_60_days`,
           |  CAST(sum(CASE WHEN (datediff(l_shipdate, o_orderdate) > 60) AND
           |    (datediff(l_shipdate, o_orderdate) <= 90)
           |    THEN 1
           |      ELSE 0 END) AS BIGINT) AS `61_90_days`,
           |  CAST(sum(CASE WHEN (datediff(l_shipdate, o_orderdate) > 90) AND
           |    (datediff(l_shipdate, o_orderdate) <= 120)
           |    THEN 1
           |      ELSE 0 END) AS BIGINT) AS `91_120_days`,
           |  CAST(sum(CASE WHEN (datediff(l_shipdate, o_orderdate) > 120)
           |    THEN 1
           |      ELSE 0 END) AS BIGINT) AS `over_120_days`
           |FROM
           |  g_q99_lineitem, g_q99_orders, g_q99_customer
           |WHERE
           |  year(l_shipdate) BETWEEN 1997 AND 1998
           |    AND l_orderkey = o_orderkey
           |    AND o_custkey = c_custkey
           |GROUP BY
           |  substr(c_name, 1, 20), o_orderstatus, c_mktsegment
           |ORDER BY substr(c_name, 1, 20), sm_type, cc_name""".stripMargin, sink)
        .orderBy(col("wh"), col("sm_type"), col("cc_name"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_sql_q73" ->
      """SELECT c_name, c_mktsegment, c_acctbal, ticket, cnt
        |FROM
        |  (SELECT l_orderkey AS ticket, o_custkey AS cust_sk,
        |     CAST(count(*) AS BIGINT) AS cnt
        |   FROM lineitem, orders, supplier, nation
        |   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |     AND s_nationkey = n_nationkey
        |     AND day(o_orderdate) BETWEEN 1 AND 2
        |     AND (s_acctbal > 1000 OR s_acctbal < 600)
        |     AND s_suppkey >= 0
        |     AND CASE WHEN s_nationkey > 0 THEN s_acctbal / s_nationkey
        |         ELSE NULL END > 1
        |     AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
        |     AND n_name IN ('NATION_3', 'NATION_12', 'NATION_21', 'NATION_19')
        |   GROUP BY l_orderkey, o_custkey) dj, customer
        |WHERE cust_sk = c_custkey
        |  AND cnt BETWEEN 1 AND 5
        |ORDER BY ticket""".stripMargin,

    "q_sql_q76" ->
      """SELECT channel, col_name, d_year, d_qoy, category,
        |  CAST(COUNT(*) AS BIGINT) AS sales_cnt,
        |  round(SUM(ext_sales_price), 2) AS sales_amt
        |FROM (
        |  SELECT 'store' AS channel, CAST(nullif(l_linenumber, 1) AS BIGINT) AS col_name,
        |    CAST(year(o_orderdate) AS BIGINT) AS d_year,
        |    CAST(quarter(o_orderdate) AS BIGINT) AS d_qoy,
        |    p_type AS category, l_extendedprice AS ext_sales_price
        |  FROM lineitem, part, orders
        |  WHERE nullif(l_linenumber, 1) IS NULL
        |    AND l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'web' AS channel, CAST(nullif(l_linenumber, 2) AS BIGINT) AS col_name,
        |    CAST(year(o_orderdate) AS BIGINT) AS d_year,
        |    CAST(quarter(o_orderdate) AS BIGINT) AS d_qoy,
        |    p_type AS category, l_extendedprice AS ext_sales_price
        |  FROM lineitem, part, orders
        |  WHERE nullif(l_linenumber, 2) IS NULL
        |    AND l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'catalog' AS channel, CAST(nullif(l_linenumber, 3) AS BIGINT) AS col_name,
        |    CAST(year(o_orderdate) AS BIGINT) AS d_year,
        |    CAST(quarter(o_orderdate) AS BIGINT) AS d_qoy,
        |    p_type AS category, l_extendedprice AS ext_sales_price
        |  FROM lineitem, part, orders
        |  WHERE nullif(l_linenumber, 3) IS NULL
        |    AND l_orderkey = o_orderkey AND l_partkey = p_partkey) foo
        |GROUP BY channel, col_name, d_year, d_qoy, category
        |ORDER BY channel, col_name NULLS FIRST, d_year, d_qoy, category""".stripMargin,

    "q_sql_q79" ->
      """SELECT c_name AS cust_name, substr(s_name, 1, 30) AS store,
        |  ticket, amt, profit
        |FROM
        |  (SELECT l_orderkey AS ticket, o_custkey AS cust_sk, s_name,
        |     round(sum(l_discount), 2) AS amt, round(sum(l_tax), 2) AS profit
        |   FROM lineitem, orders, supplier
        |   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |     AND (s_acctbal > 3000 OR s_suppkey > 5)
        |     AND day(o_orderdate) = 1
        |     AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
        |     AND s_suppkey BETWEEN 2 AND 9
        |   GROUP BY l_orderkey, o_custkey, l_suppkey, s_name) ms, customer
        |WHERE cust_sk = c_custkey
        |ORDER BY cust_name, store, ticket, amt, profit""".stripMargin,

    "q_sql_q84" ->
      """SELECT c_name AS customer_id, concat(c_name, ', ', n_name) AS customername
        |FROM customer, nation, events
        |WHERE n_name = 'NATION_2'
        |  AND c_nationkey = n_nationkey
        |  AND value >= 10
        |  AND value <= 10 + 150
        |  AND user_id = c_custkey
        |  AND event_type = 'signup'
        |ORDER BY customer_id""".stripMargin,

    "q_sql_q91" ->
      """SELECT s_name AS center, round(sum(l_extendedprice), 2) AS returns_loss
        |FROM supplier, lineitem, orders, customer, nation
        |WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        |  AND year(o_orderdate) = 1996 AND month(o_orderdate) = 11
        |  AND ((c_mktsegment = 'BUILDING' AND o_orderstatus = 'F')
        |    OR (c_mktsegment = 'MACHINERY' AND o_orderstatus = 'O'))
        |  AND n_name LIKE 'NATION_1%'
        |  AND c_acctbal > -500
        |GROUP BY s_name, c_mktsegment, o_orderstatus
        |ORDER BY center, returns_loss""".stripMargin,

    "q_sql_q96" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt
        |FROM events, customer
        |WHERE user_id = c_custkey
        |  AND hour(ts) = 20
        |  AND minute(ts) >= 30
        |  AND c_mktsegment = 'BUILDING'""".stripMargin,

    // Same emission rule as q_sql_q102: a window's rows are in the sink
    // iff window_end <= floor_ms(max event time over ALL events) - 2 min
    // (the watermark sits on the events leg, below the dim join).
    "q_sql_q103" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS brand_id, c_mktsegment AS brand,
        |  round(sum(value), 2) AS ext_price
        |FROM events e, customer
        |WHERE user_id = c_custkey
        |  AND c_acctbal > 0
        |  AND (CAST(epoch(time_bucket(INTERVAL 60 SECOND, e.ts)) AS BIGINT) + 60) * 1000
        |      <= (SELECT epoch_ms(max(ts)) - 120000 FROM events)
        |GROUP BY time_bucket(INTERVAL 60 SECOND, e.ts), c_nationkey, c_mktsegment
        |ORDER BY brand_id, brand, ext_price""".stripMargin,

    "q_sql_q99" ->
      """SELECT substr(c_name, 1, 20) AS wh, o_orderstatus AS sm_type, c_mktsegment AS cc_name,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "30_days",
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30
        |    AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 60
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "31_60_days",
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
        |    AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "61_90_days",
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
        |    AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 120
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "91_120_days",
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 120
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "over_120_days"
        |FROM lineitem, orders, customer
        |WHERE year(l_shipdate) BETWEEN 1997 AND 1998
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
  )
}
