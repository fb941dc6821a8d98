package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference SQL-text corpus, continued (files 20–27 of 34; see
  * [[SqlCorpus]] for the porting contract).
  *
  * Shapes proven here (reference `emr-baseline-testing/queries/`):
  *  - q27.sql → ROLLUP + grouping() projected as a column
  *  - q42.sql → star agg ordered by the aggregate DESC
  *  - q43.sql → day-name CASE pivot (NULL-else sums)
  *  - q46.sql → derived agg with hidden group columns + the same dim
  *              table joined twice (subquery + outer alias), <> filter
  *  - q52.sql → star agg with an arithmetic (%) group key
  *  - q55.sql → brand agg, DESC + key ordering
  *  - q62.sql → day-difference bucket pivot with backtick-quoted
  *              digit-leading aliases
  *  - q68.sql → q46 shape with a 3-sum battery and day-of-month band
  */
object SqlCorpusC {

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
    // q27.sql:24-43 — two-level ROLLUP with grouping() in the projection,
    // repeated-literal IN list, complete mode.
    "q_sql_q27" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq27_$u/t"
      runPorted(s,
        s"""${header("g_q27_job", s"/tmp/graft_sqlq27ck_$u")}
           |DROP TABLE IF EXISTS g_q27_lineitem;
           |CREATE TABLE g_q27_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q27_orders;
           |CREATE TABLE g_q27_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q27_customer;
           |CREATE TABLE g_q27_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q27_nation;
           |CREATE TABLE g_q27_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q27_part;
           |CREATE TABLE g_q27_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q27_sink;
           |CREATE TABLE g_q27_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"item_id": {"type": "string"}, "state": {"type": "string"}, "g_state": {"type": "bigint"}, "agg1": {"type": "double"}, "agg2": {"type": "double"}, "agg3": {"type": "double"}, "agg4": {"type": "double"}}}');
           |INSERT INTO g_q27_sink
           |SELECT
           |  p_brand item_id,
           |  n_name state,
           |  CAST(grouping(n_name) AS BIGINT) g_state,
           |  round(CAST(avg(cast(l_quantity AS DECIMAL(12, 2))) AS DOUBLE), 4) agg1,
           |  round(CAST(avg(cast(l_extendedprice AS DECIMAL(12, 2))) AS DOUBLE), 4) agg2,
           |  round(CAST(avg(cast(l_discount AS DECIMAL(12, 2))) AS DOUBLE), 4) agg3,
           |  round(CAST(avg(cast(l_tax AS DECIMAL(12, 2))) AS DOUBLE), 4) agg4
           |FROM g_q27_lineitem, g_q27_customer, g_q27_orders, g_q27_nation, g_q27_part
           |WHERE l_orderkey = o_orderkey AND
           |  o_custkey = c_custkey AND
           |  c_nationkey = n_nationkey AND
           |  l_partkey = p_partkey AND
           |  c_mktsegment = 'MACHINERY' AND
           |  year(o_orderdate) = 1997 AND
           |  n_name IN ('NATION_2', 'NATION_2', 'NATION_4', 'NATION_6', 'NATION_8', 'NATION_2')
           |GROUP BY ROLLUP (p_brand, n_name)
           |ORDER BY item_id, state""".stripMargin, sink)
        .orderBy(col("item_id").asc_nulls_first, col("state").asc_nulls_first)
    }),

    // q42.sql:23-39 — star aggregate ordered by the aggregate DESC first.
    "q_sql_q42" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq42_$u/t"
      runPorted(s,
        s"""${header("g_q42_job", s"/tmp/graft_sqlq42ck_$u")}
           |DROP TABLE IF EXISTS g_q42_lineitem;
           |CREATE TABLE g_q42_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q42_orders;
           |CREATE TABLE g_q42_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q42_part;
           |CREATE TABLE g_q42_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q42_sink;
           |CREATE TABLE g_q42_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"d_year": {"type": "bigint"}, "category": {"type": "string"}, "ext_sales": {"type": "double"}}}');
           |INSERT INTO g_q42_sink
           |SELECT
           |  CAST(year(dt.o_orderdate) AS BIGINT) d_year,
           |  item.p_type category,
           |  round(sum(l_extendedprice), 2) ext_sales
           |FROM g_q42_orders dt, g_q42_lineitem, g_q42_part item
           |WHERE dt.o_orderkey = g_q42_lineitem.l_orderkey
           |  AND g_q42_lineitem.l_partkey = item.p_partkey
           |  AND item.p_size = 3
           |  AND month(dt.o_orderdate) = 12
           |GROUP BY year(dt.o_orderdate)
           |  , item.p_type
           |ORDER BY ext_sales DESC, d_year
           |  , category""".stripMargin, sink)
        .orderBy(col("d_year"), col("category"))
    }),

    // q43.sql:23-54 — seven day-name CASE pivot sums with NULL else
    // branches, gmt-offset-style dim filter.
    "q_sql_q43" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq43_$u/t"
      runPorted(s,
        s"""${header("g_q43_job", s"/tmp/graft_sqlq43ck_$u")}
           |DROP TABLE IF EXISTS g_q43_lineitem;
           |CREATE TABLE g_q43_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q43_supplier;
           |CREATE TABLE g_q43_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q43_nation;
           |CREATE TABLE g_q43_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q43_sink;
           |CREATE TABLE g_q43_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"store_name": {"type": "string"}, "store_id": {"type": "bigint"}, "sun_sales": {"type": "double"}, "mon_sales": {"type": "double"}, "tue_sales": {"type": "double"}, "wed_sales": {"type": "double"}, "thu_sales": {"type": "double"}, "fri_sales": {"type": "double"}, "sat_sales": {"type": "double"}}}');
           |INSERT INTO g_q43_sink
           |SELECT
           |  n_name store_name,
           |  CAST(n_nationkey AS BIGINT) store_id,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Sunday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) sun_sales,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Monday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) mon_sales,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Tuesday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) tue_sales,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Wednesday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) wed_sales,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Thursday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) thu_sales,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Friday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) fri_sales,
           |  round(sum(CASE WHEN (date_format(l_shipdate, 'EEEE') = 'Saturday')
           |    THEN l_extendedprice
           |      ELSE NULL END), 2) sat_sales
           |FROM g_q43_lineitem, g_q43_supplier, g_q43_nation
           |WHERE l_suppkey = s_suppkey AND
           |  s_nationkey = n_nationkey AND
           |  s_acctbal > 600 AND
           |  year(l_shipdate) = 1997
           |GROUP BY n_name, n_nationkey
           |ORDER BY store_name, store_id""".stripMargin, sink)
        .orderBy(col("store_name"), col("store_id"))
    }),

    // q46.sql:23-50 — derived agg keeps a hidden group column
    // (l_suppkey), outer join re-uses the SAME dim table under an alias
    // with a <> cross-instance filter.
    "q_sql_q46" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq46_$u/t"
      runPorted(s,
        s"""${header("g_q46_job", s"/tmp/graft_sqlq46ck_$u")}
           |DROP TABLE IF EXISTS g_q46_lineitem;
           |CREATE TABLE g_q46_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q46_orders;
           |CREATE TABLE g_q46_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q46_customer;
           |CREATE TABLE g_q46_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q46_supplier;
           |CREATE TABLE g_q46_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q46_nation;
           |CREATE TABLE g_q46_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q46_sink;
           |CREATE TABLE g_q46_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"cust_name": {"type": "string"}, "cur_nation": {"type": "string"}, "bought_nation": {"type": "string"}, "ticket": {"type": "bigint"}, "amt": {"type": "double"}, "profit": {"type": "double"}}}');
           |INSERT INTO g_q46_sink
           |SELECT
           |  c_name cust_name,
           |  cur.n_name cur_nation,
           |  bought_nation,
           |  ticket,
           |  amt,
           |  profit
           |FROM
           |  (SELECT
           |    l_orderkey ticket,
           |    o_custkey cust_sk,
           |    n_name bought_nation,
           |    round(sum(l_discount), 2) amt,
           |    round(sum(l_tax), 2) profit
           |  FROM g_q46_lineitem, g_q46_orders, g_q46_supplier, g_q46_nation
           |  WHERE g_q46_lineitem.l_orderkey = g_q46_orders.o_orderkey
           |    AND g_q46_lineitem.l_suppkey = g_q46_supplier.s_suppkey
           |    AND g_q46_supplier.s_nationkey = g_q46_nation.n_nationkey
           |    AND (o_orderpriority = '2-HIGH' OR
           |    o_orderpriority = '3-MEDIUM')
           |    AND day(o_orderdate) IN (6, 10)
           |    AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
           |  GROUP BY l_orderkey, o_custkey, l_suppkey, n_name) dn, g_q46_customer,
           |  g_q46_nation cur
           |WHERE cust_sk = c_custkey
           |  AND c_nationkey = cur.n_nationkey
           |  AND cur.n_name <> bought_nation
           |ORDER BY cust_name, cur_nation, bought_nation, ticket""".stripMargin, sink)
        .orderBy(col("cust_name"), col("cur_nation"), col("bought_nation"),
          col("ticket"), col("amt"), col("profit"))
    }),

    // q52.sql:23-38 — star agg with an arithmetic (%) group key expression.
    "q_sql_q52" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq52_$u/t"
      runPorted(s,
        s"""${header("g_q52_job", s"/tmp/graft_sqlq52ck_$u")}
           |DROP TABLE IF EXISTS g_q52_lineitem;
           |CREATE TABLE g_q52_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q52_orders;
           |CREATE TABLE g_q52_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q52_part;
           |CREATE TABLE g_q52_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q52_sink;
           |CREATE TABLE g_q52_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"d_year": {"type": "bigint"}, "brand_id": {"type": "bigint"}, "brand": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q52_sink
           |SELECT
           |  CAST(year(dt.o_orderdate) AS BIGINT) d_year,
           |  CAST(item.p_partkey % 10 AS BIGINT) brand_id,
           |  item.p_brand brand,
           |  round(sum(l_extendedprice), 2) ext_price
           |FROM g_q52_orders dt, g_q52_lineitem, g_q52_part item
           |WHERE dt.o_orderkey = g_q52_lineitem.l_orderkey
           |  AND g_q52_lineitem.l_partkey = item.p_partkey
           |  AND item.p_size BETWEEN 1 AND 5
           |  AND month(dt.o_orderdate) = 11
           |  AND year(dt.o_orderdate) = 1997
           |GROUP BY year(dt.o_orderdate), item.p_brand, item.p_partkey % 10
           |ORDER BY d_year, ext_price DESC, brand_id""".stripMargin, sink)
        .orderBy(col("d_year"), col("brand_id"), col("brand"), col("ext_price"))
    }),

    // q55.sql:23-35 — brand aggregate, aggregate-DESC then key ordering.
    "q_sql_q55" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq55_$u/t"
      runPorted(s,
        s"""${header("g_q55_job", s"/tmp/graft_sqlq55ck_$u")}
           |DROP TABLE IF EXISTS g_q55_lineitem;
           |CREATE TABLE g_q55_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q55_orders;
           |CREATE TABLE g_q55_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q55_part;
           |CREATE TABLE g_q55_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q55_sink;
           |CREATE TABLE g_q55_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"brand_id": {"type": "bigint"}, "brand": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q55_sink
           |SELECT
           |  CAST(p_size AS BIGINT) brand_id,
           |  p_brand brand,
           |  round(sum(l_extendedprice), 2) ext_price
           |FROM g_q55_orders, g_q55_lineitem, g_q55_part
           |WHERE o_orderkey = l_orderkey
           |  AND l_partkey = p_partkey
           |  AND p_size BETWEEN 20 AND 28
           |  AND month(o_orderdate) = 11
           |  AND year(o_orderdate) = 1995
           |GROUP BY p_brand, p_size
           |ORDER BY ext_price DESC, brand_id""".stripMargin, sink)
        .orderBy(col("brand_id"), col("brand"))
    }),

    // q62.sql:23-55 — five day-difference buckets as CASE pivot sums with
    // backtick-quoted digit-leading aliases, 2-year ship window.
    "q_sql_q62" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq62_$u/t"
      runPorted(s,
        s"""${header("g_q62_job", s"/tmp/graft_sqlq62ck_$u")}
           |DROP TABLE IF EXISTS g_q62_lineitem;
           |CREATE TABLE g_q62_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q62_orders;
           |CREATE TABLE g_q62_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q62_supplier;
           |CREATE TABLE g_q62_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q62_nation;
           |CREATE TABLE g_q62_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q62_sink;
           |CREATE TABLE g_q62_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"wh": {"type": "string"}, "sm_type": {"type": "string"}, "web_name": {"type": "string"}, "30_days": {"type": "bigint"}, "31_60_days": {"type": "bigint"}, "61_90_days": {"type": "bigint"}, "91_120_days": {"type": "bigint"}, "over_120_days": {"type": "bigint"}}}');
           |INSERT INTO g_q62_sink
           |SELECT
           |  substr(s_name, 1, 20) wh,
           |  o_orderpriority sm_type,
           |  n_name web_name,
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
           |  g_q62_lineitem, g_q62_supplier, g_q62_orders, g_q62_nation
           |WHERE
           |  year(l_shipdate) BETWEEN 1996 AND 1997
           |    AND l_orderkey = o_orderkey
           |    AND l_suppkey = s_suppkey
           |    AND s_nationkey = n_nationkey
           |GROUP BY
           |  substr(s_name, 1, 20), o_orderpriority, n_name
           |ORDER BY
           |  substr(s_name, 1, 20), sm_type, web_name""".stripMargin, sink)
        .orderBy(col("wh"), col("sm_type"), col("web_name"))
    }),

    // q68.sql:23-56 — q46 shape with a 3-sum battery, day-of-month band,
    // 2-value dim IN list.
    "q_sql_q68" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq68_$u/t"
      runPorted(s,
        s"""${header("g_q68_job", s"/tmp/graft_sqlq68ck_$u")}
           |DROP TABLE IF EXISTS g_q68_lineitem;
           |CREATE TABLE g_q68_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q68_orders;
           |CREATE TABLE g_q68_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q68_customer;
           |CREATE TABLE g_q68_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q68_supplier;
           |CREATE TABLE g_q68_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q68_nation;
           |CREATE TABLE g_q68_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q68_sink;
           |CREATE TABLE g_q68_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"cust_name": {"type": "string"}, "cur_nation": {"type": "string"}, "bought_nation": {"type": "string"}, "ticket": {"type": "bigint"}, "extended_price": {"type": "double"}, "extended_tax": {"type": "double"}, "list_price": {"type": "double"}}}');
           |INSERT INTO g_q68_sink
           |SELECT
           |  c_name cust_name,
           |  cur.n_name cur_nation,
           |  bought_nation,
           |  ticket,
           |  extended_price,
           |  extended_tax,
           |  list_price
           |FROM (SELECT
           |  l_orderkey ticket,
           |  o_custkey cust_sk,
           |  n_name bought_nation,
           |  round(sum(l_extendedprice), 2) extended_price,
           |  round(sum(l_quantity), 2) list_price,
           |  round(sum(l_tax), 2) extended_tax
           |FROM g_q68_lineitem, g_q68_orders, g_q68_supplier, g_q68_nation
           |WHERE g_q68_lineitem.l_orderkey = g_q68_orders.o_orderkey
           |  AND g_q68_lineitem.l_suppkey = g_q68_supplier.s_suppkey
           |  AND g_q68_supplier.s_nationkey = g_q68_nation.n_nationkey
           |  AND day(o_orderdate) BETWEEN 1 AND 2
           |  AND (s_acctbal > 2000 OR
           |  s_suppkey = 3)
           |  AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
           |  AND n_name IN ('NATION_3', 'NATION_19')
           |GROUP BY l_orderkey, o_custkey, l_suppkey, n_name) dn,
           |  g_q68_customer,
           |  g_q68_nation cur
           |WHERE cust_sk = c_custkey
           |  AND c_nationkey = cur.n_nationkey
           |  AND cur.n_name <> bought_nation
           |ORDER BY cust_name, ticket""".stripMargin, sink)
        .orderBy(col("cust_name"), col("ticket"), col("bought_nation"),
          col("cur_nation"), col("extended_price"), col("extended_tax"), col("list_price"))
    }),
  )

  def oracles: Map[String, String] = Map(
    // Decimal-avg replay (see [[DecAvg]]) — float-order-independent.
    "q_sql_q27" ->
      s"""WITH g AS (
         |  SELECT p_brand AS item_id, n_name AS state,
         |    CAST(grouping(n_name) AS BIGINT) AS g_state,
         |    ${DecAvg.centsSum("l_quantity")} AS s1,
         |    ${DecAvg.centsSum("l_extendedprice")} AS s2,
         |    ${DecAvg.centsSum("l_discount")} AS s3,
         |    ${DecAvg.centsSum("l_tax")} AS s4,
         |    count(*) AS n
         |  FROM lineitem, customer, orders, nation, part
         |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n_nationkey AND l_partkey = p_partkey
         |    AND c_mktsegment = 'MACHINERY' AND year(o_orderdate) = 1997
         |    AND n_name IN ('NATION_2', 'NATION_2', 'NATION_4', 'NATION_6', 'NATION_8', 'NATION_2')
         |  GROUP BY ROLLUP (p_brand, n_name))
         |SELECT item_id, state, g_state,
         |  ${DecAvg.sparkAvg("s1", "n")} AS agg1,
         |  ${DecAvg.sparkAvg("s2", "n")} AS agg2,
         |  ${DecAvg.sparkAvg("s3", "n")} AS agg3,
         |  ${DecAvg.sparkAvg("s4", "n")} AS agg4
         |FROM g
         |ORDER BY item_id NULLS FIRST, state NULLS FIRST""".stripMargin,

    "q_sql_q42" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS d_year, p_type AS category,
        |  round(sum(l_extendedprice), 2) AS ext_sales
        |FROM orders, lineitem, part
        |WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
        |  AND p_size = 3 AND month(o_orderdate) = 12
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_sql_q43" ->
      """SELECT n_name AS store_name, CAST(n_nationkey AS BIGINT) AS store_id,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Sunday' THEN l_extendedprice ELSE NULL END), 2) AS sun_sales,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Monday' THEN l_extendedprice ELSE NULL END), 2) AS mon_sales,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Tuesday' THEN l_extendedprice ELSE NULL END), 2) AS tue_sales,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Wednesday' THEN l_extendedprice ELSE NULL END), 2) AS wed_sales,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Thursday' THEN l_extendedprice ELSE NULL END), 2) AS thu_sales,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Friday' THEN l_extendedprice ELSE NULL END), 2) AS fri_sales,
        |  round(sum(CASE WHEN dayname(l_shipdate) = 'Saturday' THEN l_extendedprice ELSE NULL END), 2) AS sat_sales
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND s_acctbal > 600 AND year(l_shipdate) = 1997
        |GROUP BY n_name, n_nationkey
        |ORDER BY store_name, store_id""".stripMargin,

    "q_sql_q46" ->
      """SELECT c_name AS cust_name, cur.n_name AS cur_nation, bought_nation,
        |  ticket, amt, profit
        |FROM
        |  (SELECT l_orderkey AS ticket, o_custkey AS cust_sk, n_name AS bought_nation,
        |     round(sum(l_discount), 2) AS amt, round(sum(l_tax), 2) AS profit
        |   FROM lineitem, orders, supplier, nation
        |   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |     AND s_nationkey = n_nationkey
        |     AND (o_orderpriority = '2-HIGH' OR o_orderpriority = '3-MEDIUM')
        |     AND day(o_orderdate) IN (6, 10)
        |     AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
        |   GROUP BY l_orderkey, o_custkey, l_suppkey, n_name) dn, customer, nation cur
        |WHERE cust_sk = c_custkey AND c_nationkey = cur.n_nationkey
        |  AND cur.n_name <> bought_nation
        |ORDER BY cust_name, cur_nation, bought_nation, ticket, amt, profit""".stripMargin,

    "q_sql_q52" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS d_year,
        |  CAST(p_partkey % 10 AS BIGINT) AS brand_id, p_brand AS brand,
        |  round(sum(l_extendedprice), 2) AS ext_price
        |FROM orders, lineitem, part
        |WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
        |  AND p_size BETWEEN 1 AND 5 AND month(o_orderdate) = 11 AND year(o_orderdate) = 1997
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q_sql_q55" ->
      """SELECT CAST(p_size AS BIGINT) AS brand_id, p_brand AS brand,
        |  round(sum(l_extendedprice), 2) AS ext_price
        |FROM orders, lineitem, part
        |WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
        |  AND p_size BETWEEN 20 AND 28
        |  AND month(o_orderdate) = 11 AND year(o_orderdate) = 1995
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_sql_q62" ->
      """SELECT substr(s_name, 1, 20) AS wh, o_orderpriority AS sm_type, n_name AS web_name,
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
        |FROM lineitem, supplier, orders, nation
        |WHERE year(l_shipdate) BETWEEN 1996 AND 1997
        |  AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_sql_q68" ->
      """SELECT c_name AS cust_name, cur.n_name AS cur_nation, bought_nation,
        |  ticket, extended_price, extended_tax, list_price
        |FROM (SELECT
        |    l_orderkey AS ticket, o_custkey AS cust_sk, n_name AS bought_nation,
        |    round(sum(l_extendedprice), 2) AS extended_price,
        |    round(sum(l_quantity), 2) AS list_price,
        |    round(sum(l_tax), 2) AS extended_tax
        |  FROM lineitem, orders, supplier, nation
        |  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |    AND s_nationkey = n_nationkey
        |    AND day(o_orderdate) BETWEEN 1 AND 2
        |    AND (s_acctbal > 2000 OR s_suppkey = 3)
        |    AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
        |    AND n_name IN ('NATION_3', 'NATION_19')
        |  GROUP BY l_orderkey, o_custkey, l_suppkey, n_name) dn, customer, nation cur
        |WHERE cust_sk = c_custkey AND c_nationkey = cur.n_nationkey
        |  AND cur.n_name <> bought_nation
        |ORDER BY cust_name, ticket, bought_nation, cur_nation,
        |  extended_price, extended_tax, list_price""".stripMargin,
  )
}
