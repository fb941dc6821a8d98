package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference SQL-text corpus, continued (files 11–19 of 34; see
  * [[SqlCorpus]] for the porting contract). Each entry is a full
  * multi-statement script — CREATE DATABASE/USE, SET conventions,
  * CREATE TABLE USING log/kv with `output.mode`, INSERT INTO — run
  * through `GraftSql.runScript` only, with an exact DuckDB oracle.
  *
  * Shapes proven here (reference `emr-baseline-testing/queries/`):
  *  - q6.sql   → uncorrelated DISTINCT scalar subquery + correlated
  *               scalar subquery (per-group avg) + HAVING
  *  - q7.sql   → 5-way star join, 4-avg battery
  *  - q13.sql  → global (no GROUP BY) avg/sum battery under two
  *               OR-of-AND blocks
  *  - q15.sql  → OR across substr-IN / dim-IN / fact-range predicates
  *  - q19.sql  → substr(dim1) <> substr(dim2) cross-dimension
  *               inequality predicate
  *  - q21.sql  → date ± INTERVAL window, before/after CASE pivot,
  *               outer CASE-ratio BETWEEN filter over the agg subquery
  *  - q22.sql  → 4-column ROLLUP, agg-first ORDER BY
  *  - q26.sql  → 5-way join avg battery over a second dim chain
  *               (nation→region)
  *  - q34.sql  → derived-table streaming agg joined to a dim AFTER
  *               aggregation, HAVING-like cnt BETWEEN, CASE-ratio
  */
/** DuckDB replay of Spark's `round(CAST(avg(cast(c AS DECIMAL(12,2))) AS
  * DOUBLE), 4)`: Spark's decimal avg is the exact sum/count HALF_UP'd at
  * 6dp (DECIMAL(16,6)), then round(double, 4) HALF_UPs the shortest
  * decimal representation — both replayed in HUGEINT integer math on the
  * exact cents sum, making the gate independent of float summation order
  * (a plain double avg can land on either side of a .00005 boundary
  * depending on shuffle merge order). Same scheme as the q18 oracle.
  */
private[queries] object DecAvg {
  def halfUp(num: String, den: String): String =
    s"(CASE WHEN $num >= 0 THEN (2 * ($num) + $den) // (2 * ($den)) " +
      s"ELSE -((2 * (-($num)) + $den) // (2 * ($den))) END)"
  /** s = HUGEINT cents-sum expression, n = count expression → double. */
  def sparkAvg(s: String, n: String): String = {
    val v6 = halfUp(s"$s * 10000", n)
    val v4 = halfUp(v6, "100")
    s"CAST($v4 AS DOUBLE) / 10000.0"
  }
  /** The cents-sum aggregate for column c. */
  def centsSum(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(12, 2))) * 100 AS HUGEINT)"
}

object SqlCorpusB {
  import DecAvg.{centsSum, sparkAvg}

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
    // q6.sql:24-41 — per-state count with an uncorrelated DISTINCT scalar
    // subquery (month lookup) and a correlated scalar subquery (price vs
    // 1.005× the per-type average), HAVING count >= 10, complete mode.
    "q_sql_q6" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq6_$u/t"
      runPorted(s,
        s"""${header("g_q6_job", s"/tmp/graft_sqlq6ck_$u")}
           |DROP TABLE IF EXISTS g_q6_lineitem;
           |CREATE TABLE g_q6_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q6_orders;
           |CREATE TABLE g_q6_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q6_customer;
           |CREATE TABLE g_q6_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q6_nation;
           |CREATE TABLE g_q6_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q6_part;
           |CREATE TABLE g_q6_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q6_sink;
           |CREATE TABLE g_q6_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"state": {"type": "string"}, "cnt": {"type": "bigint"}}}');
           |INSERT INTO g_q6_sink
           |SELECT
           |  a.n_name state,
           |  CAST(count(*) AS BIGINT) cnt
           |FROM
           |  g_q6_nation a, g_q6_customer c, g_q6_lineitem s, g_q6_orders d, g_q6_part i
           |WHERE a.n_nationkey = c.c_nationkey
           |  AND c.c_custkey = d.o_custkey
           |  AND d.o_orderkey = s.l_orderkey
           |  AND s.l_partkey = i.p_partkey
           |  AND quarter(d.o_orderdate) =
           |  (SELECT DISTINCT (quarter(o_orderdate))
           |  FROM g_q6_orders
           |  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2)
           |  AND i.p_retailprice > 1.005 *
           |  (SELECT avg(j.p_retailprice)
           |  FROM g_q6_part j
           |  WHERE j.p_type = i.p_type)
           |GROUP BY a.n_name
           |HAVING count(*) >= 10
           |ORDER BY cnt""".stripMargin, sink)
        .orderBy(col("state"))
    }),

    // q7.sql:24-41 — 5-way star join, four-avg battery, complete mode.
    "q_sql_q7" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq7_$u/t"
      runPorted(s,
        s"""${header("g_q7_job", s"/tmp/graft_sqlq7ck_$u")}
           |DROP TABLE IF EXISTS g_q7_lineitem;
           |CREATE TABLE g_q7_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q7_orders;
           |CREATE TABLE g_q7_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q7_customer;
           |CREATE TABLE g_q7_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q7_part;
           |CREATE TABLE g_q7_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q7_supplier;
           |CREATE TABLE g_q7_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q7_sink;
           |CREATE TABLE g_q7_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"item_id": {"type": "string"}, "agg1": {"type": "double"}, "agg2": {"type": "double"}, "agg3": {"type": "double"}, "agg4": {"type": "double"}}}');
           |INSERT INTO g_q7_sink
           |SELECT
           |  p_brand item_id,
           |  round(CAST(avg(cast(l_quantity AS DECIMAL(12, 2))) AS DOUBLE), 4) agg1,
           |  round(CAST(avg(cast(l_extendedprice AS DECIMAL(12, 2))) AS DOUBLE), 4) agg2,
           |  round(CAST(avg(cast(l_discount AS DECIMAL(12, 2))) AS DOUBLE), 4) agg3,
           |  round(CAST(avg(cast(l_tax AS DECIMAL(12, 2))) AS DOUBLE), 4) agg4
           |FROM g_q7_lineitem, g_q7_customer, g_q7_orders, g_q7_part, g_q7_supplier
           |WHERE l_orderkey = o_orderkey AND
           |  o_custkey = c_custkey AND
           |  l_partkey = p_partkey AND
           |  l_suppkey = s_suppkey AND
           |  c_mktsegment = 'BUILDING' AND
           |  (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH') AND
           |  year(o_orderdate) = 1996
           |GROUP BY p_brand
           |ORDER BY item_id""".stripMargin, sink)
        .orderBy(col("item_id"))
    }),

    // q13.sql:24-68 — global avg/avg/avg/sum battery (no GROUP BY) under
    // two OR-of-AND predicate blocks mixing join keys with ranges.
    "q_sql_q13" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq13_$u/t"
      runPorted(s,
        s"""${header("g_q13_job", s"/tmp/graft_sqlq13ck_$u")}
           |DROP TABLE IF EXISTS g_q13_lineitem;
           |CREATE TABLE g_q13_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q13_orders;
           |CREATE TABLE g_q13_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q13_customer;
           |CREATE TABLE g_q13_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q13_nation;
           |CREATE TABLE g_q13_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q13_supplier;
           |CREATE TABLE g_q13_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q13_sink;
           |CREATE TABLE g_q13_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"agg1": {"type": "double"}, "agg2": {"type": "double"}, "agg3": {"type": "double"}, "agg4": {"type": "double"}}}');
           |INSERT INTO g_q13_sink
           |SELECT
           |  round(CAST(avg(cast(l_quantity AS DECIMAL(12, 2))) AS DOUBLE), 4) agg1,
           |  round(CAST(avg(cast(l_extendedprice AS DECIMAL(12, 2))) AS DOUBLE), 4) agg2,
           |  round(CAST(avg(cast(l_tax AS DECIMAL(12, 2))) AS DOUBLE), 4) agg3,
           |  round(sum(l_tax), 2) agg4
           |FROM g_q13_lineitem
           |  , g_q13_supplier
           |  , g_q13_customer
           |  , g_q13_nation
           |  , g_q13_orders
           |WHERE s_suppkey = l_suppkey
           |  AND l_orderkey = o_orderkey AND year(o_orderdate) = 1996
           |  AND ((o_custkey = c_custkey
           |  AND c_mktsegment = 'BUILDING'
           |  AND l_extendedprice BETWEEN 100.00 AND 15000.00
           |  AND c_acctbal > 0
           |) OR
           |  (o_custkey = c_custkey
           |    AND c_mktsegment = 'AUTOMOBILE'
           |    AND l_extendedprice BETWEEN 50.00 AND 10000.00
           |    AND c_acctbal > 1000
           |  ) OR
           |  (o_custkey = c_custkey
           |    AND c_mktsegment = 'MACHINERY'
           |    AND l_extendedprice BETWEEN 150.00 AND 20000.00
           |    AND c_acctbal > 2000
           |  ))
           |  AND ((c_nationkey = n_nationkey
           |  AND n_name IN ('NATION_1', 'NATION_3', 'NATION_1')
           |  AND l_discount BETWEEN 0.01 AND 0.02
           |) OR
           |  (c_nationkey = n_nationkey
           |    AND n_name IN ('NATION_5', 'NATION_7', 'NATION_9')
           |    AND l_discount BETWEEN 0.02 AND 0.03
           |  ) OR
           |  (c_nationkey = n_nationkey
           |    AND n_name IN ('NATION_11', 'NATION_13', 'NATION_15')
           |    AND l_discount BETWEEN 0.01 AND 0.05
           |  ))""".stripMargin, sink)
        .orderBy(col("agg1"))
    }),

    // q15.sql:24-40 — OR across substr-IN-list / dim IN-list / fact range,
    // GROUP BY the substr expression, quarter + year dim filter.
    "q_sql_q15" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq15_$u/t"
      runPorted(s,
        s"""${header("g_q15_job", s"/tmp/graft_sqlq15ck_$u")}
           |DROP TABLE IF EXISTS g_q15_lineitem;
           |CREATE TABLE g_q15_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q15_orders;
           |CREATE TABLE g_q15_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q15_customer;
           |CREATE TABLE g_q15_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q15_sink;
           |CREATE TABLE g_q15_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"zip": {"type": "string"}, "net": {"type": "double"}}}');
           |INSERT INTO g_q15_sink
           |SELECT
           |  substr(c_name, 15, 3) zip,
           |  round(sum(l_extendedprice), 2) net
           |FROM g_q15_lineitem, g_q15_orders, g_q15_customer
           |WHERE l_orderkey = o_orderkey
           |  AND o_custkey = c_custkey
           |  AND (substr(c_name, 15, 3) IN ('000', '001', '012', '123', '055',
           |                                 '101', '144', '077', '033')
           |  OR c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
           |  OR l_extendedprice > 500)
           |  AND quarter(o_orderdate) = 2 AND year(o_orderdate) = 1996
           |GROUP BY substr(c_name, 15, 3)
           |ORDER BY zip""".stripMargin, sink)
        .orderBy(col("zip"))
    }),

    // q19.sql:24-43 — brand aggregate with a substr(dim1) <> substr(dim2)
    // inequality between two dimensions reached through the fact.
    "q_sql_q19" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq19_$u/t"
      runPorted(s,
        s"""${header("g_q19_job", s"/tmp/graft_sqlq19ck_$u")}
           |DROP TABLE IF EXISTS g_q19_lineitem;
           |CREATE TABLE g_q19_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q19_orders;
           |CREATE TABLE g_q19_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q19_customer;
           |CREATE TABLE g_q19_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q19_part;
           |CREATE TABLE g_q19_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q19_supplier;
           |CREATE TABLE g_q19_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q19_sink;
           |CREATE TABLE g_q19_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"brand": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q19_sink
           |SELECT
           |  p_brand brand,
           |  round(sum(l_extendedprice), 2) ext_price
           |FROM g_q19_orders, g_q19_lineitem, g_q19_part, g_q19_customer, g_q19_supplier
           |WHERE o_orderkey = l_orderkey
           |  AND l_partkey = p_partkey
           |  AND p_size = 8
           |  AND month(o_orderdate) = 11
           |  AND o_custkey = c_custkey
           |  AND l_suppkey = s_suppkey
           |  AND substr(c_name, 18, 1) <> substr(s_name, 18, 1)
           |GROUP BY p_brand
           |ORDER BY ext_price DESC, brand""".stripMargin, sink)
        .orderBy(col("brand"))
    }),

    // q21.sql:24-55 — pivot date ± INTERVAL 30 days scan window, CASE
    // before/after pivot sums, outer CASE-ratio BETWEEN fractional bounds.
    "q_sql_q21" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq21_$u/t"
      runPorted(s,
        s"""${header("g_q21_job", s"/tmp/graft_sqlq21ck_$u")}
           |DROP TABLE IF EXISTS g_q21_lineitem;
           |CREATE TABLE g_q21_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q21_supplier;
           |CREATE TABLE g_q21_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q21_part;
           |CREATE TABLE g_q21_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q21_sink;
           |CREATE TABLE g_q21_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"wh_name": {"type": "string"}, "item_id": {"type": "string"}, "inv_before": {"type": "double"}, "inv_after": {"type": "double"}}}');
           |INSERT INTO g_q21_sink
           |SELECT *
           |FROM (
           |       SELECT
           |         s_name wh_name,
           |         p_brand item_id,
           |         sum(CASE WHEN (cast(l_shipdate AS DATE) < cast('1997-06-15' AS DATE))
           |           THEN l_quantity
           |             ELSE 0 END) AS inv_before,
           |         sum(CASE WHEN (cast(l_shipdate AS DATE) >= cast('1997-06-15' AS DATE))
           |           THEN l_quantity
           |             ELSE 0 END) AS inv_after
           |       FROM g_q21_lineitem, g_q21_supplier, g_q21_part
           |       WHERE p_retailprice BETWEEN 902.00 AND 918.00
           |         AND p_partkey = l_partkey
           |         AND l_suppkey = s_suppkey
           |         AND l_shipdate BETWEEN (cast('1997-06-15' AS DATE) - INTERVAL 30 days)
           |       AND (cast('1997-06-15' AS DATE) + INTERVAL 30 days)
           |       GROUP BY s_name, p_brand) x
           |WHERE (CASE WHEN inv_before > 0
           |  THEN inv_after / inv_before
           |       ELSE NULL
           |       END) BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
           |ORDER BY wh_name, item_id""".stripMargin, sink)
        .orderBy(col("wh_name"), col("item_id"))
    }),

    // q22.sql:24-37 — 4-column ROLLUP with the aggregate leading the
    // ORDER BY, 12-month date span filter.
    "q_sql_q22" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq22_$u/t"
      runPorted(s,
        s"""${header("g_q22_job", s"/tmp/graft_sqlq22ck_$u")}
           |DROP TABLE IF EXISTS g_q22_lineitem;
           |CREATE TABLE g_q22_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q22_orders;
           |CREATE TABLE g_q22_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q22_part;
           |CREATE TABLE g_q22_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q22_sink;
           |CREATE TABLE g_q22_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"p_brand": {"type": "string"}, "p_type": {"type": "string"}, "l_returnflag": {"type": "string"}, "l_linestatus": {"type": "string"}, "qoh": {"type": "double"}}}');
           |INSERT INTO g_q22_sink
           |SELECT
           |  p_brand,
           |  p_type,
           |  l_returnflag,
           |  l_linestatus,
           |  round(CAST(avg(cast(l_quantity AS DECIMAL(12, 2))) AS DOUBLE), 4) qoh
           |FROM g_q22_lineitem, g_q22_orders, g_q22_part
           |WHERE l_orderkey = o_orderkey
           |  AND l_partkey = p_partkey
           |  AND o_orderdate BETWEEN cast('1996-07-01' AS DATE) AND cast('1997-06-30' AS DATE)
           |GROUP BY ROLLUP (p_brand, p_type, l_returnflag, l_linestatus)
           |ORDER BY qoh, p_brand, p_type, l_returnflag, l_linestatus""".stripMargin, sink)
        .orderBy(col("qoh"), col("p_brand").asc_nulls_first, col("p_type").asc_nulls_first,
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // q26.sql:24-41 — avg battery over the second dim chain
    // (customer→nation→region), OR'd region filter.
    "q_sql_q26" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq26_$u/t"
      runPorted(s,
        s"""${header("g_q26_job", s"/tmp/graft_sqlq26ck_$u")}
           |DROP TABLE IF EXISTS g_q26_lineitem;
           |CREATE TABLE g_q26_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q26_orders;
           |CREATE TABLE g_q26_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q26_customer;
           |CREATE TABLE g_q26_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q26_nation;
           |CREATE TABLE g_q26_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q26_region;
           |CREATE TABLE g_q26_region USING kv OPTIONS (path '$dir/region.parquet');
           |DROP TABLE IF EXISTS g_q26_sink;
           |CREATE TABLE g_q26_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"item_id": {"type": "string"}, "agg1": {"type": "double"}, "agg2": {"type": "double"}, "agg3": {"type": "double"}, "agg4": {"type": "double"}}}');
           |INSERT INTO g_q26_sink
           |SELECT
           |  o_orderpriority item_id,
           |  round(CAST(avg(cast(l_quantity AS DECIMAL(12, 2))) AS DOUBLE), 4) agg1,
           |  round(CAST(avg(cast(l_extendedprice AS DECIMAL(12, 2))) AS DOUBLE), 4) agg2,
           |  round(CAST(avg(cast(l_discount AS DECIMAL(12, 2))) AS DOUBLE), 4) agg3,
           |  round(CAST(avg(cast(l_tax AS DECIMAL(12, 2))) AS DOUBLE), 4) agg4
           |FROM g_q26_lineitem, g_q26_customer, g_q26_orders, g_q26_nation, g_q26_region
           |WHERE l_orderkey = o_orderkey AND
           |  o_custkey = c_custkey AND
           |  c_nationkey = n_nationkey AND
           |  n_regionkey = r_regionkey AND
           |  c_mktsegment = 'AUTOMOBILE' AND
           |  (r_name = 'ASIA' OR r_name = 'EUROPE') AND
           |  year(o_orderdate) = 1997
           |GROUP BY o_orderpriority
           |ORDER BY item_id""".stripMargin, sink)
        .orderBy(col("item_id"))
    }),

    // q34.sql:24-56 — derived-table streaming aggregation joined to a dim
    // AFTER the aggregate, cnt BETWEEN band, CASE-ratio dim filter,
    // DESC secondary sort.
    "q_sql_q34" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq34_$u/t"
      runPorted(s,
        s"""${header("g_q34_job", s"/tmp/graft_sqlq34ck_$u")}
           |DROP TABLE IF EXISTS g_q34_lineitem;
           |CREATE TABLE g_q34_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q34_orders;
           |CREATE TABLE g_q34_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q34_customer;
           |CREATE TABLE g_q34_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q34_supplier;
           |CREATE TABLE g_q34_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q34_sink;
           |CREATE TABLE g_q34_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"c_name": {"type": "string"}, "c_mktsegment": {"type": "string"}, "c_acctbal": {"type": "double"}, "ticket": {"type": "bigint"}, "cnt": {"type": "bigint"}}}');
           |INSERT INTO g_q34_sink
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
           |  FROM g_q34_lineitem, g_q34_orders, g_q34_supplier
           |  WHERE g_q34_lineitem.l_orderkey = g_q34_orders.o_orderkey
           |    AND g_q34_lineitem.l_suppkey = g_q34_supplier.s_suppkey
           |    AND (day(o_orderdate) BETWEEN 1 AND 3 OR day(o_orderdate) BETWEEN 25 AND 28)
           |    AND (g_q34_supplier.s_name = 'Supplier#000000003' OR
           |    g_q34_supplier.s_acctbal > 1000)
           |    AND g_q34_supplier.s_suppkey > 0
           |    AND (CASE WHEN g_q34_supplier.s_suppkey > 0
           |    THEN g_q34_supplier.s_acctbal / g_q34_supplier.s_suppkey
           |         ELSE NULL
           |         END) > 1.2
           |    AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
           |  GROUP BY l_orderkey, o_custkey) dn, g_q34_customer
           |WHERE cust_sk = c_custkey
           |  AND cnt BETWEEN 2 AND 20
           |ORDER BY c_name, c_mktsegment, c_acctbal DESC""".stripMargin, sink)
        .orderBy(col("ticket"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_sql_q6" ->
      """SELECT a.n_name AS state, CAST(count(*) AS BIGINT) AS cnt
        |FROM nation a, customer c, lineitem s, orders d, part i
        |WHERE a.n_nationkey = c.c_nationkey
        |  AND c.c_custkey = d.o_custkey
        |  AND d.o_orderkey = s.l_orderkey
        |  AND s.l_partkey = i.p_partkey
        |  AND quarter(d.o_orderdate) =
        |    (SELECT DISTINCT quarter(o_orderdate) FROM orders
        |     WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2)
        |  AND i.p_retailprice > 1.005 *
        |    (SELECT avg(j.p_retailprice) FROM part j WHERE j.p_type = i.p_type)
        |GROUP BY a.n_name
        |HAVING count(*) >= 10
        |ORDER BY state""".stripMargin,

    "q_sql_q7" ->
      s"""WITH g AS (
         |  SELECT p_brand AS item_id,
         |    ${centsSum("l_quantity")} AS s1,
         |    ${centsSum("l_extendedprice")} AS s2,
         |    ${centsSum("l_discount")} AS s3,
         |    ${centsSum("l_tax")} AS s4,
         |    count(*) AS n
         |  FROM lineitem, customer, orders, part, supplier
         |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND l_partkey = p_partkey AND l_suppkey = s_suppkey
         |    AND c_mktsegment = 'BUILDING'
         |    AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
         |    AND year(o_orderdate) = 1996
         |  GROUP BY p_brand)
         |SELECT item_id,
         |  ${sparkAvg("s1", "n")} AS agg1,
         |  ${sparkAvg("s2", "n")} AS agg2,
         |  ${sparkAvg("s3", "n")} AS agg3,
         |  ${sparkAvg("s4", "n")} AS agg4
         |FROM g
         |ORDER BY item_id""".stripMargin,

    "q_sql_q13" ->
      s"""WITH g AS (
        |  SELECT
        |  ${centsSum("l_quantity")} AS s1,
        |  ${centsSum("l_extendedprice")} AS s2,
        |  ${centsSum("l_tax")} AS s3,
        |  round(sum(l_tax), 2) AS agg4,
        |  count(*) AS n
        |FROM lineitem, supplier, customer, nation, orders
        |WHERE s_suppkey = l_suppkey
        |  AND l_orderkey = o_orderkey AND year(o_orderdate) = 1996
        |  AND ((o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        |    AND l_extendedprice BETWEEN 100.00 AND 15000.00 AND c_acctbal > 0)
        |   OR (o_custkey = c_custkey AND c_mktsegment = 'AUTOMOBILE'
        |    AND l_extendedprice BETWEEN 50.00 AND 10000.00 AND c_acctbal > 1000)
        |   OR (o_custkey = c_custkey AND c_mktsegment = 'MACHINERY'
        |    AND l_extendedprice BETWEEN 150.00 AND 20000.00 AND c_acctbal > 2000))
        |  AND ((c_nationkey = n_nationkey AND n_name IN ('NATION_1', 'NATION_3', 'NATION_1')
        |    AND l_discount BETWEEN 0.01 AND 0.02)
        |   OR (c_nationkey = n_nationkey AND n_name IN ('NATION_5', 'NATION_7', 'NATION_9')
        |    AND l_discount BETWEEN 0.02 AND 0.03)
        |   OR (c_nationkey = n_nationkey AND n_name IN ('NATION_11', 'NATION_13', 'NATION_15')
        |    AND l_discount BETWEEN 0.01 AND 0.05)))
        |SELECT
        |  ${sparkAvg("s1", "n")} AS agg1,
        |  ${sparkAvg("s2", "n")} AS agg2,
        |  ${sparkAvg("s3", "n")} AS agg3,
        |  agg4
        |FROM g""".stripMargin,

    "q_sql_q15" ->
      """SELECT substr(c_name, 15, 3) AS zip, round(sum(l_extendedprice), 2) AS net
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND (substr(c_name, 15, 3) IN ('000', '001', '012', '123', '055',
        |                                 '101', '144', '077', '033')
        |    OR c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
        |    OR l_extendedprice > 500)
        |  AND quarter(o_orderdate) = 2 AND year(o_orderdate) = 1996
        |GROUP BY substr(c_name, 15, 3)
        |ORDER BY zip""".stripMargin,

    "q_sql_q19" ->
      """SELECT p_brand AS brand, round(sum(l_extendedprice), 2) AS ext_price
        |FROM orders, lineitem, part, customer, supplier
        |WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
        |  AND p_size = 8 AND month(o_orderdate) = 11
        |  AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        |  AND substr(c_name, 18, 1) <> substr(s_name, 18, 1)
        |GROUP BY p_brand
        |ORDER BY brand""".stripMargin,

    "q_sql_q21" ->
      """SELECT * FROM (
        |  SELECT s_name AS wh_name, p_brand AS item_id,
        |    sum(CASE WHEN CAST(l_shipdate AS DATE) < CAST('1997-06-15' AS DATE)
        |      THEN l_quantity ELSE 0 END) AS inv_before,
        |    sum(CASE WHEN CAST(l_shipdate AS DATE) >= CAST('1997-06-15' AS DATE)
        |      THEN l_quantity ELSE 0 END) AS inv_after
        |  FROM lineitem, supplier, part
        |  WHERE p_retailprice BETWEEN 902.00 AND 918.00
        |    AND p_partkey = l_partkey AND l_suppkey = s_suppkey
        |    AND l_shipdate BETWEEN (CAST('1997-06-15' AS DATE) - INTERVAL 30 DAY)
        |      AND (CAST('1997-06-15' AS DATE) + INTERVAL 30 DAY)
        |  GROUP BY s_name, p_brand) x
        |WHERE (CASE WHEN inv_before > 0 THEN inv_after / inv_before ELSE NULL END)
        |  BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
        |ORDER BY wh_name, item_id""".stripMargin,

    "q_sql_q22" ->
      s"""WITH g AS (
         |  SELECT p_brand, p_type, l_returnflag, l_linestatus,
         |    ${centsSum("l_quantity")} AS s1, count(*) AS n
         |  FROM lineitem, orders, part
         |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
         |    AND o_orderdate BETWEEN CAST('1996-07-01' AS DATE) AND CAST('1997-06-30' AS DATE)
         |  GROUP BY ROLLUP (p_brand, p_type, l_returnflag, l_linestatus))
         |SELECT p_brand, p_type, l_returnflag, l_linestatus,
         |  ${sparkAvg("s1", "n")} AS qoh
         |FROM g
         |ORDER BY qoh, p_brand NULLS FIRST, p_type NULLS FIRST,
         |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_sql_q26" ->
      s"""WITH g AS (
         |  SELECT o_orderpriority AS item_id,
         |    ${centsSum("l_quantity")} AS s1,
         |    ${centsSum("l_extendedprice")} AS s2,
         |    ${centsSum("l_discount")} AS s3,
         |    ${centsSum("l_tax")} AS s4,
         |    count(*) AS n
         |  FROM lineitem, customer, orders, nation, region
         |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |    AND c_mktsegment = 'AUTOMOBILE'
         |    AND (r_name = 'ASIA' OR r_name = 'EUROPE')
         |    AND year(o_orderdate) = 1997
         |  GROUP BY o_orderpriority)
         |SELECT item_id,
         |  ${sparkAvg("s1", "n")} AS agg1,
         |  ${sparkAvg("s2", "n")} AS agg2,
         |  ${sparkAvg("s3", "n")} AS agg3,
         |  ${sparkAvg("s4", "n")} AS agg4
         |FROM g
         |ORDER BY item_id""".stripMargin,

    "q_sql_q34" ->
      """SELECT c_name, c_mktsegment, c_acctbal, ticket, cnt
        |FROM
        |  (SELECT l_orderkey AS ticket, o_custkey AS cust_sk,
        |     CAST(count(*) AS BIGINT) AS cnt
        |   FROM lineitem, orders, supplier
        |   WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |     AND (day(o_orderdate) BETWEEN 1 AND 3 OR day(o_orderdate) BETWEEN 25 AND 28)
        |     AND (s_name = 'Supplier#000000003' OR s_acctbal > 1000)
        |     AND s_suppkey > 0
        |     AND (CASE WHEN s_suppkey > 0 THEN s_acctbal / s_suppkey ELSE NULL END) > 1.2
        |     AND year(o_orderdate) IN (1996, 1996 + 1, 1996 + 2)
        |   GROUP BY l_orderkey, o_custkey) dn, customer
        |WHERE cust_sk = c_custkey
        |  AND cnt BETWEEN 2 AND 20
        |ORDER BY ticket""".stripMargin,
  )
}
