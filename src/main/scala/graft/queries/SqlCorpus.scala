package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's SQL-text corpus, ported file by file.
  *
  * The reference proves its whole SQL surface as literal `.sql` scripts
  * (`emr-baseline-testing/queries/q3.sql` … `q103.sql`): CREATE DATABASE /
  * USE, SET query-name + checkpoint conventions, CREATE TABLE ... USING
  * <source> OPTIONS(..., output.mode), then one INSERT INTO whose SELECT
  * is the query — the whole job is SQL text, no DataFrame code. Eight of
  * those query shapes are ported here onto the TPC-H-ish fixture tables
  * and run through `GraftSql.runScript` only:
  *
  *  - q3.sql    → star join + agg, complete mode
  *  - q8.sql    → IN-list ∩ INTERSECT subquery + HAVING + substring join
  *  - q18.sql   → ROLLUP + avg(cast AS DECIMAL) over a 5-way join
  *  - q71.sql   → three-branch UNION ALL subquery + dim joins
  *  - q100.sql  → GROUP BY HOPPING windows (complete)
  *  - q101.sql  → GROUP BY TUMBLING windows (complete)
  *  - q102.sql  → TUMBLING + delay() watermark (append)
  *  - q40.sql   → stream-stream LEFT OUTER join, dual delay() (append)
  *
  * Facts stream (`log` tables, MICRO_BATCH_READ → the INSERT runs as a
  * Structured Streaming query drained with Trigger.AvailableNow);
  * dimensions stay batch (`kv` tables). Every gate reads the sink table
  * back and orders deterministically for the DuckDB compare.
  *
  * Append-mode emission semantics replayed by the oracles (calibrated
  * against Spark's behavior, single-batch drain + final no-data batch;
  * watermark floors event times to milliseconds):
  *  - windowed agg: window emitted iff window_end <= max(ts) - delay
  *  - left-outer join: unmatched left row emitted iff its event time <
  *    min over both sides of (max(side ts) - side delay), strictly
  */
object SqlCorpus {

  private def uid(): String = java.util.UUID.randomUUID().toString.replace("-", "")

  /** Run a ported script and read its sink back. */
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
    // q3.sql:24-37 — date_dim ⋈ fact ⋈ item star join, filtered dims,
    // SUM + GROUP BY + ORDER BY, complete-mode sink.
    "q_sql_q3" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq3_$u/t"
      runPorted(s,
        s"""${header("g_q3_job", s"/tmp/graft_sqlq3ck_$u")}
           |DROP TABLE IF EXISTS g_q3_lineitem;
           |CREATE TABLE g_q3_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q3_orders;
           |CREATE TABLE g_q3_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q3_part;
           |CREATE TABLE g_q3_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q3_sink;
           |CREATE TABLE g_q3_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"d_year": {"type": "bigint"}, "brand": {"type": "string"}, "sum_agg": {"type": "double"}}}');
           |INSERT INTO g_q3_sink
           |SELECT
           |  CAST(year(o_orderdate) AS BIGINT) AS d_year,
           |  p_brand AS brand,
           |  round(SUM(l_extendedprice), 2) AS sum_agg
           |FROM g_q3_orders, g_q3_lineitem, g_q3_part
           |WHERE o_orderkey = l_orderkey
           |  AND l_partkey = p_partkey
           |  AND p_size = 12
           |  AND month(o_orderdate) = 11
           |GROUP BY year(o_orderdate), p_brand
           |ORDER BY d_year, sum_agg DESC, brand""".stripMargin, sink)
        .orderBy(col("d_year"), col("brand"))
    }),

    // q8.sql:24-110 — literal IN-list INTERSECT a HAVING-filtered group,
    // substring equality join against the intersected list.
    "q_sql_q8" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq8_$u/t"
      runPorted(s,
        s"""${header("g_q8_job", s"/tmp/graft_sqlq8ck_$u")}
           |DROP TABLE IF EXISTS g_q8_lineitem;
           |CREATE TABLE g_q8_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q8_supplier;
           |CREATE TABLE g_q8_supplier USING kv OPTIONS (path '$dir/supplier.parquet');
           |DROP TABLE IF EXISTS g_q8_nation;
           |CREATE TABLE g_q8_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q8_customer;
           |CREATE TABLE g_q8_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q8_orders;
           |CREATE TABLE g_q8_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q8_sink;
           |CREATE TABLE g_q8_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"s_name": {"type": "string"}, "net": {"type": "double"}}}');
           |INSERT INTO g_q8_sink
           |SELECT
           |  s_name,
           |  round(sum(l_extendedprice), 2) AS net
           |FROM g_q8_lineitem, g_q8_supplier, g_q8_nation, g_q8_orders,
           |  (SELECT pfx
           |  FROM (
           |         (SELECT substr(n_name, 8, 2) AS pfx
           |         FROM g_q8_nation
           |         WHERE substr(n_name, 8, 2) IN (
           |               '1','3','7','10','12','15','18','21','24','2'))
           |         INTERSECT
           |         (SELECT pfx
           |         FROM
           |           (SELECT
           |             substr(n_name, 8, 2) AS pfx,
           |             count(*) AS cnt
           |           FROM g_q8_nation, g_q8_customer
           |           WHERE n_nationkey = c_nationkey AND
           |             c_acctbal > 0
           |           GROUP BY substr(n_name, 8, 2)
           |           HAVING count(*) > 56) A1)
           |       ) A2
           |  ) V1
           |WHERE l_suppkey = s_suppkey
           |  AND s_nationkey = n_nationkey
           |  AND l_orderkey = o_orderkey
           |  AND o_orderstatus = 'F'
           |  AND (substr(n_name, 8, 1) = substr(V1.pfx, 1, 1))
           |GROUP BY s_name
           |ORDER BY s_name""".stripMargin, sink)
        .orderBy(col("s_name"))
    }),

    // q18.sql:24-49 — 5-way join, avg(cast(x AS DECIMAL(12,2))) aggregate
    // battery, GROUP BY ROLLUP, ORDER BY with the rollup nulls.
    "q_sql_q18" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq18_$u/t"
      runPorted(s,
        s"""${header("g_q18_job", s"/tmp/graft_sqlq18ck_$u")}
           |DROP TABLE IF EXISTS g_q18_lineitem;
           |CREATE TABLE g_q18_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q18_orders;
           |CREATE TABLE g_q18_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q18_customer;
           |CREATE TABLE g_q18_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q18_nation;
           |CREATE TABLE g_q18_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q18_part;
           |CREATE TABLE g_q18_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q18_sink;
           |CREATE TABLE g_q18_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"p_brand": {"type": "string"}, "n_name": {"type": "string"}, "c_mktsegment": {"type": "string"}, "agg1": {"type": "double"}, "agg2": {"type": "double"}, "agg3": {"type": "double"}, "agg4": {"type": "double"}}}');
           |INSERT INTO g_q18_sink
           |SELECT
           |  p_brand,
           |  n_name,
           |  c_mktsegment,
           |  round(CAST(avg(cast(l_quantity AS DECIMAL(12, 2))) AS DOUBLE), 4) AS agg1,
           |  round(CAST(avg(cast(l_extendedprice AS DECIMAL(12, 2))) AS DOUBLE), 4) AS agg2,
           |  round(CAST(avg(cast(l_discount AS DECIMAL(12, 2))) AS DOUBLE), 4) AS agg3,
           |  round(CAST(avg(cast(c_acctbal AS DECIMAL(12, 2))) AS DOUBLE), 4) AS agg4
           |FROM g_q18_lineitem, g_q18_orders, g_q18_customer, g_q18_nation, g_q18_part
           |WHERE l_orderkey = o_orderkey AND
           |  o_custkey = c_custkey AND
           |  c_nationkey = n_nationkey AND
           |  l_partkey = p_partkey AND
           |  c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY') AND
           |  year(o_orderdate) = 1996
           |GROUP BY ROLLUP (p_brand, n_name, c_mktsegment)
           |ORDER BY p_brand, n_name, c_mktsegment""".stripMargin, sink)
        .orderBy(col("p_brand").asc_nulls_first, col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)
    }),

    // q71.sql:24-66 — three channel subqueries UNION ALL'd (each its own
    // stream leg joined to the date dim), then item join + agg.
    "q_sql_q71" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq71_$u/t"
      runPorted(s,
        s"""${header("g_q71_job", s"/tmp/graft_sqlq71ck_$u")}
           |DROP TABLE IF EXISTS g_q71_lineitem;
           |CREATE TABLE g_q71_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q71_orders;
           |CREATE TABLE g_q71_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q71_part;
           |CREATE TABLE g_q71_part USING kv OPTIONS (path '$dir/part.parquet');
           |DROP TABLE IF EXISTS g_q71_sink;
           |CREATE TABLE g_q71_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"brand": {"type": "string"}, "rflag": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q71_sink
           |SELECT
           |  p_brand AS brand,
           |  rflag,
           |  round(sum(ext_price), 2) AS ext_price
           |FROM g_q71_part,
           |  (SELECT
           |     l_extendedprice AS ext_price,
           |     l_partkey AS sold_item_sk,
           |     l_returnflag AS rflag
           |   FROM g_q71_lineitem, g_q71_orders
           |   WHERE o_orderkey = l_orderkey
           |     AND month(o_orderdate) = 11
           |     AND l_linenumber = 1
           |   UNION ALL
           |   SELECT
           |     l_extendedprice AS ext_price,
           |     l_partkey AS sold_item_sk,
           |     l_returnflag AS rflag
           |   FROM g_q71_lineitem, g_q71_orders
           |   WHERE o_orderkey = l_orderkey
           |     AND month(o_orderdate) = 11
           |     AND l_linenumber = 2
           |   UNION ALL
           |   SELECT
           |     l_extendedprice AS ext_price,
           |     l_partkey AS sold_item_sk,
           |     l_returnflag AS rflag
           |   FROM g_q71_lineitem, g_q71_orders
           |   WHERE o_orderkey = l_orderkey
           |     AND month(o_orderdate) = 11
           |     AND l_linenumber >= 3
           |  ) AS tmp
           |WHERE
           |  sold_item_sk = p_partkey
           |    AND p_size < 15
           |GROUP BY p_brand, rflag
           |ORDER BY ext_price DESC, brand""".stripMargin, sink)
        .orderBy(col("brand"), col("rflag"))
    }),

    // q48.sql:23-88 — scalar SUM under two OR-of-AND blocks that mix the
    // join equalities with per-branch range predicates: the optimizer
    // must distribute the join conditions out of the disjunction; the
    // residual range tree exercises the NNF/pushdown machinery through
    // SQL text. (Integer-valued quantities make the global double sum
    // exact on both engines.)
    "q_sql_q48" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq48_$u/t"
      runPorted(s,
        s"""${header("g_q48_job", s"/tmp/graft_sqlq48ck_$u")}
           |DROP TABLE IF EXISTS g_q48_lineitem;
           |CREATE TABLE g_q48_lineitem USING log OPTIONS (path '$dir/lineitem.parquet');
           |DROP TABLE IF EXISTS g_q48_orders;
           |CREATE TABLE g_q48_orders USING kv OPTIONS (path '$dir/orders.parquet');
           |DROP TABLE IF EXISTS g_q48_customer;
           |CREATE TABLE g_q48_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q48_nation;
           |CREATE TABLE g_q48_nation USING kv OPTIONS (path '$dir/nation.parquet');
           |DROP TABLE IF EXISTS g_q48_sink;
           |CREATE TABLE g_q48_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"sum_qty": {"type": "double"}}}');
           |INSERT INTO g_q48_sink
           |SELECT round(sum(l_quantity), 2) AS sum_qty
           |FROM g_q48_lineitem, g_q48_customer, g_q48_orders, g_q48_nation
           |WHERE o_orderkey = l_orderkey
           |  AND year(o_orderdate) = 1997
           |  AND
           |  (
           |    (
           |      o_custkey = c_custkey
           |        AND
           |        c_mktsegment = 'BUILDING'
           |        AND
           |        l_extendedprice BETWEEN 1000.00 AND 15000.00
           |    )
           |      OR
           |      (
           |        o_custkey = c_custkey
           |          AND
           |          c_mktsegment = 'AUTOMOBILE'
           |          AND
           |          l_extendedprice BETWEEN 5000.00 AND 20000.00
           |      )
           |      OR
           |      (
           |        o_custkey = c_custkey
           |          AND
           |          c_mktsegment = 'MACHINERY'
           |          AND
           |          l_extendedprice BETWEEN 15000.00 AND 40000.00
           |      )
           |  )
           |  AND
           |  (
           |    (
           |      c_nationkey = n_nationkey
           |        AND
           |        n_name IN ('NATION_1', 'NATION_3', 'NATION_5')
           |        AND l_discount BETWEEN 0.00 AND 0.05
           |    )
           |      OR
           |      (c_nationkey = n_nationkey
           |        AND
           |        n_name IN ('NATION_7', 'NATION_9', 'NATION_11')
           |        AND l_discount BETWEEN 0.03 AND 0.08
           |      )
           |      OR
           |      (c_nationkey = n_nationkey
           |        AND
           |        n_name IN ('NATION_13', 'NATION_15', 'NATION_17')
           |        AND l_discount BETWEEN 0.05 AND 0.10
           |      )
           |  )""".stripMargin, sink)
        .orderBy(col("sum_qty"))
    }),

    // q100.sql:24-36 — GROUP BY HOPPING(ts, slide 30s, size 1m) over the
    // stream ⋈ dim join, complete mode.
    "q_sql_q100" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq100_$u/t"
      runPorted(s,
        s"""${header("g_q100_job", s"/tmp/graft_sqlq100ck_$u")}
           |DROP TABLE IF EXISTS g_q100_events;
           |CREATE TABLE g_q100_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q100_customer;
           |CREATE TABLE g_q100_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q100_sink;
           |CREATE TABLE g_q100_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"w_start": {"type": "bigint"}, "event_type": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q100_sink
           |SELECT
           |  CAST(unix_timestamp(w.start) AS BIGINT) AS w_start,
           |  event_type,
           |  round(sum(value), 2) AS ext_price
           |FROM (SELECT hopping(ts, interval 30 seconds, interval 1 minute) AS w, event_type, value
           |      FROM g_q100_events, g_q100_customer
           |      WHERE user_id = c_custkey
           |        AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE'))
           |GROUP BY w, event_type
           |ORDER BY ext_price DESC, event_type""".stripMargin, sink)
        .orderBy(col("w_start"), col("event_type"))
    }),

    // q101.sql:24-36 — GROUP BY TUMBLING(ts, 1 minute), complete mode.
    "q_sql_q101" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq101_$u/t"
      runPorted(s,
        s"""${header("g_q101_job", s"/tmp/graft_sqlq101ck_$u")}
           |DROP TABLE IF EXISTS g_q101_events;
           |CREATE TABLE g_q101_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q101_customer;
           |CREATE TABLE g_q101_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q101_sink;
           |CREATE TABLE g_q101_sink USING kv OPTIONS (path '$sink', output.mode 'complete',
           |  catalog '{"columns": {"w_start": {"type": "bigint"}, "event_type": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q101_sink
           |SELECT
           |  CAST(unix_timestamp(w.start) AS BIGINT) AS w_start,
           |  event_type,
           |  round(sum(value), 2) AS ext_price
           |FROM (SELECT tumbling(ts, interval 1 minute) AS w, event_type, value
           |      FROM g_q101_events, g_q101_customer
           |      WHERE user_id = c_custkey
           |        AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE'))
           |GROUP BY w, event_type
           |ORDER BY ext_price DESC, event_type""".stripMargin, sink)
        .orderBy(col("w_start"), col("event_type"))
    }),

    // q102.sql:24-36 — TUMBLING + delay() watermark, APPEND mode: only
    // windows the final watermark closed are in the sink.
    "q_sql_q102" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq102_$u/t"
      runPorted(s,
        s"""${header("g_q102_job", s"/tmp/graft_sqlq102ck_$u")}
           |DROP TABLE IF EXISTS g_q102_events;
           |CREATE TABLE g_q102_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q102_customer;
           |CREATE TABLE g_q102_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q102_sink;
           |CREATE TABLE g_q102_sink USING kv OPTIONS (path '$sink', output.mode 'append',
           |  catalog '{"columns": {"w_start": {"type": "bigint"}, "event_type": {"type": "string"}, "ext_price": {"type": "double"}}}');
           |INSERT INTO g_q102_sink
           |SELECT
           |  CAST(unix_timestamp(w.start) AS BIGINT) AS w_start,
           |  event_type,
           |  round(sum(value), 2) AS ext_price
           |FROM (SELECT tumbling(ts, interval 1 minute) AS w, event_type, value
           |      FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
           |            FROM g_q102_events), g_q102_customer
           |      WHERE user_id = c_custkey
           |        AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
           |        AND delay(ts) < '2 minutes')
           |GROUP BY w, event_type""".stripMargin, sink)
        .orderBy(col("w_start"), col("event_type"))
    }),

    // q40.sql:24-41 — stream-stream LEFT OUTER join with an event-time
    // range condition, dual delay() watermarks, dim join + filter, append.
    "q_sql_q40" -> ((s, dir) => {
      val u = uid()
      val sink = s"/tmp/graft_sqlq40_$u/t"
      runPorted(s,
        s"""${header("g_q40_job", s"/tmp/graft_sqlq40ck_$u")}
           |DROP TABLE IF EXISTS g_q40_events;
           |CREATE TABLE g_q40_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_q40_customer;
           |CREATE TABLE g_q40_customer USING kv OPTIONS (path '$dir/customer.parquet');
           |DROP TABLE IF EXISTS g_q40_sink;
           |CREATE TABLE g_q40_sink USING kv OPTIONS (path '$sink', output.mode 'append',
           |  catalog '{"columns": {"c_mktsegment": {"type": "string"}, "a_id": {"type": "bigint"}, "b_id": {"type": "bigint"}}}');
           |INSERT INTO g_q40_sink
           |SELECT
           |  c_mktsegment,
           |  a_id,
           |  b_id
           |FROM
           |  (SELECT event_id AS a_id, user_id AS a_user, CAST(ts AS TIMESTAMP) AS a_ts
           |   FROM g_q40_events WHERE event_type = 'view')
           |  LEFT OUTER JOIN
           |  (SELECT event_id AS b_id, user_id AS b_user, CAST(ts AS TIMESTAMP) AS b_ts
           |   FROM g_q40_events WHERE event_type = 'purchase')
           |  ON (a_user = b_user
           |       AND a_ts >= b_ts
           |       AND a_ts <= b_ts + interval 30 minutes)
           |  , g_q40_customer
           |WHERE
           |  a_user = c_custkey
           |    AND c_acctbal > 0
           |    AND delay(b_ts) < '30 seconds' AND delay(a_ts) < '60 seconds'""".stripMargin, sink)
        .orderBy(col("a_id"), col("b_id"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_sql_q3" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS d_year, p_brand AS brand,
        |  round(sum(l_extendedprice), 2) AS sum_agg
        |FROM orders, lineitem, part
        |WHERE o_orderkey = l_orderkey AND l_partkey = p_partkey
        |  AND p_size = 12 AND month(o_orderdate) = 11
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_sql_q8" ->
      """SELECT s_name, round(sum(l_extendedprice), 2) AS net
        |FROM lineitem, supplier, nation, orders,
        |  (SELECT pfx FROM (
        |     (SELECT substr(n_name, 8, 2) AS pfx FROM nation
        |      WHERE substr(n_name, 8, 2) IN ('1','3','7','10','12','15','18','21','24','2'))
        |     INTERSECT
        |     (SELECT pfx FROM (
        |        SELECT substr(n_name, 8, 2) AS pfx, count(*) AS cnt
        |        FROM nation, customer
        |        WHERE n_nationkey = c_nationkey AND c_acctbal > 0
        |        GROUP BY substr(n_name, 8, 2)
        |        HAVING count(*) > 56) A1)
        |   ) A2) V1
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |  AND substr(n_name, 8, 1) = substr(V1.pfx, 1, 1)
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    // Spark's avg(DECIMAL(12,2)) is an exact DECIMAL(16,6) (sum/count,
    // HALF_UP at 6dp) and round(double, 4) rounds the shortest decimal
    // representation HALF_UP — DuckDB's double avg+round differs by 1 ulp
    // at half boundaries (e.g. mean .99625 → .9963 vs .9962). Replay the
    // two-stage HALF_UP on exact integers: cents → 1e-6 units → 1e-4.
    "q_sql_q18" -> {
      def halfUp(num: String, den: String): String =
        s"(CASE WHEN $num >= 0 THEN (2 * ($num) + $den) // (2 * ($den)) " +
          s"ELSE -((2 * (-($num)) + $den) // (2 * ($den))) END)"
      def sparkAvg(s: String): String = {
        val v6 = halfUp(s"$s * 10000", "n")
        val v4 = halfUp(v6, "100")
        s"CAST($v4 AS DOUBLE) / 10000.0"
      }
      s"""WITH g AS (
         |  SELECT p_brand, n_name, c_mktsegment,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(12, 2))) * 100 AS HUGEINT) AS s1,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12, 2))) * 100 AS HUGEINT) AS s2,
         |    CAST(sum(CAST(l_discount AS DECIMAL(12, 2))) * 100 AS HUGEINT) AS s3,
         |    CAST(sum(CAST(c_acctbal AS DECIMAL(12, 2))) * 100 AS HUGEINT) AS s4,
         |    count(*) AS n
         |  FROM lineitem, orders, customer, nation, part
         |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n_nationkey AND l_partkey = p_partkey
         |    AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
         |    AND year(o_orderdate) = 1996
         |  GROUP BY ROLLUP (p_brand, n_name, c_mktsegment)
         |)
         |SELECT p_brand, n_name, c_mktsegment,
         |  ${sparkAvg("s1")} AS agg1,
         |  ${sparkAvg("s2")} AS agg2,
         |  ${sparkAvg("s3")} AS agg3,
         |  ${sparkAvg("s4")} AS agg4
         |FROM g
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
    },

    "q_sql_q71" ->
      """SELECT p_brand AS brand, rflag, round(sum(ext_price), 2) AS ext_price
        |FROM part, (
        |  SELECT l_extendedprice AS ext_price, l_partkey AS sold_item_sk,
        |    l_returnflag AS rflag
        |  FROM lineitem, orders
        |  WHERE o_orderkey = l_orderkey AND month(o_orderdate) = 11 AND l_linenumber = 1
        |  UNION ALL
        |  SELECT l_extendedprice AS ext_price, l_partkey AS sold_item_sk,
        |    l_returnflag AS rflag
        |  FROM lineitem, orders
        |  WHERE o_orderkey = l_orderkey AND month(o_orderdate) = 11 AND l_linenumber = 2
        |  UNION ALL
        |  SELECT l_extendedprice AS ext_price, l_partkey AS sold_item_sk,
        |    l_returnflag AS rflag
        |  FROM lineitem, orders
        |  WHERE o_orderkey = l_orderkey AND month(o_orderdate) = 11 AND l_linenumber >= 3
        |) tmp
        |WHERE sold_item_sk = p_partkey AND p_size < 15
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_sql_q48" ->
      """SELECT round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem, customer, orders, nation
        |WHERE o_orderkey = l_orderkey
        |  AND year(o_orderdate) = 1997
        |  AND (
        |    (o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        |      AND l_extendedprice BETWEEN 1000.00 AND 15000.00)
        |    OR (o_custkey = c_custkey AND c_mktsegment = 'AUTOMOBILE'
        |      AND l_extendedprice BETWEEN 5000.00 AND 20000.00)
        |    OR (o_custkey = c_custkey AND c_mktsegment = 'MACHINERY'
        |      AND l_extendedprice BETWEEN 15000.00 AND 40000.00)
        |  )
        |  AND (
        |    (c_nationkey = n_nationkey AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5')
        |      AND l_discount BETWEEN 0.00 AND 0.05)
        |    OR (c_nationkey = n_nationkey AND n_name IN ('NATION_7', 'NATION_9', 'NATION_11')
        |      AND l_discount BETWEEN 0.03 AND 0.08)
        |    OR (c_nationkey = n_nationkey AND n_name IN ('NATION_13', 'NATION_15', 'NATION_17')
        |      AND l_discount BETWEEN 0.05 AND 0.10)
        |  )""".stripMargin,

    "q_sql_q100" ->
      """SELECT w_start, event_type, round(sum(value), 2) AS ext_price
        |FROM (
        |  SELECT CAST(epoch(time_bucket(INTERVAL 30 SECOND, e.ts)) AS BIGINT)
        |           - 30 * o.off AS w_start,
        |         e.event_type, e.value
        |  FROM events e, customer, (SELECT unnest([0, 1]) AS off) o
        |  WHERE e.user_id = c_custkey
        |    AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_sql_q101" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 60 SECOND, e.ts)) AS BIGINT) AS w_start,
        |  e.event_type, round(sum(e.value), 2) AS ext_price
        |FROM events e, customer
        |WHERE e.user_id = c_custkey
        |  AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // Append + watermark: a window is in the sink iff it closed below the
    // final watermark = floor_ms(max event time) - 2 minutes (max over ALL
    // events rows — the watermark sits below the dim join).
    "q_sql_q102" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 60 SECOND, e.ts)) AS BIGINT) AS w_start,
        |  e.event_type, round(sum(e.value), 2) AS ext_price
        |FROM events e, customer
        |WHERE e.user_id = c_custkey
        |  AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |  AND (CAST(epoch(time_bucket(INTERVAL 60 SECOND, e.ts)) AS BIGINT) + 60) * 1000
        |      <= (SELECT epoch_ms(max(ts)) - 120000 FROM events)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // Stream-stream left outer: matched pairs always emit (single-batch
    // drain → no late drops); an unmatched left row emits null-extended
    // iff its event time < min(max(view ts) - 60s, max(purchase ts) - 30s)
    // strictly, with event times at Spark's microsecond precision and the
    // watermark floored to milliseconds.
    "q_sql_q40" ->
      """WITH a AS (
        |  SELECT event_id AS a_id, user_id AS a_user,
        |    date_trunc('microseconds', ts) AS a_ts
        |  FROM events WHERE event_type = 'view'
        |), b AS (
        |  SELECT event_id AS b_id, user_id AS b_user,
        |    date_trunc('microseconds', ts) AS b_ts
        |  FROM events WHERE event_type = 'purchase'
        |), wm AS (
        |  SELECT least(
        |    (epoch_ms(max(CASE WHEN event_type = 'view' THEN ts END)) - 60000),
        |    (epoch_ms(max(CASE WHEN event_type = 'purchase' THEN ts END)) - 30000)
        |  ) * 1000 AS w FROM events
        |), m AS (
        |  SELECT a.a_id, a.a_user, b.b_id FROM a JOIN b
        |  ON a.a_user = b.b_user AND a.a_ts >= b.b_ts
        |    AND a.a_ts <= b.b_ts + INTERVAL 30 MINUTE
        |), unm AS (
        |  SELECT a.a_id, a.a_user, CAST(NULL AS BIGINT) AS b_id FROM a, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM b
        |    WHERE b.b_user = a.a_user AND a.a_ts >= b.b_ts
        |      AND a.a_ts <= b.b_ts + INTERVAL 30 MINUTE)
        |    AND epoch_us(a.a_ts) < wm.w
        |), j AS (SELECT * FROM m UNION ALL SELECT * FROM unm)
        |SELECT c_mktsegment, j.a_id, j.b_id
        |FROM j, customer
        |WHERE j.a_user = c_custkey AND c_acctbal > 0
        |ORDER BY a_id, b_id NULLS FIRST""".stripMargin,
  )
}
