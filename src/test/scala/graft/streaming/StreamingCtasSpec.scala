package graft.streaming

import graft.SparkSpec

/** The streaming-CTAS surface (reference `emr-baseline-testing/queries/
  * q103.sql:12-33`): `CREATE TABLE ... USING <sink> OPTIONS (...,
  * output.mode) AS SELECT ... FROM <stream table>` must execute as a
  * Structured Streaming query, exactly like the INSERT INTO form — the
  * V2 CTAS creates the table, and the AppendData it plans for the query
  * is intercepted by the same post-hoc rewrite.
  */
class StreamingCtasSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def uid(): String = java.util.UUID.randomUUID().toString.replace("-", "")

  test("CTAS over a stream source runs as a streaming query (append + watermark)") {
    val u = uid()
    val sink = s"/tmp/graft_ctas_$u/t"
    GraftSql.runScript(spark,
      s"""CREATE DATABASE IF NOT EXISTS graft_ctas;
         |USE graft_ctas;
         |SET streaming.query.name=g_ctas_$u;
         |SET spark.sql.streaming.checkpointLocation.g_ctas_$u=/tmp/graft_ctasck_$u;
         |DROP TABLE IF EXISTS g_ctas_events;
         |CREATE TABLE g_ctas_events USING log OPTIONS (path '$dir/events.parquet');
         |DROP TABLE IF EXISTS g_ctas_sink;
         |CREATE TABLE g_ctas_sink USING kv OPTIONS (path '$sink', output.mode 'append') AS
         |SELECT event_type, round(sum(value), 2) total
         |FROM (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM g_ctas_events)
         |WHERE delay(ts) < '2 minutes'
         |GROUP BY TUMBLING(ts, interval 1 minute), event_type""".stripMargin)
    val back = spark.read.format("kv").option("path", sink).load()
    assert(back.columns.toSeq == Seq("event_type", "total"))
    // append + 2-minute watermark over a 30-day event spread: nearly every
    // window closes; emitted rows exist and exclude the unclosed tail
    val n = back.count()
    assert(n > 0, "CTAS streaming query wrote no rows")
  }

  test("CTAS append aggregation without watermark is rejected (streaming checker runs)") {
    val u = uid()
    val sink = s"/tmp/graft_ctasbad_$u/t"
    val e = intercept[Exception] {
      GraftSql.runScript(spark,
        s"""CREATE DATABASE IF NOT EXISTS graft_ctas;
           |USE graft_ctas;
           |DROP TABLE IF EXISTS g_ctasbad_events;
           |CREATE TABLE g_ctasbad_events USING log OPTIONS (path '$dir/events.parquet');
           |DROP TABLE IF EXISTS g_ctasbad_sink;
           |CREATE TABLE g_ctasbad_sink USING kv OPTIONS (path '$sink', output.mode 'append') AS
           |SELECT event_type, CAST(count(*) AS BIGINT) cnt
           |FROM g_ctasbad_events GROUP BY event_type""".stripMargin)
    }
    assert(e.getMessage.contains("STREAMING_OUTPUT_MODE") ||
      e.getMessage.contains("without watermark"),
      s"expected the streaming output-mode check, got: ${e.getMessage}")
  }
}
