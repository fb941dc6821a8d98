package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan diagnostics: print the optimized/physical plan of a q15-shaped
  * join over the kv/log sources (`runMain graft.PlanProbe <sfDir>`).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = spark.read.format("log").option("path", s"$dir/lineitem.parquet").load()
    val c = spark.read.format("kv").option("path", s"$dir/customer.parquet").load()
    val o = spark.read.format("kv").option("path", s"$dir/orders.parquet").load()
    l.createOrReplaceTempView("l"); c.createOrReplaceTempView("c"); o.createOrReplaceTempView("o")
    val df = spark.sql(
      """SELECT substr(c_name, 15, 3) zip, round(sum(l_extendedprice), 2) net
        |FROM l, o, c
        |WHERE l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey
        |  AND (substr(c_name, 15, 3) IN ('000', '001', '012', '123', '055',
        |                                 '101', '144', '077', '033')
        |  OR c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
        |  OR l_extendedprice > 500)
        |  AND quarter(o_orderdate) = 2 AND year(o_orderdate) = 1996
        |GROUP BY substr(c_name, 15, 3)""".stripMargin)
    df.explain("formatted")
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.toString.take(4000))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"=== batch run: ${(System.nanoTime() - t0) / 1e9} s")
    spark.stop()
  }
}
