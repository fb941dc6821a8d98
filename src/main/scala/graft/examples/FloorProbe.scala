package graft.examples

import org.apache.spark.sql.SparkSession

/** Scratch measurement harness (not a gate): in-JVM interleaved A/B of
  * the q_stream_probe_* gates under different micro-batch conf variants.
  * Delete after use.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tuneForGates(spark)
    val sfDir = "/root/testdata/sf0.1"
    val gates = Seq("q_stream_probe_ingest", "q_stream_probe_windows")

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // variants: (tag, microbatch.aqe, microbatch.partitions)
    val variants = Seq(("sp1-aqeoff", "false", "1"),
      ("sp32-aqeon", "true", "32"), ("sp8-aqeoff", "false", "8"))
    // warmup
    gates.foreach(time)
    val acc = scala.collection.mutable.Map.empty[(String, String),
      scala.collection.mutable.ArrayBuffer[Double]]
    for (round <- 1 to 3; (tag, aqe, sp) <- variants) {
      spark.conf.set("spark.graft.microbatch.aqe", aqe)
      spark.conf.set("spark.graft.microbatch.partitions", sp)
      gates.foreach { g =>
        val dt = time(g)
        acc.getOrElseUpdate((g, tag),
          scala.collection.mutable.ArrayBuffer.empty) += dt
        println(f"[ab] round $round $g $tag: $dt%.2f s")
      }
    }
    acc.toSeq.sortBy(_._1.toString).foreach { case ((g, tag), ts) =>
      val med = ts.sorted.apply(ts.length / 2)
      println(f"[ab-med] $g $tag: $med%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
