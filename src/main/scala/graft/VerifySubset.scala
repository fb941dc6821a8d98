package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Verify, restricted to a name-prefix subset — fast local iteration on a
  * group of gates (`runMain graft.VerifySubset <sfDir> <outDir> <prefixes>`,
  * comma-separated).
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, prefixArg) = args
    val prefixes = prefixArg.split(",").map(_.trim).filter(_.nonEmpty)
    def matches(name: String): Boolean = prefixes.exists(name.startsWith)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tuneForGates(spark)
    new java.io.File(outDir).mkdirs()
    val subset = SparkEntry.queries.filter(p => matches(p._1))
    subset.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[verify-subset] $name OK")
      } catch { case e: Throwable =>
        println(s"[verify-subset] $name FAILED: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(p => matches(p._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
