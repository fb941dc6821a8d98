package graft.functions

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession

/** ML scoring UDF — the reference's `logistic_regression(modelPath,
  * features)` Hive UDF (SURVEY.md §2.4 U3,
  * `emr-sql/.../LogisticRegressionUDF.scala:36-149`): loads a persisted
  * logistic-regression model once per executor and scores feature rows.
  *
  * The reference hand-parsed the parquet model files
  * (`ParquetFormatModelLoader.scala:1-99`); here the model is a standard
  * `spark.ml` persisted model, loaded lazily once per JVM and scored via
  * its coefficients (sigmoid of the margin) — no per-row model IO, no
  * driver involvement, safe on a 1000-executor scan.
  */
object MlScoring {

  // one model cache per JVM (executor); keyed by path
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Double)]()

  private def coefficients(path: String): (Array[Double], Double) =
    cache.computeIfAbsent(path, p => {
      val m = LogisticRegressionModel.load(p)
      (m.coefficients.toArray, m.intercept)
    })

  /** P(class = 1) for a dense feature array. */
  def score(path: String, features: Seq[Double]): Double = {
    val (w, b) = coefficients(path)
    require(w.length == features.length,
      s"model expects ${w.length} features, got ${features.length}")
    var margin = b
    var i = 0
    while (i < w.length) { margin += w(i) * features(i); i += 1 }
    1.0 / (1.0 + math.exp(-margin))
  }

  /** Score a libsvm-format feature string "i:v j:v ..." (1-based indices)
    * — the reference UDF's second input mode.
    */
  def scoreLibsvm(path: String, libsvm: String, numFeatures: Int): Double = {
    val arr = new Array[Double](numFeatures)
    libsvm.trim.split("\\s+").filter(_.contains(":")).foreach { tok =>
      val Array(i, v) = tok.split(":")
      arr(i.toInt - 1) = v.toDouble
    }
    score(path, arr.toSeq)
  }

  /** Register SQL spellings:
    * `logistic_regression(features_array)` and
    * `logistic_regression_libsvm(str, numFeatures)` bound to `modelPath`
    * (reference registration pattern: `create temporary function`).
    */
  def register(spark: SparkSession, modelPath: String): Unit = {
    spark.udf.register("logistic_regression",
      (features: Seq[Double]) => score(modelPath, features))
    spark.udf.register("logistic_regression_libsvm",
      (s: String, n: Int) => scoreLibsvm(modelPath, s, n))
  }

  /** Spark-idiomatic alternative: the persisted model's own transform. */
  def transform(spark: SparkSession, modelPath: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    LogisticRegressionModel.load(modelPath).transform(df)
}
