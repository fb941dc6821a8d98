package graft.functions

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinlogMlSpec extends SparkSpec {
  import spark.implicits._

  test("binlog_parser decodes Avro records into the 9-column layout (U2)") {
    val bytes1 = BinlogAvro.encode(1L, "db1", "db1.users", "UPDATE", 1700000000000L,
      Map("tag" -> "x"), Seq("id", "name"),
      before = Map("id" -> "1", "name" -> "old"),
      after = Map("id" -> "1", "name" -> "new"))
    val bytes2 = BinlogAvro.encode(2L, "db1", "db1.users", "INSERT", 1700000001000L,
      Map.empty, Seq("id"), Map.empty, Map("id" -> "2"))
    val df = Seq(bytes1, bytes2).toDF("value")
      .select(BinlogAvro.binlogParser(col("value")))
    assert(df.columns.toSeq == Seq("recordID", "source", "dbTable", "recordType",
      "recordTimestamp", "extraTags", "fields", "beforeImages", "afterImages"))
    val rows = df.orderBy("recordID").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("recordType") == "UPDATE")
    assert(rows(0).getAs[Map[String, String]]("afterImages").toMap ==
      Map("id" -> "1", "name" -> "new"))
    assert(rows(0).getAs[Map[String, String]]("beforeImages")("name") == "old")
    assert(rows(0).getAs[java.sql.Timestamp]("recordTimestamp").getTime == 1700000000000L)
    assert(rows(1).getAs[scala.collection.Seq[String]]("fields").toSeq == Seq("id"))
    // null payloads produce no rows (generator semantics)
    val withNull = Seq[Option[Array[Byte]]](Some(bytes1), None).toDF("value")
      .select(BinlogAvro.binlogParser(col("value")))
    assert(withNull.count() == 1)
  }

  test("logistic regression scoring matches spark.ml transform (U3)") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val train = Seq(
      (0.0, Vectors.dense(0.0, 0.1)), (0.0, Vectors.dense(0.2, 0.0)),
      (0.0, Vectors.dense(0.1, 0.2)), (1.0, Vectors.dense(2.0, 1.8)),
      (1.0, Vectors.dense(1.9, 2.1)), (1.0, Vectors.dense(2.2, 2.0)))
      .toDF("label", "features")
    val model = new LogisticRegression().setMaxIter(50).fit(train)
    val path = Files.createTempDirectory("lrmodel").toString + "/model"
    model.save(path)

    // scores agree with the model's own probability output
    val expected = model.transform(train)
      .select(expr("probability")).collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0)(1))
    MlScoring.register(spark, path)
    val viaUdf = Seq(Seq(2.0, 2.0)).toDF("f")
      .select(expr("logistic_regression(f)")).head().getDouble(0)
    assert(math.abs(viaUdf - MlScoring.score(path, Seq(2.0, 2.0))) < 1e-12)
    val gotDirect = Seq(
      MlScoring.score(path, Seq(0.0, 0.1)), MlScoring.score(path, Seq(0.2, 0.0)),
      MlScoring.score(path, Seq(0.1, 0.2)), MlScoring.score(path, Seq(2.0, 1.8)),
      MlScoring.score(path, Seq(1.9, 2.1)), MlScoring.score(path, Seq(2.2, 2.0)))
    expected.zip(gotDirect).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-9, s"$e vs $g")
    }
    assert(MlScoring.score(path, Seq(2.0, 2.0)) > 0.9)
    assert(MlScoring.score(path, Seq(0.0, 0.0)) < 0.1)
    // libsvm input mode
    assert(math.abs(MlScoring.scoreLibsvm(path, "1:2.0 2:2.0", 2) -
      MlScoring.score(path, Seq(2.0, 2.0))) < 1e-12)
  }

  test("warehouse partitioned save/read with dynamic partition overwrite (W10/S5)") {
    import graft.sources.Warehouse
    val dir = Files.createTempDirectory("wh").toString + "/t"
    val v1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("id", "dt", "v")
    Warehouse.saveTable(v1, dir, Seq("dt"), overwritePartitions = false)
    assert(Warehouse.readTable(spark, dir).count() == 2)
    // overwrite only the 01-02 partition
    val v2 = Seq((3L, "2024-01-02", 99.0)).toDF("id", "dt", "v")
    Warehouse.saveTable(v2, dir, Seq("dt"), overwritePartitions = true)
    val after = Warehouse.readTable(spark, dir)
    assert(after.count() == 2)
    assert(after.filter(col("dt") === "2024-01-02").select("id").as[Long].head() == 3L)
    // partition pruning reaches the plan
    val pruned = Warehouse.readTable(spark, dir).filter(col("dt") === "2024-01-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan.take(500))
  }
}
