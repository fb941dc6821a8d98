package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.ParquetIO

/** Per-row op-type merge into a kv table — the reference's Kudu
  * `merge(data, opTypeColumn)` writer (SURVEY.md §2 W7,
  * `emr-kudu/.../KuduUpdatableRelation.scala:38-74`,
  * `KuduOperator.scala:1-72`): each row carries its own operation.
  *
  * | op      | semantics (KuduSourceProvider.scala:86-95)            |
  * |---------|-------------------------------------------------------|
  * | INSERT  | add row; ignored if the key already exists            |
  * | UPSERT  | add or replace by key                                 |
  * | UPDATE  | replace only if the key exists                        |
  * | DELETE  | remove the row for the key                            |
  *
  * Implementation is a shuffle-on-key anti/semi-join rewrite (no
  * driver-side loop); the result atomically replaces the table via
  * write-to-temp + rename — the batch analogue of a storage-engine merge.
  * On a real cluster this is the copy-on-write table pattern; a
  * merge-on-read variant would keep the delta as a changelog and fold at
  * scan time (see graft.sources.cdc.Cdc.applyChanges).
  */
object KvMerge {

  val Ops: Set[String] = Set("INSERT", "UPSERT", "UPDATE", "DELETE")

  def merge(spark: SparkSession, path: String, data: DataFrame,
      opCol: String, pks: Seq[String]): Unit = {
    require(data.columns.contains(opCol), s"missing op column $opCol")
    pks.foreach(pk => require(data.columns.contains(pk), s"missing pk column $pk"))

    val hasTable = ParquetIO.listFiles(path).nonEmpty
    val target =
      if (hasTable) spark.read.format("kv").option("path", path).load()
      else data.drop(opCol).limit(0)

    val ops = upper(col(opCol))
    val touchedKeys = data.filter(ops.isin("UPSERT", "UPDATE", "DELETE"))
      .select(pks.map(col): _*).distinct()
    val kept = target.join(touchedKeys, pks, "left_anti")
    val upserts = data.filter(ops === "UPSERT").drop(opCol)
    val updates = data.filter(ops === "UPDATE").drop(opCol)
      .join(target.select(pks.map(col): _*), pks, "left_semi")
    val inserts = data.filter(ops === "INSERT").drop(opCol)
      .join(target.select(pks.map(col): _*), pks, "left_anti")
    val result = kept.unionByName(upserts).unionByName(updates).unionByName(inserts)

    // materialize to temp, then swap — the read side is lazy, so writing
    // in place would consume our own output
    val tmp = s"$path.merge-tmp"
    ParquetIO.deletePath(tmp)
    result.write.format("kv").option("path", tmp).mode("append").save()
    val fs = new Path(path).getFileSystem(ParquetIO.hadoopConf)
    ParquetIO.deletePath(path)
    fs.rename(new Path(tmp), new Path(path))
  }
}
