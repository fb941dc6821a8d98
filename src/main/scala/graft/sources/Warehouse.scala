package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SaveMode, SparkSession}

/** Warehouse-table surface — the reference's ODPS/MaxCompute connector
  * semantics on local partitioned parquet (SURVEY.md §2 S5 scan, S11
  * typed read, W10 writer).
  *
  * The reference reads via tunnel sessions with partition-spec pruning
  * (`ODPSRelation.scala:62-99`) and writes with create/overwrite-partition
  * DDL (`ODPSWriter.scala:57-167`, `OdpsUtils.scala:79-343`). Spark-first
  * equivalents: hive-style partition directories (Catalyst partition
  * pruning replaces partition-spec selection) and dynamic
  * partition-overwrite (replaces drop/create partition).
  */
object Warehouse {

  /** W10: save with partition columns; `overwritePartitions = true`
    * replaces only the partitions present in `df` (dynamic overwrite —
    * the ODPS `isOverWrite` partition semantics), otherwise appends.
    */
  def saveTable(df: DataFrame, dir: String, partitionBy: Seq[String],
      overwritePartitions: Boolean): Unit = {
    val writer = df.write.format("parquet").partitionBy(partitionBy: _*)
    if (overwritePartitions) {
      writer.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .save(dir)
    } else {
      writer.mode(SaveMode.Append).save(dir)
    }
  }

  /** S5: partition-pruned scan; filters on partition columns prune
    * directories before any file IO (visible as PartitionFilters in the
    * plan).
    */
  def readTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** S11: typed read — the reference's `OdpsOps.readTable[T]`
    * (`OdpsOps.scala:329-398`) maps records through a user transfer
    * function into an RDD[T]; the Dataset encoder is the Spark-4 shape of
    * the same contract.
    */
  def readTyped[T: Encoder](spark: SparkSession, dir: String): Dataset[T] =
    spark.read.parquet(dir).as[T]
}
