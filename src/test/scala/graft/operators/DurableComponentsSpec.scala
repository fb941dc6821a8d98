package graft.operators

import java.nio.file.Files
import graft.SparkSpec

/** Cluster durability of connectedComponents: with a checkpoint dir
  * configured, every round materializes through RELIABLE checkpoint
  * files — executor-stored localCheckpoint blocks are non-recoverable
  * on a real cluster (one lost executor kills the job mid-iteration),
  * so losing every cached block must not affect the result here.
  */
class DurableComponentsSpec extends SparkSpec {
  import spark.implicits._

  // chain (forces several pointer-jump rounds) + separate triangle + pair
  private def pairs = (
    (1L to 19L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    ).toDF("id_a", "id_b")

  private def expected: Set[(Long, Long)] =
    ((1L to 20L).map(i => (i, 1L)) ++
      Seq((100L, 100L), (101L, 100L), (102L, 100L), (200L, 200L), (201L, 200L))).toSet

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  private def dropAllCachedBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

  test("checkpoint dir switches rounds to reliable checkpoints; result survives total block loss") {
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("cc-ckpt").toString)
    val comps = Dedup.connectedComponents(pairs)
    assert(comps.rdd.toDebugString.contains("ReliableCheckpointRDD"),
      "rounds must materialize through reliable checkpoint files when a dir is set")
    assert(asSet(comps) == expected)
    // simulate executor loss: destroy every cached block, then read again —
    // the labels must come back from the checkpoint files
    dropAllCachedBlocks()
    assert(asSet(comps) == expected, "result must not depend on cached blocks")
  }

  test("converges while cached blocks are being destroyed mid-run") {
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("cc-ckpt2").toString)
    @volatile var stop = false
    val killer = new Thread(() => {
      while (!stop) { dropAllCachedBlocks(); Thread.sleep(50) }
    })
    killer.setDaemon(true)
    killer.start()
    try assert(asSet(Dedup.connectedComponents(pairs)) == expected)
    finally { stop = true; killer.join() }
  }
}
