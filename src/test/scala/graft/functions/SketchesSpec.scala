package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tomorrow")
  private val different = "completely unrelated content about databases and distributed systems design"

  test("minhash signature is deterministic and sized") {
    val df = Seq(base, base, nearDup).toDF("text")
      .select(Sketches.minhashSignature(col("text"), 64, 3).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1), "same text must give identical signatures")
    assert(sigs.forall(_.length == 64))
    assert(sigs(0) != sigs(2))
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    val df = Seq((base, nearDup), (base, different)).toDF("a", "b")
      .select(Sketches.minhashJaccard(
        Sketches.minhashSignature(col("a"), 256, 3),
        Sketches.minhashSignature(col("b"), 256, 3)).as("est"))
    val Array(nearEst, farEst) = df.collect().map(_.getDouble(0))
    // exact 3-shingle jaccard of base vs nearDup: 10 shared / 12 union = 0.8333
    assert(math.abs(nearEst - 10.0 / 12.0) < 0.1, s"near estimate $nearEst")
    assert(farEst < 0.1, s"far estimate $farEst")
  }

  test("simhash hamming distance separates near from far") {
    val df = Seq((base, nearDup), (base, different)).toDF("a", "b")
      .select(Sketches.hammingDistance(
        Sketches.simhash64(col("a")), Sketches.simhash64(col("b"))).as("d"))
    val Array(near, far) = df.collect().map(_.getAs[Number](0).longValue)
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16, s"near-dup hamming $near")
  }

  test("winnowing fingerprints overlap for shared substrings") {
    val df = Seq((base, base + " extra tail words"), (base, different)).toDF("a", "b")
      .select(size(array_intersect(
        Sketches.winnowingFingerprints(col("a")),
        Sketches.winnowingFingerprints(col("b")))).as("common"),
        size(Sketches.winnowingFingerprints(col("a"))).as("na"))
    val rows = df.collect()
    assert(rows(0).getInt(0) > rows(0).getInt(1) / 2, "shared prefix ⇒ most fingerprints shared")
    assert(rows(1).getInt(0) <= 1, "unrelated texts share ~no fingerprints")
  }

  test("hyperplane sketch hamming tracks angular distance") {
    val v = Array.tabulate(32)(i => math.sin(i + 1).toFloat)
    val nearV = v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val farV = v.map(x => -x)
    val df = Seq((v.toSeq, nearV.toSeq), (v.toSeq, farV.toSeq)).toDF("a", "b")
      .select(Sketches.hammingDistance(
        Sketches.hyperplaneSketch(col("a"), 64),
        Sketches.hyperplaneSketch(col("b"), 64)).as("d"))
    val Array(near, far) = df.collect().map(_.getAs[Number](0).longValue)
    assert(near <= 2, s"near vectors hamming $near")
    assert(far >= 60, s"opposite vectors hamming $far")
  }

  test("null inputs propagate as null") {
    val df = Seq[Option[String]](None).toDF("text")
      .select(Sketches.minhashSignature(col("text")).as("sig"),
        Sketches.simhash64(col("text")).as("sh"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
