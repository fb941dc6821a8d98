package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val Bits = 4096
  private val Hashes = 5

  private def buildBloom(hashes: Seq[Long], partitions: Int): Array[Byte] =
    hashes.toDF("h").repartition(partitions)
      .agg(BloomFilterSketch.bloomAgg(col("h"), Bits, Hashes).as("bloom"))
      .collect()(0).getAs[Array[Byte]]("bloom")

  test("no false negatives, bounded false positives") {
    val inserted = (0L until 300L).map(Sketches.splitmix64)
    val bits = buildBloom(inserted, partitions = 1)
    val bitsDf = Seq(Tuple1(bits)).toDF("bloom")

    def contained(hs: Seq[Long]): Seq[Boolean] =
      hs.toDF("h").crossJoin(broadcast(bitsDf))
        .select(BloomFilterSketch.mightContain(col("bloom"), col("h"), Bits, Hashes))
        .as[Boolean].collect().toSeq

    // every inserted hash answers true — the load-bearing guarantee
    assert(contained(inserted).forall(identity))

    // disjoint probes: fp rate stays near the analytic estimate
    val probes = (1000L until 6000L).map(i => Sketches.splitmix64(i * 7919L + 1))
    val fp = contained(probes).count(identity).toDouble / probes.size
    // load 300*5/4096 ≈ 0.37 → fp ≈ (1-e^-0.37)^5 ≈ 0.3%; allow 10× slack
    assert(fp < 0.03, s"false-positive rate $fp out of band")
  }

  test("filter is partition-invariant (merge is a commuting bitset OR)") {
    val hashes = (0L until 500L).map(i => Sketches.splitmix64(i ^ 0x1234L))
    assert(java.util.Arrays.equals(buildBloom(hashes, 1), buildBloom(hashes, 7)))
  }

  test("decontaminateBloom is bit-identical to the exact path under forced fps") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val corpus = (0L until 80L).map { i =>
      mk(i, (0 until 12).map(j => s"w${(i * 31 + j * 7) % 97}"))
    } ++ Seq(mk(900L, Seq("bench", "mark", "leak", "tail", "words")))
    val benchmark = Seq(mk(1000L, Seq("bench", "mark", "leak", "extra")),
      mk(1001L, Seq("other", "eval", "set", "rows")))
    val corpusDf = corpus.toDF("doc_id", "text")
    val benchDf = benchmark.toDF("doc_id", "text")

    // 64-bit filter for ~10 benchmark shingles → heavy false positives;
    // the result must still equal the exact path's
    val exact = graft.operators.Dedup.decontaminate(
      corpusDf, benchDf, "text", "doc_id", n = 3, minOverlap = 1, maxShingleDf = 100)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val viaBloom = graft.operators.Dedup.decontaminateBloom(
      corpusDf, benchDf, "text", "doc_id", n = 3, minOverlap = 1, maxShingleDf = 100,
      numBits = 64, numHashes = 2)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaBloom == exact)
    assert(exact.exists(_.head == 900L), "the planted leak must be flagged")
  }

  test("decontaminateBloom keeps the corpus off the shuffle until candidates") {
    val corpusDf = (0L until 20L).map(i => (i, s"a b c d$i")).toDF("doc_id", "text")
    val benchDf = Seq((100L, "a b c")).toDF("doc_id", "text")
    val plan = graft.operators.Dedup.decontaminateBloom(
        corpusDf, benchDf, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // the bloom row and the exact shingle set both reach the corpus as
    // broadcasts; no sort-merge join may touch the corpus side
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$plan")
  }
}
