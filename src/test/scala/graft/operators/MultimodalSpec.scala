package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a small document payload"),
    (2L, "another somewhat longer document payload with more bytes in it"),
    (3L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  private val withPayload = Multimodal.withBinaryPayload(docs, "text")

  test("decodeMeta emits typed metadata struct and respects nulls") {
    val got = Multimodal.decodeMeta(withPayload, "payload")
      .select(col("doc_id"), col("media.format"), col("media.n_bytes"))
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "png") // 24 bytes % 3 == 0
    assert(got(0).getLong(2) == 24L)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2), "null payload → null media")
  }

  test("resize produces width*height/64 byte payloads") {
    val got = Multimodal.resize(withPayload.filter(col("doc_id") < 3), "payload", 64, 32)
      .select(length(col("payload"))).as[Int].collect()
    assert(got.forall(_ == 64 * 32 / 64))
  }

  test("sampleFrames explodes n frames per document") {
    val got = Multimodal.sampleFrames(withPayload, "payload", framesPerDoc = 4)
      .groupBy("doc_id").count().orderBy("doc_id").collect()
    assert(got.length == 2, "null payload row contributes no frames")
    assert(got.forall(_.getLong(1) == 4L))
  }
}
