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

  test("decodeMeta yields NULL media for unrecognized payloads — never fabricated properties") {
    // text bytes and outright garbage are not readable images: metadata
    // must be null, not invented (a corrupt JPEG in a real pipeline must
    // surface as undecodable)
    val garbage = Seq((4L, Array.fill[Byte](64)(0x7f))).toDF("doc_id", "payload")
    val got = Multimodal.decodeMeta(
        withPayload.select("doc_id", "payload").unionByName(garbage), "payload")
      .select(col("doc_id"), col("media")).orderBy("doc_id").collect()
    assert(got.length == 4)
    assert(got.forall(_.isNullAt(1)),
      "unrecognized or null payloads must carry null media")
  }

  test("resize of an unreadable payload is null, not invented bytes") {
    val got = Multimodal.resize(withPayload.filter(col("doc_id") < 3), "payload", 64, 32)
      .select(col("payload")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("real PNG payloads decode through javax.imageio with true properties") {
    val png = Multimodal.withPngPayload(docs.select("doc_id"), "doc_id")
    val got = Multimodal.decodeMeta(png, "payload")
      .select(col("doc_id"), col("media.format"), col("media.width"),
        col("media.height"), col("media.n_bytes"), length(col("payload")))
      .orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "png")
      assert(r.getInt(2) == (id % 64).toInt + 1, s"width for id=$id")
      assert(r.getInt(3) == (id % 48).toInt + 1, s"height for id=$id")
      assert(r.getLong(4) == r.getInt(5).toLong, "n_bytes is the true payload size")
      // true PNG: magic bytes present
    }
    val bytes = png.select(col("payload")).limit(1).collect()(0).getAs[Array[Byte]](0)
    assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }

  test("resize of a real image is a real scaled image (decodes to the target size)") {
    val png = Multimodal.withPngPayload(docs.select("doc_id"), "doc_id")
    val resized = Multimodal.resize(png, "payload", 16, 12)
    val metas = Multimodal.decodeMeta(resized, "payload")
      .select(col("media.format"), col("media.width"), col("media.height")).collect()
    assert(metas.forall(r => r.getString(0) == "png" && r.getInt(1) == 16 && r.getInt(2) == 12))
  }

  test("sampleFrames: real containers explode frames, unknown containers surface decode_error") {
    // text bytes are NOT a video container: one error row, zero frames
    val unknown = Multimodal.sampleFrames(withPayload, "payload", framesPerDoc = 4)
      .select("doc_id", "frame_idx", "frame", "decode_error").orderBy("doc_id").collect()
    assert(unknown.length == 2, "null payload row contributes no rows")
    unknown.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) &&
        r.getString(3) == "unsupported container",
        s"unknown container must error, not fabricate frames: $r")
    }
    // a real GFV container explodes min(n, framesPerDoc) frames, no error
    val gfv = Multimodal.withGfvPayload(Seq(7L).toDF("doc_id"), "doc_id")
    val got = Multimodal.sampleFrames(gfv, "payload", framesPerDoc = 4).collect()
    assert(got.length == math.min((7 % 4) + 2, 4))
    assert(got.forall(r => r.getAs[String]("decode_error") == null))
  }

  test("AVI/MJPEG: real RIFF walk + per-frame ImageIO decode of real JPEG frames") {
    val ids = Seq(3L, 8L, 14L)
    val avi = Multimodal.withAviPayload(ids.toDF("doc_id"), "doc_id")
    // container walk finds exactly n = id%4+2 frames, each a REAL JPEG
    // decoding to the generator dimensions (w = id%16+1, h = id%12+1)
    val stats = Multimodal.videoFrameStats(avi, "payload")
      .select("doc_id", "frame_idx", "n_pixels").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (id <- ids) {
      val n = (id % 4).toInt + 2
      val px = ((id % 16) + 1) * ((id % 12) + 1)
      (0 until n).foreach(f => assert(stats((id, f)) == px, s"id=$id f=$f"))
      assert(!stats.contains((id, n)), s"id=$id produced extra frames")
    }
    // the raw frame bytes are JPEG (SOI marker), not PNG or raw pixels
    val frame0 = Multimodal.sampleFrames(avi, "payload", framesPerDoc = 1)
      .select("frame").collect().map(_.getAs[Array[Byte]](0))
    frame0.foreach { b =>
      assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8, "JPEG SOI expected")
    }
    // truncated AVI payloads fail the walk cleanly (no invented frames)
    val whole = Multimodal.VideoCodec.encodeAviMjpeg(3L)
    assert(Multimodal.VideoCodec.parseAviFrames(whole.take(whole.length - 5)).isEmpty)
  }

  test("lumaStats reproduces the generator pixels through a real decode") {
    import spark.implicits._
    val df = Multimodal.withPngPayload(Seq(5L).toDF("doc_id"), "doc_id")
    val r = Multimodal.lumaStats(df, "payload").collect()(0)
    // id=5 → 6×6 image; replay the generator + Rec.601 integer luma
    val (w, h) = (6, 6)
    var sum = 0L
    val lumas = for (y <- 0 until h; x <- 0 until w) yield {
      val v = ((5L * 31 + y) * 31 + x) & 0xffffff
      val l = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 + (v & 0xff) * 114) / 1000
      sum += l; l
    }
    assert(r.getAs[Long]("n_pixels") == 36L)
    assert(r.getAs[Long]("sum_luma") == sum)
    assert(r.getAs[Long]("n_bright") == lumas.count(_ * 36 > sum))

    // unreadable payload → null stats, never invented ones
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val rb = Multimodal.lumaStats(bad, "payload").collect()(0)
    assert(rb.isNullAt(rb.fieldIndex("n_pixels")) && rb.isNullAt(rb.fieldIndex("sum_luma")))
  }

  test("imageHash: re-encoded pixels hash identically (content identity, not byte identity)") {
    import spark.implicits._
    val base = Multimodal.withPngPayload(
      Seq(17L, 23L, 40L).toDF("doc_id"), "doc_id")
    // decode and re-encode each PNG: byte-different payloads, same pixels
    val reencoded = base.collect().map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      val bos = new java.io.ByteArrayOutputStream()
      // re-encode through a different image type to vary the byte stream
      val copy = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      copy.getGraphics.drawImage(img, 0, 0, null)
      javax.imageio.ImageIO.write(copy, "png", bos)
      (r.getLong(0), bos.toByteArray)
    }.toSeq
    val reDf = reencoded.toDF("doc_id", "payload")
    val origBytes = base.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(reencoded.exists { case (id, b) => !java.util.Arrays.equals(b, origBytes(id)) },
      "re-encode should change at least one byte stream")
    val h1 = Multimodal.imageHash(base, "payload")
      .select("doc_id", "ahash64").as[(Long, Long)].collect().toMap
    val h2 = Multimodal.imageHash(reDf, "payload")
      .select("doc_id", "ahash64").as[(Long, Long)].collect().toMap
    assert(h1 == h2, s"perceptual hash must survive re-encoding: $h1 vs $h2")
    // distinct images hash differently (content sensitivity)
    assert(h1.values.toSet.size == 3, h1)
    // undecodable payload → null hash
    val bad = Multimodal.imageHash(
      Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"), "payload").collect()(0)
    assert(bad.isNullAt(bad.fieldIndex("ahash64")))
  }

  test("WAV parse reproduces the generator samples through a real RIFF walk") {
    val ids = Seq(0L, 7L, 499L, 1234L)
    val docs = Multimodal.withWavPayload(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.decodeAudioMeta(docs, "payload")
      .select("doc_id", "sample_rate", "n_samples", "duration_ms", "sum_abs", "peak")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    ids.foreach { id =>
      val n = (id % 500).toInt + 100
      val samples = (0 until n).map(i => Multimodal.WavCodec.sampleAt(id, i).toLong)
      val want = (8000, n.toLong, n.toLong * 1000 / 8000,
        samples.map(math.abs).sum, samples.map(math.abs).max)
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
    // sign extension is exercised: at least one tested id's stream wraps
    // negative (not every id does — small ids' ranges stay below 2^15)
    assert(ids.exists { id =>
      val n = (id % 500).toInt + 100
      (0 until n).exists(i => Multimodal.WavCodec.sampleAt(id, i) < 0)
    })
  }

  test("GFV container: real frame walk + per-frame decode reproduce the generator") {
    val ids = Seq(0L, 3L, 17L)
    val docs = Multimodal.withGfvPayload(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.videoFrameStats(docs, "payload")
      .select("doc_id", "frame_idx", "n_pixels", "sum_luma")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    ids.foreach { id =>
      val n = (id % 4).toInt + 2
      val (w, h) = ((id % 16).toInt + 1, (id % 12).toInt + 1)
      (0 until n).foreach { f =>
        val seed = id * 131 + f
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val v = ((seed * 31 + y) * 31 + x).toInt & 0xffffff
          sum += (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 + (v & 0xff) * 114) / 1000
        }
        assert(got((id, f)) == (w.toLong * h, sum), s"id=$id f=$f")
      }
      assert(!got.contains((id, n)), s"id=$id produced extra frames")
    }
    // malformed containers produce zero rows, not invented frames
    val bad = Multimodal.videoFrameStats(
      Seq((9L, "GFV1junkjunk".getBytes("US-ASCII"))).toDF("doc_id", "payload"), "payload")
    assert(bad.count() == 0)
    // sampleFrames prefers the REAL container walk: frames are exact PNGs
    val sampled = Multimodal.sampleFrames(docs, "payload", framesPerDoc = 2)
      .select("doc_id", "frame").collect()
    sampled.foreach { r =>
      val fr = r.getAs[Array[Byte]]("frame")
      assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr)) != null,
        s"sampled frame of doc ${r.getLong(0)} is not a decodable image")
    }
  }

  test("WAV parse: unknown chunks skipped, malformed payloads null out") {
    // hand-build a wav with a junk odd-length chunk BEFORE fmt/data —
    // the walker must skip it (word-aligned) and still parse
    val base = Multimodal.WavCodec.encodeWav(42L)
    val junk = java.nio.ByteBuffer.allocate(8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
      .array()
    val patched = java.nio.ByteBuffer
      .allocate(base.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 12).put(junk).put(base, 12, base.length - 12).array()
    // fix the RIFF size field
    val riffLen = patched.length - 8
    patched(4) = (riffLen & 0xff).toByte
    patched(5) = ((riffLen >> 8) & 0xff).toByte
    patched(6) = ((riffLen >> 16) & 0xff).toByte
    patched(7) = ((riffLen >> 24) & 0xff).toByte
    assert(Multimodal.WavCodec.parse(patched) == Multimodal.WavCodec.parse(base))
    // malformed: truncated, wrong magic, stereo refused
    assert(Multimodal.WavCodec.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.WavCodec.parse("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    val stereo = base.clone(); stereo(22) = 2 // channels field
    assert(Multimodal.WavCodec.parse(stereo).isEmpty)
    val viaDf = Multimodal.decodeAudioMeta(
      Seq((1L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload"), "payload").collect()(0)
    assert(viaDf.isNullAt(viaDf.fieldIndex("n_samples")))
  }

  test("imageNearDup: banded candidates lose nothing vs brute force (pigeonhole)") {
    // 8x8-or-larger generated PNGs; compare the banded operator against
    // a brute-force all-pairs pass over the same decoded hashes
    val ids = (0L until 400L).filter(i => i % 64 >= 7 && i % 48 >= 7)
    val docs = Multimodal.withPngPayload(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.imageNearDup(docs, "payload", "doc_id",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val hashes = Multimodal.imageHash(docs, "payload")
      .select(col("doc_id"), col("ahash64"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (ia, ib, d)).sorted.toSeq
    assert(got == brute)
    assert(brute.nonEmpty, "fixture should produce near-dup pairs")
  }

  test("mp4 box walk reads brand/duration/tracks/codecs from the real structure") {
    // both track shapes, a v1 mvhd, and malformed payloads
    val m1 = Multimodal.Mp4Codec.parseMeta(Multimodal.Mp4Codec.encodeMp4(7L)).get
    assert(m1.majorBrand == "isom" && m1.timescale == 600L)
    assert(m1.durationUnits == (7 % 97 + 3) * 600L)
    assert(m1.nTracks == 1 && m1.codecs == Seq("avc1"))
    val m2 = Multimodal.Mp4Codec.parseMeta(Multimodal.Mp4Codec.encodeMp4(12L)).get
    assert(m2.nTracks == 2 && m2.codecs == Seq("avc1", "mp4a"))
    // sample tables (stsz both layouts + stco): per-sample video sizes,
    // uniform audio sizes, one chunk per track — replayed from the
    // fixture formulas
    val nv7 = 7 % 7 + 2
    assert(m1.samples == Seq(Multimodal.Mp4Codec.TrackSamples(
      nv7, (0 until nv7).map(i => 100L + (7 + i) % 50).sum, 1L)))
    val nv12 = 12 % 7 + 2
    val na12 = 12 % 5 + 1
    assert(m2.samples == Seq(
      Multimodal.Mp4Codec.TrackSamples(
        nv12, (0 until nv12).map(i => 100L + (12 + i) % 50).sum, 1L),
      Multimodal.Mp4Codec.TrackSamples(na12, na12 * (40L + 12 % 20), 1L)))
    // truncation / garbage / text → None, never invented metadata
    val bytes = Multimodal.Mp4Codec.encodeMp4(12L)
    assert(Multimodal.Mp4Codec.parseMeta(bytes.take(bytes.length - 3)).isEmpty)
    assert(Multimodal.Mp4Codec.parseMeta("not a container at all".getBytes).isEmpty)
    assert(Multimodal.Mp4Codec.parseMeta(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("an EMPTY full box at the buffer end yields None, never a crash") {
    // structurally valid walk whose mvhd has a zero-length body: the
    // version-byte read must be guarded (untrusted-payload contract)
    def be32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    val ftyp = be32(16L) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    val emptyMvhd = be32(8L) ++ "mvhd".getBytes("US-ASCII")
    val moov = be32(8L + emptyMvhd.length) ++ "moov".getBytes("US-ASCII") ++ emptyMvhd
    assert(Multimodal.Mp4Codec.parseMeta(ftyp ++ moov).isEmpty)
  }

  test("mvhd version 1 layout parses (64-bit duration offsets)") {
    // splice a v1 mvhd into an encoded file: version byte 1, 8-byte
    // creation/modification, 4-byte timescale, 8-byte duration
    def be32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def be64(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    val mvhdBody = Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(123456789L) ++ be32(0x00010000) ++ be32(0x01000000) ++
      Array.fill[Byte](8 + 36 + 24 + 4)(0)
    val mvhd = be32(8L + mvhdBody.length) ++ "mvhd".getBytes("US-ASCII") ++ mvhdBody
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    val ftyp = be32(16L) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    val m = Multimodal.Mp4Codec.parseMeta(ftyp ++ moov).get
    assert(m.timescale == 90000L && m.durationUnits == 123456789L && m.nTracks == 0)
  }

  test("videoContainerMeta: mp4 metadata is real, frames stay honestly undecodable") {
    val ids = Seq(6L, 7L).toDF("doc_id")
    val mp4 = Multimodal.withMp4Payload(ids, "doc_id")
    val meta = Multimodal.videoContainerMeta(mp4, "payload")
      .select("doc_id", "container", "major_brand", "duration_ms", "n_tracks",
        "codecs", "decode_error")
      .orderBy("doc_id").collect()
    assert(meta(0).getString(1) == "mp4" && meta(0).getString(2) == "isom")
    assert(meta(0).getLong(3) == (6 % 97 + 3) * 1000L)
    assert(meta(0).getInt(4) == 2 && meta(0).getString(5) == "avc1,mp4a")
    assert(meta(1).getInt(4) == 1 && meta(1).getString(5) == "avc1")
    assert(meta.forall(_.isNullAt(6)))
    // the frame path must NOT fabricate frames from the recognized mp4 —
    // it errors with the specific truth (container ok, no JVM codec)
    val frames = Multimodal.sampleFrames(mp4, "payload", 4)
      .select("doc_id", "frame_idx", "decode_error").collect()
    assert(frames.length == 2)
    assert(frames.forall(_.isNullAt(1)))
    assert(frames.forall(_.getString(2).contains("no JVM decoder")))
    // GFV/AVI payloads report their container + frame count; garbage errors
    val gfv = Multimodal.withGfvPayload(Seq(5L).toDF("doc_id"), "doc_id")
    val g = Multimodal.videoContainerMeta(gfv, "payload")
      .select("container", "n_frames", "decode_error").head()
    assert(g.getString(0) == "gfv" && g.getInt(1) == (5 % 4 + 2) && g.isNullAt(2))
    val bad = Seq((9L, "plain text bytes")).toDF("doc_id", "text")
    val b = Multimodal.videoContainerMeta(
        Multimodal.withBinaryPayload(bad, "text"), "payload")
      .select("container", "decode_error").head()
    assert(b.isNullAt(0) && b.getString(1) == "unsupported container")
  }
}
