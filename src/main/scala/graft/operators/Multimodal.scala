package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns next to a typed metadata
  * struct — the layout that scales: bytes stay columnar in parquet,
  * metadata predicates prune row groups without touching payloads,
  * and per-batch decode runs inside `mapPartitions` with bounded memory.
  *
  * Image decode/resize is REAL — [[ImageCodec]] uses the JDK's
  * `javax.imageio` (no external dependency): metadata comes from a
  * header-only probe (no pixel decode on the metadata path), resize
  * re-encodes through `BufferedImage`. Payloads no installed reader
  * recognizes yield NULL metadata / null resize output — undecodable
  * input surfaces as undecodable. Video goes through REAL container
  * walks ([[VideoCodec]]: the GFV frame-index container and AVI/MJPEG
  * RIFF forms) with per-frame ImageIO decode; containers the stack
  * doesn't understand (mp4/webm — the JDK ships no demuxer for them)
  * surface a `decode_error`, never fabricated frames.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Real image codec over the JDK's `javax.imageio` — headless-safe,
    * zero added dependencies.
    */
  object ImageCodec {
    /** Header-only metadata probe: (format, width, height), or None when
      * no installed ImageIO reader recognizes the bytes. Reads only the
      * image header — the metadata path over a 100 TB corpus must not
      * decode pixels.
      */
    def probe(payload: Array[Byte]): Option[(String, Int, Int)] = {
      // Fast path: parse the PNG IHDR directly (signature + first chunk,
      // fixed offsets per the PNG spec). ImageIO instantiates a reader +
      // input stream per call (~1 ms) — far too heavy as the per-row cost
      // of a metadata scan over a 100 TB corpus; header parsing is the
      // same real decode without the plugin machinery.
      pngHeader(payload).orElse(imageIoProbe(payload))
    }

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def pngHeader(p: Array[Byte]): Option[(String, Int, Int)] = {
      def be32(off: Int): Int =
        ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      if (p.length >= 24 && p.take(8).sameElements(PngSig) &&
          p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        Some(("png", be32(16), be32(20)))
      else None
    }

    private def imageIoProbe(payload: Array[Byte]): Option[(String, Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
          } catch { case _: Exception => None } finally r.dispose()
        }
      } finally iis.close()
    }

    /** Deterministic PNG payload: width × height, pixel RGB derived from
      * (seed, x, y). Used by fixtures/tests to exercise the real decode
      * path with known properties.
      */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, ((seed * 31 + y) * 31 + x).toInt & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real resize: decode, scale with bilinear interpolation, re-encode
      * as PNG. None if the payload isn't a readable image.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      val img = try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      } catch { case _: Exception => None }
      img.map { src =>
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** Minimal REAL video container (an MJPEG-style frame concatenation):
    * magic "GFV1" | frame count (BE int32) | per-frame byte length (BE
    * int32 each) | concatenated PNG frames. Both directions live here so
    * the video gates stage real container bytes and the parser proves it
    * walks them back — the [[WavCodec]] treatment, for video.
    */
  object VideoCodec {
    def encodeGfv(id: Long): Array[Byte] = {
      val n = (id % 4).toInt + 2
      val frames = (0 until n).map(f =>
        ImageCodec.encodePng((id % 16).toInt + 1, (id % 12).toInt + 1, id * 131 + f))
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write("GFV1".getBytes("US-ASCII"))
      out.writeInt(n)
      frames.foreach(fr => out.writeInt(fr.length))
      frames.foreach(out.write)
      bos.toByteArray
    }

    /** Real container walk: verify magic, read the frame index, slice
      * exact frame payloads; anything malformed (bad magic, negative or
      * overflowing lengths, truncation) → None.
      */
    def parseFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
      if (p == null || p.length < 8) return None
      if (new String(p, 0, 4, "US-ASCII") != "GFV1") return None
      def be32(off: Int): Int =
        ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      val n = be32(4)
      if (n < 0 || 8 + 4L * n > p.length) return None
      val lens = (0 until n).map(i => be32(8 + 4 * i))
      if (lens.exists(_ < 0)) return None
      val total = lens.foldLeft(0L)(_ + _)
      val dataOff = 8 + 4 * n
      if (dataOff + total != p.length) return None
      var off = dataOff
      Some(lens.map { l =>
        val fr = java.util.Arrays.copyOfRange(p, off, off + l)
        off += l
        fr
      })
    }

    /** REAL AVI/MJPEG fixture encoder: a standards-shaped RIFF('AVI ')
      * form — LIST('hdrl') with the avih main header and one 'vids'
      * stream (strh fourcc 'MJPG' + strf BITMAPINFOHEADER), then
      * LIST('movi') carrying each frame as an '00dc' chunk of REAL JPEG
      * bytes (ImageIO-encoded). Frame count / dimensions / pixel seed
      * follow the GFV formula (n = id%4+2, w = id%16+1, h = id%12+1,
      * seed id·131+f) so structural oracles are shared.
      */
    def encodeAviMjpeg(id: Long): Array[Byte] = {
      val n = (id % 4).toInt + 2
      val w = (id % 16).toInt + 1
      val h = (id % 12).toInt + 1
      val frames = (0 until n).map { f =>
        val seed = id * 131 + f
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((seed * 31 + y) * 31 + x).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put(fourcc.getBytes("US-ASCII")).putInt(body.length).put(body)
        if ((body.length & 1) == 1) buf.put(0.toByte) // word alignment
        buf.array()
      }
      def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
        val inner = bodies.foldLeft(Array.emptyByteArray)(_ ++ _)
        val buf = java.nio.ByteBuffer.allocate(12 + inner.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("LIST".getBytes("US-ASCII")).putInt(4 + inner.length)
          .put(listType.getBytes("US-ASCII")).put(inner)
        buf.array()
      }
      def le(fields: Seq[Int]): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(4 * fields.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        fields.foreach(buf.putInt)
        buf.array()
      }
      val fourccMjpg = java.nio.ByteBuffer.wrap("MJPG".getBytes("US-ASCII"))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val fourccVids = java.nio.ByteBuffer.wrap("vids".getBytes("US-ASCII"))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      // avih: usPerFrame, maxBytesPerSec, pad, flags, totalFrames, initial,
      // streams, bufSize, w, h, reserved[4]
      val avih = chunk("avih", le(Seq(
        100000, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)))
      // strh: fccType 'vids', handler 'MJPG', flags, prio+lang, initial,
      // scale, rate, start, length, bufSize, quality, sampleSize, frame rect
      val strh = chunk("strh", le(Seq(
        fourccVids, fourccMjpg, 0, 0, 0, 1, 10, 0, n, 0, -1, 0, 0, 0)))
      // strf: BITMAPINFOHEADER (size 40, w, h, planes|bitcount,
      // compression 'MJPG', imageSize, ppm x/y, clrUsed, clrImportant)
      val strf = chunk("strf", le(Seq(
        40, w, h, 1 | (24 << 16), fourccMjpg, w * h * 3, 0, 0, 0, 0)))
      val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
      val movi = list("movi", frames.map(chunk("00dc", _)))
      val form = hdrl ++ movi
      val buf = java.nio.ByteBuffer.allocate(12 + form.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + form.length)
        .put("AVI ".getBytes("US-ASCII")).put(form)
      buf.array()
    }

    /** REAL AVI container walk (the [[WavCodec]] RIFF discipline, for
      * video): verify the RIFF/'AVI ' form, walk top-level chunks to the
      * LIST('movi'), collect each video frame chunk's payload ('00dc'
      * compressed / '00db' uncompressed, any stream number). Anything
      * malformed — bad magic, overflowing lengths, truncation — → None,
      * never invented frames. Frame bytes are whatever the container
      * carries (JPEG for MJPEG files); the consumer decodes them with
      * ImageIO and surfaces per-frame failures.
      */
    def parseAviFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
      if (p == null || p.length < 12) return None
      def ascii(off: Int, n: Int) = new String(p, off, n, "US-ASCII")
      def le32(off: Int): Int =
        (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
          ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def isFrameChunk(cid: String): Boolean =
        cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
          (cid.substring(2) == "dc" || cid.substring(2) == "db")
      def walkMovi(start: Int, end: Int): Boolean = {
        var off = start
        while (off + 8 <= end) {
          val cid = ascii(off, 4); val clen = le32(off + 4)
          if (clen < 0 || off + 8 + clen > end) return false
          if (isFrameChunk(cid))
            frames += java.util.Arrays.copyOfRange(p, off + 8, off + 8 + clen)
          off += 8 + clen + (clen & 1)
        }
        true
      }
      var off = 12
      while (off + 8 <= p.length) {
        val cid = ascii(off, 4); val clen = le32(off + 4)
        if (clen < 0 || off + 8 + clen > p.length) return None
        if (cid == "LIST" && clen >= 4 && ascii(off + 8, 4) == "movi") {
          if (!walkMovi(off + 12, off + 8 + clen)) return None
        }
        off += 8 + clen + (clen & 1)
      }
      if (frames.isEmpty) None else Some(frames.toSeq)
    }

    /** Container dispatch: GFV first (fixed offsets), then AVI. */
    def parseAnyFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] =
      parseFrames(p).orElse(parseAviFrames(p))
  }

  /** ISO BMFF (mp4) BOX-STRUCTURE walk — container-level metadata for
    * the dominant real-world video format. The JDK ships no H.264/AAC
    * codec, so FRAMES keep the decode_error honesty contract
    * ([[sampleFrames]]); what CAN be answered honestly is the box
    * structure itself: major brand (ftyp), movie timescale + duration
    * (moov/mvhd, version 0 and 1 layouts), track count (trak boxes) and
    * each track's sample-entry codec fourcc (trak/mdia/minf/stbl/stsd)
    * — pure big-endian size/type box parsing, the same discipline as
    * the RIFF walks ([[WavCodec]]/[[VideoCodec.parseAviFrames]]).
    * Anything malformed (bad sizes, truncation, missing moov/mvhd) →
    * None, never invented properties. Public layout: ISO/IEC 14496-12.
    */
  object Mp4Codec {

    /** Per-track sample-table statistics from stsz (count + byte total,
      * both the uniform-size and per-sample-size layouts) and stco
      * (chunk count) — the size/bitrate truth a triage pass reads
      * without touching any codec.
      */
    case class TrackSamples(sampleCount: Long, totalBytes: Long, chunkCount: Long)

    case class Mp4Meta(majorBrand: String, timescale: Long, durationUnits: Long,
        nTracks: Int, codecs: Seq[String], samples: Seq[TrackSamples])

    /** Minimal standards-shaped mp4 fixture, deterministic from `id`:
      * ftyp('isom') + moov(mvhd timescale 600, duration (id%97+3)*600;
      * one 'avc1' video trak, plus one 'mp4a' audio trak when id%3==0 —
      * each with tkhd/mdia/mdhd/hdlr/minf/stbl/stsd) + an opaque mdat. Sample tables beyond stsd are elided: the fixture
      * exists to prove the METADATA walk; its frames are intentionally
      * undecodable (no JVM codec), which is exactly what the frame path
      * must surface.
      */
    def encodeMp4(id: Long): Array[Byte] = {
      def box(tpe: String, body: Array[Byte]): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(8 + body.length)
        buf.putInt(8 + body.length).put(tpe.getBytes("US-ASCII")).put(body)
        buf.array()
      }
      def be(fields: Seq[Int]): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(4 * fields.length)
        fields.foreach(buf.putInt)
        buf.array()
      }
      val timescale = 600
      val durationUnits = ((id % 97) + 3).toInt * 600
      val nTracks = if (id % 3 == 0) 2 else 1

      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be(Seq(512)) ++
          "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
      // mvhd v0: ver/flags, creation, modification, timescale, duration,
      // rate 1.0, volume 1.0 (+reserved), reserved[2], unity matrix,
      // predefined[6], next track id
      val mvhd = box("mvhd", be(Seq(
        0, 0, 0, timescale, durationUnits, 0x00010000, 0x01000000, 0, 0,
        0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
        0, 0, 0, 0, 0, 0, nTracks + 1)))
      def trak(trackId: Int, handler: String, codec: String): Array[Byte] = {
        val tkhd = box("tkhd", be(Seq(
          7, 0, 0, trackId, 0, durationUnits, 0, 0, 0, 0, 0,
          0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000, 0, 0)))
        val mdhd = box("mdhd", be(Seq(0, 0, 0, timescale, durationUnits,
          0x55C40000))) // lang 'und' + predefined
        val hdlr = box("hdlr", be(Seq(0, 0)) ++
          handler.getBytes("US-ASCII") ++ be(Seq(0, 0, 0)) ++ Array(0.toByte))
        // one sample entry: 6 reserved bytes + data_ref_index, then a
        // codec-shaped body (dimensions/rates for video, channel/rate
        // for audio) — enough structure for any stsd-aware reader
        val entryBody =
          if (handler == "vide") be(Seq(0, 0x0001, 0, 0, 0, 0x00400030,
            0x00480000, 0x00480000, 0, 0x00010000, 0, 0, 0, 0, 0, 0, 0, 0,
            0x00180000)).take(78)
          else be(Seq(0, 0x0001, 0, 0, 0x00020010, 0, 0xAC440000)).take(28)
        val stsd = box("stsd", be(Seq(0, 1)) ++ box(codec, entryBody))
        // sample tables, deterministic from id: video uses the
        // per-sample-size stsz layout (sample_size = 0, explicit
        // entries), audio the uniform-size layout — both real paths of
        // the walk; one chunk offset each
        val stsz =
          if (handler == "vide") {
            val nv = ((id % 7) + 2).toInt
            box("stsz", be(Seq(0, 0, nv) ++
              (0 until nv).map(i => 100 + ((id + i) % 50).toInt)))
          } else {
            val na = ((id % 5) + 1).toInt
            box("stsz", be(Seq(0, 40 + (id % 20).toInt, na)))
          }
        val stco = box("stco", be(Seq(0, 1, 4096)))
        val stbl = box("stbl", stsd ++ stsz ++ stco)
        val minf = box("minf", stbl)
        val mdia = box("mdia", mdhd ++ hdlr ++ minf)
        box("trak", tkhd ++ mdia)
      }
      val traks = (1 to nTracks).map { t =>
        if (t == 1) trak(1, "vide", "avc1") else trak(2, "soun", "mp4a")
      }.foldLeft(Array.emptyByteArray)(_ ++ _)
      val moov = box("moov", mvhd ++ traks)
      val mdat = box("mdat",
        Array.tabulate(16 + (id % 32).toInt)(i => ((id * 31 + i) & 0xff).toByte))
      ftyp ++ moov ++ mdat
    }

    /** The REAL box walk. None for anything that is not a well-formed
      * mp4 with ftyp + moov/mvhd — the caller surfaces a decode_error.
      */
    def parseMeta(p: Array[Byte]): Option[Mp4Meta] = {
      if (p == null || p.length < 16) return None
      def ascii(off: Int, n: Int): String = new String(p, off, n, "US-ASCII")
      def be32(off: Int): Long =
        (((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)) & 0xffffffffL
      def be64(off: Int): Long = (be32(off) << 32) | be32(off + 4)

      /** Walk sibling boxes in [start, end): (type, bodyStart, bodyEnd). */
      def children(start: Int, end: Int): Option[Seq[(String, Int, Int)]] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var off = start
        while (off + 8 <= end) {
          val size32 = be32(off)
          val tpe = ascii(off + 4, 4)
          if (!tpe.forall(c => c >= 0x20 && c < 0x7f)) return None
          val (hdr, size) =
            if (size32 == 1L) { if (off + 16 > end) return None; (16, be64(off + 8)) }
            else if (size32 == 0L) (8, (end - off).toLong) // box runs to end
            else (8, size32)
          if (size < hdr || off + size > end) return None
          out += ((tpe, off + hdr, off + size.toInt))
          off += size.toInt
        }
        if (off != end) return None
        Some(out.toSeq)
      }

      // full box = 1-byte version + 3-byte flags before the body; a
      // structurally valid walk can still carry an EMPTY full box at
      // the buffer's end — guard the header read (malformed -> None,
      // never crash: the untrusted-payload contract)
      def fullBoxBody(b: (String, Int, Int)): Option[(Int, Int)] =
        if (b._3 - b._2 >= 4) Some(((p(b._2) & 0xff), b._2 + 4)) else None

      // stsz: sample_size(4) + sample_count(4), then per-sample sizes
      // iff sample_size == 0; stco: entry_count(4). Size guards bound
      // every read by the box end — a lying count yields None for the
      // track, never an out-of-bounds read.
      def parseSampleTables(sk: Seq[(String, Int, Int)]): Option[TrackSamples] =
        for {
          stsz <- sk.find(_._1 == "stsz")
          (_, zb) <- fullBoxBody(stsz)
          _ <- if (stsz._3 - zb >= 8) Some(()) else None
          uniform = be32(zb)
          count = be32(zb + 4)
          total <-
            // uniform and count are untrusted unsigned-32 values: guard
            // the product so an adversarial stsz (e.g. both 0xFFFFFFFF)
            // yields the documented malformed->None, not a silently
            // negative overflowed total
            if (uniform != 0L) {
              if (count != 0L && uniform > Long.MaxValue / count) None
              else Some(uniform * count)
            }
            else if (count <= (stsz._3 - zb - 8) / 4) {
              var s = 0L; var i = 0
              while (i < count.toInt) { s += be32(zb + 8 + 4 * i); i += 1 }
              Some(s)
            } else None
        } yield {
          val chunks = (for {
            stco <- sk.find(_._1 == "stco")
            (_, cb) <- fullBoxBody(stco)
            _ <- if (stco._3 - cb >= 4) Some(()) else None
          } yield be32(cb)).getOrElse(0L)
          TrackSamples(count, total, chunks)
        }

      children(0, p.length).flatMap { top =>
        for {
          ftyp <- top.find(_._1 == "ftyp")
          _ <- if (ftyp._3 - ftyp._2 >= 4) Some(()) else None
          brand = ascii(ftyp._2, 4)
          moov <- top.find(_._1 == "moov")
          moovKids <- children(moov._2, moov._3)
          mvhd <- moovKids.find(_._1 == "mvhd")
          (ver, body) <- fullBoxBody(mvhd)
          tsDur <- ver match {
            case 0 if mvhd._3 - body >= 16 => Some((be32(body + 8), be32(body + 12)))
            case 1 if mvhd._3 - body >= 24 => Some((be32(body + 16), be64(body + 20)))
            case _ => None
          }
          traks = moovKids.filter(_._1 == "trak")
          trackInfo = traks.flatMap { t =>
            for {
              kids <- children(t._2, t._3)
              mdia <- kids.find(_._1 == "mdia")
              mk <- children(mdia._2, mdia._3)
              minf <- mk.find(_._1 == "minf")
              ik <- children(minf._2, minf._3)
              stbl <- ik.find(_._1 == "stbl")
              sk <- children(stbl._2, stbl._3)
              stsd <- sk.find(_._1 == "stsd")
              // stsd body: ver/flags + entry_count, then the first
              // sample entry box whose TYPE is the codec fourcc
              (_, b) <- fullBoxBody(stsd)
              entries <- children(b + 4, stsd._3)
              first <- entries.headOption
            } yield (first._1, parseSampleTables(sk))
          }
          codecs = trackInfo.map(_._1)
        } yield Mp4Meta(brand, tsDur._1, tsDur._2, traks.length, codecs,
          trackInfo.flatMap(_._2))
      }
    }
  }

  /** Attach a real mp4 fixture payload derived from a long id column
    * (the mp4 sibling of [[withGfvPayload]]/[[withAviPayload]]).
    */
  def withMp4Payload(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(payloadCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ Mp4Codec.encodeMp4(r.getLong(idIdx))))
    }(enc)
  }

  /** Container-level video metadata over the REAL walks — what a crawl
    * triage pass needs before any codec runs: which container, how
    * long, how many tracks, which codecs — per payload:
    *
    *  - mp4 → (container 'mp4', major brand, timescale, duration in
    *    units + exact milliseconds, track count, codec fourccs)
    *  - AVI / GFV → container tag + frame count (the walk's truth;
    *    these containers carry no declared duration the walk trusts)
    *  - anything else → ONE row with `decode_error`, null metadata —
    *    never fabricated properties.
    *
    * Row-local `mapPartitions`, no shuffle — scales like every other
    * decode-plane operator here.
    */
  def videoContainerMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("container", StringType, nullable = true),
      StructField("major_brand", StringType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration_units", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_tracks", IntegerType, nullable = true),
      StructField("codecs", StringType, nullable = true),
      // sample-table truth (stsz/stco), summed over the tracks that
      // carry them; null when no track declares sample tables
      StructField("n_samples", LongType, nullable = true),
      StructField("sample_bytes", LongType, nullable = true),
      StructField("n_chunks", LongType, nullable = true),
      StructField("bitrate_bps", LongType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("decode_error", StringType, nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val meta: Seq[Any] = Mp4Codec.parseMeta(p) match {
          case Some(m) =>
            // integer-exact ms: units * 1000 / timescale (timescale > 0
            // enforced by the walk's well-formedness; guard anyway)
            val ms: Any = if (m.timescale > 0) m.durationUnits * 1000L / m.timescale
              else null
            val (nSamples, sampleBytes, nChunks, bitrate): (Any, Any, Any, Any) =
              if (m.samples.isEmpty) (null, null, null, null)
              else {
                val bytes = m.samples.map(_.totalBytes).sum
                // integer-exact bits/sec from the box-declared duration
                val bps: Any = ms match {
                  case msL: Long if msL > 0 => bytes * 8000L / msL
                  case _ => null
                }
                (m.samples.map(_.sampleCount).sum, bytes,
                  m.samples.map(_.chunkCount).sum, bps)
              }
            Seq("mp4", m.majorBrand, m.timescale, m.durationUnits, ms,
              m.nTracks, m.codecs.mkString(","),
              nSamples, sampleBytes, nChunks, bitrate, null, null)
          case None => VideoCodec.parseFrames(p) match {
            case Some(frames) =>
              Seq("gfv", null, null, null, null, null, null,
                null, null, null, null, frames.length, null)
            case None => VideoCodec.parseAviFrames(p) match {
              case Some(frames) =>
                Seq("avi", null, null, null, null, null, null,
                  null, null, null, null, frames.length, null)
              case None =>
                Seq(null, null, null, null, null, null, null,
                  null, null, null, null, null, "unsupported container")
            }
          }
        }
        Row.fromSeq(r.toSeq ++ meta)
      }
    }(enc)
  }

  /** Attach a real GFV video payload derived from a long id column
    * (fixture helper — the video sibling of [[withPngPayload]] /
    * [[withWavPayload]]).
    */
  def withGfvPayload(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(payloadCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ VideoCodec.encodeGfv(r.getLong(idIdx))))
    }(enc)
  }

  /** Per-frame pixel statistics through the REAL path: GFV container
    * walk → per-frame `javax.imageio` PNG decode → integer Rec.601 luma
    * sums. One output row per (doc, frame): (frame_idx, n_pixels,
    * sum_luma) — all-integer, so the oracle predicts every value from
    * the staged generator formula. Non-GFV payloads produce zero rows
    * (never fabricated frames). Iterator-to-iterator `mapPartitions`.
    */
  def videoFrameStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("sum_luma", LongType, nullable = false)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        VideoCodec.parseAnyFrames(payload).toSeq.flatMap(_.zipWithIndex.flatMap {
          case (fr, idx) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr))
              catch { case _: Exception => null }
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                    (rgb & 0xff) * 114) / 1000
                  x += 1
                }
                y += 1
              }
              Some(Row.fromSeq(r.toSeq ++ Seq[Any](idx, w.toLong * h, sum)))
            }
        })
      }
    }(enc)
  }

  /** Attach a real AVI/MJPEG payload derived from a long id column
    * (fixture helper — the AVI sibling of [[withGfvPayload]]).
    */
  def withAviPayload(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(payloadCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ VideoCodec.encodeAviMjpeg(r.getLong(idIdx))))
    }(enc)
  }

  /** Attach a binary payload column derived from a string column (fixture
    * helper — real pipelines read payloads from storage).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** Attach a real PNG payload with properties derived from a long id
    * column: width = id % 64 + 1, height = id % 48 + 1 (fixture helper —
    * exercises the real `javax.imageio` decode path with predictable
    * metadata).
    */
  def withPngPayload(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(payloadCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Row.fromSeq(r.toSeq :+
          ImageCodec.encodePng((id % 64).toInt + 1, (id % 48).toInt + 1, id))
      }
    }(enc)
  }

  /** Canonical PCM16 mono WAV: 44-byte RIFF/fmt/data header + LE
    * samples. Both directions here so the audio gates stage REAL wav
    * bytes and the parser proves it reads them back, byte for byte.
    */
  object WavCodec {
    val SampleRate = 8000

    /** Deterministic full-range integer sample stream per id: the audio
      * analogue of the PNG pixel formula — SQL-replayable so the decode
      * gate proves sample-exact parsing.
      */
    def sampleAt(id: Long, i: Int): Int =
      (((id * 31 + i.toLong * 17) % 65536L) - 32768L).toInt

    def encodeWav(id: Long): Array[Byte] = {
      val n = (id % 500).toInt + 100
      val dataLen = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(SampleRate)
        .putInt(SampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) { buf.putShort(sampleAt(id, i).toShort); i += 1 }
      buf.array()
    }

    /** REAL RIFF chunk walk: verify RIFF/WAVE magic, locate fmt and
      * data chunks (any order, other chunks skipped), return
      * (sampleRate, nSamples, sumAbs, peak) from the PCM16 stream.
      * Anything malformed → None (never fabricated properties).
      */
    def parse(p: Array[Byte]): Option[(Int, Long, Long, Long)] = {
      if (p == null || p.length < 12) return None
      def ascii(off: Int, n: Int) = new String(p, off, n, "US-ASCII")
      def le32(off: Int): Int =
        (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
          ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
      def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
      var off = 12
      var rate = -1; var blockAlign = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (off + 8 <= p.length) {
        val cid = ascii(off, 4); val clen = le32(off + 4)
        if (clen < 0 || off + 8 + clen > p.length) return None
        cid match {
          case "fmt " if clen >= 16 =>
            if (le16(off + 8) != 1 || le16(off + 10) != 1) return None // PCM mono only
            rate = le32(off + 12); blockAlign = le16(off + 20); bits = le16(off + 22)
          case "data" => dataOff = off + 8; dataLen = clen
          case _ => // skip unknown chunks
        }
        off += 8 + clen + (clen & 1) // chunks are word-aligned
      }
      if (rate <= 0 || bits != 16 || blockAlign != 2 || dataOff < 0) return None
      val n = dataLen / 2
      var sumAbs = 0L; var peak = 0L; var i = 0
      while (i < n) {
        val s = (le16(dataOff + 2 * i) << 16) >> 16 // sign-extend
        val a = math.abs(s.toLong)
        sumAbs += a; if (a > peak) peak = a
        i += 1
      }
      Some((rate, n.toLong, sumAbs, peak))
    }
  }

  /** Attach a real PCM16 WAV payload derived from a long id column
    * (fixture helper — the audio sibling of [[withPngPayload]]).
    */
  def withWavPayload(df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(payloadCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ WavCodec.encodeWav(r.getLong(idIdx))))
    }(enc)
  }

  /** Audio metadata + sample statistics from a REAL RIFF/WAVE parse:
    * sample rate, sample count, integer duration (ms, truncating),
    * Σ|sample| and peak |sample| over the PCM16 stream — all-integer
    * math, so an oracle that knows the sample generator predicts every
    * value bit-exactly (the [[lumaStats]] proof standard, for audio).
    * Unrecognized payloads yield nulls. Iterator-to-iterator
    * `mapPartitions`, constant memory per task.
    */
  def decodeAudioMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType), StructField("n_samples", LongType),
      StructField("duration_ms", LongType), StructField("sum_abs", LongType),
      StructField("peak", LongType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        WavCodec.parse(payload) match {
          case Some((rate, n, sumAbs, peak)) =>
            // Seq[Any]: a plain Seq(rate, n, ...) would weakly-conform
            // Int rate up to Long and break the INT field's external type
            Row.fromSeq(r.toSeq ++ Seq[Any](rate, n, n * 1000L / rate, sumAbs, peak))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** 64-bit average perceptual hash (aHash) of each image payload — the
    * image-dedup primitive: decode (REAL ImageIO), integer Rec.601 luma,
    * 8×8 block means with pixel→cell assignment `(y·8/h, x·8/w)`
    * (integer division, so any dimensions work — cells can be empty on
    * sub-8px images), bit `cy·8+cx` set iff the cell's mean exceeds the
    * mean of the occupied cells' means (integer cross-multiplied
    * compare, no floats anywhere). Re-encoding the same pixels yields
    * the SAME hash (content identity, not byte identity — the property
    * that makes this a dedup key where md5 fails); near-duplicate
    * images land within a small Hamming distance, so the SimHash
    * machinery's banding applies unchanged. Null/undecodable payloads
    * hash to null.
    *
    * Scale shape: pure `mapPartitions` row-local compute — constant
    * memory per task, no shuffle; the downstream dedup is one groupBy
    * on the 8-byte hash.
    */
  def imageHash(df: DataFrame, payloadCol: String,
      hashCol: String = "ahash64"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(hashCol, LongType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img =
          if (payload == null) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
        val hash: Any = if (img == null) null
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val cellSum = new Array[Long](64)
          val cellN = new Array[Long](64)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              val c = cy * 8 + x * 8 / w
              cellSum(c) += luma
              cellN(c) += 1
              x += 1
            }
            y += 1
          }
          val means = new Array[Long](64)
          var tot = 0L
          var nOcc = 0L
          var i = 0
          while (i < 64) {
            if (cellN(i) > 0) {
              means(i) = cellSum(i) / cellN(i); tot += means(i); nOcc += 1
            }
            i += 1
          }
          var bits = 0L
          i = 0
          while (i < 64) {
            if (cellN(i) > 0 && means(i) * nOcc > tot) bits |= (1L << i)
            i += 1
          }
          bits
        }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** Decode metadata for each payload in partition-local batches.
    * Runs as `mapPartitions` over an iterator — constant memory per task,
    * no driver involvement, codec initialized once per partition (the
    * expensive part with real codecs).
    */
  def decodeMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media", metaSchema))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition codec init would go here (expensive for real codecs)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        // unrecognized payload ⇒ null media — never fabricated properties
        val media = if (payload == null) null
          else ImageCodec.probe(payload) match {
            case Some((fmt, w, h)) => Row(fmt, w, h, payload.length.toLong)
            case None => null
          }
        Row.fromSeq(r.toSeq :+ media)
      }
    }(enc)
  }

  /** Pixel-level luminance statistics from the REAL decoded image:
    * integer Rec.601 luma per pixel ((r·299 + g·587 + b·114) / 1000,
    * truncating), total pixel count, luma sum, and the count of pixels
    * strictly brighter than the image mean (luma·n > Σluma — exact
    * integer comparison, no float mean). Unreadable payloads yield nulls.
    *
    * All-integer math end to end, so an oracle that knows the pixel
    * generator can predict the decoded values bit-exactly — the
    * strongest possible proof that the decode path reproduces the
    * encoded image, not just its header. Iterator-to-iterator
    * `mapPartitions`; per-image state is one int array.
    */
  def lumaStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_pixels", LongType), StructField("sum_luma", LongType),
      StructField("n_bright", LongType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img =
          if (payload == null) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
        val stats: Seq[Any] = if (img == null) Seq(null, null, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val lumas = new Array[Long](w * h)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              lumas(y * w + x) = luma
              sum += luma
              x += 1
            }
            y += 1
          }
          val n = (w * h).toLong
          var bright = 0L
          var i = 0
          while (i < lumas.length) {
            if (lumas(i) * n > sum) bright += 1
            i += 1
          }
          Seq(n, sum, bright)
        }
        Row.fromSeq(r.toSeq ++ stats)
      }
    }(enc)
  }

  /** Batched resize: constant-size output payloads (e.g. thumbnailing a
    * 100 TB image corpus). Output column replaces the payload; payloads
    * that aren't readable images become null (not invented bytes).
    */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val schema = df.schema
    val payloadIdx = schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val out = if (payload == null) null
          else ImageCodec.resize(payload, w, h).orNull
        Row.fromSeq(r.toSeq.updated(payloadIdx, out))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (video → frames).
    * Emits (original columns..., frame_idx, frame, decode_error) — a
    * generator-style explode executed partition-locally. Containers the
    * codec stack actually understands (GFV, AVI — [[VideoCodec]]) take
    * the REAL walk; anything else yields ONE row with a `decode_error`
    * instead of fabricated frames (the round-8 honesty contract: a
    * pipeline pointed at an mp4 corpus must SEE that nothing decoded,
    * not receive plausible-looking byte slices). Null payloads emit no
    * rows (no media, not an error).
    */
  def sampleFrames(df: DataFrame, payloadCol: String, framesPerDoc: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("frame", BinaryType),
      StructField("decode_error", StringType, nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Iterator.empty
        else VideoCodec.parseAnyFrames(payload) match {
          case Some(frames) =>
            frames.take(framesPerDoc).iterator.zipWithIndex.map {
              case (f, i) => Row.fromSeq(r.toSeq ++ Seq(i, f, null))
            }
          case None =>
            // a RECOGNIZED mp4 errors with the specific truth (container
            // walked fine, tracks need a codec the JVM doesn't ship) —
            // triage can tell "not a video" from "video we can't decode"
            val err = Mp4Codec.parseMeta(payload) match {
              case Some(m) =>
                s"mp4 container recognized (codecs=${m.codecs.mkString(",")}) " +
                  "but no JVM decoder for its tracks"
              case None => "unsupported container"
            }
            Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null, err)))
        }
      }
    }(enc)
  }

  /** Image near-duplicate pairs via banded perceptual hashes — visual
    * dedup over the REAL decode path: each image's 64-bit aHash
    * ([[imageHash]]) splits into `bands` equal slices; images sharing
    * ANY slice become candidates, and the exact Hamming distance
    * filters to `maxHamming`. With `maxHamming < bands`, recall is
    * EXACT by pigeonhole (≤ maxHamming differing bits cannot touch all
    * bands) — the MinHash-LSH discipline applied to pixels.
    *
    * Scale shape: decode + hash row-local; candidates come from an
    * equi-join on (band, slice) — one partial shuffle of 8-byte keys,
    * never an all-pairs comparison; the verify is a codegen'd
    * `bit_count`. Degenerate slices (e.g. all-dark corpora hashing to
    * zero) concentrate a band key exactly like a hot MinHash band — the
    * same cap/salting playbook applies upstream of this operator.
    */
  def imageNearDup(
      df: DataFrame, payloadCol: String, idCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands ($maxHamming >= $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val hashed = imageHash(df, payloadCol)
      .select(col(idCol).as("id"), col("ahash64"))
      .where(col("ahash64").isNotNull)
    val banded = hashed.select(col("id"), col("ahash64"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("ahash64"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"),
      col("id").as("id_a"), col("ahash64").as("ha"))
    val b = banded.select(col("band"), col("key"),
      col("id").as("id_b"), col("ahash64").as("hb"))
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ha"), col("hb")).distinct()
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
