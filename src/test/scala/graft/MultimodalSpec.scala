package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaFromDocuments(
    Seq((0L, "short clip body"), (1L, "another body"), (2L, "v" * 2000))
      .toDF("doc_id", "text"))

  test("fake header encodes and decode-stub inverts it") {
    val out = Multimodal.extractMeta(media).orderBy("media_id").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Boolean]("valid")))
    assert(out.map(_.getAs[Int]("kind_id")).toSeq == Seq(0, 1, 2))
    assert(out.head.getAs[Int]("width") == 32 && out.head.getAs[Int]("height") == 24)
    assert(out.head.getAs[Int]("body_bytes") == "short clip body".length)
  }

  test("truncated payload is valid=false in BOTH decode paths") {
    val short = Seq((0L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val viaExpr = Multimodal.extractMeta(short.withColumn("kind_id", lit(0))).head()
    assert(!viaExpr.getAs[Boolean]("valid"))
    val viaPart = Multimodal.decodeMapPartitions(spark, short).head()
    assert(!viaPart.getAs[Boolean]("valid"))
  }

  test("corrupted payload is flagged invalid") {
    val bad = media.withColumn("payload",
      concat(lit(Array[Byte](1, 2, 3, 4)), substring(col("payload"), 5, 1 << 20)))
    val out = Multimodal.extractMeta(bad).collect()
    assert(out.forall(!_.getAs[Boolean]("valid")))
  }

  test("sampleFrames: only video kind, strided fixed-size slices") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 256, stride = 4)
    val rows = frames.orderBy("media_id", "frame_idx").collect()
    assert(rows.forall(_.getAs[Long]("media_id") == 2L)) // kind 2 = video
    val idxs = rows.map(_.getAs[Int]("frame_idx")).toSeq
    assert(idxs == idxs.sorted && idxs.forall(_ % 4 == 0))
    assert(rows.init.forall(_.getAs[Array[Byte]]("frame").length == 256))
  }

  test("mapPartitions decode matches the expression decode path") {
    val viaExpr = Multimodal.extractMeta(media)
      .select("media_id", "kind_id", "valid", "width", "height", "body_bytes")
      .orderBy("media_id").collect().toSeq
    val viaPartitions = Multimodal.decodeMapPartitions(spark, media)
      .select("media_id", "kind_id", "valid", "width", "height", "body_bytes")
      .orderBy("media_id").collect().toSeq
    assert(viaPartitions == viaExpr)
  }

  test("resize stub: new header dims decode back, body shrinks") {
    val resized = media.withColumn("payload", Multimodal.resizeStub(col("payload"), 8, 6))
    val out = Multimodal.extractMeta(resized).orderBy("media_id").collect()
    assert(out.forall(_.getAs[Boolean]("valid")))
    assert(out.forall(r => r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 6))
    val before = Multimodal.extractMeta(media).orderBy("media_id").collect()
    before.zip(out).foreach { case (b, a) =>
      assert(a.getAs[Int]("body_bytes") <= b.getAs[Int]("body_bytes"))
      assert(a.getAs[Int]("body_bytes") >= 1)
    }
  }

  test("parseImage reads dimensions from GENUINE codec-written PNG and JPEG files") {
    // fixtures from a real encoder (JDK javax.imageio), not our own bytes:
    // proves the header parser against independently-produced files
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val dir = java.nio.file.Files.createTempDirectory("graft_imgfix")
    def writeImg(name: String, fmt: String, w: Int, h: Int): java.io.File = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
      val f = dir.resolve(name).toFile
      assert(ImageIO.write(img, fmt, f), s"ImageIO has no $fmt writer")
      f
    }
    val png = writeImg("a.png", "png", 37, 19)
    val jpg = writeImg("b.jpg", "jpg", 123, 45)
    // through the binary-file connector — the real ingest path
    val rows = spark.read.format("binaryFile").load(dir.toString + "/*")
      .select(col("path"), col("content")).collect()
      .map(r => r.getString(0) -> Multimodal.parseImage(0L, r.getAs[Array[Byte]]("content")))
      .toMap
    val p = rows.find(_._1.endsWith("a.png")).get._2
    assert(p.format == "png" && p.valid && p.width == 37 && p.height == 19)
    val j = rows.find(_._1.endsWith("b.jpg")).get._2
    assert(j.format == "jpeg" && j.valid && j.width == 123 && j.height == 45)
    png.delete(); jpg.delete(); dir.toFile.delete()
  }

  test("encodePng/encodeJpeg round-trip through parseImage, and ImageIO accepts the PNG header") {
    val enc = Seq((0L, 640, 480, "pixels"), (1L, 9, 7, "x"))
      .toDF("media_id", "w", "h", "body")
      .select(col("media_id"),
        Multimodal.encodePng(col("w"), col("h"), col("body")).as("png"),
        Multimodal.encodeJpeg(col("w"), col("h"), col("body")).as("jpg"))
      .collect()
    enc.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = if (id == 0L) (640, 480) else (9, 7)
      val p = Multimodal.parseImage(id, r.getAs[Array[Byte]]("png"))
      assert(p.format == "png" && p.valid && p.width == w && p.height == h)
      val j = Multimodal.parseImage(id, r.getAs[Array[Byte]]("jpg"))
      assert(j.format == "jpeg" && j.valid && j.width == w && j.height == h)
    }
    // a REAL reader agrees on the emitted PNG header: ImageIO's PNG reader
    // parses IHDR (incl. CRC) before touching pixel data
    val pngBytes = enc.head.getAs[Array[Byte]]("png")
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(pngBytes)))
    assert(rd.getWidth(0) == 640 && rd.getHeight(0) == 480)
  }

  test("parseImage: garbage, truncation, and the GRFT stub header") {
    assert(Multimodal.parseImage(0L, null).format == "unknown")
    assert(!Multimodal.parseImage(0L, Array[Byte](1, 2)).valid)
    // JPEG SOI but no SOF: invalid, still recognized as jpeg
    val noSof = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
    val ns = Multimodal.parseImage(0L, noSof)
    assert(ns.format == "jpeg" && !ns.valid)
    // the synthetic corpus path still decodes
    val fake = media.select(col("media_id"), col("payload")).collect().head
    val g = Multimodal.parseImage(fake.getLong(0), fake.getAs[Array[Byte]]("payload"))
    assert(g.format == "grft" && g.valid && g.width == 32 && g.height == 24)
  }

  test("encodeWav round-trips through parseAudio, and javax.sound accepts it") {
    val enc = Seq((0L, 16000, 2, 16, "a" * 64000), (1L, 8000, 1, 8, "pcm"))
      .toDF("media_id", "sr", "ch", "bits", "body")
      .select(col("media_id"), col("sr"), col("ch"), col("bits"),
        Multimodal.encodeWav(col("sr"), col("ch"), col("bits"), col("body")).as("wav"))
      .collect()
    enc.foreach { r =>
      val (sr, ch, bits) = (r.getInt(1), r.getInt(2), r.getInt(3))
      val a = Multimodal.parseAudio(r.getLong(0), r.getAs[Array[Byte]]("wav"))
      assert(a.format == "wav" && a.valid)
      assert(a.sample_rate == sr && a.channels == ch && a.bits_per_sample == bits)
      assert(a.duration_ms == a.data_bytes.toLong * 1000 / (sr.toLong * ch * bits / 8))
    }
    // a REAL reader agrees: the JDK's WAV parser reads our fmt chunk
    val af = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(enc.head.getAs[Array[Byte]]("wav")))
    val fmt = af.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 2 &&
      fmt.getSampleSizeInBits == 16)
  }

  test("parseAudio reads a GENUINE javax.sound-written WAV file") {
    // fixture from the JDK encoder, not our bytes: 100 ms of silence at
    // 22050 Hz mono 16-bit
    import javax.sound.sampled._
    val fmt = new AudioFormat(22050f, 16, 1, true, false)
    val pcm = new Array[Byte](2 * 2205)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 2205L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val a = Multimodal.parseAudio(7L, bos.toByteArray)
    assert(a.format == "wav" && a.valid)
    assert(a.sample_rate == 22050 && a.channels == 1 && a.bits_per_sample == 16)
    assert(a.data_bytes == pcm.length && a.duration_ms == 100L)
  }

  test("encodeMp4 round-trips through parseVideo, incl. v1 mvhd and largesize") {
    val enc = Seq((0L, 600, 72000, "frames"), (1L, 90000, 123456, "x"))
      .toDF("media_id", "tscale", "dur", "body")
      .select(col("media_id"), col("tscale"), col("dur"),
        Multimodal.encodeMp4(col("tscale"), col("dur"), col("body")).as("mp4"))
      .collect()
    enc.foreach { r =>
      val (ts, du) = (r.getInt(1), r.getInt(2))
      val v = Multimodal.parseVideo(r.getLong(0), r.getAs[Array[Byte]]("mp4"))
      assert(v.format == "mp4" && v.valid && v.brand == "isom")
      assert(v.timescale == ts && v.duration == du.toLong)
      assert(v.duration_ms == du.toLong * 1000 / ts)
      assert(v.mdat_bytes == (if (r.getLong(0) == 0L) 6 else 1))
    }
    // hand-build a version-1 mvhd (64-bit times) + largesize mdat: the box
    // walk must handle both extended forms real muxers emit
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    val mvhdV1 = be32(120) ++ "mvhd".getBytes ++ Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(1000) ++ be64(98765L) ++ new Array[Byte](80)
    val moov = be32(8 + mvhdV1.length) ++ "moov".getBytes ++ mvhdV1
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "mp42".getBytes ++ be32(0)
    val mdatBody = new Array[Byte](5)
    val mdat = be32(1) ++ "mdat".getBytes ++ be64(16 + mdatBody.length) ++ mdatBody
    val v1 = Multimodal.parseVideo(9L, ftyp ++ moov ++ mdat)
    assert(v1.valid && v1.brand == "mp42" && v1.timescale == 1000)
    assert(v1.duration == 98765L && v1.duration_ms == 98765L && v1.mdat_bytes == 5)
  }

  test("parseAudio/parseVideo: garbage and truncation flag invalid") {
    assert(!Multimodal.parseAudio(0L, null).valid)
    assert(!Multimodal.parseAudio(0L, "RIFFxxxxWAVE".getBytes).valid) // no fmt/data
    assert(!Multimodal.parseAudio(0L, Array[Byte](1, 2, 3)).valid)
    assert(!Multimodal.parseVideo(0L, null).valid)
    assert(!Multimodal.parseVideo(0L, Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')).valid)
    // ftyp but no moov: recognized shape, still invalid (no timing)
    val ftypOnly = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++ Array[Byte](0, 0, 0, 0)
    assert(!Multimodal.parseVideo(0L, ftypOnly).valid)
    // crafted RIFF chunk size near Int.MaxValue: positive (passes the sign
    // check) but overflowed the Int cursor before the guard — must return
    // invalid, not throw from a negative string index
    val evil = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ Array[Byte](0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F) ++
      new Array[Byte](64)
    assert(!Multimodal.parseAudio(0L, evil).valid)
  }

  test("parseAudio clamps a truncated data chunk instead of discarding it") {
    // real WAV from the JDK encoder, then cut short mid-data: the header's
    // optimistic data size overruns the remaining bytes — the parse must
    // clamp to what is present and stay valid (common capture truncation)
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](1600) // 100 ms
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 800L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val whole = bos.toByteArray
    val cut = whole.take(whole.length - 800) // drop the last half of the data
    val a = Multimodal.parseAudio(3L, cut)
    assert(a.valid && a.format == "wav")
    assert(a.data_bytes == 800, s"clamped to present bytes, got ${a.data_bytes}")
    assert(a.duration_ms == 50L)
  }

  test("parseAny dispatches mixed payloads to the right parser by magic") {
    val rows = Seq(
      (0L, Multimodal.encodePng(lit(40), lit(30), lit("img"))),
      (1L, Multimodal.encodeWav(lit(16000), lit(2), lit(16), lit("pcm"))),
      (2L, Multimodal.encodeMp4(lit(600), lit(1200), lit("vid"))),
      (3L, Multimodal.encodeJpeg(lit(9), lit(7), lit("j"))))
      .map { case (id, c) =>
        Seq(id).toDF("media_id").select(col("media_id"), c.as("payload")) }
      .reduce(_ unionByName _)
    val out = Multimodal.decodeMedia(spark, rows).orderBy("media_id").collect()
    assert(out.map(_.getAs[String]("format")).toSeq == Seq("png", "wav", "mp4", "jpeg"))
    assert(out.forall(_.getAs[Boolean]("valid")))
    assert(out(0).getAs[Int]("width") == 40 && out(0).getAs[Int]("height") == 30)
    assert(out(1).getAs[Int]("sample_rate") == 16000 && out(1).getAs[Int]("channels") == 2)
    assert(out(2).getAs[Long]("duration_ms") == 2000L)
    // garbage stays unknown/invalid through the dispatcher too
    assert(!Multimodal.parseAny(9L, Array[Byte](9, 9, 9, 9, 9, 9, 9, 9)).valid)
  }

  test("byteHistogram: normalized 16-bin histogram sums to ~1") {
    val h = media.select(Multimodal.byteHistogram(col("payload")).as("h"))
      .as[Seq[Double]].collect()
    h.foreach { bins =>
      assert(bins.length == 16)
      assert(math.abs(bins.sum - 1.0) < 0.01)
    }
  }

  test("REAL pixel decode: engine-built PNGs decode through javax.imageio " +
       "to the exact dimensions and pixel checksum") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.decodePngPixels(spark,
        Multimodal.pngMediaFromDocuments(spark, docs))
      .orderBy("media_id").collect()
    assert(out.length == 30)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((8 + id % 9).toInt, (6 + id % 7).toInt)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w) want += Multimodal.testPixel(id, x, y)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getLong(3) == want,
        s"media $id: got (${r.getInt(1)},${r.getInt(2)},${r.getLong(3)}) " +
          s"want ($w,$h,$want)")
    }
    // a decoder-rejected payload fails loudly, never a silent zero row
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePngPixels(spark, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("REAL PCM decode: engine-built WAVs decode through javax.sound " +
       "to the exact rate, frame count, and sample checksum") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.decodeWavSamples(spark,
        Multimodal.wavMediaFromDocuments(spark, docs))
      .orderBy("media_id").collect()
    assert(out.length == 30)
    out.foreach { r =>
      val id = r.getLong(0)
      val rate = (8000 + (id % 5) * 1000).toInt
      val n = (200 + id % 57).toInt
      var want = 0L
      for (i <- 0 until n) want += Multimodal.testSample(id, i)
      assert(r.getInt(1) == rate && r.getLong(2) == n.toLong &&
        r.getLong(3) == want,
        s"media $id: got (${r.getInt(1)},${r.getLong(2)},${r.getLong(3)}) " +
          s"want ($rate,$n,$want)")
    }
    // a codec-rejected payload fails loudly, never a silent zero row
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWavSamples(spark, bad).collect()
    }
    assert(e.getMessage != null)
  }
}
