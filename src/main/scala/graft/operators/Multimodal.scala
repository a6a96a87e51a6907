package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media rides through the engine as an opaque `binary` payload column plus
  * typed metadata — the lakehouse-standard layout (one row per asset,
  * bytes + struct metadata). The Spark-side machinery here — schema, batch
  * shape, partition-friendly transforms, frame sampling — is real and
  * tested; the actual codec work is STUBBED (this container ships no
  * image/audio libraries) behind `decodeStub`, which parses a deterministic
  * 16-byte fake header. Swapping in a real decoder = replacing that one
  * function; every downstream operator is payload-agnostic.
  *
  * Scale notes: payloads never enter a shuffle key; metadata extraction is
  * column-local (mapPartitions-free, codegen'd byte slicing), and frame
  * sampling explodes to fixed-size slices so downstream batches stay
  * bounded.
  */
object Multimodal {

  /** Fake-header layout (all big-endian int32): magic | kind | width | height. */
  val Magic = 0x47524654 // "GRFT"

  /** Build a deterministic fake media payload from seed text: 16-byte header
    * + the text bytes as "pixels". Stands in for real image/audio bytes in
    * tests and demos.
    */
  def encodeFake(kindId: Column, width: Column, height: Column, body: Column): Column = {
    // int → 4 big-endian bytes, via the zero-padded 8-char hex form
    def be32(v: Column): Column = unhex(lpad(hex(v), 8, "0"))
    concat(be32(lit(Magic)), be32(kindId), be32(width), be32(height),
      encode(body, "UTF-8"))
  }

  /** ??? in spirit: the real decode (JPEG/PNG/WAV/MP4) would live here.
    * STUB — parses the deterministic fake header instead. The signature
    * (binary in, struct of typed metadata out) is the real contract.
    */
  def decodeStub(payload: Column): Column = {
    def beInt(off: Int): Column =
      conv(hex(substring(payload, off, 4)), 16, 10).cast("int")
    struct(
      // coalesce: a truncated (<16 B) payload yields null field reads, which
      // must surface as valid=false — same behavior as the mapPartitions path
      coalesce(beInt(1) === Magic && length(payload) >= 16, lit(false)).as("valid"),
      beInt(5).as("kind_id"),
      beInt(9).as("width"),
      beInt(13).as("height"),
      (length(payload) - 16).as("body_bytes"))
  }

  /** Media table from the documents fixture: every doc becomes one fake
    * asset with deterministic dimensions derived from doc_id.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val kind = (col("doc_id") % 3).cast("int") // 0=image 1=audio 2=video
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind_id"),
      encodeFake(
        kind,
        (lit(32) + col("doc_id") % 96).cast("int"),
        (lit(24) + col("doc_id") % 72).cast("int"),
        col("text")).as("payload"))
  }

  /** Metadata extraction: binary → typed columns. Codegen'd byte slicing —
    * the shape a real decoder's cheap header-sniff pass would take at scale
    * (full decode only after pushdown-filtered selection).
    */
  def extractMeta(media: DataFrame): DataFrame =
    media
      .withColumn("meta", decodeStub(col("payload")))
      .select(
        col("media_id"), col("kind_id"),
        col("meta.valid").as("valid"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.body_bytes").as("body_bytes"))

  /** Typed metadata row — the decode contract's output schema. */
  case class MediaMeta(
      media_id: Long, kind_id: Int, valid: Boolean,
      width: Int, height: Int, body_bytes: Int)

  /** The per-partition "decoder handle" — stands in for a heavyweight codec
    * context (libjpeg handle, ffmpeg context) that must be initialized once
    * per task, not once per row. ??? in spirit: `decode` would call the real
    * library; the stub parses the deterministic fake header.
    */
  private final class DecoderStub {
    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    def decode(mediaId: Long, payload: Array[Byte]): MediaMeta =
      if (payload == null || payload.length < 16 || be32(payload, 0) != Magic)
        MediaMeta(mediaId, -1, valid = false, 0, 0, math.max(0, payload.length - 16))
      else
        MediaMeta(mediaId, be32(payload, 4), valid = true,
          be32(payload, 8), be32(payload, 12), payload.length - 16)
  }

  /** Batch-shaped decode: `mapPartitions` streams each partition's rows
    * through ONE decoder instance — the Spark-side plumbing (schema in/out,
    * partition-level batching, per-task init amortization) a real
    * image/audio decode stage needs at 100 TB. Swapping the stub for a real
    * codec changes only `DecoderStub.decode`.
    */
  def decodeMapPartitions(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new DecoderStub // once per partition/task
        rows.map { case (id, payload) => decoder.decode(id, payload) }
      }
      .toDF()
  }

  /** Resize STUB: rewrites the header to the target dimensions and truncates
    * the body proportionally — the contract (binary → binary, new metadata
    * consistent with the new header) is real; the pixel math is not.
    */
  def resizeStub(payload: Column, newW: Int, newH: Int): Column = {
    def be32(v: Column): Column = unhex(lpad(hex(v), 8, "0"))
    val meta = decodeStub(payload)
    val scaled = (col2: Column) => greatest(
      ceil(col2 * (lit(newW) * lit(newH)) /
        greatest(meta.getField("width") * meta.getField("height"), lit(1))).cast("int"),
      lit(1))
    concat(
      be32(lit(Magic)), be32(meta.getField("kind_id")), be32(lit(newW)), be32(lit(newH)),
      substring(payload, 17, Int.MaxValue).substr(lit(1), scaled(meta.getField("body_bytes"))))
  }

  /** Feature extraction STUB: a 16-bin byte histogram of the payload body
    * (high nibble = bin), L1-normalized — deterministic stand-in for an
    * embedding model, with the real contract (binary → array<double>, fixed
    * dimension). Single JVM pass; the original 16-regex-passes-over-hex
    * expression form was 10× slower.
    */
  def byteHistogram(payload: Column, bins: Int = 16): Column = {
    val u = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Array.fill(bins)(0.0)
      else {
        val counts = new Array[Long](bins)
        var i = 16 // skip the fake header
        while (i < bytes.length) {
          counts(((bytes(i) & 0xf0) >>> 4) * bins / 16) += 1
          i += 1
        }
        val total = math.max(bytes.length - 16, 1).toDouble
        // floor(x*1e6+0.5)/1e6, not BigDecimal HALF_UP: pure-double rounding
        // is bit-reproducible in any engine computing c/total the same way,
        // which lets the feature query hash-match a DuckDB oracle
        counts.map(c => math.floor(c / total * 1000000.0 + 0.5) / 1000000.0)
      }
    }
    u(payload)
  }

  // ---------------------------------------------------------------------
  // REAL image headers: PNG IHDR + JPEG SOF over genuine magic bytes.
  // No codec library — pure byte arithmetic, which is exactly what a
  // header-sniff pass does at 100 TB (full pixel decode only after
  // pushdown-filtered selection). The GRFT stub path stays for the
  // synthetic corpus; real and fake payloads discriminate by magic.
  // ---------------------------------------------------------------------

  private def be16c(v: Column): Column = unhex(lpad(hex(v), 4, "0"))
  private def be32c(v: Column): Column = unhex(lpad(hex(v), 8, "0"))

  /** One PNG chunk: length | type | data | CRC32(type+data) — the CRC is
    * real (Spark's `crc32`), so the emitted bytes are spec-correct PNG.
    */
  private def pngChunk(typ: String, data: Column): Column = {
    val t = encode(lit(typ), "US-ASCII")
    concat(be32c(length(data)), t, data, be32c(crc32(concat(t, data))))
  }

  /** Byte-genuine PNG: 8-byte signature, IHDR (8-bit RGB, no interlace),
    * the body as an IDAT chunk, IEND. Any header-sniffing tool reads the
    * dimensions; only pixel decode (zlib) would reject the fake body.
    */
  def encodePng(width: Column, height: Column, body: Column): Column =
    concat(
      unhex(lit("89504E470D0A1A0A")),
      pngChunk("IHDR", concat(be32c(width), be32c(height), unhex(lit("0802000000")))),
      pngChunk("IDAT", encode(body, "UTF-8")),
      pngChunk("IEND", lit(Array.empty[Byte])))

  /** Byte-genuine JPEG prefix: SOI, JFIF APP0, a baseline SOF0 carrying the
    * real dimensions, SOS, body as entropy bytes, EOI. A marker walk (ours
    * below, or any EXIF tool) reads the dimensions from SOF0.
    */
  def encodeJpeg(width: Column, height: Column, body: Column): Column =
    concat(
      unhex(lit("FFD8")), // SOI
      unhex(lit("FFE000104A46494600010100000100010000")), // APP0 "JFIF"
      unhex(lit("FFC00011" + "08")), be16c(height), be16c(width), // SOF0: len 17, precision 8
      unhex(lit("03" + "011100" + "021101" + "031101")), // 3 components
      unhex(lit("FFDA000C03010002110311003F00")), // SOS
      encode(body, "UTF-8"),
      unhex(lit("FFD9"))) // EOI

  /** Parsed image-header row — the real-decode contract's output schema. */
  case class ImageMeta(
      media_id: Long, format: String, valid: Boolean, width: Int, height: Int)

  /** Real header parse: PNG (signature + IHDR — the spec fixes IHDR as the
    * first chunk, so width/height sit at bytes 16..23), JPEG (marker walk
    * to the first SOF0-SOF15 frame header, skipping DHT/JPG/DAC which
    * share the Cx range but carry no dimensions), with the GRFT stub
    * header still honored for the synthetic corpus. Pure byte arithmetic.
    */
  def parseImage(mediaId: Long, b: Array[Byte]): ImageMeta = {
    def be32(off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    def be16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    if (b == null || b.length < 4)
      ImageMeta(mediaId, "unknown", valid = false, 0, 0)
    else if (b.length >= 24 && be32(0) == 0x89504E47 && be32(4) == 0x0D0A1A0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      ImageMeta(mediaId, "png", valid = true, be32(16), be32(20))
    else if ((b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8) {
      var i = 2
      var out: ImageMeta = null
      while (out == null && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xFF) i += 1 // resync to next marker
        else {
          val m = b(i + 1) & 0xff
          if (m == 0xFF) i += 1 // fill byte
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2 // standalone
          else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            // SOF: precision(1) height(2) width(2) after the 2-byte length
            if (i + 8 < b.length)
              out = ImageMeta(mediaId, "jpeg", valid = true, be16(i + 7), be16(i + 5))
            else i = b.length
          }
          else if (m == 0xDA || m == 0xD9) i = b.length // into entropy data / EOI: no SOF seen
          else i += 2 + be16(i + 2) // skip the segment
        }
      }
      if (out != null) out else ImageMeta(mediaId, "jpeg", valid = false, 0, 0)
    }
    else if (b.length >= 16 && be32(0) == Magic)
      ImageMeta(mediaId, "grft", valid = true, be32(8), be32(12))
    else ImageMeta(mediaId, "unknown", valid = false, 0, 0)
  }

  /** Batch-shaped REAL header decode — same mapPartitions plumbing as
    * [[decodeMapPartitions]], but over genuine PNG/JPEG magic bytes.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, payload) => parseImage(id, payload) })
      .toDF()
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size slice
    * of the body becomes a frame row `(media_id, frame_idx, frame_bytes)`.
    * Explode keeps frames as independent rows — the unit of parallelism for
    * downstream per-frame models.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val body  = substring(col("payload"), 17, Int.MaxValue)
    val nFrames = floor((length(body) + frameBytes - 1) / frameBytes)
    media
      .where(col("kind_id") === 2)
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), (nFrames - 1).cast("int"), lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(
        col("media_id"), col("frame_idx"),
        substring(body, (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes)).as("frame"))
  }
}
