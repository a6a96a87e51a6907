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

  test("byteHistogram: normalized 16-bin histogram sums to ~1") {
    val h = media.select(Multimodal.byteHistogram(col("payload")).as("h"))
      .as[Seq[Double]].collect()
    h.foreach { bins =>
      assert(bins.length == 16)
      assert(math.abs(bins.sum - 1.0) < 0.01)
    }
  }
}
