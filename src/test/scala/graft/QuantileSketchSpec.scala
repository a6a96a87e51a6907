package graft

import graft.functions.QuantileSketch
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucket representative is within alpha of every value, zero bin exact") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val v = math.exp(rnd.nextGaussian() * 4) // spans many decades
      val rep = QuantileSketch.representative(QuantileSketch.bucketOf(v))
      assert(math.abs(rep - v) <= QuantileSketch.Alpha * v * 1.0000001,
        s"v=$v rep=$rep")
    }
    assert(QuantileSketch.bucketOf(0.0) == QuantileSketch.ZeroBucket)
    assert(QuantileSketch.bucketOf(-3.5) == QuantileSketch.ZeroBucket)
    assert(QuantileSketch.representative(QuantileSketch.ZeroBucket) == 0.0)
  }

  test("merge of per-group sketches is bit-identical to the direct sketch") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 5000).map(i => (i % 7, rnd.nextDouble() * 500))
    val df = rows.toDF("g", "v")
    val skUdaf = udaf(QuantileSketch.sketch, org.apache.spark.sql.Encoders.scalaDouble)
    val mergeUdaf = udaf(QuantileSketch.mergeSketch,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    val direct = df.agg(skUdaf(col("v"))).as[Array[Long]].head()
    val rolled = df.groupBy("g").agg(skUdaf(col("v")).as("sk"))
      .agg(mergeUdaf(col("sk"))).as[Array[Long]].head()
    assert(direct.sameElements(rolled))
    assert(QuantileSketch.totalCount(direct) == 5000L)
  }

  test("quantile estimates are within the relative-error bound of exact order stats") {
    val rnd = new scala.util.Random(29)
    val values = Array.fill(20000)(math.exp(rnd.nextGaussian() * 2) * 10)
    val packed = {
      var m = Map.empty[Int, Long]
      values.foreach { v =>
        val b = QuantileSketch.bucketOf(v); m = m.updated(b, m.getOrElse(b, 0L) + 1L)
      }
      // serialize through the aggregator to exercise the real path
      val df = values.toSeq.toDF("v")
      val skUdaf = udaf(QuantileSketch.sketch, org.apache.spark.sql.Encoders.scalaDouble)
      df.agg(skUdaf(col("v"))).as[Array[Long]].head()
    }
    val sorted = values.sorted
    Seq(0.01, 0.25, 0.5, 0.9, 0.95, 0.99).foreach { q =>
      val exact = sorted(math.max(0, math.ceil(q * sorted.length).toInt - 1))
      val est = QuantileSketch.estimateQuantile(packed, q)
      assert(math.abs(est - exact) <= QuantileSketch.Alpha * exact * 1.0000001,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("zeros flow through: count preserved, low quantiles report 0") {
    val df = (Seq.fill(60)(0.0) ++ Seq.fill(40)(100.0)).toDF("v")
    val skUdaf = udaf(QuantileSketch.sketch, org.apache.spark.sql.Encoders.scalaDouble)
    val packed = df.agg(skUdaf(col("v"))).as[Array[Long]].head()
    assert(QuantileSketch.totalCount(packed) == 100L)
    assert(QuantileSketch.estimateQuantile(packed, 0.5) == 0.0)
    assert(math.abs(QuantileSketch.estimateQuantile(packed, 0.9) - 100.0) <= 1.1)
  }
}
