package graft

import org.apache.spark.sql.functions._

/** The events loader's physical-form tolerance: the driver has regenerated
  * the testdata with a different `ts` encoding three times (TIMESTAMP(NANOS),
  * UTC-adjusted micros, NTZ micros); these fixtures pin the loader's behavior
  * for every form it claims to handle, including raw-long epochs in ns / µs /
  * ms / s sniffed by magnitude.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one known instant: 2024-03-05T06:07:08.123456Z
  private val us = 1709618828123456L

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit =
    Seq((1L, 7L, "click", 1.5, "{}")).toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("raw-long ts is unit-sniffed by magnitude: ns, us, ms, and s all land on the same instant") {
    val cases = Seq(
      "ns" -> (us * 1000L, us * 1000L),
      "us" -> (us, us * 1000L),
      "ms" -> (us / 1000L, (us / 1000L) * 1000000L),
      "s"  -> (us / 1000000L, (us / 1000000L) * 1000000000L))
    cases.foreach { case (unit, (raw, wantNs)) =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$unit").toString
      writeEvents(dir, lit(raw))
      val row = Tables.events(spark, dir)
        .select(unix_micros(col("ts")).as("us"), col("ts_ns")).head()
      assert(row.getAs[Long]("us") == wantNs / 1000L, s"unit=$unit converted ts")
      assert(row.getAs[Long]("ts_ns") == wantNs, s"unit=$unit ts_ns")
    }
  }

  test("native timestamp ts (the current testdata form) passes through with derived ts_ns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_native").toString
    writeEvents(dir, timestamp_micros(lit(us)))
    val row = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("ts_ns")).head()
    assert(row.getAs[Long]("us") == us)
    assert(row.getAs[Long]("ts_ns") == us * 1000L)
  }

  test("driver testdata loads: ts is a timestamp, ts_ns consistent, rows non-empty") {
    val ev = Tables.events(spark, Sf0001)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val bad = ev.where(unix_micros(col("ts")) * 1000L =!= col("ts_ns")).count()
    assert(bad == 0, "ts and ts_ns must encode the same instant")
    assert(ev.count() > 0)
  }
}
