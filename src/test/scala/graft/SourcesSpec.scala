package graft

import java.nio.file.Files

import graft.sources.Sources
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  private lazy val base = Files.createTempDirectory("sources").toString
  private lazy val events = Tables.events(spark, Sf0001)
    .select("event_id", "user_id", "event_type", "value")

  test("parquet/csv/json/orc round-trip with explicit schema") {
    for (fmt <- Seq("parquet", "csv", "json", "orc")) {
      val path = s"$base/events_$fmt"
      Sources.write(events, path, fmt)
      val back = Sources.read(spark, path, fmt, Some(events.schema))
      assert(back.schema == events.schema, s"$fmt schema drift")
      assert(back.count() == events.count(), s"$fmt row loss")
      val a = events.orderBy("event_id").collect().toSeq
      val b = back.orderBy("event_id").collect().toSeq
      assert(a == b, s"$fmt contents drift")
    }
  }

  test("partitioned write produces prunable directories") {
    val path = s"$base/events_part"
    Sources.write(events, path, "parquet", partitionBy = Seq("event_type"))
    assert(new java.io.File(s"$path/event_type=click").exists())
    val pruned = Sources.read(spark, path, "parquet")
      .where(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
  }

  test("single-file export writes exactly one part file") {
    val path = s"$base/single"
    Sources.writeSingleFile(events.limit(10), path)
    val parts = new java.io.File(path).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 1)
  }
}
