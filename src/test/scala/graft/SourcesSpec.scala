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

  test("xml round-trip with explicit schema, entity escaping on the hook") {
    // text exercises the XML escapes a real corpus would hit
    val docs = spark.createDataFrame(Seq(
      (1L, "plain text"),
      (2L, "a < b && c > d"),
      (3L, "quotes \"x\" and 'y' & amp"))).toDF("doc_id", "text")
    val path = s"$base/docs_xml"
    Sources.write(docs, path, "xml")
    val back = Sources.read(spark, path, "xml", Some(docs.schema))
    // compare names+types, not nullability: the tuple-derived source schema
    // is non-nullable, any file read is nullable
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)), "xml schema drift")
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq, "xml contents drift")
  }

  test("to_xml/from_xml column round-trip is the identity") {
    val xmlSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    val rt = docs
      .select(to_xml(struct(col("doc_id"), col("text"))).as("xml"))
      .select(from_xml(col("xml"), xmlSchema).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    assert(rt.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
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
