package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregated top-k equals the window form on real data") {
    val e = Tables.events(spark, Sf0001)
    val viaAgg = TopK.perGroup(e, col("user_id"), col("ts_ns"), col("event_id"), k = 3)
      .select(col("group_key"), col("id"), col("rn"))
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns").desc, col("event_id"))
    val viaWindow = e.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("rn").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("ties break on ascending id; k larger than group is safe") {
    val df = Seq((1L, 10L, 101L), (1L, 10L, 100L), (1L, 9L, 50L), (2L, 5L, 7L))
      .toDF("g", "p", "id")
    val out = TopK.perGroup(df, col("g"), col("p"), col("id"), k = 10)
      .select("group_key", "id", "rn").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 100L, 1L), (1L, 101L, 2L), (1L, 50L, 3L), (2L, 7L, 1L)))
  }
}
