package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe (dev): repeated warm timings of q_dedup_recall. */
object RecallProbe2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries("q_dedup_recall")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, d).write.mode("overwrite").format("noop").save()
      println(f"[recall2] run $i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
