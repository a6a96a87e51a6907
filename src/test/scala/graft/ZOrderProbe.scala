package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: file-stat pruning and wall-time effect of the z-order layout
  * at sf0.1 / 64 files. Run: `sbt "Test/runMain graft.ZOrderProbe"`.
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("zorder_probe").toString
    val ev = Tables.events(spark, base)
      .select("event_id", "user_id", "event_type", "value")
    graft.operators.Layout.zorderWrite(ev, "user_id", "event_id", s"$dir/z", 64)
    ev.repartition(64).write.mode("overwrite").parquet(s"$dir/naive")

    def stats(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("event_id").as("elo"), max("event_id").as("ehi"))
        .where(col("uhi") >= 3 && col("ulo") <= 7 &&
          col("ehi") >= 100 && col("elo") <= 20000)
        .count()

    def time(path: String): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(path)
        .where(col("user_id").between(3, 7) && col("event_id").between(100, 20000))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(s"[zorder] files intersecting box: z=${stats(s"$dir/z")}/64 naive=${stats(s"$dir/naive")}/64")
    time(s"$dir/z"); time(s"$dir/naive") // warm
    println(f"[zorder] box-filter wall: z=${Seq(time(s"$dir/z"), time(s"$dir/z")).min}%.3fs " +
      f"naive=${Seq(time(s"$dir/naive"), time(s"$dir/naive")).min}%.3fs")
    spark.stop()
  }
}
