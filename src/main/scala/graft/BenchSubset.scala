package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: best-of-3 bench for a NAMED SUBSET of `SparkEntry.queries`
  * — the per-query iteration loop Bench's full-suite run is too slow for.
  * Mirrors Bench's protocol (noop sink, warmup, clearCache between runs)
  * so numbers are comparable to the round record.
  *
  *   sbt "runMain graft.BenchSubset q_dedup_funnel q_dedup_explain"
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    SparkEntry.queries.get("q_scan_project").foreach(fn =>
      try run(fn) catch { case _: Throwable => })
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_funnel", "q_dedup_explain")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        run(fn)
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"$name%-28s best=${times.min}%6.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
