package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run NAMED `SparkEntry.queries` entries and print their
  * rows — the fast eyeball loop for invariant-gated fixtures (whose
  * declared columns are booleans that must all be true before the
  * DuckDB hash compare can pass).
  *
  *   sbt "runMain graft.QueryShow q_stream_ivf_growth"
  */
object QueryShow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach {
      case s"sql:$name" =>
        // dump the DuckDB oracle (for driver-side spot checks)
        println(s"-- oracle for $name --")
        println(SparkEntry.oracleSql.getOrElse(name, sys.error(s"no oracle for $name")))
      case name =>
        val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.show(50, truncate = false)
        println(f"$name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
