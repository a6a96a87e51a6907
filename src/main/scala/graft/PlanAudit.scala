package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for scale-critical queries and
  * grep-friendly markers (PushedFilters, TakeOrderedAndProject,
  * BroadcastHashJoin, WholeStageCodegen) to audit that Catalyst produces
  * the plan we want — not just a plan that passes.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet
      else Set("q_log_composite", "q_scan_project", "q_topk_global",
        "q_star_join", "q_point_lookup", "q_join_semi", "q_agg_type_day",
        "q_range_join", "q_window_topk_user")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.contains(name)) {
        println(s"==== $name ====")
        println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
