package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("columnStats: exact one-pass profile matches direct queries") {
    val orders = Tables.orders(spark, Sf0001)
    val got = Stats.columnStats(orders, Seq("o_custkey", "o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    val nRows = orders.count()
    val want = Seq("o_custkey", "o_orderstatus").map { c =>
      val r = orders.agg(countDistinct(col(c)), min(col(c)).cast("string"),
        max(col(c)).cast("string")).head()
      (c, nRows, r.getLong(0), 0L, r.getString(1), r.getString(2))
    }
    assert(got == want)
  }

  test("columnStatsApprox ndv is within 10% of exact on orders keys") {
    val orders = Tables.orders(spark, Sf0001)
    val exact = Stats.columnStats(orders, Seq("o_custkey")).head().getLong(2)
    val approx = Stats.columnStatsApprox(orders, Seq("o_custkey")).head().getLong(2)
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }

  test("ANALYZE + CBO: column stats flip an un-hinted join to broadcast") {
    val orders = Tables.orders(spark, Sf0001)
    val lineitem = Tables.lineitem(spark, Sf0001)
    // same fresh-catalog/stale-warehouse hygiene as Layout.writeBucketed
    Seq("stats_orders", "stats_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = (try Option(new java.net.URI(wh).getPath) catch { case _: Exception => None })
        .getOrElse(wh)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(whPath, t))
    }
    orders.write.mode("overwrite").saveAsTable("stats_orders")
    lineitem.write.mode("overwrite").saveAsTable("stats_lineitem")
    val n = Stats.analyze(spark, "stats_orders",
      Seq("o_orderkey", "o_orderstatus"))
    Stats.analyze(spark, "stats_lineitem", Seq("l_orderkey"))
    assert(n == orders.count(), "cataloged row count must be exact")

    // the build side: a selective filter on the analyzed column. Without
    // CBO the filter's size estimate equals the full table's, so with the
    // threshold pinned between (filtered, full) the planner must refuse to
    // broadcast; with CBO the FilterEstimation shrinks the estimate below
    // the threshold and the SAME un-hinted query broadcasts.
    def join() = spark.table("stats_lineitem")
      .join(spark.table("stats_orders").where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))

    val confs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val fullSize = spark.table("stats_orders")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val filteredSize = spark.table("stats_orders")
        .where(col("o_orderstatus") === "F")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(filteredSize < fullSize,
        s"CBO must shrink the filtered estimate: $filteredSize vs $fullSize")
      val threshold = (filteredSize + fullSize) / 2
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)

      val withCbo = join().queryExecution.executedPlan.toString
      assert(withCbo.contains("BroadcastHashJoin"),
        s"stats + CBO must pick broadcast:\n${withCbo.take(800)}")

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val withoutCbo = join().queryExecution.executedPlan.toString
      assert(!withoutCbo.contains("BroadcastHashJoin"),
        s"without CBO the filtered estimate stays full-size, no broadcast:\n${withoutCbo.take(800)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
