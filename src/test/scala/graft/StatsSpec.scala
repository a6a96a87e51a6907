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
    Seq("stats_orders", "stats_orders_raw", "stats_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = (try Option(new java.net.URI(wh).getPath) catch { case _: Exception => None })
        .getOrElse(wh)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(whPath, t))
    }
    orders.write.mode("overwrite").saveAsTable("stats_orders")
    orders.write.mode("overwrite").saveAsTable("stats_orders_raw") // same data, NEVER analyzed
    lineitem.write.mode("overwrite").saveAsTable("stats_lineitem")
    val n = Stats.analyze(spark, "stats_orders", Seq("o_orderkey", "o_custkey"))
    Stats.analyze(spark, "stats_lineitem", Seq("l_orderkey"))
    assert(n == orders.count(), "cataloged row count must be exact")

    // the build side: an equality filter on an analyzed high-ndv column —
    // with column stats CBO estimates rows/ndv (~10 rows, a few hundred
    // bytes); without stats the Filter estimate passes through the table's
    // file-size-based estimate unchanged. Pinning the broadcast threshold
    // between the two, the SAME un-hinted query broadcasts exactly when
    // ANALYZE has run — the load-bearing claim for a 100 TB warehouse,
    // where hints can't know post-filter sizes but statistics can.
    def join(ordersTable: String) = spark.table("stats_lineitem")
      .join(spark.table(ordersTable).where(col("o_custkey") === 42),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))

    val confs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // the estimate of the join's ACTUAL build side (filter + the pruned
      // two-column projection): column pruning scales the no-stats size
      // estimate too, so measuring the filter alone would pin the
      // threshold against a plan the join never builds
      def filteredEstimate(t: String) = spark.table(t)
        .where(col("o_custkey") === 42).select("o_orderkey", "o_custkey")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val withStats = filteredEstimate("stats_orders")
      val noStats = filteredEstimate("stats_orders_raw")
      assert(withStats < noStats,
        s"column stats must shrink the filtered estimate: $withStats vs $noStats")
      val threshold = (withStats + noStats) / 2
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)

      val analyzed = join("stats_orders").queryExecution.executedPlan.toString
      assert(analyzed.contains("BroadcastHashJoin"),
        s"stats + CBO must pick broadcast:\n${analyzed.take(800)}")

      val unanalyzed = join("stats_orders_raw").queryExecution.executedPlan.toString
      assert(!unanalyzed.contains("BroadcastHashJoin"),
        s"without stats the filtered estimate stays full-size, no broadcast:\n${unanalyzed.take(800)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
