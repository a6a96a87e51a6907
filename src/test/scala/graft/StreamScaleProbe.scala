package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: streaming throughput scaling. Replicates the events table
  * `factor`-fold (ids offset, timestamps jittered inside the original
  * span so window/session cardinality stays realistic), runs the
  * watermarked tumbling aggregation and the streaming dedup as REAL
  * streaming jobs, and reports rows/s at 1× vs factor×. Sub-linear wall
  * growth (exponent < 1) means per-batch overhead amortizes and state
  * operations stay O(rows) — the property that keeps a stream alive when
  * the topic is 1000× busier. Run:
  * `sbt "Test/runMain graft.StreamScaleProbe [baseDir] [factor]"`.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = s"/tmp/streamscale$factor"
    val path = s"$out/events"
    if (!new java.io.File(path).exists()) {
      val t = Tables.events(spark, base).drop("ts_ns")
      t.crossJoin(spark.range(factor).select(col("id").as("rep")))
        .select(
          (col("event_id") + col("rep") * 100000000L).as("event_id"),
          // jitter inside the original span: replicas land in the same
          // windows/sessions rather than inventing new quiet hours
          (col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, pmod(rep * 37, 3600))")).as("ts"),
          (col("user_id") + col("rep") * 10000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(16).write.mode("overwrite").parquet(path)
    }
    val oneX = s"$out/events1x"
    if (!new java.io.File(oneX).exists())
      Tables.events(spark, base).drop("ts_ns")
        .repartition(4).write.mode("overwrite").parquet(oneX)

    def run(dir: String, name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
            mode: String = "complete"): Double = {
      val t0 = System.nanoTime()
      graft.streaming.EventStreams.runToMemory(
        mk(graft.streaming.EventStreams.readEvents(spark, dir)), name, mode,
        statePartitions = Some(8))
      (System.nanoTime() - t0) / 1e9
    }

    val n1 = spark.read.parquet(oneX).count()
    val nN = spark.read.parquet(path).count()
    // enrich joins user_id to the nation dim; replicated user_ids are offset
    // by 10000·rep so only the original band matches — the join itself still
    // evaluates per row, which is what the throughput number measures
    val dim = Tables.nation(spark, base)
    // the two explicit-state APIs run in their native output modes; TWS
    // additionally needs the RocksDB (State-V2) backend
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    for ((label, mode, mk) <- Seq[(String, String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      ("tumbling", "complete", df => graft.streaming.EventStreams.tumblingDaily(df)),
      ("dedup", "complete", df => graft.streaming.EventStreams.dedupedEvents(df).groupBy().count()),
      ("enrich", "complete", df => graft.streaming.EventStreams.enrichedCounts(df, dim, "n_nationkey", "n_name")),
      ("fmgs", "append", df => graft.streaming.EventStreams.gapSessions(spark, df)),
      ("tws", "update", df => graft.streaming.EventStreams.statefulUserTotalsV2(spark, df)))) {
      run(oneX, s"ss_w_$label", mk, mode) // warm: session/codegen init
      val t1 = run(oneX, s"ss_1_$label", mk, mode)
      val tN = run(path, s"ss_n_$label", mk, mode)
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"[sscale] $label%-9s 1x ${t1}%6.2f s (${n1 / t1 / 1000}%.0fk rows/s) -> " +
        f"${factor}x ${tN}%6.2f s (${nN / tN / 1000}%.0fk rows/s)  exp $exp%.2f")
    }
    spark.stop()
  }
}
