package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe (dev, test source set — not shipped): stream-stream
  * interval join wall time vs state partition count (shuffle.partitions at
  * stream start). Run: `sbt "Test/runMain graft.DedupProbe [dataDir] [cpus]"`.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runStream(parts: Int, name: String): Double = {
      val t0 = System.nanoTime()
      val ev = graft.streaming.EventStreams.readEventsNanos(spark, s"$d/events.parquet")
      val joined = graft.streaming.EventStreams.clickPurchaseJoin(ev, ev)
      graft.streaming.EventStreams.runToMemory(joined, name, "append", Some(parts))
      (System.nanoTime() - t0) / 1e9
    }
    def runSession(parts: Int, name: String): Double = {
      val t0 = System.nanoTime()
      val sess = graft.streaming.EventStreams.userSessionCounts(
        graft.streaming.EventStreams.readEventsNanos(spark, s"$d/events.parquet"))
      graft.streaming.EventStreams.runToMemory(sess, name, "complete", Some(parts))
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] interval p=32 cold  ${runStream(32, "m1")}%6.2f s")
    println(f"[probe] interval p=32 warm  ${runStream(32, "m2")}%6.2f s")
    println(f"[probe] interval p=8        ${runStream(8, "m3")}%6.2f s")
    println(f"[probe] interval p=4        ${runStream(4, "m4")}%6.2f s")
    println(f"[probe] interval p=8 again  ${runStream(8, "m5")}%6.2f s")
    println(f"[probe] session  p=32       ${runSession(32, "s1")}%6.2f s")
    println(f"[probe] session  p=8        ${runSession(8, "s2")}%6.2f s")
    println(f"[probe] session  p=8 again  ${runSession(8, "s3")}%6.2f s")
    // row-count sanity: partition count must not change results
    println("[probe] interval rows p32=" + spark.table("m2").count() + " p8=" + spark.table("m5").count())
    println("[probe] session rows p32=" + spark.table("s1").count() + " p8=" + spark.table("s3").count())
    spark.stop()
  }
}
