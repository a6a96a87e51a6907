package graft

import org.apache.spark.sql.SparkSession

/** One phase of the cross-JVM kill/resume streaming test (test-scope tool,
  * never shipped in the library artifact).
  *
  * Each invocation is a FRESH JVM: it starts the stateful session-window
  * query (`EventStreams.userSessionCounts`) against `inDir`, drains all
  * available input into the parquet sink at `outDir` under checkpoint
  * `ckpt`, then exits. Any session state that is still open when the JVM
  * dies exists ONLY in the checkpoint's state store — the next invocation
  * must restore it from disk, which is exactly what the spec asserts.
  *
  * args: inDir outDir ckptDir [kind]   kind = session (default) | fmgs |
  * availtotals (AvailableNow stateful catch-up: one catch-up run over
  * whatever is in inDir, target/checkpoint under outDir, then exit — the
  * aggregate state between phase JVMs lives only in outDir/_chk)
  */
object StreamResumePhase {
  def main(args: Array[String]): Unit = {
    val (inDir, outDir, ckpt) = (args(0), args(1), args(2))
    val kind = args.lift(3).getOrElse("session")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("stream-resume-phase")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    if (kind == "availtotals") {
      try graft.streaming.EventStreams.catchUpRunningTotals(spark, inDir, outDir)
      finally spark.stop()
      return
    }
    try {
      val src = graft.streaming.EventStreams.readEvents(spark, inDir)
      val transformed = kind match {
        case "fmgs" => graft.streaming.EventStreams.gapSessions(spark, src)
        case _      => graft.streaming.EventStreams.userSessionCounts(src)
      }
      val q = transformed
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.stop()
  }
}
