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
  * args: inDir outDir ckptDir
  */
object StreamResumePhase {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, ckpt) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("stream-resume-phase")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      val q = graft.streaming.EventStreams
        .userSessionCounts(graft.streaming.EventStreams.readEvents(spark, inDir))
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
