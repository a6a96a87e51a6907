package graft

import java.nio.file.{Files, Paths}

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Cross-JVM kill/restart of a STATEFUL streaming query.
  *
  * The same-JVM resume test (`EventStreamsSpec`) proves offset-log
  * exactly-once for a stateless sink. This spec proves the stronger
  * property: session-window STATE survives a process death. Phase 1 runs
  * the session-window query over the early half of the events in a child
  * JVM and exits — any session still open at that point lives only in the
  * checkpoint's state store on disk. Phase 2 is a brand-new JVM on the
  * same checkpoint fed the late half; it must restore that state and merge
  * boundary-spanning sessions correctly. The final emitted set must equal
  * an uninterrupted single-run twin over all the data.
  *
  * Sessions only merge across the time split (no event_id split artifacts):
  * a phase-1-emitted session has end < watermark ≤ splitTs − 1h, and a
  * phase-2 event has ts ≥ splitTs, so nothing ever lands in an
  * already-emitted session — the comparison is deterministic.
  */
class StreamKillResumeSpec extends SparkSpec {

  private def forkPhase(inDir: String, outDir: String, ckpt: String,
                        kind: String = "session"): Unit = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.StreamResumePhase", inDir, outDir, ckpt, kind)
    val proc = new ProcessBuilder(cmd: _*)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectErrorStream(false)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
      .start()
    val done = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(done, "phase JVM did not finish within 5 minutes")
    assert(proc.exitValue() == 0, s"phase JVM exited ${proc.exitValue()}")
  }

  private def addSlice(df: org.apache.spark.sql.DataFrame, inDir: String, tag: String): Unit = {
    val tmp = Files.createTempDirectory(s"kr_slice_$tag").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.move(f.toPath, Paths.get(inDir, s"slice_$tag.parquet")))
  }

  test("session-window state survives a JVM kill and restores in a new process") {
    val all = Tables.events(spark, Sf0001).drop("ts_ns").cache()
    // split on the median event time so sessions genuinely span the boundary
    val medianMs = all.select(unix_millis(col("ts")).as("ms"))
      .stat.approxQuantile("ms", Array(0.5), 0.0).head.toLong

    val inDir = Files.createTempDirectory("kr_in").toString
    val outDir = Files.createTempDirectory("kr_out").toString + "/out"
    val ckpt = Files.createTempDirectory("kr_ckpt").toString

    addSlice(all.where(unix_millis(col("ts")) < medianMs), inDir, "early")
    forkPhase(inDir, outDir, ckpt) // JVM 1: dies with open sessions in state
    addSlice(all.where(unix_millis(col("ts")) >= medianMs), inDir, "late")
    forkPhase(inDir, outDir, ckpt) // JVM 2: must restore state from disk

    // uninterrupted twin in THIS JVM: same query, all data, fresh checkpoint
    val twinIn = Files.createTempDirectory("kr_twin_in").toString
    val twinOut = Files.createTempDirectory("kr_twin_out").toString + "/out"
    val twinCkpt = Files.createTempDirectory("kr_twin_ckpt").toString
    addSlice(all, twinIn, "all")
    val q = EventStreams.userSessionCounts(EventStreams.readEvents(spark, twinIn))
      .writeStream.format("parquet")
      .option("path", twinOut)
      .option("checkpointLocation", twinCkpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    def emitted(dir: String): Set[(Long, Long, Long)] =
      spark.read.parquet(dir)
        .select(unix_millis(col("session_start")), col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val resumed = emitted(outDir)
    val twin = emitted(twinOut)
    assert(resumed.nonEmpty, "resumed run emitted no sessions")
    assert(resumed == twin,
      s"resumed-run sessions differ from uninterrupted twin: " +
        s"only-resumed=${(resumed -- twin).take(5)} only-twin=${(twin -- resumed).take(5)}")
    all.unpersist()
    ()
  }

  test("fMGWS custom session state survives a JVM kill and restores in a new process") {
    // the explicit-state analogue of the session-window test: the open
    // SessAcc record (three longs per user) lives only in the checkpoint's
    // state store between the two phase JVMs, and the registered event-time
    // timeouts must re-arm from restored state in the new process
    val all = Tables.events(spark, Sf0001).drop("ts_ns").cache()
    val medianMs = all.select(unix_millis(col("ts")).as("ms"))
      .stat.approxQuantile("ms", Array(0.5), 0.0).head.toLong

    val inDir = Files.createTempDirectory("krf_in").toString
    val outDir = Files.createTempDirectory("krf_out").toString + "/out"
    val ckpt = Files.createTempDirectory("krf_ckpt").toString

    addSlice(all.where(unix_millis(col("ts")) < medianMs), inDir, "early")
    forkPhase(inDir, outDir, ckpt, kind = "fmgs")
    addSlice(all.where(unix_millis(col("ts")) >= medianMs), inDir, "late")
    forkPhase(inDir, outDir, ckpt, kind = "fmgs")

    val twinIn = Files.createTempDirectory("krf_twin_in").toString
    val twinOut = Files.createTempDirectory("krf_twin_out").toString + "/out"
    val twinCkpt = Files.createTempDirectory("krf_twin_ckpt").toString
    addSlice(all, twinIn, "all")
    val q = EventStreams.gapSessions(spark, EventStreams.readEvents(spark, twinIn))
      .writeStream.format("parquet")
      .option("path", twinOut)
      .option("checkpointLocation", twinCkpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    def emitted(dir: String): Set[(Long, Long, Long)] =
      spark.read.parquet(dir)
        .select(unix_millis(col("session_start")), col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val resumed = emitted(outDir)
    val twin = emitted(twinOut)
    assert(resumed.nonEmpty, "resumed fMGWS run emitted no sessions")
    // phase 1's earlier watermark can only WITHHOLD emissions relative to
    // the twin, never invent them; after phase 2 drains the same data the
    // sets must coincide exactly (timeout boundary argument in the header)
    assert(resumed == twin,
      s"resumed fMGWS sessions differ from uninterrupted twin: " +
        s"only-resumed=${(resumed -- twin).take(5)} only-twin=${(twin -- resumed).take(5)}")
    all.unpersist()
    ()
  }

  test("AvailableNow stateful catch-up state survives a JVM kill between runs") {
    // the nightly-incremental analogue: the per-user aggregate state
    // between the two catch-up runs exists ONLY in the checkpoint on disk
    // (each phase JVM exits completely). Phase 2 must fold the second
    // arrival into the restored totals; if it instead restarted from
    // nothing or re-read arrival 1, the served table would diverge from
    // the batch rollup computed here.
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "event_type", "value").cache()
    val inDir = Files.createTempDirectory("an_in").toString
    val tgt = Files.createTempDirectory("an_tgt").toString + "/tgt"

    addSlice(ev.where(col("event_id") % 2 === 0), inDir, "even")
    forkPhase(inDir, tgt, "", kind = "availtotals") // JVM 1 dies after run 1
    addSlice(ev.where(col("event_id") % 2 =!= 0), inDir, "odd")
    forkPhase(inDir, tgt, "", kind = "availtotals") // JVM 2 resumes from disk

    val served = spark.read.parquet(s"$tgt/current")
      .select(col("user_id"), col("n"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = ev
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == expected,
      s"resumed catch-up diverges from batch rollup: " +
        s"only-served=${(served -- expected).take(5)} only-batch=${(expected -- served).take(5)}")
    ev.unpersist()
    ()
  }
}
