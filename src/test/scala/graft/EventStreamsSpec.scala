package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming transforms run against the static sf0.001 events dir via the
  * memory sink and are cross-checked against their batch twins — the same
  * window expressions must produce the same aggregates.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // the stream source needs a directory of parquet part-files: events.parquet
  // IS a single file, so point the reader at a dir containing a copy
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    // drop the ts_ns pushdown helper column: the stream schema is the
    // canonical 6-column events shape
    Tables.events(spark, Sf0001).drop("ts_ns").write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling daily counts match the batch equivalent") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(EventStreams.tumblingDaily(stream), "t_daily", "append")
    val streamed = spark.table("t_daily")
      .select(col("day_start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Tables.events(spark, Sf0001)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day_start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // append mode emits only windows closed by the final watermark; every
    // emitted window must match its batch twin exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
  }

  test("foreachBatch upsert: multi-batch merge equals batch rollup; replay-idempotent") {
    // 4-file input → 4 micro-batches under maxFilesPerTrigger=1
    val in = java.nio.file.Files.createTempDirectory("upsert-in").toString
    Tables.events(spark, Sf0001).drop("ts_ns")
      .repartition(4).write.mode("overwrite").parquet(in)
    def stream = spark.readStream.schema(EventStreams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val target = java.nio.file.Files.createTempDirectory("upsert-tgt").toString

    EventStreams.upsertUserTotals(stream, target)
    val versions = new java.io.File(target).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).sorted
    assert(versions.toSeq == Seq("v0", "v1", "v2", "v3"),
      s"expected 4 committed versions, got ${versions.toSeq}")

    val got = EventStreams.latestUpsertState(spark, target)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val want = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum((col("value").cast("decimal(18,2)") * 100).cast("long")) / 100.0).as("total"))
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == want, "final upsert state must equal the batch rollup")

    // atomic commit: the _LATEST pointer names the newest version
    assert(graft.operators.Layout.committedVersion(target).contains(3L),
      "pointer must name the newest committed version")

    // a torn (uncommitted) version directory — crash between the commit's
    // two renames — is invisible to readers: the pointer still resolves v3
    val torn = new java.io.File(target, "v99"); torn.mkdirs()
    java.nio.file.Files.write(torn.toPath.resolve("part-00000.parquet"),
      Array[Byte](0, 1, 2, 3)) // garbage, not parquet
    val served = EventStreams.latestUpsertState(spark, target)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(served == want, "reader must never see an uncommitted version")
    org.apache.commons.io.FileUtils.deleteDirectory(torn)

    // replay the WHOLE stream with a fresh checkpoint into the same target:
    // every batch re-commits over its own version — final state unchanged
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$target/_chk"))
    EventStreams.upsertUserTotals(stream, target)
    val replayed = EventStreams.latestUpsertState(spark, target)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(replayed == want, "replayed stream must not double-count")
  }

  test("stream-static enrichment join matches the batch join, stateless join") {
    val dim = Tables.nation(spark, Sf0001)
    val stream = EventStreams.readEvents(spark, eventsDir)
    val enriched = EventStreams.enrichedCounts(stream, dim, "n_nationkey", "n_name")
    EventStreams.runToMemory(enriched, "t_enrich", "complete")
    val streamed = spark.table("t_enrich")
      .as[(String, Long)].collect().toMap
    val batch = Tables.events(spark, Sf0001)
      .join(dim, col("user_id") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(
      EventStreams.dedupedEvents(stream.union(stream)).groupBy().count(),
      "t_dedup", "complete")
    val n = spark.table("t_dedup").as[Long].head()
    assert(n == Tables.events(spark, Sf0001).count())
  }

  test("stateful user totals: streaming final state matches batch groupBy") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(
      EventStreams.statefulUserTotals(spark, stream), "t_totals", "update")
    // update mode may emit a row per micro-batch; the final state per user is
    // the row with the largest n
    val finalState = spark.table("t_totals")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .as[(Long, Long)].collect().toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(finalState == batch)
  }

  test("streamingQuantiles: sketch accumulated over 4 micro-batches equals the batch sketch") {
    import graft.functions.QuantileSketch
    val in = java.nio.file.Files.createTempDirectory("sketch-in").toString
    Tables.events(spark, Sf0001).drop("ts_ns")
      .repartition(4).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(EventStreams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    EventStreams.runToMemory(
      EventStreams.streamingQuantiles(spark, stream), "t_squant", "update",
      statePartitions = Some(2))
    val total = udf((p: Seq[Long]) => QuantileSketch.totalCount(p.toArray))
    val finalSketches = spark.table("t_squant")
      .withColumn("n", total(col("sketch")))
      .groupBy(col("event_type"))
      .agg(max_by(col("sketch"), col("n")).as("sketch"))
      .as[(String, Array[Long])].collect().toMap
    val skUdaf = udaf(QuantileSketch.sketch, org.apache.spark.sql.Encoders.scalaDouble)
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("event_type")).agg(skUdaf(col("value")).as("sk"))
      .as[(String, Array[Long])].collect().toMap
    assert(finalSketches.keySet == batch.keySet)
    batch.foreach { case (k, sk) =>
      assert(finalSketches(k).sameElements(sk), s"stream/batch sketch diverged for $k")
    }
  }

  test("transformWithState totals over 4 micro-batches equal the batch groupBy") {
    val in = java.nio.file.Files.createTempDirectory("tws-in").toString
    Tables.events(spark, Sf0001).drop("ts_ns")
      .repartition(4).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(EventStreams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try EventStreams.runToMemory(
      EventStreams.statefulUserTotalsV2(spark, stream), "t_tws", "update",
      statePartitions = Some(2))
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val finalState = spark.table("t_tws")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .as[(Long, Long)].collect().toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(finalState == batch)
  }

  test("gapSessions: closes by successor AND by event-time timeout; withholds open sessions") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, uid: Long, offMin: Long) =
      (id, new Timestamp(base + offMin * 60000L), uid, "click", 1.0, "{}")
    // user 1: two events 10min apart (one session), then a 40min gap closes
    //   it; the successor session ends 5h before max ts -> times out too.
    // user 2: a single event just 30min before max ts -> still open at the
    //   final watermark (max-1h), must be withheld.
    val rows = Seq(
      ev(1, 1L, 0), ev(2, 1L, 10), ev(3, 1L, 50), ev(4, 1L, 55),
      ev(5, 2L, 330), ev(6, 9L, 360)) // uid 9 pushes max ts for the watermark
    val dir = java.nio.file.Files.createTempDirectory("fmgs-events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val sess = EventStreams.gapSessions(spark, EventStreams.readEvents(spark, dir))
    EventStreams.runToMemory(sess, "t_fmgs", "append", statePartitions = Some(2))
    val got = spark.table("t_fmgs")
      .select(col("user_id"), col("session_start"), col("n_events"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    // watermark = 360min - 60min = 300min. user 1 session A (0..10) closed by
    // successor; session B (50..55) timeout 85 < 300 fires. user 2's session
    // (330) and uid 9's (360) are open inside the horizon: withheld.
    assert(got == Set(
      (1L, new java.sql.Timestamp(base), 2L),
      (1L, new java.sql.Timestamp(base + 50 * 60000L), 2L)))
  }

  test("file sink: stream-to-parquet with checkpoint preserves every event") {
    val outDir = java.nio.file.Files.createTempDirectory("stream-out").toString
    val q = EventStreams.readEvents(spark, eventsDir)
      .writeStream
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$outDir/data")
    assert(written.count() == Tables.events(spark, Sf0001).count())
    assert(written.columns.sorted.toSeq ==
      Tables.events(spark, Sf0001).drop("ts_ns").columns.sorted.toSeq)
  }

  test("AvailableNow catch-up processes only new files per run") {
    val root = java.nio.file.Files.createTempDirectory("availnow").toString
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "event_type", "value")
    val expected1 = ev.where(col("event_id") % 2 === 0 &&
      col("event_type").isin("click", "purchase")).count()
    val expectedAll = ev.where(col("event_type").isin("click", "purchase")).count()

    ev.where(col("event_id") % 2 === 0).write.parquet(s"$root/in")
    EventStreams.catchUpAvailableNow(spark, s"$root/in", s"$root/sink", s"$root/chk")
    assert(spark.read.parquet(s"$root/sink").count() == expected1)

    ev.where(col("event_id") % 2 =!= 0).write.mode("append").parquet(s"$root/in")
    EventStreams.catchUpAvailableNow(spark, s"$root/in", s"$root/sink", s"$root/chk")
    // exactly the second arrival added — a re-processed first arrival
    // would push the append sink past expectedAll
    assert(spark.read.parquet(s"$root/sink").count() == expectedAll)

    // a third run with NO new input appends nothing
    EventStreams.catchUpAvailableNow(spark, s"$root/in", s"$root/sink", s"$root/chk")
    assert(spark.read.parquet(s"$root/sink").count() == expectedAll)
  }

  test("sliding hourly windows emit and every count is positive") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(EventStreams.slidingHourly(stream), "t_sliding", "append")
    val rows = spark.table("t_sliding")
    assert(rows.count() > 0)
    assert(rows.where(col("n") <= 0).count() == 0)
    // each 1-hour-slide/1-hour-window... window=1h slide=15min: w_end - w_start
    // must equal the declared 1 hour for every emitted window
    assert(rows.where(
      unix_millis(col("w_end")) - unix_millis(col("w_start")) =!= 3600000L).count() == 0)
  }

  test("stream-stream interval join matches the batch twin") {
    val s1 = EventStreams.readEvents(spark, eventsDir)
    val s2 = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(
      EventStreams.clickPurchaseJoin(s1, s2), "t_interval", "append")
    val streamed = spark.table("t_interval")
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    val e = Tables.events(spark, Sf0001)
    val batch = EventStreams.clickPurchaseJoin(e, e)
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("foreachBatch sink: custom writer sees every event exactly once") {
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = EventStreams.readEvents(spark, eventsDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(batch.count()): Unit
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(seen.get() == Tables.events(spark, Sf0001).count())
  }

  test("session windows produce bounded per-user sessions") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(EventStreams.userSessions(stream), "t_sessions", "append")
    val rows = spark.table("t_sessions")
    assert(rows.where(col("session_end") < col("session_start")).count() == 0)
  }

  test("RocksDB state store: session windows match the default provider's result") {
    // Heap state (default HDFSBackedStateStoreProvider) is bounded by
    // executor memory; RocksDB keeps state on local disk — the production
    // provider once streaming state outgrows the heap. Same query, same
    // data, both providers: results must be identical.
    val stream = EventStreams.readEvents(spark, eventsDir)
    EventStreams.runToMemory(EventStreams.userSessionCounts(stream),
      "t_sess_heap", "complete")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      EventStreams.runToMemory(EventStreams.userSessionCounts(stream),
        "t_sess_rocks", "complete")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    def rows(t: String) = spark.table(t)
      .select("session_start", "user_id", "n_events")
      .collect().map(_.toSeq).toSet
    val heap = rows("t_sess_heap")
    val rocks = rows("t_sess_rocks")
    assert(heap.nonEmpty)
    assert(rocks == heap)
  }

  test("checkpointed file-sink stream resumes exactly-once across restarts") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("resume_in").toString
    val outDir = Files.createTempDirectory("resume_out").toString + "/out"
    val ckpt = Files.createTempDirectory("resume_ckpt").toString
    val all = Tables.events(spark, Sf0001).drop("ts_ns")
    def addSlice(lo: Long, hi: Long): Unit = {
      // each slice lands as its own parquet part inside the watched dir
      val tmp = Files.createTempDirectory("resume_slice").toString
      all.where(col("event_id") >= lo && col("event_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach { f =>
          Files.move(f.toPath,
            java.nio.file.Paths.get(inDir, s"slice_${lo}_$hi.parquet"))
        }
    }
    def runOnce(): Unit = {
      val q = EventStreams.readEvents(spark, inDir)
        .select("event_id", "event_type")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    addSlice(0, 300)
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == all.where(col("event_id") < 300).count())
    addSlice(300, 500)
    runOnce() // SECOND query instance, same checkpoint: must pick up only
              // the new slice — the first slice is committed in the offset
              // log and must not be reprocessed into duplicates
    val out = spark.read.parquet(outDir)
    assert(out.count() == all.where(col("event_id") < 500).count())
    assert(out.select("event_id").distinct().count() == out.count())
  }
}
