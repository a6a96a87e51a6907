package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals the direct aggregate on skewed data") {
    // heavy skew: 90% of rows share one key
    val df = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 5).otherwise(lit(999L)).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val direct = df.groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("key").as[(Long, Long, Double)].collect().toSeq
    val salted = Layout.saltedAgg(df, col("k"), col("v"))
      .orderBy("key").as[(Long, Long, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("scd2Upsert closes replaced versions, increments, and inserts new keys") {
    val base = Seq(
      (1L, "a", 10.0, 1L, true),
      (2L, "b", 20.0, 1L, true),
      // key 3 already has history: v1 closed, v2 current
      (3L, "c0", 5.0, 1L, false),
      (3L, "c1", 30.0, 2L, true))
      .toDF("k", "name", "bal", "version", "is_current")
    val changes = Seq(
      (2L, "b2", 25.0),  // update existing single-version key
      (3L, "c2", 35.0),  // update key with prior history → v3
      (9L, "n", 1.0))    // brand-new key → v1
      .toDF("k", "name", "bal")
    val out = Layout.scd2Upsert(base, changes, "k")
      .orderBy("k", "version")
      .as[(Long, String, Double, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0, 1L, true),    // untouched key passes through
      (2L, "b", 20.0, 1L, false),   // closed
      (2L, "b2", 25.0, 2L, true),   // appended at max+1
      (3L, "c0", 5.0, 1L, false),   // already-closed history survives
      (3L, "c1", 30.0, 2L, false),  // was current, now closed
      (3L, "c2", 35.0, 3L, true),   // appended at max+1 over full history
      (9L, "n", 1.0, 1L, true)))    // new key inserts at version 1
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    Tables.events(spark, Sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // the dim must be a real scan: a local relation constant-folds the
    // filter away and leaves DPP nothing to derive the pruning subquery from
    Seq(("click", 1), ("view", 2), ("purchase", 3)).toDF("et", "et_id")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10")
      val q = fact.join(dim, fact("event_type") === dim("et"))
        .where(col("et_id") === 1)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), s"expected DPP subquery in:\n$plan")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("click"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the third pruning mechanism beside static pushdown and DPP: when a
    // shuffle join's small side carries a selective filter, Catalyst
    // injects bloom_filter_might_contain(join_key) into the FACT side's
    // scan filter — at 100 TB this drops non-matching fact rows at the
    // scan, before the shuffle. Thresholds tuned down to fire at test size;
    // broadcast disabled because a broadcast join needs no runtime filter.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_extendedprice")
      val dim = Tables.orders(spark, Sf0001)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      // Spark 4 renders the injected filter as might_contain(<scalar
      // subquery computing bloom_filter_agg(join key)>) on the fact side
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected injected runtime bloom filter in:\n$plan")
      // the filter is pruning-only: the result equals the unfiltered join
      val n = q.as[Long].head()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n0 = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n")).as[Long].head()
      assert(n == n0 && n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // one hot key holds ~90% of the left side; with skew thresholds tuned
    // down, AQE's OptimizeSkewedJoin must split that partition
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // payload must be incompressible: skew stats read COMPRESSED shuffle
      // sizes, so a constant payload would dedupe to nothing on the wire
      val left = spark.range(200000)
        .select(when(col("id") % 10 === 0, col("id") % 64).otherwise(lit(7L)).as("k"),
          md5(concat(lit("s"), col("id"))).as("payload"))
      val right = spark.range(64).select(col("id").as("k"), lit(1).as("tag"))
      val joined = left.join(right, "k")
      // collect() runs THIS DataFrame's own QueryExecution — count() would
      // build a new one and the adaptive plan would never finalize here
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("clustered layout: a 1-D range predicate intersects few files, naive all") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "ts_ns", "event_type", "value")
    Layout.clusteredWrite(ev, "ts_ns", s"$dir/c", nFiles = 16)
    ev.repartition(16).write.mode("overwrite").parquet(s"$dir/naive")

    // mid-span time window ≈ 1/16 of the range: the clustered layout must
    // serve it from 1-2 files; a round-robin layout touches all of them
    val Array(lo, hi) = ev.agg(min("ts_ns"), max("ts_ns")).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val (wLo, wHi) = (lo + (hi - lo) / 2, lo + (hi - lo) / 2 + (hi - lo) / 16)
    def intersecting(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("ts_ns").as("tlo"), max("ts_ns").as("thi"))
        .where(col("thi") >= wLo && col("tlo") <= wHi)
        .count()
    val cHit = intersecting(s"$dir/c")
    val nHit = intersecting(s"$dir/naive")
    assert(nHit >= 14, s"naive layout unexpectedly clustered: $nHit/16")
    assert(cHit <= 2, s"range clustering pruned too little: $cHit files")

    // layout is result-invisible
    val slice = (d: org.apache.spark.sql.DataFrame) => d
      .where(col("ts_ns").between(wLo, wHi))
      .select("event_id").as[Long].collect().toSet
    assert(slice(spark.read.parquet(s"$dir/c")) == slice(ev))
  }

  test("z-order layout: fewer files intersect a 2-D box than a naive layout") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "event_type", "value")
    Layout.zorderWrite(ev, "user_id", "event_id", s"$dir/z", nFiles = 16)
    ev.repartition(16).write.mode("overwrite").parquet(s"$dir/naive")

    // per-file (min,max) stats — what parquet footer pruning sees
    def intersecting(path: String): Long = {
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("event_id").as("elo"), max("event_id").as("ehi"))
        .where(col("uhi") >= 3 && col("ulo") <= 7 &&
          col("ehi") >= 100 && col("elo") <= 700)
        .count()
    }
    val zHit = intersecting(s"$dir/z")
    val nHit = intersecting(s"$dir/naive")
    // a naive round-robin layout spreads every value range over every file,
    // so all 16 intersect; the z-order must rule out most files by stats
    assert(nHit >= 14, s"naive layout unexpectedly clustered: $nHit/16")
    assert(zHit <= nHit / 2, s"z-order pruned too little: $zHit vs naive $nHit")

    // layout is result-invisible
    val box = (d: org.apache.spark.sql.DataFrame) => d
      .where(col("user_id").between(3, 7) && col("event_id").between(100, 700))
      .select("event_id").as[Long].collect().toSet
    assert(box(spark.read.parquet(s"$dir/z")) == box(ev))
  }

  test("hilbert layout prunes a 2-D box at least as well as naive, content intact") {
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "event_type", "value")
    Layout.hilbertWrite(ev, "user_id", "event_id", s"$dir/h", nFiles = 16)
    ev.repartition(16).write.mode("overwrite").parquet(s"$dir/naive")

    def intersecting(path: String): Long = {
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("event_id").as("elo"), max("event_id").as("ehi"))
        .where(col("uhi") >= 3 && col("ulo") <= 7 &&
          col("ehi") >= 100 && col("elo") <= 700)
        .count()
    }
    val hHit = intersecting(s"$dir/h")
    val nHit = intersecting(s"$dir/naive")
    assert(nHit >= 14, s"naive layout unexpectedly clustered: $nHit/16")
    assert(hHit <= nHit / 2, s"hilbert pruned too little: $hHit vs naive $nHit")

    val box = (d: org.apache.spark.sql.DataFrame) => d
      .where(col("user_id").between(3, 7) && col("event_id").between(100, 700))
      .select("event_id").as[Long].collect().toSet
    assert(box(spark.read.parquet(s"$dir/h")) == box(ev))
  }

  test("compact merges small files to the target count without changing content") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val ev = Tables.events(spark, Sf0001).select("event_id", "event_type", "value")
    ev.repartition(32).write.mode("overwrite").parquet(s"$dir/frag")
    val fragBytes = new java.io.File(s"$dir/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = math.max(1L, fragBytes / 4) // expect ~4 output files
    val nOut = Layout.compact(spark, s"$dir/frag", s"$dir/out", target)
    val outFiles = new java.io.File(s"$dir/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the writer may skip an empty coalesced partition, so files ≤ nOut;
    // the contract is fewer-and-bigger files with identical content
    assert(outFiles <= nOut && outFiles < 32 && outFiles >= 2,
      s"nOut=$nOut outFiles=$outFiles")
    // content identity
    assert(spark.read.parquet(s"$dir/out").orderBy("event_id")
      .collect().toSeq == ev.orderBy("event_id").collect().toSeq)
  }

  test("shuffle_hash hint forces a ShuffledHashJoin where broadcast would win") {
    val plan = SparkEntry.queries("q_join_hint")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(500))
  }

  test("vacuumVersions deletes old versions, keeps the newest, spares non-version dirs") {
    val root = java.nio.file.Files.createTempDirectory("vacuum").toString
    Seq("v0", "v1", "v3", "_chk", "current").foreach { n =>
      val dir = new java.io.File(s"$root/$n"); dir.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/$n/part-0"), "x")
    }
    val removed = Layout.vacuumVersions(root, keep = 1)
    assert(removed == 2)
    val left = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(left == Set("v3", "_chk", "current"))
  }

  test("vacuumVersions protects the replay-needed version when the checkpoint trails the pointer") {
    // crash window: commitVersion published v3 (pointer = 3) but the stream
    // checkpoint only committed batch 2 — batch 3 will replay and rebuild
    // from latestVersion(below = 3) = v2, so keep=1 must NOT delete v2
    val root = java.nio.file.Files.createTempDirectory("vacuum-guard").toString
    Seq("v0", "v1", "v2", "v3").foreach { n =>
      val dir = new java.io.File(s"$root/$n"); dir.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/$n/part-0"), "x")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/_LATEST"), "3")
    new java.io.File(s"$root/_chk/commits").mkdirs()
    Seq("0", "1", "2").foreach { b =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/_chk/commits/$b"), "{}")
    }
    val removed = Layout.vacuumVersions(root, keep = 1)
    assert(removed == 2, s"expected only v0/v1 removed, removed $removed")
    val left = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(left == Set("v2", "v3", "_LATEST", "_chk"))
  }

  test("manifest-log commit: append-only entries, no-rename recovery, idempotent replay") {
    val root = java.nio.file.Files.createTempDirectory("manifest").toString
    def stage(v: Long): java.io.File = {
      val d = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(root), s".stage-$v").toFile
      java.nio.file.Files.writeString(new java.io.File(d, "part-0").toPath, s"data$v")
      d
    }
    Layout.commitVersion(root, 0L, stage(0))
    Layout.commitVersion(root, 1L, stage(1))
    // one immutable entry per commit, zero-padded so listing order = commit order
    val entries = new java.io.File(root, "_manifest").listFiles().map(_.getName).sorted
    assert(entries.toSeq == Seq(f"${0L}%020d.commit", f"${1L}%020d.commit"))
    assert(Layout.committedVersion(root).contains(1L))
    // the object-store story: recovery must not depend on the renamed
    // pointer at all — delete it and the manifest alone names the version
    new java.io.File(root, "_LATEST").delete()
    assert(Layout.committedVersion(root).contains(1L))
    // idempotent replay of an already-committed version: no throw, same state
    Layout.commitVersion(root, 1L, stage(1))
    assert(Layout.committedVersion(root).contains(1L))
    assert(new java.io.File(root, "_manifest").listFiles().length == 2)
    // vacuum retires the stale version's manifest entry with its directory
    Layout.commitVersion(root, 2L, stage(2))
    assert(Layout.vacuumVersions(root, keep = 1) == 2)
    assert(new java.io.File(root, "_manifest").listFiles().map(_.getName).toSeq ==
      Seq(f"${2L}%020d.commit"))
    assert(Layout.committedVersion(root).contains(2L))
  }

  test("vacuumVersions never deletes an uncommitted (dangling) version") {
    // v5 exists but the pointer stops at 4: v5 is a torn commit awaiting
    // replay — vacuum leaves it for its batch to overwrite, and the keep
    // count applies to committed versions only
    val root = java.nio.file.Files.createTempDirectory("vacuum-dangle").toString
    Seq("v3", "v4", "v5").foreach { n =>
      val dir = new java.io.File(s"$root/$n"); dir.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/$n/part-0"), "x")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/_LATEST"), "4")
    val removed = Layout.vacuumVersions(root, keep = 1)
    assert(removed == 1)
    val left = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(left == Set("v4", "v5", "_LATEST"))
  }

  test("dynamic partition overwrite rewrites only the touched partition") {
    val dir = java.nio.file.Files.createTempDirectory("partow").toString + "/t"
    val ev = Tables.events(spark, Sf0001)
      .select("event_id", "user_id", "event_type", "value")
    ev.write.partitionBy("event_type").parquet(dir)
    def files(part: String) =
      new java.io.File(s"$dir/event_type=$part").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSeq.sorted
    val viewBefore  = files("view")
    val errorBefore = files("error")
    Layout.overwritePartitions(
      ev.where(col("event_type") === "click" && col("user_id") % 2 === 0),
      dir, "event_type")
    // untouched partitions: identical file names, mtimes, and sizes
    assert(files("view") == viewBefore && files("error") == errorBefore)
    // touched partition: only the even-user rows survive
    val expected = ev.where(col("event_type") =!= "click" || col("user_id") % 2 === 0)
      .orderBy("event_id").collect().toSeq
    assert(spark.read.parquet(dir)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect().toSeq == expected)
  }

  test("dropPartitions ages out matching partitions metadata-only; " +
    "survivors inode-identical, null partition never age-dropped") {
    val dir = java.nio.file.Files.createTempDirectory("retdrop").toString + "/t"
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("value"),
        to_date(col("ts")).cast("string").as("day"))
    // plant a null-day row: it lands in __HIVE_DEFAULT_PARTITION__ and
    // must survive every value-based retention pass
    ev.unionByName(spark.range(1).select(lit(-1L).as("event_id"),
        lit(0.0).as("value"), lit(null.asInstanceOf[String]).as("day")))
      .coalesce(2).write.partitionBy("day").parquet(dir)
    val days = ev.select("day").distinct().orderBy("day")
      .as[String].collect()
    val cutoff = days(6) // 7th distinct day
    def snap(): Map[String, (Long, Long)] = {
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val root = java.nio.file.Paths.get(dir)
      val it = java.nio.file.Files.walk(root).iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (java.nio.file.Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith("."))
          out(root.relativize(p).toString) =
            (java.nio.file.Files.getLastModifiedTime(p).toMillis,
              java.nio.file.Files.size(p))
      }
      out.toMap
    }
    val before = snap()
    val dropped = Layout.dropPartitions(spark, dir, "day", _ <= cutoff)
    assert(dropped == days.take(7).toSeq.sorted,
      s"exactly the 7 oldest days must drop: $dropped")
    val after = snap()
    // survivors are the SAME files — untouched mtime and size (no data
    // was read or rewritten; the drop is directory metadata only)
    after.foreach { case (f, sig) =>
      assert(before.get(f).contains(sig), s"survivor $f must be inode-identical")
    }
    assert(before.keySet -- after.keySet ==
      before.keySet.filter(f => days.take(7).exists(d => f.startsWith(s"day=$d/"))))
    // the null partition survived, and the retained rows are exactly the
    // post-cutoff rows plus the null-day row
    assert(after.keys.exists(_.startsWith("day=__HIVE_DEFAULT_PARTITION__")))
    val left = spark.read.parquet(dir)
    assert(left.where(col("day").isNull).count() == 1)
    assert(left.where(col("day").isNotNull).count() ==
      ev.where(col("day") > cutoff).count())
    // idempotent: a re-run drops nothing and touches nothing
    assert(Layout.dropPartitions(spark, dir, "day", _ <= cutoff).isEmpty)
    assert(snap() == after)
  }

  test("dropPartitions decodes Hive path escaping exactly: literal '+' " +
    "survives, %XX decodes, a stray '%' never corrupts the expire value") {
    // the inverse of the WRITER's escaping, not URL decoding: a literal
    // '+' is never escaped on write (URLDecoder would turn it into a
    // space and feed the wrong value to a destructive predicate), and a
    // foreign writer's stray '%' must pass through, not throw
    assert(Layout.unescapePathName("a+b") == "a+b")
    assert(Layout.unescapePathName("t%3Av") == "t:v")
    assert(Layout.unescapePathName("p%2Fq%25") == "p/q%")
    assert(Layout.unescapePathName("50%") == "50%")
    assert(Layout.unescapePathName("%zz9") == "%zz9")
    assert(Layout.unescapePathName("") == "")
    // end-to-end: partition values containing '+', ':' (escaped %3A on
    // write) and '%' round-trip through the drop predicate untouched
    val dir = java.nio.file.Files.createTempDirectory("retdrop-esc").toString + "/t"
    Seq(("a+b", 1L), ("t:v", 2L), ("50%", 3L), ("keep", 4L))
      .toDF("tenant", "n")
      .write.partitionBy("tenant").parquet(dir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val dropped = Layout.dropPartitions(spark, dir, "tenant", v => {
      seen += v; v == "a+b" || v == "t:v" || v == "50%"
    })
    assert(seen.sorted == Seq("50%", "a+b", "keep", "t:v"),
      s"predicate must see the WRITER's original values, got $seen")
    assert(dropped == Seq("50%", "a+b", "t:v"))
    assert(spark.read.parquet(dir).select("tenant").as[String].collect()
      .toSeq == Seq("keep"))
  }

  test("upsert applies inserts, updates, and deletes in one pass") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "t", "v")
    val changes = Seq(
      (2L, "b2", 20.0, false), // update
      (3L, "c", 3.0, true),    // delete
      (4L, "d", 4.0, false))   // insert
      .toDF("k", "t", "v", "_deleted")
    val out = Layout.upsert(base, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 1.0), (2L, "b2", 20.0), (4L, "d", 4.0)))
    // the base side of the anti join must not shuffle: broadcast build
    val plan = Layout.upsert(base, changes, "k").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("bucketed tables join without an exchange") {
    // self-clean: drop catalog entries AND stray locations from aborted runs
    Seq("bucket_a", "bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    Layout.writeBucketed(a, "bucket_a", "k", 4)
    Layout.writeBucketed(b, "bucket_b", "k", 4)
    // tables this small broadcast by default, which bypasses bucketed reads —
    // disable broadcast so the plan shows the co-located sort-merge join the
    // layout exists for
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.readTable(spark, "bucket_a")
        .join(Layout.readTable(spark, "bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
