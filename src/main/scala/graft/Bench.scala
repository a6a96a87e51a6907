package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink, NOT count(): count() lets the optimizer prune unused
    // window/sort subtrees (a windowed query would bench as a bare scan);
    // the noop write materializes every output column end-to-end
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // untimed warmup: JVM + codegen + parquet footer reads land here instead
    // of inflating whichever query happens to run first
    SparkEntry.queries.get("q_scan_project").foreach(fn =>
      try run(fn) catch { case _: Throwable => })
    // best of three runs per query: a single pass conflates per-query cost
    // with whichever query happens to absorb JIT/GC hiccups (round 1 showed
    // 4-8× outliers on reruns of the same plan), and with only two runs a
    // codegen-heavy query can spend BOTH passes partially cold (round 4
    // measured dedup_recall best-of-2 at 8.5 s vs 2.5 s best-of-3 on the
    // same code). Failure visibility: a query that throws still gets a
    // (meaningless, tiny) time — count it so breakage can't hide.
    // 1-minute loadavg bracketing the run: a record taken on a loaded
    // machine (round 6's driver bench measured unchanged code 6-34x slow;
    // round 3 had the same artifact) is identifiable from the JSON line
    // itself instead of needing a post-hoc idle re-measure
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadPre = loadavg()
    var failed = 0
    def bestOf3(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      var threw = false
      val dt = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        try run(fn) catch { case _: Throwable => threw = true }
        val t = (System.nanoTime() - t0) / 1e9
        // operators persist reused intermediates (signature tables); drop
        // them so caches don't accumulate across the whole suite
        spark.catalog.clearCache()
        t
      }.min
      (dt, threw)
    }
    val firstPass = SparkEntry.queries.map { case (name, fn) =>
      val (dt, threw) = bestOf3(fn)
      if (threw) failed += 1
      name -> dt
    }
    // contention guard: a best-of-3 taken while another process holds the
    // cores can still be 6-34x slow (observed round 3 and round 6). Any
    // query whose recorded best exceeds 3x the median across queries AND
    // clears the protocol's 0.5 s floor gets one more best-of-3 at the end
    // of the suite (contention is bursty; a later re-measure usually lands
    // off the burst) and keeps the minimum of the two measurements.
    val med = {
      val s = firstPass.values.toSeq.sorted
      if (s.isEmpty) 0.0 else s(s.length / 2)
    }
    val results = firstPass.map { case (name, dt) =>
      if (dt >= 0.5 && dt > 3 * med)
        name -> math.min(dt, bestOf3(SparkEntry.queries(name))._1)
      else name -> dt
    }
    val loadPost = loadavg()
    // rounding keeps the whole line short enough to survive a bounded
    // 2000-char tail capture of stdout (the round-1 line was ~2.6 KB and
    // got truncated before the driver could parse it): per-query values at
    // 1 decimal, the headline total at 2
    def r(v: Double, scale: Int): String = {
      val s = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
      if (s.isEmpty || s.startsWith("0E")) "0" else s // stripTrailingZeros quirk on 0.0
    }
    // keys drop the uniform "q_" prefix: with 100+ queries the full names
    // push the line past the 2000-char tail capture. Values >= 10 s print
    // as integers so no entry ever exceeds 3 chars.
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // numeric sf ("0.1" from ".../sf0.1") keeps the line a few chars shorter
    val sf = "sf([0-9.]+)$".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    // "failed" appears only when nonzero: the healthy line stays short
    val failedField = if (failed > 0) s""","failed":$failed""" else ""
    // The driver parses this line out of a BOUNDED (~2000-char) stdout tail,
    // so the rendered line must fit no matter how many queries are declared
    // (109 names no longer do). Entries are emitted largest-first and the
    // smallest fold into an "omitted" count+sum once the line would cross
    // the budget — sub-tenth-second queries carry no regression signal (the
    // protocol bar is 2x AND >= 0.5 s), and the omitted sum proves nothing
    // slow is hiding in the fold.
    val entries = results.toSeq
      .map { case (k, v) => (k.stripPrefix("q_"), v) }
      .sortBy { case (k, v) => (-v, k) }
    def line(keep: Int): String = {
      val qs = entries.take(keep)
        .map { case (k, v) => "\"" + k + "\":" + r(v, if (v >= 9.95) 0 else 1) }
        .mkString("{", ",", "}")
      val dropped = entries.drop(keep)
      // per-family subtotals over the folded tail (family = first name
      // token): a regression hiding inside the omitted aggregate is then
      // localizable from the archived line alone. Top 16 families by time,
      // remainder folded into "other", so the field's length stays bounded
      // as `keep` shrinks (the line-budget loop still governs overall).
      val om = if (dropped.isEmpty) ""
        else {
          val bySum = dropped.groupBy(_._1.takeWhile(_ != '_'))
            .map { case (f, qs) => f -> qs.map(_._2).sum }
            .toSeq.sortBy { case (f, v) => (-v, f) }
          val (top, rest) = bySum.splitAt(16)
          val famEntries = top ++
            (if (rest.isEmpty) Nil else Seq("other" -> rest.map(_._2).sum))
          val fam = famEntries.map { case (f, v) => "\"" + f + "\":" + r(v, 1) }
            .mkString("{", ",", "}")
          s""","omitted":{"n":${dropped.size},"sec":${r(dropped.map(_._2).sum, 1)},"fam":$fam}"""
        }
      s"""{"metric":"total","value":${r(total, 2)},"unit":"sec","queries":$qs$om$failedField,"load":[${r(loadPre, 1)},${r(loadPost, 1)}],"sf":$sf}"""
    }
    var keep = entries.length
    while (keep > 1 && line(keep).length > 1880) keep -= 1
    // stop Spark BEFORE printing: shutdown chatter (e.g. "Cannot find
    // active jobs" from the status tracker) otherwise lands AFTER the
    // metric line in the driver's bounded tail capture and pollutes the
    // archived record. Logs off first so stop itself is silent.
    val out = line(keep)
    spark.sparkContext.setLogLevel("OFF")
    // NonFatal only: swallowing OutOfMemoryError/InterruptedException here
    // would mask a dying JVM (and clear the interrupt flag) right before
    // the metric line prints
    try spark.stop() catch { case scala.util.control.NonFatal(_) => }
    println(out)
    Console.out.flush()
  }
}
