package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure operator scaling. Builds a 10× copy of sf0.1 (ids
  * offset so content is distinct where it matters), times the heavy
  * operators at both sizes, and prints the scaling exponent
  * log(t10/t1)/log(10) — ~1.0 = linear, ~2.0 = quadratic (a scale bug).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val probeOverride = args.drop(2)
    val saltWords = sys.env.get("SPARK_GRAFT_SALT_WORDS").contains("1")
    val out = s"/tmp/scale$factor" + (if (saltWords) "w" else "")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, idCol: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val path = s"$out/$name.parquet"
      if (!new java.io.File(path).exists()) {
        // events goes through the typed loader (ns->µs); the copy is written
        // with a plain timestamp column, which Tables.events passes through
        val t = if (name == "events") Tables.events(spark, base)
                else Tables.table(spark, base, name)
        val big = (0 until factor).map(i => f(t, i)).reduce(_ unionByName _)
        big.write.mode("overwrite").parquet(path)
      }
    }
    // events: shift ids; documents: shift ids AND salt the text so dedup
    // doesn't see 10 exact copies of everything; embeddings: shift ids.
    // Suffix salting keeps replicas NEAR-duplicates of each other — right
    // for probing how dedup behaves on a duplicate-heavy corpus, but then
    // true pair output grows ~factor² (and triangles ~factor³), so
    // output-proportional operators measure the OUTPUT growth, not the
    // data scaling. SPARK_GRAFT_SALT_WORDS=1 word-salts instead (every
    // word tagged with the replica id → replicas share no shingles):
    // replicas become mutually-disjoint corpora, isolating the
    // data-volume exponent for pair/triangle operators.
    replicate("events", "event_id", (t, i) =>
      t.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
    replicate("documents", "doc_id", (t, i) =>
      t.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
        .withColumn("text",
          if (saltWords) regexp_replace(col("text"), "(\\S+)", s"$$1$i")
          else concat(col("text"), lit(s" copysalt$i"))))
    replicate("embeddings", "vec_id", (t, i) =>
      t.withColumn("vec_id", col("vec_id") + lit(i * 100000000L)))

    // copy small star tables through so query code can read them if needed
    Seq("lineitem", "orders", "customer", "nation", "region", "part", "supplier")
      .foreach { n =>
        val path = s"$out/$n.parquet"
        if (!new java.io.File(path).exists())
          Tables.table(spark, base, n).write.mode("overwrite").parquet(path)
      }

    val probes = if (probeOverride.nonEmpty) probeOverride.toSeq else Seq(
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_exact", "q_neardup_embedding",
      "q_sim_topk", "q_agg_type_day", "q_window_topk_user", "q_sessionize",
      "q_text_stats", "q_stateful_totals", "q_reassemble", "q_salted_agg")

    def time(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"query"}%-22s ${"t(1x)"}%8s t(${factor}x)  exp")
    probes.foreach { q =>
      time(base, q) // warm plans/codegen
      val t1 = time(base, q)
      time(out, q)  // warm the replica side too: one-time per-dir costs
                    // (artifact-store build, footer reads) must not load
                    // the exponent measurement
      val tn = time(out, q)
      val exp = math.log(tn / t1) / math.log(factor.toDouble)
      println(f"[scale] $q%-22s $t1%8.2f $tn%8.2f  $exp%.2f")
    }
    spark.stop()
  }
}
