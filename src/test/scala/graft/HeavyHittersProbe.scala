package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: heavy hitters on the axis that actually hurts at 100 TB —
  * VOCABULARY size. A plain groupBy(token) shuffles one row per distinct
  * token; the Misra–Gries pass shuffles ≤ k counters per map task no
  * matter the vocabulary. Synthetic corpus: `vocab` distinct rare tokens
  * (zipf-free worst case for a sketch) plus two planted heavy tokens above
  * the 1/32 threshold. Run:
  * `sbt "Test/runMain graft.HeavyHittersProbe [vocab] [rowsPerToken]"`.
  */
object HeavyHittersProbe {
  def main(args: Array[String]): Unit = {
    val vocab = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ~3·vocab rare tokens (3 per distinct word) + 2 heavy tokens at ~1/8
    // and ~1/16 of the total stream; 8 words per row keeps rows modest
    val rare = spark.range(3L * vocab)
      .select(concat(lit("w"), pmod(col("id"), lit(vocab))).as("token"))
    val nRare = 3L * vocab
    val heavy = spark.range(nRare / 2)
      .select(when(col("id") % 3 === 0, "hot2").otherwise("hot1").as("token"))
    val docs = rare.union(heavy)
      .groupBy(floor(monotonically_increasing_id() / 8).as("g"))
      .agg(concat_ws(" ", collect_list(col("token"))).as("text"))
      .select(col("g").as("doc_id"), col("text"))
      .persist()
    val total = docs.count() // materialize once, outside both timings

    // shuffle-write accounting: the probe's actual claim is that the MG
    // pass ships counters, not the vocabulary — measure it, don't assert it
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def time(label: String)(f: => Unit): Double = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drains asynchronously
      println(f"[hhprobe] vocab=$vocab $label%-12s $dt%7.2f s  shuffle ${shuffleBytes.get / 1024.0 / 1024.0}%8.2f MB")
      dt
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    time("warmup") { run(graft.operators.HeavyHitters.frequentTokens(docs, 64, 32)) }
    val tMg = time("misra-gries") {
      run(graft.operators.HeavyHitters.frequentTokens(docs, 64, 32))
    }
    // the groupBy-everything equivalent: full frequency table, then filter
    val tokens = docs.select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("token"))
    val tGb = time("groupBy-all") {
      run(tokens.groupBy("token").count()
        .crossJoin(broadcast(tokens.agg(count(lit(1)).as("n_total"))))
        .where(col("count") * 32 > col("n_total"))
        .select(col("token"), col("count")))
    }
    println(f"[hhprobe] vocab=$vocab docs=$total  mg/groupBy = ${tMg / tGb}%.2f")
    spark.stop()
  }
}
