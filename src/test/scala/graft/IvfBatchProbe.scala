package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorOps

/** Scratch probe (dev): smallest nprobe at which batch IVF equals the exact
  * per-probe top-10 for probes 0..3. Run:
  * `sbt "Test/runMain graft.IvfBatchProbe [dataDir...]"`.
  */
object IvfBatchProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d)
      val probes = emb.where(col("vec_id").isin(0L, 1L, 2L, 3L))
      val byProbe = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      val exact = emb
        .crossJoin(broadcast(probes.select(
          col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))))
        .where(col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", round(VectorOps.cosine(col("embedding"), col("probe_emb")), 4))
        .withColumn("rk", row_number().over(byProbe))
        .where(col("rk") <= 10)
        .select(col("probe_id"), col("vec_id"), col("cosine"))
      for (np <- Seq(8, 10, 12, 14)) {
        val ivf = Similarity.ivfProbeSetTopK(emb, probes, k = 10, nprobe = np)
        val diff = exact.exceptAll(ivf.select("probe_id", "vec_id", "cosine")).count()
        println(s"[ivfprobe] $d nprobe=$np missing=$diff")
      }
      // probe-COUNT scaling across two decades (4 -> 40 -> 400 probes, one
      // corpus pass each); per-decade exponent = log10(t_next/t_prev),
      // sublinear expected because the corpus scan amortizes across probes
      // and the candidate join is an equi-join on cell (hash join), not a
      // per-row scan of every probe's cell array
      def time(n: Int): Double = {
        val ps = emb.where(col("vec_id") < n)
        val t0 = System.nanoTime()
        Similarity.ivfProbeSetTopK(emb, ps, k = 10, nprobe = 10)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      time(4) // warmup
      val (t4, t40, t400) = (time(4), time(40), time(400))
      val e1 = math.log(t40 / t4) / math.log(10)
      val e2 = math.log(t400 / t40) / math.log(10)
      println(f"[ivfprobe] $d probes 4->40->400: $t4%.2f s -> $t40%.2f s -> $t400%.2f s, exponents $e1%.2f / $e2%.2f")
      // the candidate join must be a broadcast HASH join on cell — the old
      // array_contains form planned as BroadcastNestedLoopJoin
      val plan = Similarity.ivfProbeSetTopK(
        emb, emb.where(col("vec_id") < 400), k = 10, nprobe = 10)
        .queryExecution.executedPlan.toString
      println(s"[ivfprobe] $d hashJoin=${plan.contains("BroadcastHashJoin")} " +
        s"nestedLoop=${plan.contains("BroadcastNestedLoopJoin")}")
    }
    spark.stop()
  }
}
