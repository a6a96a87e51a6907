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
      // probe-COUNT scaling: wall time for 4 vs 40 probes (one corpus pass
      // each); exponent = log(t40/t4)/log(10), sublinear expected because
      // the corpus scan amortizes across probes
      def time(n: Int): Double = {
        val ps = emb.where(col("vec_id") < n)
        val t0 = System.nanoTime()
        Similarity.ivfProbeSetTopK(emb, ps, k = 10, nprobe = 10)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      time(4) // warmup
      val (t4, t40) = (time(4), time(40))
      val exp = math.log(t40 / t4) / math.log(10)
      println(f"[ivfprobe] $d probes 4->40: $t4%.2f s -> $t40%.2f s, exponent $exp%.2f")
    }
    spark.stop()
  }
}
