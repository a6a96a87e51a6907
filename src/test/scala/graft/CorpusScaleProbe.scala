package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (dev): 100x documents-only scale check for the corpus
  * operators (they read only the documents table). Exponent vs 1x.
  */
object CorpusScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val out = s"/tmp/corpusscale$factor"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"$out/documents.parquet"
    if (!new java.io.File(path).exists()) {
      // crossJoin replication: one plan regardless of factor (a factor-way
      // union's plan tree is itself O(factor) to analyze at 1000x)
      val t = Tables.table(spark, base, "documents")
      t.crossJoin(spark.range(factor).select(col("id").as("rep")))
        .select(
          (col("doc_id") + col("rep") * 100000000L).as("doc_id"),
          concat(col("text"), lit(" copysalt"), col("rep")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(32).write.mode("overwrite").parquet(path)
    }
    def time(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("q_tfidf_topterms", "q_pack_sequences", "q_text_repetition",
        "q_decontaminate", "q_decontaminate_bloom", "q_decontaminate_bcast",
        "q_shuffle_sample", "q_token_shard", "q_token_shard_ranged",
        "q_heavy_hitters", "q_vocab_coverage", "q_length_curriculum",
        "q_boilerplate_strip", "q_fuzzy_pairs",
        "q_bm25_search", "q_bpe_pairs", "q_pmi_bigrams", "q_chunk_overlap",
        // duplicate-heavy stress for the substring tier: every window sits
        // in a ~factor-sized bucket, so the MaxBucket star cap is load-bearing
        "q_dedup_substring").foreach { q =>
      time(base, q)
      val t1 = time(base, q)
      val tn = time(out, q)
      val exp = math.log(tn / t1) / math.log(factor.toDouble)
      println(f"[cscale] $q%-20s $t1%7.2f s -> $tn%7.2f s  exp $exp%.2f")
    }
    spark.stop()
  }
}
