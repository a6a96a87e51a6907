package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Scratch probe (dev): stage-level cost of the prefix-filtered AllPairs
  * join (exactJaccardPairs) that feeds dedup_recall / pagerank / triangles.
  */
object AllPairsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[approbe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val sh = docs.select(col("doc_id"), TF.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0).withColumn("n_sh", size(col("sh"))).persist()
    time("shingles materialize")(sh.write.mode("overwrite").format("noop").save())
    val ex = sh.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    time("explode")(ex.write.mode("overwrite").format("noop").save())
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.write.mode("overwrite").format("noop").save())
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val t = lit(BigDecimal.decimal(0.7))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rk", row_number().over(byRarity))
      .where(col("rk") <= col("n_sh") - ceil(col("n_sh") * t) + 1)
      .select(col("doc_id"), col("n_sh"), ceil(col("n_sh") * t).as("min_len"), col("rk"), col("s"))
      .persist()
    time("prefix build")(prefix.write.mode("overwrite").format("noop").save())
    val td = BigDecimal.decimal(0.7)
    val p0 = td.underlying.unscaledValue.longValueExact
    val den = math.round(math.pow(10, td.scale)) + p0
    val sumN = col("a.n_sh") + col("b.n_sh")
    val alpha = floor(((lit(p0) * sumN + lit(den - 1)).cast("double")) / lit(den.toDouble)).cast("long")
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh") >= col("b.min_len") && col("b.n_sh") >= col("a.min_len") &&
          lit(1) + least(col("a.n_sh") - col("a.rk"), col("b.n_sh") - col("b.rk")) >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().persist()
    time("candidate join")(cand.write.mode("overwrite").format("noop").save())
    println(s"[approbe] candidates = ${cand.count()}")
    val verify = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .where(col("jaccard") >= 0.7)
    time("verify")(verify.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
