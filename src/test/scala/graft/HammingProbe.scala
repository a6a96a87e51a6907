package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Similarity

/** Scratch probe (dev): isolate the cost of the SRP/Hamming tiers. */
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[hprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    time("count")(emb.write.mode("overwrite").format("noop").save())
    time("sig64")(emb.select(VectorOps.lshSignature(col("embedding"), 64))
      .write.mode("overwrite").format("noop").save())
    time("sig256")(emb.select(VectorOps.lshSignatureWide(col("embedding"), 256))
      .write.mode("overwrite").format("noop").save())
    time("sig256 again")(emb.select(VectorOps.lshSignatureWide(col("embedding"), 256))
      .write.mode("overwrite").format("noop").save())
    time("hammingTopK")(Similarity.hammingTopK(emb, 0L)
      .write.mode("overwrite").format("noop").save())
    time("hammingTopK again")(Similarity.hammingTopK(emb, 0L)
      .write.mode("overwrite").format("noop").save())
    time("bruteForce")(Similarity.bruteForceTopK(emb, 0L)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
