package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev probe: at-rest bytes of the three streamed ANN store layouts over
  * the same corpus — float32 (flat), SQ8 (`quantized = true`), and IVF-PQ
  * codes (`streamIngestIvfPq`). Nominal per-row payload at dim 64:
  * 256 B float, 64 B + 8 B scale SQ8, m=8 codes ≈ 8 B PQ (32×); parquet
  * framing and the id/cell columns dilute the on-disk ratio — this probe
  * measures what actually hits the disk, which at 100 TB is what probes,
  * compactions, and requantizes move.
  *
  * Run: `sbt "Test/runMain graft.StoreBytesProbe [sfDir]"`
  */
object StoreBytesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()

    def bytes(dir: String): Long = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try it.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally it.close()
    }

    val fl = java.nio.file.Files.createTempDirectory("sbytes-float").toString
    val sq = java.nio.file.Files.createTempDirectory("sbytes-sq8").toString
    val pq = java.nio.file.Files.createTempDirectory("sbytes-pq").toString
    Similarity.streamIngestIvfBatch(emb, 0L, s"$fl/ivf_index", s"$fl/cells",
      nlist = 16, sampleRows = 2048)
    Similarity.streamIngestIvfBatch(emb, 0L, s"$sq/ivf_index", s"$sq/cells",
      nlist = 16, sampleRows = 2048, quantized = true)
    Similarity.streamIngestIvfPqBatch(emb, 0L, pq,
      nlist = 16, m = 8, codebookK = 32, sampleRows = 2048)
    val (bf, bs, bp) = (bytes(s"$fl/cells"), bytes(s"$sq/cells"), bytes(s"$pq/cells"))
    println(f"[bytes] rows $n%6d  float ${bf / 1024.0}%8.1f KB   " +
      f"sq8 ${bs / 1024.0}%8.1f KB (${bf.toDouble / bs}%4.2fx)   " +
      f"pq ${bp / 1024.0}%8.1f KB (${bf.toDouble / bp}%4.2fx)")
    println(f"[bytes] index artifacts: ivf ${bytes(s"$pq/ivf_index") / 1024.0}%6.1f KB  " +
      f"pq codebooks ${bytes(s"$pq/pq_index") / 1024.0}%6.1f KB")
    spark.stop()
  }
}
