package graft

import graft.operators.TextIndex
import org.apache.spark.sql.functions._

/** Dev probe: the positional tier's trade, measured — the SCALING.md
  * evidence behind `q_phrase_stored`/`q_near_stored`. Claims to verify:
  * (1) enabling positions costs one extra tokenize+write per append and
  * a token-stream-sized table (bigger than the postings — the Lucene
  * positions trade); (2) the phrase serve reads only the phrase terms'
  * tm_mod slice of that table (∝ Σ tf of the phrase's terms), while a
  * scan-side phrase match re-tokenizes the whole corpus per query — so
  * the byte ratio widens with corpus size exactly like the BM25 serve's.
  *
  * Run: `sbt "Test/runMain graft.PositionsProbe [sizes...]"`
  */
object PositionsProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(20000, 60000, 180000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("positions-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dirBytes(p: String, keep: String => Boolean = _ => true): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) return 0L
      val it = java.nio.file.Files.walk(root).iterator()
      var s = 0L
      while (it.hasNext) {
        val f = it.next()
        val fn = f.getFileName.toString
        if (java.nio.file.Files.isRegularFile(f) && !fn.startsWith("_") &&
            !fn.startsWith(".") && keep(f.toString))
          s += java.nio.file.Files.size(f)
      }
      s
    }
    val phrase = Seq("alpha", "beta") // planted adjacent in 1/13 of docs

    for (n <- sizes) {
      val dir = java.nio.file.Files.createTempDirectory("posprobe").toString
      spark.range(n.toLong).repartition(16).mapPartitions { it =>
        it.map { id =>
          val rnd = new scala.util.Random(id * 2654435761L)
          val sb = Seq.newBuilder[String]
          (0 until 120).foreach(_ => sb += s"w${rnd.nextInt(2000)}")
          if (id % 13 == 0) { sb += "alpha"; sb += "beta" } // the phrase
          if (id % 7 == 0) sb += "alpha"                    // a lone alpha
          (id, sb.result().mkString(" "))
        }
      }.toDF("doc_id", "text").write.parquet(s"$dir/corpus")
      val docs = spark.read.parquet(s"$dir/corpus")
      val flatIdx = s"$dir/flat_index"
      val posIdx = s"$dir/pos_index"
      val tFlat = timed {
        TextIndex.appendTextIndexBatch(docs, flatIdx, batchId = 0L, nMods = 1024)
      }
      val tPos = timed {
        TextIndex.appendTextIndexBatch(docs, posIdx, batchId = 0L, nMods = 1024,
          withPositions = true)
      }
      // scan-side phrase twin: re-tokenize the corpus, adjacency via the
      // anchor trick over posexploded tokens — what a store-less engine
      // pays PER QUERY
      def scanPhrase() = {
        val toks = docs.select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.tokens(lower(col("text"))))
            .as(Seq("pos", "term")))
        val slots = phrase.zipWithIndex.toDF("term", "slot")
        toks.join(broadcast(slots), "term")
          .select(col("doc_id"), (col("pos") - col("slot")).as("start"), col("slot"))
          .groupBy(col("doc_id"), col("start"))
          .agg(count(lit(1)).as("nt"))
          .where(col("nt") === phrase.length)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
          .orderBy(col("doc_id"))
      }
      // warm both paths, then measure
      scanPhrase().collect()
      TextIndex.phraseSearchStored(spark, posIdx, phrase).collect()
      val tScan = timed { scanPhrase().collect() }
      val tServe = timed {
        TextIndex.phraseSearchStored(spark, posIdx, phrase).collect()
      }
      val nMods = 1024
      val mods = phrase.toDS()
        .select(pmod(hash(col("value")), lit(nMods)).cast("int").as("m"))
        .distinct().as[Int].collect().toSet
      val corpusB = dirBytes(s"$dir/corpus")
      val postingsB = dirBytes(s"$posIdx/postings")
      val positionsB = dirBytes(s"$posIdx/positions")
      val servedB = dirBytes(s"$posIdx/positions",
        p => mods.exists(m => p.contains(s"tm_mod=$m/")))
      println(f"[posprobe] n=$n%7d  append flat=$tFlat%6.2fs pos=$tPos%6.2fs " +
        f"(+${(tPos / tFlat - 1) * 100}%4.0f%%)  " +
        f"corpus=${corpusB / 1e6}%8.1fMB postings=${postingsB / 1e6}%8.1fMB " +
        f"positions=${positionsB / 1e6}%8.1fMB  " +
        f"phrase: scan=$tScan%6.2fs serve=$tServe%6.2fs  " +
        f"bytes scan=${corpusB / 1e6}%8.1fMB serve=${servedB / 1e6}%6.2fMB " +
        f"(x${corpusB.toDouble / math.max(servedB, 1)}%6.1f fewer)")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
