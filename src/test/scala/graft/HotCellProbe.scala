package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{functions => F}

/** Dev probe: cell-occupancy skew under a drifting stream and the
  * hot-cell split response — the SCALING.md evidence behind
  * `q_sim_ivf_hotsplit`. Per-probe serve cost is per-CELL, so the
  * numbers that matter are max/mean occupancy and the hot-probe scan
  * latency, before and after `splitHotCells` runs to quiescence.
  *
  * Fixture: `base` uniform rows bootstrap the quantizer (nlist 64), then
  * a concentrated drop of `drift` tight near-clones of 4 points lands —
  * the post-bootstrap drift the MEAN-based requantize trigger sleeps
  * through (mean stays modest while a handful of cells absorb the drop).
  *
  * Run: `sbt "Test/runMain graft.HotCellProbe [base] [drift...]"`
  */
object HotCellProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(50000)
    val drifts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(5000, 20000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("hot-cell-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    def synth(n: Int, seedBase: Long): org.apache.spark.sql.DataFrame =
      spark.range(n.toLong).repartition(16).mapPartitions { it =>
        it.map { id =>
          val rnd = new scala.util.Random((id + seedBase) * 2654435761L)
          (id + seedBase, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
        }
      }.toDF("vec_id", "embedding")

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val baseDf = synth(base, 0L).persist()
    baseDf.count()
    val anchors = baseDf.where(F.col("vec_id") < 4)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap

    // (drift rows, anchor count): 4-anchor drops exercise the multi-hot
    // response; the 1-anchor drop is the targeted-physical headline (one
    // hot cell of 64 — moved bytes must be a small store fraction)
    val cases = drifts.map(d => (d, 4)) :+ ((6000, 1))
    for ((drift, nAnchors) <- cases) {
      val dir = java.nio.file.Files.createTempDirectory("hotprobe").toString
      val idx = s"$dir/ivf_index"; val data = s"$dir/cells"
      Similarity.saveIvfIndex(baseDf, idx, nlist = 64, sampleRows = 4096)
      Similarity.streamIngestIvfBatch(baseDf, 0L, idx, data, nlist = 64, sampleRows = 4096)
      // concentrated drop: `drift` tight clones of `nAnchors` anchors
      val clones = spark.range(drift.toLong).repartition(16).mapPartitions { it =>
        it.map { i =>
          val a = (i % nAnchors).toInt
          val rnd = new scala.util.Random(i * 40503L + a)
          (1000000L + i,
            anchors(a.toLong).map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
        }
      }.toDF("vec_id", "embedding")
      Similarity.streamIngestIvfBatch(clones, 1L, idx, data, nlist = 64, sampleRows = 4096)
      // compact to the cell-clustered layout (small file target so the
      // store is multi-file at probe scale): hot cells then live in an
      // identifiable file subset — the layout the targeted-physical
      // rewrite is designed for
      Similarity.compactIvfStore(spark, dir, upTo = 1L,
        targetFileBytes = 512L * 1024)

      def occ() = Similarity.cellOccupancy(spark, dir)
        .agg(F.max("n_rows"), F.avg("n_rows")).as[(Long, Double)].head()
      def hotProbe() = (1 to 3).map { _ =>
        timed(Similarity.ivfTopKStored(
          Dedup.readStore(spark, data).drop("batch"), idx,
          probeId = 0L, k = 10, nprobe = 4)
          .write.mode("overwrite").format("noop").save())
      }.drop(1).min

      // physical-rewrite accounting: the split must move bytes ∝ hot
      // mass, not store size — snapshot the store's data files around the
      // quiescence loop and charge every file that vanished
      def fileSizes(): Map[String, Long] = {
        val out = scala.collection.mutable.Map.empty[String, Long]
        val root = java.nio.file.Paths.get(data)
        val walk = java.nio.file.Files.walk(root).iterator()
        while (walk.hasNext) {
          val p = walk.next()
          val n = p.getFileName.toString
          if (java.nio.file.Files.isRegularFile(p) &&
              !n.startsWith("_") && !n.startsWith("."))
            out(root.relativize(p).toString) = java.nio.file.Files.size(p)
        }
        out.toMap
      }
      val (maxB, meanB) = occ()
      val tProbeB = hotProbe()
      val filesB = fileSizes()
      val ceiling = (meanB * 3).toInt
      var rounds = 0; var splits = 0
      val tSplit = timed {
        var k = Similarity.splitHotCells(spark, dir, maxCellRows = ceiling)
        while (k > 0 && rounds < 12) { splits += k; rounds += 1
          k = Similarity.splitHotCells(spark, dir, maxCellRows = ceiling) }
      }
      val filesA = fileSizes()
      val movedBytes = (filesB.keySet -- filesA.keySet).toSeq.map(filesB).sum
      val totalBytes = filesB.values.sum
      val (maxA, meanA) = occ()
      val nlistA = Similarity.loadIvfIndex(spark, idx).length
      val tProbeA = hotProbe()
      println(f"[hotcell] base=$base%6d drift=$drift%6d x$nAnchors | before max/mean=" +
        f"$maxB%6d/${meanB}%7.1f probe=$tProbeB%6.3f s | split($splits cells, " +
        f"$rounds rounds)=$tSplit%6.2f s -> nlist=$nlistA%4d | after max/mean=" +
        f"$maxA%6d/${meanA}%7.1f probe=$tProbeA%6.3f s | moved=" +
        f"${movedBytes / 1048576.0}%7.2f/${totalBytes / 1048576.0}%7.2f MB " +
        f"(${if (totalBytes == 0) 0.0 else 100.0 * movedBytes / totalBytes}%5.1f%%)")
      Similarity.invalidateIvfIndex(idx)
    }

    // IN-STREAM response: the same uniform-then-drift arrival as a file
    // stream, with the skew trigger armed vs unarmed — measures what the
    // between-batch maintenance costs the ingest and what it buys the
    // serve path (the stream NEVER stops; the trigger fires between
    // micro-batches).
    {
      val drift = 20000
      def mkInput(): String = {
        val in = java.nio.file.Files.createTempDirectory("hotstream").toString
        val t0 = System.currentTimeMillis()
        val clones = spark.range(drift.toLong).repartition(16).mapPartitions { it =>
          it.map { i =>
            val a = (i % 4).toInt
            val rnd = new scala.util.Random(i * 40503L + a)
            (1000000L + i,
              anchors(a.toLong).map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
          }
        }.toDF("vec_id", "embedding")
        Seq(baseDf, clones).zipWithIndex.foreach { case (df, i) =>
          df.coalesce(2).write.mode("append").parquet(in)
          val it = java.nio.file.Files.list(java.nio.file.Paths.get(in)).iterator()
          while (it.hasNext) {
            val p = it.next()
            if (java.nio.file.Files.getLastModifiedTime(p).toMillis >= t0 - 60000L)
              java.nio.file.Files.setLastModifiedTime(p,
                java.nio.file.attribute.FileTime.fromMillis(t0 - 3600000L + i * 2000L))
          }
        }
        in
      }
      def streamed(maxCell: Int): (Double, Long, Double, Int, Double) = {
        val in = mkInput()
        val dir = java.nio.file.Files.createTempDirectory("hotstreamw").toString
        val t = timed(Similarity.streamIngestIvf(spark, in, dir, nlist = 64,
          sampleRows = 4096, maxCellRows = maxCell, splitRounds = 12))
        val (mx, mean) = Similarity.cellOccupancy(spark, dir)
          .agg(F.max("n_rows"), F.avg("n_rows")).as[(Long, Double)].head()
        val nl = Similarity.loadIvfIndex(spark, s"$dir/ivf_index").length
        val tp = (1 to 3).map { _ =>
          timed(Similarity.ivfTopKStored(
            Dedup.readStore(spark, s"$dir/cells").drop("batch"), s"$dir/ivf_index",
            probeId = 0L, k = 10, nprobe = 4)
            .write.mode("overwrite").format("noop").save())
        }.drop(1).min
        (t, mx, mean, nl, tp)
      }
      val meanFinal = (base + drift) / 64
      val (tOff, mxOff, meanOff, nlOff, tpOff) = streamed(Int.MaxValue)
      val (tOn, mxOn, meanOn, nlOn, tpOn) = streamed(meanFinal * 3)
      println(f"[hotcell-stream] base=$base%6d drift=$drift%6d | trigger OFF: " +
        f"stream=$tOff%6.2f s nlist=$nlOff%4d max/mean=$mxOff%6d/${meanOff}%7.1f " +
        f"probe=$tpOff%6.3f s | trigger ON (ceiling=${meanFinal * 3}): " +
        f"stream=$tOn%6.2f s nlist=$nlOn%4d max/mean=$mxOn%6d/${meanOn}%7.1f " +
        f"probe=$tpOn%6.3f s")
    }
    spark.stop()
  }
}
