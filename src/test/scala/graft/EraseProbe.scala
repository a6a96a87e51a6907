package graft

import graft.operators.Similarity
import org.apache.spark.sql.{functions => F}

/** Dev probe: right-to-erasure cost on the stored ANN index — the
  * SCALING.md evidence behind `q_sim_ivf_delete`. The claim to measure:
  * deletion moves bytes ∝ the FILES holding victims, not the store, and
  * its wall is dominated by the victim-file rewrite, not store size.
  *
  * Fixture: `base` uniform rows (dim 64), nlist 64, compacted to the
  * cell-clustered layout at a small file target so the store is
  * multi-file at probe scale. Victim sets of growing size are drawn two
  * ways: CLUSTERED (consecutive ids — at ingest these spread across
  * cells, so files hit ∝ victims until saturation) and a SINGLE id (the
  * common GDPR request shape).
  *
  * Run: `sbt "Test/runMain graft.EraseProbe [base] [victims...]"`
  */
object EraseProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(50000)
    val victimNs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 100, 1000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("erase-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val baseDf = spark.range(base.toLong).repartition(16).mapPartitions { it =>
      it.map { id =>
        val rnd = new scala.util.Random(id * 2654435761L)
        (id.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
      }
    }.toDF("vec_id", "embedding").persist()
    baseDf.count()

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fileSizes(data: String): Map[String, Long] = {
      val out = scala.collection.mutable.Map.empty[String, Long]
      val root = java.nio.file.Paths.get(data)
      val it = java.nio.file.Files.walk(root).iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (java.nio.file.Files.isRegularFile(p) &&
            !n.startsWith("_") && !n.startsWith("."))
          out(root.relativize(p).toString) = java.nio.file.Files.size(p)
      }
      out.toMap
    }

    for (nv <- victimNs) {
      val dir = java.nio.file.Files.createTempDirectory("eraseprobe").toString
      Similarity.saveIvfIndex(baseDf, s"$dir/ivf_index", nlist = 64, sampleRows = 4096)
      Similarity.streamIngestIvfBatch(baseDf, 0L, s"$dir/ivf_index", s"$dir/cells",
        nlist = 64, sampleRows = 4096)
      Similarity.compactIvfStore(spark, dir, upTo = 0L,
        targetFileBytes = 512L * 1024)
      val before = fileSizes(s"$dir/cells")
      val victims = (0L until nv.toLong).toSeq
      val t = timed {
        val n = Similarity.deleteFromIvfStore(spark, dir, victims)
        require(n == nv.toLong, s"expected $nv deletions, got $n")
      }
      val after = fileSizes(s"$dir/cells")
      val moved = (before.keySet -- after.keySet).toSeq.map(before).sum
      val total = before.values.sum
      val left = graft.operators.Dedup.readStore(spark, s"$dir/cells").count()
      println(f"[erase] base=$base%6d victims=$nv%5d | wall=$t%6.2f s | moved=" +
        f"${moved / 1048576.0}%7.2f/${total / 1048576.0}%7.2f MB " +
        f"(${100.0 * moved / total}%5.1f%%) files=${before.size - (before.keySet intersect after.keySet).size}%3d/${before.size}%3d | rows left=$left")
      Similarity.invalidateIvfIndex(s"$dir/ivf_index")
    }

    // FOLD comparison at the bulk-scattered end (SCALING.md's own
    // guidance, now an op): a saturating victim set erased as a separate
    // delete THEN compacted (two full store rewrites) vs folded into ONE
    // compactIvfStore(dropIds) rewrite. Same end state, half the moved
    // bytes.
    val nvMax = victimNs.max
    def freshStore(): String = {
      val dir = java.nio.file.Files.createTempDirectory("eraseprobe_fold").toString
      Similarity.saveIvfIndex(baseDf, s"$dir/ivf_index", nlist = 64, sampleRows = 4096)
      Similarity.streamIngestIvfBatch(baseDf, 0L, s"$dir/ivf_index", s"$dir/cells",
        nlist = 64, sampleRows = 4096)
      Similarity.compactIvfStore(spark, dir, upTo = 0L,
        targetFileBytes = 512L * 1024)
      dir
    }
    val victims = (0L until nvMax.toLong).toSeq
    val dirSep = freshStore()
    val tSep = timed {
      require(Similarity.deleteFromIvfStore(spark, dirSep, victims) == nvMax.toLong)
      Similarity.compactIvfStore(spark, dirSep, upTo = 0L,
        targetFileBytes = 512L * 1024)
    }
    val leftSep = graft.operators.Dedup.readStore(spark, s"$dirSep/cells").count()
    val dirFold = freshStore()
    val tFold = timed {
      require(Similarity.compactIvfStore(spark, dirFold, upTo = 0L,
        targetFileBytes = 512L * 1024, dropIds = victims) == nvMax.toLong)
    }
    val leftFold = graft.operators.Dedup.readStore(spark, s"$dirFold/cells").count()
    require(leftSep == leftFold && leftFold == base.toLong - nvMax,
      s"fold and separate paths must agree: $leftSep vs $leftFold")
    println(f"[erase] FOLD victims=$nvMax%5d | delete+compact=$tSep%6.2f s " +
      f"(2 rewrites) | compact(dropIds)=$tFold%6.2f s (1 rewrite)")

    // BULK-victim comparison (the compliance-batch shape): the same
    // erasure via the literal-`isin` entry point vs the victim-TABLE
    // broadcast-join form. The literal form's plan is ∝ |victims|
    // (expression build + optimize + task serialize, driver Seq
    // memory); the join form's plan is constant-size. Expect the
    // literal wall to grow superlinearly past ~10⁴ while the join stays
    // flat at the store-rewrite cost.
    val bulkNs = Seq(1000, 10000, 100000).filter(_ <= base / 2)
    for (nv <- bulkNs) {
      // every other id: scattered victims, saturating the file-targeting
      val victimsB = (0L until 2L * nv).filter(_ % 2 == 0L)
      val dirLit = freshStore()
      val tLit = timed {
        require(Similarity.deleteFromIvfStore(spark, dirLit, victimsB) == nv.toLong)
      }
      val leftLit = graft.operators.Dedup.readStore(spark, s"$dirLit/cells").count()
      val dirJoin = freshStore()
      val vDf = victimsB.toDF("vec_id")
      val tJoin = timed {
        require(Similarity.deleteFromIvfStore(spark, dirJoin, vDf) == nv.toLong)
      }
      val leftJoin = graft.operators.Dedup.readStore(spark, s"$dirJoin/cells").count()
      require(leftLit == leftJoin && leftJoin == base.toLong - nv,
        s"bulk forms must agree: $leftLit vs $leftJoin")
      println(f"[erase] BULK victims=$nv%6d | literal-isin=$tLit%7.2f s | " +
        f"victim-table join=$tJoin%7.2f s | rows left=$leftJoin")
    }
    spark.stop()
  }
}
