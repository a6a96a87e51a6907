package graft

import graft.operators.Similarity
import org.apache.spark.sql.{functions => F}

/** Dev probe: hierarchical two-level quantizer training cost vs nlist —
  * the SCALING.md evidence that training stays per-task-flat as nlist
  * grows (the driver-Lloyd baseline is O(sample·nlist·dim) per pass and
  * stops being runnable around nlist ~2k, which is the whole reason the
  * hierarchical trainer exists).
  *
  * Synthetic corpus (rows × dim 64, deterministic per-partition RNG);
  * per nlist: wall time of `buildCentroidsHierarchical` (count + group
  * train + distributed sample assign + per-group train + concat), the
  * realized distributed-sample size, and the wall time of the downstream
  * full-corpus two-level cell assignment (the op the trained index
  * feeds). Driver-Lloyd baseline timed only where feasible.
  *
  * Run: `sbt "Test/runMain graft.HierTrainProbe [rows]"`
  */
object HierTrainProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("hier-train-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val df = spark.range(rows.toLong).repartition(16)
      .mapPartitions { it =>
        it.map { id =>
          val rnd = new scala.util.Random(id * 2654435761L)
          (id, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
        }
      }.toDF("vec_id", "embedding")
      .persist()
    df.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    for (nlist <- Seq(1024, 4096, 16384)) {
      val ((cents, sampleN), tTrain) =
        timed(Similarity.buildCentroidsHierarchical(df, nlist, oversample = 8))
      require(cents.length == nlist, s"trained ${cents.length}, wanted $nlist")
      // downstream: full-corpus two-level assignment against the index
      val assigner = F.udf(Similarity.nearestCellAssigner(cents))
      val (_, tAssign) = timed(
        df.select(assigner(F.col("embedding")).as("cell"))
          .write.mode("overwrite").format("noop").save())
      println(f"[hier] rows=$rows%7d nlist=$nlist%6d sample=$sampleN%7d " +
        f"train=$tTrain%7.2f s assign=$tAssign%7.2f s")
    }
    // driver-Lloyd contrast, only where it terminates in sane time
    val (c1k, tFlat) = timed(Similarity.buildCentroids(df, 1024, sampleRows = 8192))
    println(f"[hier] driver-Lloyd baseline nlist=1024 sample=8192: $tFlat%7.2f s " +
      f"(O(sample·nlist·dim) per pass — at nlist 16384/oversample 8 this is " +
      f"~${16384.0 * 131072 / (1024.0 * 8192)}%4.0f× the work on ONE core; not run)")
    require(c1k.length == 1024)
    spark.stop()
  }
}
