package graft

import graft.functions.VectorOps
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: SQ8 ranking fidelity at a HOSTILE dim / dynamic-range point.
  *
  * The shipped claim (SCALING.md round 12) — SQ8 direction error < 1 % of
  * cosine — was measured at dim 64 on gaussian vectors, where every
  * component uses the full int8 range. The per-vector scale makes SQ8
  * invariant to LOW NORM (a small maxabs just rescales; relative precision
  * is unchanged), so the genuinely hostile axis is DYNAMIC RANGE: one
  * outlier component pins the scale at 127/|outlier| and every other
  * component quantizes to a handful of levels — and the direction
  * information that distinguishes neighbors lives exactly in those
  * crushed components.
  *
  * Workloads (seeded; corpus `rows`, `probes` probed ids):
  *  - gauss@64 / gauss@512 — i.i.d. N(0,1): the benign curve vs dim.
  *  - lownorm@512 — 1e-3·N(0,1): demonstrates scale invariance (expected
  *    to match gauss@512 exactly in recall).
  *  - outlier5@512 / outlier50@512 — component 0 = 5 (resp. 50) shared by
  *    every vector, remaining 511 components 0.01·N(0,1): all pairwise
  *    cosines ≈ 1 and neighbors are decided entirely by the tail, which
  *    the outlier's scale crushes to ~±1 level (resp. to zero) — the
  *    adversarial dynamic-range floor, as a curve.
  *
  * Reports recall@10 of SQ8 brute force vs float truth (mean/min over
  * probes) and the cosine error (MAE/max over probe 0 × corpus) through
  * the engine's own quantize()/cast-up-code path.
  *
  * Run: `sbt "Test/runMain graft.Sq8Probe [rows] [probes]"`
  */
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(5000)
    val probes = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(kind: String, dim: Int) = {
      val rnd = new scala.util.Random(13)
      (0L until rows.toLong).map { i =>
        val v: Seq[Float] = kind match {
          case "gauss"     => Seq.fill(dim)(rnd.nextGaussian().toFloat)
          case "lownorm"   => Seq.fill(dim)((1e-3 * rnd.nextGaussian()).toFloat)
          case "outlier5"  => 5f +: Seq.fill(dim - 1)((0.01 * rnd.nextGaussian()).toFloat)
          case "outlier50" => 50f +: Seq.fill(dim - 1)((0.01 * rnd.nextGaussian()).toFloat)
        }
        (i, v)
      }.toDF("vec_id", "embedding")
    }

    for ((kind, dim) <- Seq(("gauss", 64), ("gauss", 512), ("lownorm", 512),
        ("outlier5", 512), ("outlier50", 512))) {
      val emb = corpus(kind, dim).cache()
      emb.count()
      val recalls = (0L until probes.toLong).map { p =>
        val bf = Similarity.bruteForceTopK(emb, p, 10)
          .select("vec_id").as[Long].collect().toSet
        val qz = Similarity.quantizedTopK(emb, p, 10)
          .select("vec_id").as[Long].collect().toSet
        (bf intersect qz).size
      }
      val q = Similarity.quantize(emb).select(col("vec_id"),
        col("embedding"), col("qvec").cast("array<float>").as("qf"))
      val probe0 = q.where(col("vec_id") === 0L)
        .select(col("embedding").as("pe"), col("qf").as("pq"))
      val (mae, maxe) = q.where(col("vec_id") =!= 0L).crossJoin(broadcast(probe0))
        .select(abs(VectorOps.cosine(col("embedding"), col("pe")) -
          VectorOps.cosine(col("qf"), col("pq"))).as("e"))
        .agg(avg(col("e")), max(col("e"))).as[(Double, Double)].head()
      println(f"[sq8] $kind%-10s dim $dim%4d rows $rows%6d  " +
        f"recall@10 mean ${recalls.sum / 10.0 / probes}%5.3f min ${recalls.min}%2d/10  " +
        f"cosineErr mae $mae%.2e max $maxe%.2e")
      emb.unpersist()
    }
    spark.stop()
  }
}
