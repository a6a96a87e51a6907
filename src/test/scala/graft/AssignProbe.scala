package graft

import graft.operators.Similarity

/** Dev probe: per-row nearest-centroid assignment cost at lake-scale
  * nlist — the term the two-level coarse assigner removes.
  *
  * At nlist = 10⁴–10⁵ (the FAISS √N-family sizing for a 10⁸–10¹⁰-vector
  * corpus) the linear centroid scan is O(nlist·dim) per row and becomes
  * the assignment pass's whole budget. `Similarity.nearestCellAssigner`
  * shortlists by a √nlist group quantizer instead; this probe times both
  * paths on the same synthetic workload, driver-side (the assigner IS
  * the per-row closure the executors run — single-thread timing is the
  * honest per-core number; the map pass parallelizes embarrassingly).
  *
  * `probeGroups == nGroups` (exhaustive) does the linear scan's work
  * through the two-level code path, so the contrast is shortlist-vs-full
  * on identical code, not two implementations.
  *
  * Two workloads: `clustered` (default) plants the centroids as cluster
  * centers and draws rows as center + noise — the geometry a TRAINED
  * quantizer has by construction (k-means centroids sit on the data's
  * cluster structure; that structure is exactly what the group level
  * exploits). `gaussian` draws centroids and rows i.i.d. — the
  * adversarial bound where high-dim distance concentration makes every
  * shortlist weak (no trained quantizer looks like this; kept as the
  * floor).
  *
  * Run: `sbt "Test/runMain graft.AssignProbe [nlist] [dim] [rows] [workload]"`
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val nlist = args.headOption.map(_.toInt).getOrElse(16384)
    val dim = args.lift(1).map(_.toInt).getOrElse(32)
    val rows = args.lift(2).map(_.toInt).getOrElse(20000)
    val workload = args.lift(3).getOrElse("clustered")
    val rnd = new scala.util.Random(12)
    val centroids = Array.fill(nlist)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs: Array[Seq[Float]] =
      if (workload == "clustered")
        Array.fill(rows) {
          val c = centroids(rnd.nextInt(nlist))
          Seq.tabulate(dim)(j => (c(j) + 0.3 * rnd.nextGaussian()).toFloat)
        }
      else
        Array.fill(rows)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
    println(s"[assign] workload=$workload")

    def timed(label: String, f: Seq[Float] => Int): Unit = {
      f(vecs(0)) // build/cache the group quantizer outside the timing
      val t0 = System.nanoTime()
      var i = 0; var sink = 0
      while (i < vecs.length) { sink += f(vecs(i)); i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[assign] $label%-28s nlist $nlist%6d dim $dim%3d rows $rows%7d  " +
        f"$s%7.2f s  ${rows / s}%9.0f rows/s  (sink $sink)")
    }

    // exhaustive probes == the linear scan's work (same result, ties incl.)
    timed("exhaustive (= linear scan)",
      Similarity.nearestCellAssigner(centroids, forceCoarse = true,
        probeGroups = Int.MaxValue))
    timed("coarse shortlist (default)",
      Similarity.nearestCellAssigner(centroids, forceCoarse = true))

    // agreement of the shortlist with the exact assignment on this workload
    val exact = Similarity.nearestCellAssigner(centroids, forceCoarse = true,
      probeGroups = Int.MaxValue)
    val coarse = Similarity.nearestCellAssigner(centroids, forceCoarse = true)
    val agree = vecs.count(v => exact(v) == coarse(v))
    println(f"[assign] shortlist agreement ${agree.toDouble / rows}%6.4f ($agree/$rows)")
  }
}
