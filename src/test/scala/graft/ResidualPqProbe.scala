package graft

import graft.operators.Similarity

/** Dev probe: what the IVF-PQ store's RAW-vector codes cost in accuracy
  * vs FAISS-style RESIDUAL codes, at equal code budget.
  *
  * The engine's `streamIngestIvfPq` encodes the raw vector (not the
  * residual x − centroid) deliberately: raw codes are independent of the
  * coarse quantizer, so `requantizeIvfStore` can grow nlist by relabeling
  * cells WITHOUT touching a code — the maintenance property every other
  * store family has. Residual codes would couple code to cell and force a
  * full re-encode (a second lossy pass) on every requantize. This probe
  * measures the other side of that trade: residual energy is smaller than
  * vector energy, so at equal m·log₂k bits residual codes reconstruct
  * more accurately and rank better — by how much, and does the engine's
  * exact-rerank pool absorb it?
  *
  * Driver-side (accuracy, not throughput): corpus of `rows` vectors,
  * coarse k-means to `nlist`, per-subspace codebooks trained on the same
  * bounded sample for both schemes, reconstruction x̂ = decode(codes)
  * (raw) vs x̂ = centroid + decode(residual codes) (residual); ranking by
  * cos(probe, x̂). Reports per scheme: ADC-only recall@10 vs float truth,
  * and pool recall (true top-10 surviving into the rerank·k = 100 pool —
  * what the serve path's exact re-rank actually needs).
  *
  * Workloads: `clustered` (centroid-planted + noise — realistic trained
  * geometry) and `gaussian` (i.i.d. — the adversarial floor, neighbors
  * scatter across cells).
  *
  * Run: `sbt "Test/runMain graft.ResidualPqProbe [rows] [probes]"`
  */
object ResidualPqProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2000)
    val nProbes = args.lift(1).map(_.toInt).getOrElse(20)
    val dim = 64; val m = 8; val codebookK = 32; val nlist = 64
    val sub = dim / m

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na <= 0 || nb <= 0) 0.0 else d / math.sqrt(na * nb)
    }
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = v(j) - cs(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    def trainBooks(sample: Array[Array[Double]]): Array[Array[Array[Double]]] =
      Array.tabulate(m) { j =>
        Similarity.kmeans(
          sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)),
          codebookK)
      }
    def encode(v: Array[Double], books: Array[Array[Array[Double]]]): Array[Int] =
      Array.tabulate(m) { j =>
        val bk = books(j)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < bk.length) {
          var d = 0.0; var t = 0
          while (t < sub) { val x = v(j * sub + t) - bk(c)(t); d += x * x; t += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    def decode(codes: Array[Int], books: Array[Array[Array[Double]]]): Array[Double] = {
      val out = new Array[Double](dim)
      var j = 0
      while (j < m) {
        System.arraycopy(books(j)(codes(j)), 0, out, j * sub, sub); j += 1
      }
      out
    }

    for (workload <- Seq("clustered", "gaussian")) {
      val rnd = new scala.util.Random(17)
      val plant = Array.fill(nlist)(Array.fill(dim)(rnd.nextGaussian()))
      val corpus: Array[Array[Double]] =
        if (workload == "clustered")
          Array.fill(rows) {
            val c = plant(rnd.nextInt(nlist))
            Array.tabulate(dim)(j => c(j) + 0.3 * rnd.nextGaussian())
          }
        else Array.fill(rows)(Array.fill(dim)(rnd.nextGaussian()))
      val centroids = Similarity.kmeans(corpus.take(2048), nlist)
      val cellOf = corpus.map(nearest(_, centroids))
      val sample = corpus.take(2048)
      val rawBooks = trainBooks(sample)
      val resBooks = trainBooks(sample.zipWithIndex.map { case (v, i) =>
        val c = centroids(cellOf(i))
        Array.tabulate(dim)(j => v(j) - c(j))
      })
      val rawHat = corpus.map(v => decode(encode(v, rawBooks), rawBooks))
      val resHat = corpus.zipWithIndex.map { case (v, i) =>
        val c = centroids(cellOf(i))
        val r = Array.tabulate(dim)(j => v(j) - c(j))
        val d = decode(encode(r, resBooks), resBooks)
        Array.tabulate(dim)(j => c(j) + d(j))
      }
      var rawR, resR, rawPool, resPool, rawPool2, resPool2 = 0
      for (p <- 0 until nProbes) {
        val q = corpus(p)
        def topIds(hat: Array[Array[Double]], k: Int): Seq[Int] =
          (0 until rows).filter(_ != p)
            .map(i => (cos(q, hat(i)), i)).sortBy(t => (-t._1, t._2))
            .take(k).map(_._2)
        val truth = topIds(corpus, 10).toSet
        rawR += (topIds(rawHat, 10).toSet intersect truth).size
        resR += (topIds(resHat, 10).toSet intersect truth).size
        rawPool += (topIds(rawHat, 100).toSet intersect truth).size
        resPool += (topIds(resHat, 100).toSet intersect truth).size
        rawPool2 += (topIds(rawHat, 200).toSet intersect truth).size
        resPool2 += (topIds(resHat, 200).toSet intersect truth).size
      }
      def f(x: Int) = x.toDouble / (10 * nProbes)
      println(f"[respq] $workload%-10s rows $rows%6d m=$m k=$codebookK nlist=$nlist  " +
        f"adcRecall raw ${f(rawR)}%5.3f res ${f(resR)}%5.3f   " +
        f"poolRecall@100 raw ${f(rawPool)}%5.3f res ${f(resPool)}%5.3f   " +
        f"pool@200 raw ${f(rawPool2)}%5.3f res ${f(resPool2)}%5.3f")
    }
  }
}
