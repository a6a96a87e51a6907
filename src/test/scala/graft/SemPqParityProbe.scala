package graft

import graft.operators.Similarity

/** Dev probe pricing a PQ-coded SEMANTIC-DEDUP store (judge item: the
  * ANN family's measured 24.7× PQ at-rest argument applies to the same
  * byte-bottleneck column — IF the drop decision survives coding).
  *
  * Sem-dedup drops a row when cosine ≥ 0.95 against a kept neighbor, so
  * what matters is not top-k recall (rank order, which an exact re-rank
  * leg can repair) but THRESHOLD PARITY near 0.95 — and unlike the ANN
  * serve path, the sem-dedup store has no float column to re-rank with:
  * a "rerank" can only decode the codes (the same lossy information), so
  * raw ADC accuracy IS the decision accuracy. This probe measures
  * decision parity per cosine band on pairs PLANTED at exact cosines:
  *
  *  - pairs (u, v) with cos(u, v) = t by construction
  *    (v = t·u + √(1−t²)·r⊥), bands straddling the 0.95 threshold;
  *  - schemes: SQ8 (the shipped 3.5× tier — decision on int8 codes),
  *    PQ m=8/k=32 (the ANN store's 8 B/vec config), PQ m=16/k=256
  *    (16 B/vec — the accuracy-upgrade config), each scored BOTH
  *    asymmetrically (float batch row vs coded store row — the
  *    incremental probe's shape) and symmetrically (code vs code — the
  *    in-store pair scan's shape);
  *  - parity = fraction of pairs whose ≥ 0.95 decision matches the
  *    float truth, per band; plus mean |Δcos|.
  *
  * Verdict rule (documented in SCALING.md): build `q_semdedup_pq_stored`
  * only if some coded config holds ≥ 99% parity in the 0.94–0.96 bands —
  * otherwise the PQ tier stays an ANN-only layout and sem-dedup keeps
  * SQ8 as its compression floor.
  *
  * Run: `sbt "Test/runMain graft.SemPqParityProbe [pairsPerBand]"`
  */
object SemPqParityProbe {
  def main(args: Array[String]): Unit = {
    val nPairs = args.headOption.map(_.toInt).getOrElse(400)
    val dim = 64
    val rnd = new scala.util.Random(42)

    def gaussian(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def norm(a: Array[Double]): Double = math.sqrt(a.map(x => x * x).sum)
    def unit(): Array[Double] = { val g = gaussian(); val n = norm(g); g.map(_ / n) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); i += 1 }
      d / (norm(a) * norm(b))
    }
    // v at exact cosine t from u: t·u + √(1−t²)·(r orthonormalized vs u)
    def mate(u: Array[Double], t: Double): Array[Double] = {
      val r = unit()
      val dot = (0 until dim).map(i => r(i) * u(i)).sum
      val perp = (0 until dim).map(i => r(i) - dot * u(i)).toArray
      val pn = norm(perp)
      val s = math.sqrt(math.max(0.0, 1 - t * t))
      (0 until dim).map(i => t * u(i) + s * perp(i) / pn).toArray
    }

    val bands = Seq(0.90, 0.93, 0.945, 0.955, 0.96, 0.97, 0.99, 0.999)
    val pairs: Seq[(Double, Array[Double], Array[Double])] = bands.flatMap { t =>
      (0 until nPairs).map { _ => val u = unit(); (t, u, mate(u, t)) }
    }

    // codebooks/SQ8 trained on the pair population itself (the store's
    // own geometry), bounded sample like the engine's builders
    val trainSample = rnd.shuffle(pairs.flatMap(p => Seq(p._2, p._3))).take(2048).toArray

    def sq8(v: Array[Double]): Array[Double] = {
      val mx = math.max(v.map(math.abs).max, 1e-30)
      v.map(x => math.round(x * 127.0 / mx).toDouble)
    }
    case class Pq(m: Int, k: Int) {
      val sub = dim / m
      val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
        Similarity.kmeans(
          trainSample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)), k)
      }
      def encode(v: Array[Double]): Array[Int] = Array.tabulate(m) { j =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var t2 = 0
          while (t2 < sub) { val x = v(j * sub + t2) - books(j)(c)(t2); d += x * x; t2 += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      def decode(codes: Array[Int]): Array[Double] =
        (0 until m).flatMap(j => books(j)(codes(j))).toArray
    }
    val pq8 = Pq(8, 32)
    val pq16 = Pq(16, 256)

    val thr = 0.95
    case class Scheme(name: String, score: (Array[Double], Array[Double]) => Double)
    val schemes = Seq(
      Scheme("sq8  sym (64 B)", (u, v) => cos(sq8(u), sq8(v))),
      Scheme("pq8  asym (8 B)", (u, v) => cos(u, pq8.decode(pq8.encode(v)))),
      Scheme("pq8  sym  (8 B)", (u, v) => cos(pq8.decode(pq8.encode(u)), pq8.decode(pq8.encode(v)))),
      Scheme("pq16 asym (16 B)", (u, v) => cos(u, pq16.decode(pq16.encode(v)))),
      Scheme("pq16 sym  (16 B)", (u, v) => cos(pq16.decode(pq16.encode(u)), pq16.decode(pq16.encode(v)))))

    println(f"[sempq] pairs/band=$nPairs dim=$dim threshold=$thr")
    println(f"[sempq] ${"band"}%8s ${schemes.map(_.name.padTo(18, ' ')).mkString}")
    val bandStats = bands.map { t =>
      val bp = pairs.filter(_._1 == t)
      val truths = bp.map { case (_, u, v) => cos(u, v) >= thr }
      val cols = schemes.map { sch =>
        val scored = bp.map { case (_, u, v) => sch.score(u, v) }
        val parity = scored.zip(truths).count { case (s, tr) => (s >= thr) == tr }.toDouble / bp.size
        val err = scored.zip(bp).map { case (s, (_, u, v)) => math.abs(s - cos(u, v)) }.sum / bp.size
        (parity, err)
      }
      println(f"[sempq] $t%8.3f " + cols.map { case (p, e) => f"$p%5.3f |d|=$e%5.3f    " }.mkString)
      (t, cols)
    }
    // verdict: near-threshold bands decide
    val nearBands = bandStats.filter(b => b._1 >= 0.94 && b._1 <= 0.96)
    schemes.zipWithIndex.foreach { case (sch, i) =>
      val worst = nearBands.map(_._2(i)._1).min
      println(f"[sempq] verdict ${sch.name}: worst near-threshold parity $worst%5.3f " +
        (if (worst >= 0.99) "-> PASSES the build bar" else "-> below the 0.99 build bar"))
    }
  }
}
