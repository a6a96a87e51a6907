package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column math for similarity search.
  *
  * Operates on `array<float>` / `array<double>` columns with pure Catalyst
  * expressions (`zip_with` + `aggregate`), so the dot products run inside
  * WholeStageCodegen with no serialization boundary — the property that makes
  * brute-force cosine viable as the exact baseline over millions of rows.
  * All math is done in double: float accumulation drifts and would break
  * oracle parity.
  */
object VectorOps {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** ‖v‖₂ */
  def norm(v: Column): Column =
    sqrt(aggregate(transform(asDouble(v), x => x * x), lit(0.0), (s, x) => s + x))

  /** Cosine similarity; 0.0 on zero vectors. Backed by the codegen'd
    * [[CosineSimilarity]] Catalyst expression — the `aggregate`/`zip_with`
    * form (see `dot`/`norm`) is interpreted and falls out of codegen.
    */
  def cosine(a: Column, b: Column): Column = Expressions.cosineSim(a, b)

  /** Random-hyperplane LSH signature: `bits` sign bits of projections onto
    * deterministic pseudo-random ±1 (Rademacher) hyperplanes, packed into a
    * long. Cosine-similar vectors collide on most bits, so grouping by
    * (bands of) this signature buckets near-neighbors — the scale path for
    * ANN and embedding near-dup when brute force stops fitting.
    *
    * Hyperplane component (p, j) = ±1 from splitmix64(p·100003 + j) —
    * deterministic across executors with zero broadcast state. Single-pass
    * JVM loop rather than per-plane `aggregate`/`zip_with` expressions:
    * higher-order array functions are CodegenFallback (interpreted) and the
    * expression form measured ~30× slower.
    */
  // sign matrix cache: signs for (bits, dim) are pure functions of indices,
  // so compute them once per JVM instead of one splitmix64 per (plane, dim)
  // per ROW — at 10⁸ rows that's the difference between 32·dim hashes once
  // and 32·dim hashes three billion times
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(bits: Int, dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((bits, dim), { case (b, d) =>
      Array.tabulate(b, d) { (p, j) =>
        val h = graft.functions.TextFunctions.splitmix64(p.toLong * 100003L + j)
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    })

  def lshSigScala(v: Seq[Float], bits: Int): Long = {
    // copy to a primitive array FIRST: the Seq apply in the plane loop is a
    // boxed generic access, and it runs bits× per element — measured 4.6 s
    // per 5k rows at 256 bits (80M boxed reads) vs one arraycopy here
    val a = v.toArray
    val s = signs(bits, a.length)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val row = s(p)
      var proj = 0.0
      var j = 0
      while (j < a.length) { proj += row(j) * a(j); j += 1 }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def lshSignature(v: Column, bits: Int = 16): Column =
    udf((vec: Seq[Float]) => lshSigScala(vec, bits)).apply(v)

  /** Wide SRP signature: `bits` sign bits packed into ⌈bits/64⌉ longs.
    * One long (64 bits) separates neighbors from noise at z ≈ 1.3 on
    * near-orthogonal corpora (cosine ~0.25 → P[bit agrees] ≈ 0.58) —
    * enough for bucketing duplicates, not for RANKING top-k; 256 bits
    * quadruple the signal-to-noise (z ≈ 2.6), which is what the Hamming
    * shortlist tiers need. Same deterministic splitmix64 hyperplanes.
    */
  def lshSigWideScala(v: Seq[Float], bits: Int): Array[Long] = {
    val a = v.toArray // primitive copy — see lshSigScala
    val s = signs(bits, a.length)
    val words = (bits + 63) / 64
    val sig = new Array[Long](words)
    var p = 0
    while (p < bits) {
      val row = s(p)
      var proj = 0.0
      var j = 0
      while (j < a.length) { proj += row(j) * a(j); j += 1 }
      if (proj > 0) sig(p / 64) |= (1L << (p % 64))
      p += 1
    }
    sig
  }

  def lshSignatureWide(v: Column, bits: Int = 256): Column =
    udf((vec: Seq[Float]) => lshSigWideScala(vec, bits)).apply(v)

  /** Hamming distance between two wide signatures of `words` longs —
    * an explicit codegen'd sum of `bit_count(xor)` terms (the higher-order
    * `zip_with`/`aggregate` form is CodegenFallback).
    */
  def hammingWide(a: Column, b: Column, words: Int): Column =
    (0 until words)
      .map(i => bit_count(org.apache.spark.sql.functions.element_at(a, i + 1)
        .bitwiseXOR(org.apache.spark.sql.functions.element_at(b, i + 1))))
      .reduce(_ + _)
}
