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

  /** Cosine similarity; null-safe on zero vectors (returns 0.0). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of projections onto
    * deterministic pseudo-random ±1 (Rademacher) hyperplanes, packed into a
    * long. Cosine-similar vectors collide on most bits, so grouping by
    * (bands of) this signature buckets near-neighbors — the scale path for
    * ANN and embedding near-dup when brute force stops fitting.
    *
    * Hyperplane component (p, j) = +1 if xxhash64(p*dim + j) has its low bit
    * set, else -1 — deterministic across executors with zero broadcast state.
    */
  def lshSignature(v: Column, bits: Int = 16): Column = {
    val vd = asDouble(v)
    val planeBits = (0 until bits).map { p =>
      // projection = Σ_j v[j] * sign(hash(p, j))
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, j) => when(xxhash64(lit(p) * lit(100003) + j) % 2 === 0, x).otherwise(-x)),
        lit(0.0), (s, x) => s + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planeBits.reduce(_.bitwiseOR(_))
  }
}
