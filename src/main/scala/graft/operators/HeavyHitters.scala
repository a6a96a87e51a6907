package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass heavy hitters: a Misra–Gries frequency summary as a typed
  * Aggregator, then an exact recount of the (≤ k) surviving candidates —
  * candidate-generation-then-verify, the same discipline as the fuzzy-dedup
  * and ANN paths.
  *
  * Why not a plain groupBy-count? At 100 TB the full frequency table IS the
  * problem: `groupBy(token)` shuffles one row per distinct token (billions
  * for web text). The MG summary holds at most k counters per partial
  * aggregate, so the map side ships ≤ k rows per task regardless of
  * vocabulary size, and the exact second pass touches only the ≤ k
  * candidates — a broadcast semi-join, no full-vocabulary exchange ever.
  *
  * Guarantee (Misra–Gries 1982; merge form Agarwal et al. 2013): a key with
  * true frequency > n/k survives every reduce/merge order. So with
  * `k ≥ frac`, the candidate set provably contains every key above the
  * n/frac report threshold, and the exact recount makes the declared output
  * deterministic — the sketch can only add candidates that the recount then
  * filters, never lose a qualifying one.
  */
object HeavyHitters {

  /** Misra–Gries summary over string keys with at most `k` counters.
    *
    * reduce: hit → increment; miss with room → insert at 1; miss when full
    * → decrement all (the classic "cancel k distinct items" step).
    * merge: sum counters, then subtract the (k+1)-th largest count from all
    * and drop non-positives — the error-preserving merge.
    *
    * The buffer is an immutable Map under a product encoder: it stays a JVM
    * map inside the hash aggregate and encodes only at shuffle/spill (the
    * TopKAgg discipline). Counts are summary weights (true count minus at
    * most n/k), NOT exact frequencies — callers must recount exactly.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c)            => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest count; subtracting it from everyone keeps ≤ k
        // positive counters and inflates each error by ≤ that cut — the sum
        // of cuts over the merge tree stays ≤ n/k (Agarwal et al. 2013)
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
      }
    }

    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  /** Tokens of `documents.text` with exact count > total/`frac`, found in
    * two bounded passes: (1) one scan computing the MG candidate set AND
    * the total token count in the same aggregate; (2) one scan recounting
    * only the candidates (inner join against the ≤ k broadcast candidates,
    * map-side combinable groupBy). Requires `k ≥ frac` for the no-false-
    * negative guarantee above.
    */
  def frequentTokens(docs: DataFrame, k: Int = 64, frac: Int = 32): DataFrame = {
    require(k >= frac, s"k=$k must be >= frac=$frac for the MG guarantee")
    val toks = docs.select(explode(TF.tokens(lower(col("text")))).as("token"))
    val mg = udaf(new MisraGries(k), ExpressionEncoder[String]())
    val sketch = toks.agg(mg(col("token")).as("cands"), count(lit(1)).as("n_total"))
    val candidates = sketch.select(explode(col("cands")).as("token"), col("n_total"))
    toks
      .join(broadcast(candidates), "token")
      .groupBy(col("token"), col("n_total"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") * frac > col("n_total"))
      .select(col("token"), col("n"))
      .orderBy("token")
  }
}
