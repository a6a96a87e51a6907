package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** DDSketch-style mergeable quantile sketch (Masson, Rim & Lee, VLDB 2019):
  * counts in log-γ buckets, giving an α RELATIVE-error guarantee on every
  * quantile value — `bucket(v) = ⌈log_γ v⌉` with `γ = (1+α)/(1-α)`, so any
  * value in a bucket is within α of the bucket's representative
  * `2γ^i/(γ+1)`. Non-positive values (the data floor is 0.0 at sf0.1) go to
  * a reserved zero bucket, exactly as the paper's "zero bin".
  *
  * Why THIS sketch for the rollup surface: bucket counts are a plain
  * integer map, so
  *   - reduce/merge are bucket-wise adds — ORDER-INDEPENDENT, hence
  *     deterministic under Spark's nondeterministic partition merge order
  *     (the same property the engine's Long-cents money convention buys);
  *   - merging per-day sketches yields BIT-IDENTICAL state to sketching the
  *     whole group directly (sum of multisets), so the rollup invariant
  *     `merge(daily sketches) == sketch(all rows)` is exact equality, not a
  *     tolerance — the strongest possible oracle for a mergeable sketch;
  *   - the serialized form is a bucket-sorted (bucket, count) Long-pair
  *     array — a canonical value, safe to hash-compare.
  *
  * The GK/KLL alternatives are compaction-based: their state depends on
  * arrival order, which breaks both properties above under distributed
  * aggregation. DDSketch trades them a bounded-universe assumption
  * (bucket count grows with the value dynamic range, ~2.3k buckets per
  * decade at α=0.01 — bounded and tiny for any real metric column).
  *
  * Scale shape: both aggregators are standard two-phase hash aggregates —
  * map-side partial sketches, one shuffle of O(groups) sketch rows. The
  * buffer lives as a plain JVM Map inside the hash aggregate
  * (TypedImperativeAggregate); the product encoder below runs only at
  * shuffle/spill boundaries (the `OrderedConcat` lesson — Kryo serialized
  * per partial merge and was 8× slower). The 100 TB rollup pattern is the
  * declared query's: sketch once at fine grain (type × day), persist,
  * merge at ANY coarser grain without re-touching the raw data.
  */
object QuantileSketch {

  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)
  private val logGamma = math.log(Gamma)

  /** Reserved key for v ≤ 0 (DDSketch zero bin). MinValue sorts first, so
    * the serialized canonical form keeps zeros at the front.
    */
  val ZeroBucket: Int = Int.MinValue

  def bucketOf(v: Double): Int =
    if (v <= 0.0) ZeroBucket else math.ceil(math.log(v) / logGamma).toInt

  /** Midpoint representative of bucket i: 2γ^i/(γ+1) — within α of every
    * value the bucket can hold.
    */
  def representative(bucket: Int): Double =
    if (bucket == ZeroBucket) 0.0
    else 2.0 * math.pow(Gamma, bucket) / (Gamma + 1)

  /** Canonical serialized form: bucket-sorted, flattened (bucket, count)
    * pairs — order-independent by construction.
    */
  private def serialize(m: Map[Int, Long]): Array[Long] = {
    val keys = m.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val out = new Array[Long](keys.length * 2)
    var i = 0
    keys.foreach { b => out(i) = b.toLong; out(i + 1) = m(b); i += 2 }
    out
  }

  private def deserializeInto(acc: Map[Int, Long], packed: Array[Long]): Map[Int, Long] = {
    var m = acc
    var i = 0
    while (i < packed.length) {
      val b = packed(i).toInt; val c = packed(i + 1)
      m = m.updated(b, m.getOrElse(b, 0L) + c)
      i += 2
    }
    m
  }

  private def mergeMaps(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
  }

  /** values → sketch (canonical Long-pair array). */
  val sketch: Aggregator[Double, Map[Int, Long], Array[Long]] =
    new Aggregator[Double, Map[Int, Long], Array[Long]] {
      def zero: Map[Int, Long] = Map.empty
      def reduce(m: Map[Int, Long], v: Double): Map[Int, Long] = {
        val b = bucketOf(v)
        m.updated(b, m.getOrElse(b, 0L) + 1L)
      }
      def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] = mergeMaps(a, b)
      def finish(m: Map[Int, Long]): Array[Long] = serialize(m)
      def bufferEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }

  /** serialized sketches → merged sketch — the rollup half of the pair;
    * merging is bucket-wise addition, so the result is bit-identical to
    * sketching the union of the inputs' rows.
    */
  val mergeSketch: Aggregator[Array[Long], Map[Int, Long], Array[Long]] =
    new Aggregator[Array[Long], Map[Int, Long], Array[Long]] {
      def zero: Map[Int, Long] = Map.empty
      def reduce(m: Map[Int, Long], packed: Array[Long]): Map[Int, Long] =
        deserializeInto(m, packed)
      def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] = mergeMaps(a, b)
      def finish(m: Map[Int, Long]): Array[Long] = serialize(m)
      def bufferEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder[Map[Int, Long]]()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }

  /** Public canonical-form helpers for callers that hold sketch state
    * outside an Aggregator (the streaming fMGWS accumulator).
    */
  def pack(m: Map[Int, Long]): Array[Long] = serialize(m)

  def mergePacked(a: Array[Long], b: Array[Long]): Array[Long] =
    serialize(deserializeInto(deserializeInto(Map.empty[Int, Long], a), b))

  /** Total count held by a serialized sketch. */
  def totalCount(packed: Array[Long]): Long = {
    var n = 0L; var i = 1
    while (i < packed.length) { n += packed(i); i += 2 }
    n
  }

  /** Quantile estimate from the serialized form: representative of the
    * bucket containing rank ⌈q·n⌉ (rank 1 = smallest).
    */
  def estimateQuantile(packed: Array[Long], q: Double): Double = {
    val n = totalCount(packed)
    if (n == 0) return Double.NaN
    val target = math.max(1L, math.ceil(q * n).toLong)
    var seen = 0L; var i = 0
    while (i < packed.length) {
      seen += packed(i + 1)
      if (seen >= target) return representative(packed(i).toInt)
      i += 2
    }
    representative(packed(packed.length - 2).toInt)
  }
}
