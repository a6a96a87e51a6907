package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling and dataset mixing for training-data assembly.
  *
  * Training corpora are built by sampling sources at different rates
  * (stratified) and mixing them to a target recipe. Both run as one
  * deterministic scan each — the seed makes runs reproducible, and nothing
  * here shuffles: sampling is a filter, mixing is a union of filters.
  */
object Sampling {

  /** Deterministic per-row uniform in [0,1): splitmix64 of (key column
    * hash, seed). Content-keyed — the decision follows the ROW, not the
    * partition layout, so repartitioned/re-read data samples identically.
    * (Spark's `sample`/`sampleBy` are seeded per-partition and change
    * results when the layout changes — unacceptable for reproducible
    * corpus builds.)
    */
  private def uniform(keyCol: String, seed: Long) =
    // unsigned shift, NOT abs(): abs(Long.MinValue) overflows back to a
    // negative, which would force-keep that row at any rate
    (shiftrightunsigned(xxhash64(col(keyCol), lit(seed)), 1).cast("double") /
      Long.MaxValue.toDouble)

  /** Keep each stratum at its own rate: `fractions(stratum) = rate`.
    * Strata absent from the map are dropped.
    */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(uniform(keyCol, seed) < rate)
  }

  /** Mix labeled sources into one corpus at per-source rates — the
    * "recipe" operation of corpus assembly. Each (source, rate) pair is an
    * independent filtered scan; the union is by name so source schemas may
    * order columns differently.
    */
  def mix(sources: Seq[(DataFrame, Double)], keyCol: String, seed: Long = 42L): DataFrame =
    sources.zipWithIndex.map { case ((df, rate), i) =>
      df.where(uniform(keyCol, seed + i) < rate)
    }.reduce(_ unionByName _)
}
