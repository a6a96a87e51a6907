package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation-based per-group top-k.
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(o)) <= k`)
  * shuffles EVERY row to its group's reducer and sorts it there. This
  * operator instead aggregates with a bounded buffer: each map task keeps
  * only its local top-k per group (partial aggregation), so the shuffle
  * carries at most k·|groups| rows — at 100 TB with k=3 that is the
  * difference between shuffling the lake and shuffling a contact sheet.
  *
  * Ordering: primary key descending, tiebreak id ascending (the newest-
  * first + deterministic-tiebreak shape of the reference's reads).
  */
object TopK {

  case class Item(primary: Long, id: Long)

  /** Bounded top-k list aggregator: buffer is an insertion-sorted list of
    * at most k items (desc primary, asc id).
    */
  class TopKAgg(k: Int) extends Aggregator[Item, List[Item], Seq[Item]] {
    private def better(a: Item, b: Item): Boolean =
      a.primary > b.primary || (a.primary == b.primary && a.id < b.id)

    // span/::: are iterative library ops: O(k) per insert, no recursion —
    // safe at any k (the old recursive insert risked StackOverflow).
    private def insert(sorted: List[Item], a: Item): List[Item] = {
      if (sorted.lengthCompare(k) >= 0 && better(sorted.last, a)) return sorted
      val (pre, post) = sorted.span(better(_, a))
      val merged = pre ::: (a :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }

    override def zero: List[Item] = Nil
    override def reduce(b: List[Item], a: Item): List[Item] = insert(b, a)
    override def merge(x: List[Item], y: List[Item]): List[Item] =
      y.foldLeft(x)(insert)
    override def finish(r: List[Item]): Seq[Item] = r
    // product encoder (NOT Kryo): stays a plain JVM list inside the hash
    // aggregate; encodes to UnsafeArrayData only at shuffle/spill
    override def bufferEncoder: Encoder[List[Item]] = ExpressionEncoder[List[Item]]()
    override def outputEncoder: Encoder[Seq[Item]] = ExpressionEncoder[Seq[Item]]()
  }

  /** Top-k rows per group: returns (groupCol, id, primary, rn) with rn in
    * 1..k — the same output shape as the window form, one bounded-buffer
    * aggregation instead of a full shuffle+sort.
    */
  def perGroup(
      df: DataFrame,
      groupCol: Column,
      primaryCol: Column,
      idCol: Column,
      k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[Item]())
    df.groupBy(groupCol.as("group_key"))
      .agg(topk(primaryCol, idCol).as("items"))
      .select(col("group_key"), posexplode(col("items")).as(Seq("pos", "item")))
      .select(
        col("group_key"),
        col("item.id").as("id"),
        col("item.primary").as("primary"),
        (col("pos") + 1).as("rn"))
  }
}
