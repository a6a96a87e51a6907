package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mg(k: Int) = new HeavyHitters.MisraGries(k)

  test("MG reduce: a majority key survives eviction pressure") {
    val agg = mg(2)
    // 8×a + 6 distinct rare keys: freq(a) = 8 > n/k = 14/2 = 7, so the MG
    // guarantee says `a` must hold a counter no matter the arrival order
    val stream = (1 to 8).map(_ => "a") ++ (1 to 6).map(i => s"r$i")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(buf.contains("a"), s"majority key evicted: $buf")
    // summary size bounded by k
    assert(buf.size <= 2)
  }

  test("MG merge: bounded size and no false negatives across split orders") {
    val agg = mg(4)
    val data = (1 to 40).map(_ => "hot") ++ (1 to 30).map(i => s"r${i % 15}")
    // freq(hot)=40 > n/k = 70/4 = 17.5 → hot must survive ANY split/merge
    for (cut <- Seq(1, 10, 35, 69)) {
      val (l, r) = data.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(m.size <= 4)
      assert(m.contains("hot"), s"hot lost at cut=$cut: $m")
    }
  }

  test("frequentTokens equals the exact groupBy result on skewed tokens") {
    // planted heavy tokens at ~25% and ~12%; 200 distinct rare tokens force
    // real eviction at k=8
    val words =
      (1 to 100).map(_ => "heavy") ++
      (1 to 50).map(_ => "warm") ++
      (1 to 200).map(i => s"rare$i")
    val docs = words.grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "s", 1L) }.toSeq
      .toDF("doc_id", "text", "source", "n_chars")
    val got = HeavyHitters.frequentTokens(docs, k = 8, frac = 8)
      .as[(String, Long)].collect().toSeq
    // exact: counts over all tokens, threshold n/8 = 350/8 = 43.75
    val exact = docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .groupBy("t").count().where(col("count") * 8 > 350)
      .orderBy("t").as[(String, Long)].collect().toSeq
    assert(got == exact)
    assert(got.map(_._1) == Seq("heavy", "warm"))
  }
}
