package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived graphs.
  *
  * The reference has no graph surface (its engine is Cosmos DB,
  * `BigDataLogControl.cs:206-330`); this is the north-star centrality
  * pass a curation pipeline runs over the document-similarity graph —
  * e.g. to find template hubs: heavily-duplicated content accumulates
  * rank, organic documents stay near the uniform floor.
  */
object Graph {

  /** Fixed-iteration PageRank over the exact-Jaccard similarity graph
    * (undirected: each pair contributes both orientations). The default
    * threshold is 0.7 — the planted-duplicate graph: the 0.4 organic graph
    * inflates AllPairs candidates quadratically on this low-diversity
    * corpus (measured 27 s at sf0.1 vs ~3 s at 0.7) without changing the
    * curation signal, which is about duplicate hubs.
    *
    * Scale shape: edges come from the prefix-filtered AllPairs join
    * ([[Dedup.exactJaccardPairs]] — no doc×doc), each iteration is ONE
    * join of the node-sized rank table to the edge list plus a dst-keyed
    * aggregate, and iteration count is fixed (5 here, like the label-
    * propagation dedup's bounded sweeps). Ranks persist per iteration so
    * the recursive lineage doesn't re-expand (2^iters recompute
    * otherwise); at lake scale each iteration would checkpoint exactly
    * like `Dedup.transitiveClusters` does.
    *
    * Determinism convention: each neighbor contribution r/deg is rounded
    * to 12 dp then summed in DECIMAL (the engine-wide exact-sum rule), and
    * each new rank is rounded to 12 dp — so Spark's parallel aggregation
    * and a serial engine produce identical bits every iteration. No
    * dangling-mass redistribution: isolated nodes decay to the reset
    * floor, which is the property the curation signal wants.
    */
  /** Per-document triangle counts over the exact-Jaccard similarity graph —
    * the local clustering signal: a doc in many triangles sits inside a
    * dense duplicate clique (template family), not just a pairwise match.
    *
    * Algorithm: DEGREE-ORIENTED node-iterator (the standard distributed
    * triangle count, e.g. Suri & Vassilvitskii 2011): orient every
    * undirected edge from its lower-(degree, id) endpoint to the higher,
    * enumerate wedges at each node's out-neighbors, close them against the
    * canonical edge list. Orientation is what makes this scale: every
    * node's out-degree is bounded by O(√m) on any graph (a hub of degree d
    * keeps only out-edges to HIGHER-degree nodes), so wedge count is
    * Σ out-deg² = O(m^1.5) worst case instead of Σ deg² — which a
    * star-shaped duplicate family would otherwise make quadratic. Three
    * hash joins, no iteration.
    */
  def triangleCounts(docs: DataFrame, minJaccard: Double = 0.7,
      pairsOpt: Option[DataFrame] = None): DataFrame = {
    // canonical undirected pair list (doc_a < doc_b) — from the caller's
    // stored edge artifact when provided, else the AllPairs join; persisted
    // because it feeds degree, orientation, and the closing join
    val pairs = pairsOpt
      .getOrElse(Dedup.exactJaccardPairs(docs, n = 3, minJaccard = minJaccard))
      .select("doc_a", "doc_b").persist()
    val deg = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val oriented = pairs
      .join(deg.select(col("id").as("doc_a"), col("deg").as("deg_a")), "doc_a")
      .join(deg.select(col("id").as("doc_b"), col("deg").as("deg_b")), "doc_b")
      .select(
        when(struct(col("deg_a"), col("doc_a")) < struct(col("deg_b"), col("doc_b")),
          col("doc_a")).otherwise(col("doc_b")).as("src"),
        when(struct(col("deg_a"), col("doc_a")) < struct(col("deg_b"), col("doc_b")),
          col("doc_b")).otherwise(col("doc_a")).as("dst"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("a"), col("x.dst").as("b"), col("y.dst").as("c"))
    val tri = wedges.join(pairs,
      least(col("b"), col("c")) === col("doc_a") &&
        greatest(col("b"), col("c")) === col("doc_b"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  def pageRankSim(
      docs: DataFrame, minJaccard: Double = 0.7, iters: Int = 5,
      damping: Double = 0.85, reset: Double = 0.15,
      pairsOpt: Option[DataFrame] = None): DataFrame = {
    // persist the pair list FIRST: the union (both orientations), the
    // degree aggregate, and the degree join each re-evaluate their input,
    // so an unpersisted AllPairs join would run ~6× (measured 26 s -> 4 s
    // at sf0.1 from this one barrier)
    val pairs = pairsOpt
      .getOrElse(Dedup.exactJaccardPairs(docs, n = 3, minJaccard = minJaccard))
      .select("doc_a", "doc_b").persist()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").persist()
    val nodes = docs.select(col("doc_id"))
    val nTotal = nodes.agg(count(lit(1)).cast("double").as("n_total"))
    var ranks = nodes.crossJoin(broadcast(nTotal))
      .select(col("doc_id"), (lit(1.0) / col("n_total")).as("r"), col("n_total"))
      .persist()
    for (_ <- 0 until iters) {
      val contrib = ranks
        .join(withDeg, ranks("doc_id") === withDeg("src"))
        .groupBy(col("dst"))
        .agg(sum(round(col("r") / col("deg"), 12).cast("decimal(28,14)"))
          .cast("double").as("contrib"))
      // localCheckpoint, not persist: caching reuses the DATA but the
      // logical plan still nests the previous iteration twice (contrib +
      // outer join), so analysis alone grows 2^i — measured 0.75 s ->
      // 17 s by iteration 5. Truncating lineage per sweep is the same
      // discipline as Dedup.transitiveClusters' label propagation; a
      // cluster deployment would use reliable checkpoints instead.
      ranks = ranks.join(contrib, ranks("doc_id") === contrib("dst"), "left_outer")
        .select(ranks("doc_id"),
          round(lit(reset) / col("n_total") +
            lit(damping) * coalesce(col("contrib"), lit(0.0)), 12).as("r"),
          col("n_total"))
        .localCheckpoint()
    }
    ranks.select(col("doc_id"), round(col("r") * 1e6, 4).as("rank_ppm"))
      .orderBy("doc_id")
  }
}
