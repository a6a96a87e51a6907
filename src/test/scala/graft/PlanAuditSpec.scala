package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Plan-shape audits: invariants the formatted explain must show, asserted
  * so a regression fails the suite instead of surfacing only as a 100 TB
  * slowdown.
  *
  * The load-bearing one: the events TIME filter must reach the parquet
  * scan — `PushedFilters` carrying a range predicate on the `ts` scan
  * column — for BOTH physical forms `events.parquet` has shipped in
  * (native timestamp, and raw int64 epoch handled by `Tables.events`'
  * unit sniff, which keeps `ts_ns` a BARE scan-column reference precisely
  * so this pushdown survives). At 100 TB the time axis is the row-group
  * pruning axis; the last two testdata regenerations nearly broke this.
  */
class PlanAuditSpec extends SparkSpec {

  private def pushedFilters(df: DataFrame): String =
    "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(df.queryExecution.explainString(FormattedMode))
      .map(_.group(1)).mkString(";")

  /** Range (not just IsNotNull) predicates on the raw `ts` scan column must
    * be in the parquet scan's pushed filters.
    */
  private def assertTsRangePushed(df: DataFrame, what: String): Unit = {
    val pushed = pushedFilters(df)
    assert("GreaterThan(OrEqual)?\\(ts[,)]".r.findFirstIn(pushed).isDefined &&
      "LessThan(OrEqual)?\\(ts[,)]".r.findFirstIn(pushed).isDefined,
      s"$what: time range NOT pushed to the parquet scan; pushed=[$pushed]")
  }

  private val timeQueries = Seq("q_filter_timerange", "q_log_composite")

  test("time filter pushes to the parquet scan on the shipped testdata form") {
    for (q <- timeQueries)
      assertTsRangePushed(SparkEntry.queries(q)(spark, Sf0001), s"$q@shipped")
  }

  /** Re-write events in each historical physical form and re-assert: the
    * invariant must hold however the next regeneration ships `ts`.
    */
  test("time filter pushes down for BOTH physical ts forms (raw epoch long, native timestamp)") {
    val base = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("ts"), col("ts_ns"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .cache()
    val shippedRows = SparkEntry.queries("q_filter_timerange")(spark, Sf0001).count()

    def writeForm(sub: String, tsCol: org.apache.spark.sql.Column): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_planaudit_$sub")
      SparkEntry.deleteRecursivelyOnExit(dir)
      val d = dir.toFile.getAbsolutePath
      base.select(col("event_id"), tsCol.as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    // gen-1 shape: int64 epoch (nanos); Tables.events sniffs the unit and
    // keeps ts_ns a bare reference to the scan column
    val rawDir = writeForm("raw", col("ts_ns"))
    // current shape: native timestamp (micros)
    val tsDir = writeForm("native", col("ts"))

    for (d <- Seq(rawDir, tsDir); q <- timeQueries)
      assertTsRangePushed(SparkEntry.queries(q)(spark, d), s"$q@$d")
    // and the sniffed form returns the same rows as the shipped table
    assert(SparkEntry.queries("q_filter_timerange")(spark, rawDir).count() == shippedRows)
    assert(SparkEntry.queries("q_filter_timerange")(spark, tsDir).count() == shippedRows)
    base.unpersist()
  }

  /** Queries ALLOWED to plan a BroadcastNestedLoopJoin: each one broadcasts
    * a scalar/tiny relation (a probe vector, a corpus total, a threshold
    * row, an nlist-sized index) against the data — the intended "ship the
    * scalar to the data" plan — or is the declared cartesian demo
    * (`q_cross_join`). Pinned as a closed set: a NEW query landing here
    * means a join lost its equi-keys, which at 100 TB is a scan × scan.
    */
  private val bnljDeclared = Set(
    "q_bm25_search", "q_cms_freq", "q_cross_join", "q_funnel", "q_gapfill",
    "q_hard_negatives", "q_lm_score", "q_mix_temperature", "q_pmi_bigrams",
    "q_quantile_sliding", "q_sim_hamming", "q_sim_hamming_batch", "q_sim_ivf",
    "q_sim_ivf_append", "q_sim_ivf_batch_stored", "q_sim_ivf_coarse",
    "q_sim_ivf_compacted", "q_sim_ivf_persisted",
    "q_sim_ivf_quantized", "q_sim_ivfpq_batch_stored",
    "q_sim_ivfpq_requantized", "q_sim_ivfpq_stored",
    "q_sim_ivf_recall", "q_sim_ivf_requantized", "q_sim_pq", "q_sim_pq_persisted",
    "q_sim_probeset",
    // round-14 lifecycle gates: each one's brute-force TRUTH leg is a
    // crossJoin(broadcast(≤4 probe rows)) — the same declared scalar-
    // broadcast shape as the q_sim_* siblings above.
    "q_sim_ivf_hier", "q_sim_ivf_hotsplit", "q_sim_ivfpq_aged",
    "q_sim_filtered_stored",
    // round-15 gates: delete/filtered truth legs are the same ≤4-row
    // broadcast cross join (plus 1-row completeness scalars); hybrid
    // carries the declared q_bm25_search scalar broadcast in its lexical
    // leg.
    "q_sim_ivf_delete", "q_sim_ivfpq_filtered", "q_hybrid_search",
    "q_stream_ivf_hotsplit",
    // round-16 gates: same declared shapes — the coded-layout delete and
    // the in-stream growth gate carry ≤2-row broadcast truth legs (plus
    // 1-row completeness scalars).
    "q_sim_ivfpq_delete", "q_stream_ivf_growth", "q_stream_ivf_erase",
    // retention gate: same ≤2-row broadcast truth leg + 1-row
    // completeness scalar as the delete gate
    "q_sim_ivf_retention",
    // round-17 bulk-erasure gate: the same ≤2-row broadcast truth leg +
    // 1-row completeness scalar as q_sim_ivf_delete (the victim set
    // itself rides a broadcast HASH semi/anti join — never a BNLJ)
    "q_sim_ivf_bulk_delete",
    "q_hybrid_search_pruned", "q_hybrid_search_weighted",
    // round-17 ingest-to-serve gate: the vec-exactness truth leg is the
    // same ≤2-row broadcast cross join as q_sim_ivf_retention's
    "q_stream_hybrid_production",
    // the stored text-index family: every serve carries the SAME 1-row
    // global-stats scalar broadcast cross join the full-scan
    // q_bm25_search declares (N/avgdl ride in as one broadcast row)
    "q_bm25_stored", "q_bm25_delete", "q_bm25_retention", "q_bm25_compact",
    "q_stream_bm25_ingest", "q_hybrid_search_indexed",
    "q_sim_quantized", "q_sim_topk", "q_stream_ann_ingest",
    "q_stream_ann_quantized", "q_tfidf_topterms",
    "q_tpch_q11", "q_tpch_q22")

  test("point lookup and type filter push equality predicates to the scan") {
    val pl = pushedFilters(SparkEntry.queries("q_point_lookup")(spark, Sf0001))
    assert("EqualTo\\(event_id[,)]".r.findFirstIn(pl).isDefined,
      s"point lookup id predicate not pushed; pushed=[$pl]")
    val ft = pushedFilters(SparkEntry.queries("q_filter_type")(spark, Sf0001))
    assert("EqualTo\\(event_type[,)]".r.findFirstIn(ft).isDefined,
      s"type filter not pushed; pushed=[$ft]")
  }

  test("TPC-H star join uses broadcast joins for its dimensions") {
    val plan = SparkEntry.queries("q_star_join")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("no declared query plans a CartesianProduct; BNLJ only in the declared scalar-broadcast set") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljDeclared(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: undeclared BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
