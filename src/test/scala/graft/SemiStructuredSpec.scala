package graft

import org.apache.spark.sql.functions._

/** Semi-structured surface (VARIANT) and subquery planning semantics. */
class SemiStructuredSpec extends SparkSpec {

  test("variant path extraction: typed hit, typed miss, malformed input") {
    val df = spark.createDataFrame(Seq(
      (1L, """{"k": 42, "s": "x"}"""),
      (2L, """{"k": "not-an-int"}"""),
      (3L, """{"other": 1}"""))).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    val out = df.select(col("id"),
      try_variant_get(col("v"), "$.k", "int").as("k"),
      try_variant_get(col("v"), "$.s", "string").as("s"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 42 && out(0).getString(2) == "x")
    assert(out(1).isNullAt(1), "type-mismatched path must yield null, not throw")
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("correlated scalar subquery de-correlates to an aggregate + join") {
    val df = SparkEntry.queries("q_scalar_subquery")(spark, Sf0001)
    val plan = df.queryExecution.optimizedPlan.toString
    // Catalyst's RewriteCorrelatedScalarSubquery must have turned the two
    // per-row subqueries into grouped aggregates joined back on p_type —
    // the optimized plan contains Joins and NO remaining scalar-subquery
    assert(plan.contains("Join"), plan.take(500))
    assert(!plan.contains("scalar-subquery"),
      s"subquery survived optimization (per-row re-execution at scale):\n${plan.take(500)}")
    // and the predicate itself must hold on the result
    val rows = df.collect()
    assert(rows.nonEmpty)
  }
}
