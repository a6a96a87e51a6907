package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table/column statistics — the `ANALYZE TABLE` surface that feeds
  * cost-based optimization.
  *
  * Every join-strategy decision so far in the engine is size-estimate +
  * explicit hint; that holds while file sizes predict plan sizes, but at
  * 100 TB the first filter breaks the correlation (a 1% selective
  * predicate leaves a "100 TB" estimate on a 1 TB stream, and the
  * broadcast-threshold guess goes wrong in BOTH directions). Catalog
  * statistics repair it: `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`
  * records row counts and per-column min/max/ndv/null histograms, and
  * Spark's CBO (`spark.sql.cbo.enabled`) propagates them through filters
  * and joins so the planner — not a hardcoded hint — picks broadcast vs
  * shuffle. StatsSpec proves the load-bearing case: the same un-hinted
  * join flips from SortMergeJoin to BroadcastHashJoin when column stats
  * make the filtered build side provably small.
  */
object Stats {

  /** Run `ANALYZE TABLE` on a catalog table (row/size stats, plus
    * per-column stats when `cols` is non-empty). Returns the cataloged row
    * count. One stats-collection scan — at 100 TB this is the maintenance
    * job every warehouse schedules, amortized over every plan it improves.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String] = Nil): Long = {
    spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS")
    if (cols.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$table` COMPUTE STATISTICS FOR COLUMNS " +
        cols.map(c => s"`$c`").mkString(", "))
    // read the cataloged stats directly: plan-side stats.rowCount is only
    // populated when CBO/planStats is on, but ANALYZE writes the catalog
    // entry unconditionally — this must work on a default-conf session.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    spark.sessionState.catalog.getTableMetadata(ident).stats
      .flatMap(_.rowCount).map(_.toLong)
      .getOrElse(sys.error(s"ANALYZE left no row count for $table"))
  }

  /** Exact per-column profile of `cols` in ONE aggregate pass: row count,
    * null count, exact ndv, min/max (as strings for engine-portable
    * comparison). The exact-ndv form is the ORACLE-CHECKABLE profile;
    * [[columnStatsApprox]] is the 100 TB form (HLL ndv, one pass, no
    * count-distinct expand). Output: one row per column.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, exact = true)

  /** [[columnStats]] with `approx_count_distinct` ndv — the production
    * profile at data scale: a single map-side-combinable pass, no
    * per-distinct shuffle expansion.
    */
  def columnStatsApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, exact = false)

  private def profile(df: DataFrame, cols: Seq[String], exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        // n_rows - count(col) == null count; stays BIGINT in every engine
        // (a summed CASE widens to HUGEINT in DuckDB and breaks the
        // oracle's schema compare)
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // unpivot the single stats row to one row per column
    val stackArgs = cols.map { c =>
      s"'$c', `__ndv_$c`, `__nulls_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (column, ndv, n_nulls, min_value, max_value)",
      "n_rows")
      .select(col("column"), col("n_rows"), col("ndv"), col("n_nulls"),
        col("min_value"), col("max_value"))
      .orderBy("column")
  }
}
