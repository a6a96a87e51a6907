package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate: declarative expectations evaluated in ONE aggregate
  * pass — the validation step a production pipeline runs between ingest
  * and publish (the Great-Expectations / dbt-test shape, engine-native).
  *
  * Scale shape: all row-level rules compile to `sum(when(!p, 1))` columns
  * of a single scan-wide aggregate — one pass, map-side partials, no
  * shuffle beyond the 1-row combine, no matter how many rules. Referential
  * integrity is the one rule that inherently joins; it broadcasts the
  * parent KEY SET when dim-sized (and degrades to a shuffled anti join
  * past that) — the child table never shuffles for the check.
  */
object DataQuality {

  /** One row-level expectation: `pred` must hold on every row. */
  final case class Rule(name: String, pred: Column)

  /** Evaluate all rules in one aggregate pass over `df`.
    * Returns (rule, violations, ok) — one row per rule, rule-name order.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val counters = rules.map(r =>
      sum(when(!coalesce(r.pred, lit(false)), 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(counters.head, counters.tail: _*)
    // wide → long: one row per rule; stack is codegen'd, no shuffle
    val stackArgs = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    wide.selectExpr(s"stack(${rules.length}, $stackArgs) as (rule, violations)")
      .select(col("rule"), col("violations"), (col("violations") === 0).as("ok"))
      .orderBy("rule")
  }

  /** Referential-integrity check: child rows whose `childKey` has no match
    * in `parent.parentKey` (orphans). Same output shape as [[audit]].
    */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   name: String): DataFrame = {
    val orphans = child
      .join(broadcast(parent.select(col(parentKey).as(childKey)).distinct()),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphans.select(lit(name).as("rule"), col("violations"),
      (col("violations") === 0).as("ok"))
  }
}
