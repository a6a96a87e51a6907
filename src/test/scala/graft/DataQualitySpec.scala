package graft

import graft.operators.DataQuality
import graft.operators.DataQuality.Rule
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "a"),
    (2L, -5.0, "b"),          // violates positive
    (3L, 0.0, null),          // violates positive AND not_null
    (4L, 2.5, "d")
  ).toDF("id", "v", "s")

  test("audit counts violations per rule in one pass, null predicate = violation") {
    val out = DataQuality.audit(df, Seq(
      Rule("v_positive", col("v") > 0),
      Rule("s_not_null", col("s").isNotNull),
      Rule("id_unique_ish", col("id") <= 4)))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("id_unique_ish", 0L, true),
      ("s_not_null", 1L, false),
      ("v_positive", 2L, false)))
  }

  test("audit predicate evaluating to NULL counts as a violation, not a pass") {
    // v > 0 on a NULL v is NULL in SQL; a naive sum(when(!p,1)) would skip it
    val n = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v")
    val out = DataQuality.audit(n, Seq(Rule("v_positive", col("v") > 0)))
      .as[(String, Long, Boolean)].collect().head
    assert(out == (("v_positive", 1L, false)))
  }

  test("refIntegrity counts orphans via anti join") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L, 8L).toDF("fk")
    val out = DataQuality.refIntegrity(child, "fk", parent, "pk", "fk_ref")
      .as[(String, Long, Boolean)].collect().head
    assert(out == (("fk_ref", 2L, false)))
  }
}
