package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, UlidExpression}

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths:
  *   - `GraftExtensions` for `spark.sql.extensions=graft.GraftExtensions`
  *     at session build (the standard deployment hook);
  *   - `GraftExtensions.register(spark)` to add the functions to an
  *     already-running session (e.g. a host application's session the
  *     library does not construct).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(
      classOf[GraftExtensions].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "", /* group */ "",
      /* since */ "0.1.0", /* deprecated */ "", /* source */ "scala_udf")

  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))),
    (FunctionIdentifier("ulid"),
      info("ulid", "ulid() - time-ordered unique id (26-char Crockford base32)"),
      (_: Seq[Expression]) => UlidExpression()),
  )

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    graft.shims.FunctionRegistration.register(spark, injections)
}
