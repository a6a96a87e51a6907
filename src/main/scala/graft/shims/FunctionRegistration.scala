package graft.shims

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftaccess.SessionStateAccess

/** Registers expression builders on a live session's function registry.
  * Goes through [[SessionStateAccess]] because `sessionState` is
  * `private[sql]` — the same package-level access pattern Spark connector
  * libraries use to extend a session they did not construct.
  */
object FunctionRegistration {
  def register(
      spark: SparkSession,
      fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)]): Unit =
    fns.foreach { case (id, info, builder) =>
      SessionStateAccess.registerFunction(spark, id, info, builder)
    }
}
