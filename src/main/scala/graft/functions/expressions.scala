package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftaccess.{SessionStateAccess => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cosine similarity of two numeric array columns as a native Catalyst
  * expression with `doGenCode` — the hot inner loop of similarity search and
  * embedding near-dup verification.
  *
  * Why a custom Expression and not `aggregate`/`zip_with` (the first
  * implementation) or a UDF: higher-order array functions are CodegenFallback
  * (interpreted, per-element allocation), and a UDF pays
  * serialization into Scala collections per row. This compiles to a tight
  * primitive loop over the columnar `ArrayData`, stays inside
  * WholeStageCodegen, and allocates nothing.
  *
  * Semantics: Σab / (‖a‖‖b‖); 0.0 when either norm is zero; compares
  * min(len(a), len(b)) elements. Array elements must be non-null
  * float/double (embedding vectors by construction).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float|double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val den = math.sqrt(nx) * math.sqrt(ny)
    if (den > 0.0) dot / den else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      double graftDot = 0.0, graftNx = 0.0, graftNy = 0.0;
      int graftN = java.lang.Math.min($a.numElements(), $b.numElements());
      for (int graftI = 0; graftI < graftN; graftI++) {
        double graftX = (double) $a.$lGet(graftI);
        double graftY = (double) $b.$rGet(graftI);
        graftDot += graftX * graftY;
        graftNx += graftX * graftX;
        graftNy += graftY * graftY;
      }
      double graftDen = java.lang.Math.sqrt(graftNx) * java.lang.Math.sqrt(graftNy);
      ${ev.value} = graftDen > 0.0 ? graftDot / graftDen : 0.0;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** `ulid()` as a native nondeterministic expression (reference id scheme,
  * `/root/reference/LogChange.cs:29-43`): 26-char time-ordered id minted at
  * eval time. Nondeterministic so Catalyst never folds, reorders across
  * filters, or re-executes it expecting stability.
  */
case class UlidExpression() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    UTF8String.fromString(Ulid.generate())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    ev.copy(
      code = code"""
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          org.apache.spark.unsafe.types.UTF8String.fromString(
            graft.functions.Ulid.generate());""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override def prettyName: String = "ulid"
}

object Expressions {
  /** Column wrapper for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[UlidExpression]]. */
  def ulidExpr(): Column = ExpressionUtils.column(UlidExpression())
}
