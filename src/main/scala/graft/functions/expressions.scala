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

/** Karp-Rabin rolling-hash window selection — the content-defined sampling
  * core of the substring-dedup family (winnowing-family selection,
  * Schleimer et al. 2003; dedup target per Lee et al. 2021).
  *
  * A window of `width` codepoints starting at 1-based position p is
  * SELECTED iff `kr(window) % 16 == 0`, where
  * `kr = foldLeft(0)((h, cp) => (h * 257 + cp) mod (2^31-1))` over the
  * window's codepoints — an expected 1/16 sample that depends only on the
  * window's content, so a span shared at different offsets in two
  * documents selects identical windows on both sides.
  *
  * Why this replaced the original md5-nibble selection: md5 hashes `width`
  * bytes PER POSITION — O(n·width) digest work per document — while the
  * rolling form updates in O(1) per position (one multiply-add to enter a
  * codepoint, one to retire it), one O(n) pass per document. Same 1/16
  * selection rate, same content-defined property, and the fold is exactly
  * re-derivable in the DuckDB oracle (`list_reduce`), keeping the
  * correctness gate engine-independent.
  */
object KrHash {
  val Base = 257L
  val Mod = 2147483647L // 2^31 - 1, prime: products stay < 2^52 in a Long
  val SelectMod = 16L

  /** Direct (non-rolling) hash of one window — the spec form tests roll
    * the production path against.
    */
  def windowHash(window: String): Long = {
    var h = 0L
    var i = 0
    while (i < window.length) {
      val cp = window.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** 1-based CODEPOINT positions (matching `substr` semantics) of the
    * selected windows, computed with one rolling pass. Called from
    * generated code — keep the signature static-forwarder friendly.
    */
  def selectPositions(text: UTF8String, width: Int): ArrayData = {
    val s = text.toString
    val nChars = s.length
    // codepoint array: positions are codepoint-based so Spark's substr and
    // DuckDB's substring agree on what the window contains
    var n = 0
    var i = 0
    while (i < nChars) { i += Character.charCount(s.codePointAt(i)); n += 1 }
    if (n < width)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Int])
    val cps = new Array[Long](n)
    var ci = 0; i = 0
    while (i < nChars) {
      val cp = s.codePointAt(i); cps(ci) = cp; ci += 1; i += Character.charCount(cp)
    }
    var pw = 1L // Base^(width-1) mod Mod: the retire multiplier
    var k = 0
    while (k < width - 1) { pw = pw * Base % Mod; k += 1 }
    var h = 0L
    k = 0
    while (k < width) { h = (h * Base + cps(k)) % Mod; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    var j = 0
    var done = false
    while (!done) {
      if (h % SelectMod == 0L) out += (j + 1)
      if (j + width >= n) done = true
      else {
        h = ((h + Mod - cps(j) * pw % Mod) % Mod * Base + cps(j + width)) % Mod
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `kr_window_positions(text, width)` as a native unary expression: the
  * array of selected 1-based window positions, emitted by a tight JVM
  * rolling loop (one multiply-add per position) instead of exploding every
  * position through substr+md5 expressions and discarding 15/16 of them.
  */
case class KrWindowPositions(child: Expression, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(width >= 2, "window width must be >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    KrHash.selectPositions(t.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KrHash.selectPositions($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): KrWindowPositions =
    copy(child = newChild)

  override def prettyName: String = "kr_window_positions"
}

object Expressions {
  /** Column wrapper for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[UlidExpression]]. */
  def ulidExpr(): Column = ExpressionUtils.column(UlidExpression())

  /** Column wrapper for [[KrWindowPositions]]. */
  def krWindowPositions(text: Column, width: Int): Column =
    ExpressionUtils.column(KrWindowPositions(ExpressionUtils.expression(text), width))
}
