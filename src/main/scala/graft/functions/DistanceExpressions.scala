package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector distance kernels as native Catalyst expressions.
  *
  * Mirrors the semantics of the reference's SIMD kernels
  * (reference: include/svs/core/distance/euclidean.h:142, inner_product.h:102,
  * cosine.h:102) re-expressed as whole-stage-codegen'd JVM loops: HotSpot
  * auto-vectorizes the scalar loop, which is the idiomatic Spark analog of the
  * reference's AVX dispatch. Inputs are `ARRAY<FLOAT>` or `ARRAY<DOUBLE>`;
  * accumulation is always IEEE double in element order, making results
  * bit-identical to a left-fold in any other engine (DuckDB oracle parity).
  */
abstract class VectorDistanceExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  protected def elementType: DataType = elemOf(left)
  protected def rightElementType: DataType = elemOf(right)

  // Mixed ARRAY<FLOAT>/ARRAY<DOUBLE> args are fine: each element widens to
  // double at the point of use and the fold is always double, so a mixed
  // pair computes exactly what it would after casting the float side up
  // (the Metric.computeDF contract) with no cast projection materialized.
  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if (l == FloatType || l == DoubleType) &&
            (r == FloatType || r == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT>/ARRAY<DOUBLE> args, " +
            s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  /** Java source for the loop body given array variable names + result var. */
  protected def genLoop(a: String, b: String, result: String,
                        ctx: CodegenContext): String

  protected def evalLoop(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    evalLoop(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(a, b, ev.value, ctx))

  private def getterOf(et: DataType): String =
    if (et == FloatType) "getFloat" else "getDouble"

  protected def getter: String = getterOf(elementType)
  protected def getterR: String = getterOf(rightElementType)

  @inline protected final def elemAt(arr: ArrayData, i: Int): Double =
    if (elementType == FloatType) arr.getFloat(i).toDouble else arr.getDouble(i)

  @inline protected final def elemAtR(arr: ArrayData, i: Int): Double =
    if (rightElementType == FloatType) arr.getFloat(i).toDouble
    else arr.getDouble(i)
}

/** Squared Euclidean distance: sum_i (a_i - b_i)^2.
  * Reference semantics: include/svs/core/distance/euclidean.h:142 (DistanceL2
  * returns the squared norm; smaller = closer). */
case class L2Distance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "l2_distance"

  override protected def genLoop(a: String, b: String, result: String,
                                 ctx: CodegenContext): String = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    s"""
       |int $n = $a.numElements();
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double)$a.$getter($i) - (double)$b.$getterR($i);
       |  $acc += $d * $d;
       |}
       |$result = $acc;
     """.stripMargin
  }

  override protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val d = elemAt(a, i) - elemAtR(b, i); acc += d * d; i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Inner product similarity: sum_i a_i * b_i. NOTE this is a *similarity* —
  * larger = closer (reference: core/distance/inner_product.h:102 uses a
  * std::greater comparator); top-k consumers must order DESC. */
case class InnerProduct(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "inner_product"

  override protected def genLoop(a: String, b: String, result: String,
                                 ctx: CodegenContext): String = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    s"""
       |int $n = $a.numElements();
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double)$a.$getter($i) * (double)$b.$getterR($i);
       |}
       |$result = $acc;
     """.stripMargin
  }

  override protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += elemAt(a, i) * elemAtR(b, i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Cosine similarity: dot(a,b) / (||a||*||b||); larger = closer. Zero-norm
  * inputs yield 0.0. Reference: core/distance/cosine.h:102 (the reference
  * pre-fixes the query-side norm; here both norms are computed inline —
  * callers may precompute a norm column at ingest and use InnerProduct on
  * normalized vectors for the fast path). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "cosine_similarity"

  override protected def genLoop(a: String, b: String, result: String,
                                 ctx: CodegenContext): String = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    s"""
       |int $n = $a.numElements();
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double)$a.$getter($i);
       |  double $y = (double)$b.$getterR($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = ($na == 0.0 || $nb == 0.0)
       |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }

  override protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = elemAt(a, i); val y = elemAtR(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
