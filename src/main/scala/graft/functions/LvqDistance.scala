package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Squared L2 distance between a full-precision query and an LVQ level-1
  * encoded row, evaluated directly against the stored codes:
  *
  *   dist = Σ_i (q_i − (μ_i + (lo + s·c_i)))²
  *
  * `μ` is the codec's (6-decimal-rounded) dataset mean, embedded as a
  * codegen reference object so the whole loop stays inside whole-stage
  * codegen — the coarse IVF pass scans `(c1, lo1, s1)` only and never
  * decodes to a vector column. The association `μ + (lo + s·c)` matches
  * `Lvq.decode` and the DuckDB oracle exactly, so distances are
  * bit-identical to decode-then-L2.
  *
  * Reference semantics: the closed-source LVQ fast-scan distance
  * (reference README.md:36 documents the API; arithmetic follows
  * Aguerrebere et al., PVLDB 16(11), 2023).
  */
case class Lvq1Distance(query: Expression, codes: Expression,
                        lo: Expression, scale: Expression, mu: Array[Double])
    extends QuaternaryExpression {

  override def first: Expression = query
  override def second: Expression = codes
  override def third: Expression = lo
  override def fourth: Expression = scale

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "lvq1_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    (query.dataType, codes.dataType, lo.dataType, scale.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ShortType, _),
            DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<SMALLINT>, DOUBLE, " +
            s"DOUBLE), got $other")
    }

  override def nullSafeEval(q: Any, c: Any, l: Any, s: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val lov = l.asInstanceOf[Double]
    val sv = s.asInstanceOf[Double]
    var acc = 0.0
    var i = 0
    val n = qa.numElements()
    while (i < n) {
      val w = mu(i) + (lov + sv * ca.getShort(i))
      val d = qa.getDouble(i) - w
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("mu", mu, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c, l, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val d = ctx.freshName("d")
      s"""
         |int $n = $q.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $w = $muRef[$i] + ($l + $s * (double)$c.getShort($i));
         |  double $d = $q.getDouble($i) - $w;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(query = newFirst, codes = newSecond, lo = newThird,
      scale = newFourth)
}
