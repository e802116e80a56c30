package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmin-L2 centroid id for a vector column against a small in-plan centroid
  * set — the per-row kernel of k-means assignment / IVF routing (SURVEY §2
  * A4/J3a; reference: batch assignment GEMM, include/svs/index/ivf/common.h:
  * 242-303). A native codegen'd expression (not a higher-order-function fold:
  * Spark evaluates those interpreted, per-element) so assignment stays inside
  * whole-stage codegen — a pure map at any scale.
  *
  * Centroids must be pre-sorted by id; ties break to the first (lowest) id
  * via strict `<`, matching `ORDER BY dist, cid LIMIT 1` oracles. */
case class NearestCentroid(child: Expression, cids: Array[Long],
                           cvecs: Array[Array[Double]])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val buf = new Array[Double](d)
    var i = 0
    while (i < d) {
      buf(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    NearestCentroid.argmin(buf, cids, cvecs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val cvecsRef = ctx.addReferenceObj("cvecs", cvecs, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |double[] $buf = new double[$n];
         |for (int $i = 0; $i < $n; $i++) $buf[$i] = (double)$a.$get($i);
         |${ev.value} = graft.functions.NearestCentroid.argmin($buf, $cidsRef, $cvecsRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroid {
  /** Strict-< scan in centroid order; same L2 fold order as Metric.L2. */
  def argmin(v: Array[Double], cids: Array[Long],
             cvecs: Array[Array[Double]]): Long = {
    var best = -1L
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      var acc = 0.0
      var i = 0
      while (i < v.length) { val d = v(i) - cv(i); acc += d * d; i += 1 }
      if (acc < bestD) { bestD = acc; best = cids(c) }
      c += 1
    }
    best
  }
}
