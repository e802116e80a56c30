package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.core.{Metric, SimdSupport}

/** Static call target for the SIMD distance expressions' generated code.
  *
  * Generated Java references ONLY this class — never `jdk.incubator.vector`
  * directly — so compiled query plans link fine on a JVM without
  * `--add-modules jdk.incubator.vector`; the availability probe
  * (`SimdSupport.available`, evaluated once per JVM) routes every call to the
  * scalar fold in that case, mirroring the reference's CPUID-probe-once
  * kernel dispatch (include/svs/lib/arch.h:36-118). Scala top-level objects
  * compile with static forwarders, so `SimdCall.l2DD(...)` is a plain static
  * call inside whole-stage codegen.
  */
object SimdCall {
  private val useSimd: Boolean = SimdSupport.available

  def l2DD(a: Array[Double], b: Array[Double]): Double =
    if (useSimd) graft.simd.SimdKernels.l2(a, b) else Metric.L2.compute(a, b)
  def l2DF(a: Array[Double], b: Array[Float]): Double =
    if (useSimd) graft.simd.SimdKernels.l2DF(a, b)
    else Metric.L2.computeDF(a, b)
  def l2FF(a: Array[Float], b: Array[Float]): Double =
    if (useSimd) graft.simd.SimdKernels.l2FF(a, b)
    else Metric.L2.computeFF(a, b)

  def ipDD(a: Array[Double], b: Array[Double]): Double =
    if (useSimd) graft.simd.SimdKernels.ip(a, b) else Metric.IP.compute(a, b)
  def ipDF(a: Array[Double], b: Array[Float]): Double =
    if (useSimd) graft.simd.SimdKernels.ipDF(a, b)
    else Metric.IP.computeDF(a, b)
  def ipFF(a: Array[Float], b: Array[Float]): Double =
    if (useSimd) graft.simd.SimdKernels.ipFF(a, b)
    else Metric.IP.computeFF(a, b)

  def cosineDD(a: Array[Double], b: Array[Double]): Double =
    if (useSimd) graft.simd.SimdKernels.cosine(a, b)
    else Metric.Cosine.compute(a, b)
  def cosineDF(a: Array[Double], b: Array[Float]): Double =
    if (useSimd) graft.simd.SimdKernels.cosineDF(a, b)
    else Metric.Cosine.computeDF(a, b)
  def cosineFF(a: Array[Float], b: Array[Float]): Double =
    if (useSimd) graft.simd.SimdKernels.cosineFF(a, b)
    else Metric.Cosine.computeFF(a, b)
}

/** SIMD twins of the scalar distance expressions: `l2_distance_simd` etc.
  *
  * The scalar expressions (L2Distance & co.) emit an element-order double
  * fold that HotSpot may auto-vectorize; these emit a static call into the
  * JDK Vector API kernels (graft.simd.SimdKernels) — explicit 8-lane fma
  * groups, ~2-3.5x the scalar rate at 64-768 dims (SCALE.md KernelBench).
  * Lane-wise accumulation reorders the fold, so values may differ from the
  * scalar expression in the last ulp: these are OPT-IN production variants
  * (the q67/q74 contract — certified on id-ranking agreement, while the
  * hash-certified query paths keep the scalar fold). The arrays are
  * materialized from ArrayData before the call (`toDoubleArray` is a single
  * `Platform.copyMemory` for unsafe rows); the copy is O(d) like the kernel
  * itself and is what the Vector API needs to load lanes.
  *
  * Reference analog: the AVX-512 kernels behind the same distance names
  * (include/svs/core/distance/euclidean.h:216-328).
  */
abstract class SimdVectorDistanceExpression extends VectorDistanceExpression {

  /** Kernel family name inside SimdCall: "l2" | "ip" | "cosine". */
  protected def kernel: String

  private def callJava(a: String, b: String): String = {
    val C = "graft.functions.SimdCall"
    (elementType, rightElementType) match {
      case (DoubleType, DoubleType) =>
        s"$C.${kernel}DD($a.toDoubleArray(), $b.toDoubleArray())"
      case (FloatType, FloatType) =>
        s"$C.${kernel}FF($a.toFloatArray(), $b.toFloatArray())"
      // the kernels are symmetric (l2/ip/cosine all commute), so the mixed
      // case normalizes to (double side, float side)
      case (DoubleType, FloatType) =>
        s"$C.${kernel}DF($a.toDoubleArray(), $b.toFloatArray())"
      case _ =>
        s"$C.${kernel}DF($b.toDoubleArray(), $a.toFloatArray())"
    }
  }

  override protected def genLoop(a: String, b: String, result: String,
                                 ctx: CodegenContext): String =
    s"$result = ${callJava(a, b)};"

  override protected def evalLoop(a: ArrayData, b: ArrayData): Double =
    (elementType, rightElementType) match {
      case (DoubleType, DoubleType) => callDD(a.toDoubleArray(), b.toDoubleArray())
      case (FloatType, FloatType)   => callFF(a.toFloatArray(), b.toFloatArray())
      case (DoubleType, FloatType)  => callDF(a.toDoubleArray(), b.toFloatArray())
      case _                        => callDF(b.toDoubleArray(), a.toFloatArray())
    }

  protected def callDD(a: Array[Double], b: Array[Double]): Double
  protected def callDF(a: Array[Double], b: Array[Float]): Double
  protected def callFF(a: Array[Float], b: Array[Float]): Double
}

case class L2DistanceSimd(left: Expression, right: Expression)
    extends SimdVectorDistanceExpression {
  override def prettyName: String = "l2_distance_simd"
  override protected def kernel: String = "l2"
  override protected def callDD(a: Array[Double], b: Array[Double]): Double =
    SimdCall.l2DD(a, b)
  override protected def callDF(a: Array[Double], b: Array[Float]): Double =
    SimdCall.l2DF(a, b)
  override protected def callFF(a: Array[Float], b: Array[Float]): Double =
    SimdCall.l2FF(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

case class InnerProductSimd(left: Expression, right: Expression)
    extends SimdVectorDistanceExpression {
  override def prettyName: String = "inner_product_simd"
  override protected def kernel: String = "ip"
  override protected def callDD(a: Array[Double], b: Array[Double]): Double =
    SimdCall.ipDD(a, b)
  override protected def callDF(a: Array[Double], b: Array[Float]): Double =
    SimdCall.ipDF(a, b)
  override protected def callFF(a: Array[Float], b: Array[Float]): Double =
    SimdCall.ipFF(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

case class CosineSimilaritySimd(left: Expression, right: Expression)
    extends SimdVectorDistanceExpression {
  override def prettyName: String = "cosine_similarity_simd"
  override protected def kernel: String = "cosine"
  override protected def callDD(a: Array[Double], b: Array[Double]): Double =
    SimdCall.cosineDD(a, b)
  override protected def callDF(a: Array[Double], b: Array[Float]): Double =
    SimdCall.cosineDF(a, b)
  override protected def callFF(a: Array[Float], b: Array[Float]): Double =
    SimdCall.cosineFF(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
