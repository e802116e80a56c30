package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Column-API surface for the vector kernels + slower built-in-composed
  * reference forms (used to cross-check the codegen'd expressions in tests).
  */
object VectorFunctions {

  def l2Distance(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))

  def innerProduct(a: Column, b: Column): Column =
    Bridge.column(InnerProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Reference form of L2 via built-ins (same left-fold order). */
  def l2DistanceRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Reference form of inner product via built-ins. */
  def innerProductRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** L2 norm of a vector column (precomputed at ingest for cosine fast path;
    * mirrors the reference's per-argument norm fix, cosine.h:204). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))

  /** Unit-normalize a vector column at ingest (zero vectors pass through
    * unchanged). With both sides normalized, cosine similarity becomes a
    * plain inner product — the reference's fixed-argument optimization
    * (cosine.h:102,204 `maybe_fix_argument`): one multiply-add per element
    * in the hot loop instead of three. */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Register SQL names so `spark.sql("SELECT l2_distance(a,b) ...")` works. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "l2_distance", es => L2Distance(es.head, es(1)), "builtin")
    reg.createOrReplaceTempFunction(
      "inner_product", es => InnerProduct(es.head, es(1)), "builtin")
    reg.createOrReplaceTempFunction(
      "cosine_similarity", es => CosineSimilarity(es.head, es(1)), "builtin")
  }
}
