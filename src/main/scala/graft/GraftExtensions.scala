package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.{CosineSimilarity, CosineSimilaritySimd, InnerProduct,
  InnerProductSimd, L2Distance, L2DistanceSimd}

/** The engine's SQL extension surface (SURVEY §2.9): the reference exposes
  * its kernels through C++ customization-point objects + a runtime
  * dispatcher (lib/dispatcher.h, orchestrators/manager.h); the Spark-native
  * equivalent is Catalyst expressions registered in the FunctionRegistry so
  * any SQL string — `SELECT l2_distance(a.vec, b.vec)` — hits the same
  * codegen'd kernels as the DataFrame API.
  *
  * Two ways in:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide)
  *  - programmatic: `GraftFunctions.register(spark)` on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getCanonicalName, null, name, usage, ""),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.KnnPartialStrategy)
    ext.injectOptimizerRule(_ => graft.plans.KnnRewriteRule)
  }
}

object GraftFunctions {

  private def binary(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(
      s"expected 2 arguments, got ${args.length}")
  }

  /** Lift a Column→Column combinator (a composition of built-in codegen'd
    * expressions) into a SQL function builder — the text-analysis signals
    * are pure expression trees, so SQL users get the same codegen as the
    * DataFrame API with zero new Expression classes. */
  private def unaryCol(f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Seq[Expression] => Expression = {
    case Seq(a) => Bridge.toCatalyst(f(Bridge.column(a)))
    case args => throw new IllegalArgumentException(
      s"expected 1 argument, got ${args.length}")
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("l2_distance", "l2_distance(a, b) - squared Euclidean distance",
      binary(L2Distance)),
    ("inner_product", "inner_product(a, b) - dot-product similarity",
      binary(InnerProduct)),
    ("cosine_similarity", "cosine_similarity(a, b) - cosine similarity",
      binary(CosineSimilarity)),
    // SIMD twins (JDK Vector API kernels; scalar fallback without the
    // module). Lane folds may differ from the scalar functions in the last
    // ulp — opt-in production variants, certified on id-ranking agreement.
    ("l2_distance_simd",
      "l2_distance_simd(a, b) - squared Euclidean distance (SIMD kernel)",
      binary(L2DistanceSimd)),
    ("inner_product_simd",
      "inner_product_simd(a, b) - dot-product similarity (SIMD kernel)",
      binary(InnerProductSimd)),
    ("cosine_similarity_simd",
      "cosine_similarity_simd(a, b) - cosine similarity (SIMD kernel)",
      binary(CosineSimilaritySimd)),
    // text-analysis signals as SQL functions (§2.9 for the text family):
    // identical expression trees to the certified DataFrame operators
    ("graft_quality_score",
      "graft_quality_score(text) - heuristic quality score in [0, 1000]",
      unaryCol(graft.operators.TextAnalysis.qualityScore)),
    ("graft_lang_id",
      "graft_lang_id(text) - n-gram-profile language guess",
      unaryCol(graft.operators.TextAnalysis.langId)),
    ("graft_token_count",
      "graft_token_count(text) - whitespace token count",
      unaryCol(t => graft.operators.TextAnalysis.tokenCount(
        graft.operators.TextAnalysis.tokens(t)))),
    ("graft_fingerprint",
      "graft_fingerprint(text) - rolling-hash content fingerprint",
      unaryCol(graft.operators.TextAnalysis.fingerprint)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      Bridge.registerFunction(spark, name, usage, builder) }
}
