package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, LeanVec, Lvq, Recall}

class LeanVecSpec extends SparkSpec {

  private def data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)
  private val D = Tables.embDims
  private val K = 10

  test("jacobiEigen recovers a known spectrum and orthonormal vectors") {
    // A = Q diag(9,4,1) Qᵀ for a fixed rotation Q (Givens in the 0-1 and
    // 1-2 planes) — eigenvalues must come back {9,4,1} and A·v = λ·v.
    val c = math.cos(0.3); val s = math.sin(0.3)
    val g1 = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val c2 = math.cos(1.1); val s2 = math.sin(1.1)
    val g2 = Array(Array(1.0, 0.0, 0.0), Array(0.0, c2, -s2),
      Array(0.0, s2, c2))
    def mul(a: Array[Array[Double]], b: Array[Array[Double]]) =
      Array.tabulate(3, 3)((i, j) =>
        (0 until 3).map(t => a(i)(t) * b(t)(j)).sum)
    val rot = mul(g1, g2)
    val lam = Array(9.0, 4.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(t => rot(i)(t) * lam(t) * rot(j)(t)).sum)
    val (vals, vecs) = LeanVec.jacobiEigen(a)
    assert(vals.sorted.zip(Array(1.0, 4.0, 9.0))
      .forall { case (x, y) => math.abs(x - y) < 1e-10 })
    for (col <- 0 until 3) {
      val v = Array.tabulate(3)(r => vecs(r)(col))
      val av = Array.tabulate(3)(r => (0 until 3).map(t => a(r)(t) * v(t)).sum)
      val err = (0 until 3).map(r => math.abs(av(r) - vals(col) * v(r))).max
      assert(err < 1e-9, s"A·v ≠ λ·v for column $col: $err")
    }
  }

  test("trained model is orthonormal with descending eigenvalues") {
    val m = LeanVec.train(data, 16)
    assert(m.orthoDefect < 1e-9, s"ortho defect ${m.orthoDefect}")
    assert(m.eigvals.length === D)
    assert(m.eigvals.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues not descending")
    assert(m.varianceFraction > 0.0 && m.varianceFraction <= 1.0 + 1e-12)
  }

  test("full-rank model preserves L2 ranking exactly (rotation invariance)") {
    // r = d: P is a full orthogonal basis, so ‖P(a−b)‖ = ‖a−b‖ and even the
    // COARSE pass alone must reproduce exact kNN id-for-id.
    val m = LeanVec.train(data, D)
    val rq = LeanVec.transform(q, m, idCol = "query_id", vecCol = "qvec",
      outCol = "qvec")
    val rd = LeanVec.transform(data, m)
    val coarse = FlatKnn.search(rq, rd, K, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val exact = FlatKnn.search(q, data, K, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(coarse === exact)
  }

  test("exhaustive reorder window equals exact kNN at r=8") {
    val m = LeanVec.train(data, 8)
    val n = data.count()
    val kr = ((n + K - 1) / K).toInt
    val lv = LeanVec.search(q, data, m, K, kr)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val exact = FlatKnn.search(q, data, K, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(lv === exact)
  }

  test("realistic window recall clears the q87 floor with margin") {
    val m = LeanVec.train(data, 16)
    val approx = LeanVec.search(q, data, m, K, kReorder = 8)
    val truth = FlatKnn.search(q, data, K, Metric.L2)
    val rec = Recall.recallAtK(approx, truth, K)
    info(f"leanvec r=16 window=80 recall@10 = $rec%.3f " +
      f"(varFraction = ${m.varianceFraction}%.3f)")
    assert(rec >= 0.70, s"recall $rec below spec floor 0.70 " +
      "(q87 certifies 0.60)")
    assert(m.varianceFraction >= 0.20,
      s"variance fraction ${m.varianceFraction} below spec floor 0.20 " +
        "(q87 certifies 0.15)")
  }

  test("LVQ-composed coarse codes lose little recall at the same window") {
    val m = LeanVec.train(data, 16)
    val reduced = LeanVec.transform(data, m).cache()
    val lvqP = Lvq.Params(Lvq.trainMean(reduced), bits1 = 4, bits2 = 8)
    val enc = Lvq.encode(reduced, lvqP)
    val composed = LeanVec.searchLvq(q, enc, lvqP, m, data, K, kReorder = 8)
    val plain = LeanVec.search(q, data, m, K, kReorder = 8)
    val truth = FlatKnn.search(q, data, K, Metric.L2)
    val recComposed = Recall.recallAtK(composed, truth, K)
    val recPlain = Recall.recallAtK(plain, truth, K)
    info(f"composed recall $recComposed%.3f vs plain $recPlain%.3f")
    assert(recComposed >= recPlain - 0.10,
      s"4-bit coarse codes cost ${recPlain - recComposed} recall")
    reduced.unpersist()
  }
}
