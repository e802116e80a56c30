package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.Pq

/** Product quantization: encode = per-subspace argmin (driver reference),
  * ADC ranks = brute-force LUT reference, and the trained-Lloyd path
  * strictly reduces quantization distortion vs sampled codebooks. */
class PqSpec extends SparkSpec {

  private val M = 4
  private val K = 8
  private def dims = Tables.embDims

  private def vecs() = Tables.embeddingVectors(spark, sfDir)
    .select("id", "vec")

  private def sampledParams(): Pq.Params = {
    val rows = vecs().filter(col("id") % 7 === 0 && col("id") < 7 * K)
      .orderBy("id").collect()
      .map(_.getAs[Seq[Double]]("vec").toArray).toSeq
    Pq.paramsFromRows(rows, M, K, dims)
  }

  private def refCode(v: Array[Double], p: Pq.Params): Array[Int] =
    Array.tabulate(p.m) { j =>
      val sub = v.slice(j * p.subDim, (j + 1) * p.subDim)
      (0 until p.k).minBy(c => Metric.L2.compute(sub, p.codebooks(j)(c)))
    }

  test("encode emits the per-subspace argmin codes") {
    val p = sampledParams()
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = Pq.encode(vecs(), p).collect()
      .map(r => r.getLong(0) -> (1 to M).map(r.getLong).toArray)
    got.foreach { case (id, codes) =>
      assert(codes.map(_.toInt).toSeq === refCode(data(id), p).toSeq,
        s"id $id")
      assert(codes.forall(c => c >= 0 && c < K))
    }
  }

  test("ADC ranks equal a brute-force LUT reference") {
    val p = sampledParams()
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val queries = Tables.embeddingQueries(spark, sfDir)
    val qs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val got = Pq.searchAdc(queries, Pq.encode(vecs(), p), p, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    qs.foreach { case (qid, q) =>
      val adc = data.toSeq.map { case (id, v) =>
        val codes = refCode(v, p)
        val d = (0 until p.m).foldLeft(0.0) { (acc, j) =>
          acc + Metric.L2.compute(q.slice(j * p.subDim, (j + 1) * p.subDim),
            p.codebooks(j)(codes(j)))
        }
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      assert(byQ(qid).sortBy(_._2).map(_._3).toSeq === adc, s"q$qid")
    }
  }

  test("trained-Lloyd codebooks reduce distortion vs sampled rows") {
    def distortion(p: Pq.Params): Double = {
      val data = vecs().collect().map(_.getSeq[Double](1).toArray)
      data.map { v =>
        val codes = refCode(v, p)
        (0 until p.m).map(j => Metric.L2.compute(
          v.slice(j * p.subDim, (j + 1) * p.subDim),
          p.codebooks(j)(codes(j)))).sum
      }.sum / data.length
    }
    val trained = Pq.trainLloyd(vecs(), M, K, dims, iters = 3)
    assert(trained.codebooks.length === M)
    assert(trained.codebooks.forall(_.length === K))
    val dS = distortion(sampledParams())
    val dT = distortion(trained)
    assert(dT < dS, s"trained distortion $dT !< sampled $dS")
  }
}
