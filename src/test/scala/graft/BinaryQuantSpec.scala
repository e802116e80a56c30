package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.BinaryQuant

/** Binary (sign-bit) quantization: word packing vs a driver reference,
  * Hamming ranks vs a naive popcount sweep, and the two-pass rerank's
  * recall dominance over Hamming-only. */
class BinaryQuantSpec extends SparkSpec {

  private def vecs() = Tables.embeddingVectors(spark, sfDir)
    .select("id", "vec")

  private def refCodes(v: Array[Double], t: Seq[Double]): Array[Long] = {
    val words = (t.length + 31) / 32
    val out = new Array[Long](words)
    for (i <- t.indices if v(i) > t(i))
      out(i / 32) |= 1L << (i % 32)
    out
  }

  test("encode packs sign bits 32-per-word exactly") {
    val p = BinaryQuant.train(vecs())
    assert(p.dims === Tables.embDims && p.words === (Tables.embDims + 31) / 32)
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    BinaryQuant.encode(vecs(), p).collect().foreach { r =>
      val id = r.getLong(0)
      val got = (1 to p.words).map(r.getLong).toArray
      assert(got.toSeq === refCodes(data(id), p.thresholds).toSeq, s"id $id")
    }
  }

  test("Hamming ranks equal a naive popcount sweep; rerank recall ≥ " +
      "Hamming-only recall vs exact") {
    val p = BinaryQuant.train(vecs())
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val queries = Tables.embeddingQueries(spark, sfDir)
    val qs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val codes = BinaryQuant.encode(vecs(), p)
    val k = 10
    val got = BinaryQuant.searchHamming(queries, codes, p, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    var hamHits = 0; var rrHits = 0
    val rr = BinaryQuant.searchHammingRerank(queries, codes, p, vecs(), k,
        kReorder = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    qs.foreach { case (qid, q) =>
      val qc = refCodes(q, p.thresholds)
      val ref = data.toSeq.map { case (id, v) =>
        val dc = refCodes(v, p.thresholds)
        val d = qc.zip(dc).map { case (a, b) =>
          java.lang.Long.bitCount(a ^ b) }.sum.toLong
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)
      assert(got(qid).sortBy(_._2).map(_._3).toSeq === ref, s"q$qid")
      val exact = data.toSeq.map { case (id, v) =>
        (id, Metric.L2.compute(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
      hamHits += ref.count(exact)
      rrHits += rr(qid).map(_._2).count(exact)
    }
    assert(rrHits >= hamHits, s"rerank $rrHits < hamming-only $hamHits")
  }
}
