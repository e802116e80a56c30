package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.MaxSim

/** Late-interaction MaxSim: reference-scorer equality, two-stage ≡
  * exhaustive at full candidate width, candidate-subset containment, and
  * the ascending-metric (L2: per-token min, ascending rank) path. */
class MaxSimSpec extends SparkSpec {

  private def bags() = {
    val vecs = Tables.embeddingVectors(spark, sfDir)
    val docsV = MaxSim.groupTokens(vecs, 4)
    val queries = docsV.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"), col("dtok").as("qtok"),
        col("dvec").as("qvec"))
    (docsV, queries)
  }

  test("maxsim equals a driver-side reference scorer") {
    val (docsV, queries) = bags()
    val dv = docsV.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val qv = dv.filter(_._1 % 25 == 0)
    val byDoc = dv.groupBy(_._1)
    val got = MaxSim.topK(queries, docsV, 5, Metric.Cosine).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === byDoc.keySet.count(_ % 25 == 0) * 5)
    got.foreach { case (qid, did, _, nano) =>
      val qtoks = qv.filter(_._1 == qid).sortBy(_._2)
      val score = qtoks.foldLeft(0.0) { case (acc, (_, _, q)) =>
        acc + byDoc(did).map(d => Metric.Cosine.compute(q, d._3)).max
      }
      assert(nano === math.floor(1e9 * score).toLong, s"q$qid d$did")
    }
  }

  test("two-stage at full candidate width ≡ exhaustive maxsim") {
    val (docsV, queries) = bags()
    val nDocs = docsV.select("doc_id").distinct().count().toInt
    val full = MaxSim.topKTwoStage(queries, docsV, 5, nDocs,
      Tables.embDims, Metric.Cosine).collect().map(_.toSeq).toSet
    val ex = MaxSim.topK(queries, docsV, 5, Metric.Cosine)
      .collect().map(_.toSeq).toSet
    assert(full === ex)
  }

  test("two-stage results come from the stage-1 candidate set") {
    val (docsV, queries) = bags()
    val got = MaxSim.topKTwoStage(queries, docsV, 5, 8, Tables.embDims,
      Metric.Cosine).collect()
    assert(got.nonEmpty)
    // every reranked doc must be a stage-1 candidate: rerank of 8
    // candidates can return at most 8 rows per query
    val perQ = got.groupBy(_.getLong(0)).values.map(_.length)
    assert(perQ.forall(_ <= 8))
  }

  test("ascending metric (L2) takes per-token min and ranks ascending") {
    val (docsV, queries) = bags()
    val got = MaxSim.topK(queries, docsV, 3, Metric.L2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dv = docsV.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val byDoc = dv.groupBy(_._1)
    val qv = dv.filter(_._1 % 25 == 0)
    // rank 1 for each query is the doc with the smallest summed min-L2 —
    // and a query's own bag (distance 0 per token) must win
    got.filter(_._3 == 1L).foreach { case (qid, did, _, nano) =>
      assert(did === qid, s"query $qid should retrieve its own bag first")
      val qtoks = qv.filter(_._1 == qid).sortBy(_._2)
      val score = qtoks.foldLeft(0.0) { case (acc, (_, _, q)) =>
        acc + byDoc(did).map(d => Metric.L2.compute(q, d._3)).min
      }
      assert(nano === math.floor(1e9 * score).toLong)
    }
  }
}
