package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, IvfIndex, KMeans}
import graft.streaming.StreamingKnn

/** Stream ≡ batch for the streaming similarity-search surface: feeding the
  * query set through micro-batches must reproduce the one-shot batch search
  * pair-for-pair (per-query independence against a static index). */
class StreamingKnnSpec extends SparkSpec {

  private def ckpt() =
    java.nio.file.Files.createTempDirectory("graft-knn-stream").toString

  private def collectStream(queries: Seq[(Long, Seq[Double])], nBatches: Int)
                           (attach: DataFrame => (DataFrame => Unit) =>
                             org.apache.spark.sql.streaming.StreamingQuery)
      : Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val stream = mem.toDF().toDF("query_id", "qvec")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = attach(stream) { res =>
      val rows = res.select("query_id", "rnk", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      buf.synchronized { buf ++= rows }
    }
    try {
      queries.grouped(math.max(1, queries.length / nBatches)).foreach { g =>
        mem.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    buf.toSeq.sorted
  }

  private def embQueries: Seq[(Long, Seq[Double])] =
    Tables.embeddingQueries(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

  test("streaming flat kNN over 3 micro-batches equals the batch search") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec").cache()
    val streamed = collectStream(embQueries, 3)(st => emit =>
      StreamingKnn.attachFlat(st, data, 5, Metric.L2, ckpt())(emit))
    val batch = FlatKnn.search(
        Tables.embeddingQueries(spark, sfDir), data, 5, Metric.L2)
      .select("query_id", "rnk", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming IVF kNN over 2 micro-batches equals the batch probe search") {
    val base = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val cents = Tables.embeddingVectors(spark, sfDir)
      .filter(col("id") % 100 === 7).limit(8).collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
    val clustered = KMeans.assign(base, cents).cache()
    val streamed = collectStream(embQueries, 2)(st => emit =>
      StreamingKnn.attachIvf(st, clustered, cents, 5, 2, Metric.L2,
        ckpt())(emit))
    val batch = IvfIndex.search(Tables.embeddingQueries(spark, sfDir),
        clustered, cents, 5, 2, Metric.L2)
      .select("query_id", "rnk", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q60 pipeline: dedup keeps one doc per fingerprint and gates compose") {
    val out = SparkEntry.queries("q60_pipeline")(spark, sfDir).cache()
    assert(out.count() > 0)
    // split values legal, scores above the gate
    assert(out.filter(!col("split").isin("train", "val", "test")).count() === 0)
    assert(out.filter(col("score") < 500).count() === 0)
    // output doc ids unique (dedup applied)
    assert(out.select("doc_id").distinct().count() === out.count())
  }
}
