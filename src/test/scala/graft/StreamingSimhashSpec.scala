package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.StreamingSimhash

/** Streaming wide-SimHash near-dup pairs: the emitted pair SET must equal
  * the batch operator regardless of arrival order or micro-batch
  * boundaries, and the per-row hash must be bit-identical to the batch
  * column fold. */
class StreamingSimhashSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[(Long, String)]])
      : Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val acc = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-simhash-stream").toString
    val q = StreamingSimhash.attachWidePairs(stream, maxHamming = 3,
      nBands = 4, ckpt) { b =>
      val ps = b.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      acc.synchronized { ps.foreach(acc += _) }
    }
    try {
      batches.foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    acc.toSet
  }

  private lazy val corpus = Tables.table(spark, sfDir, "documents")
    .select(col("doc_id").cast("long"), col("text"))
    .limit(200).collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private lazy val batchPairs = {
    import spark.implicits._
    Dedup.simhashWidePairs(
        corpus.toDF("doc_id", "text").select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("toks")),
        maxHamming = 3, nBands = 4)
      .as[(Long, Long)].collect().toSet
  }

  test("per-row wideHash is bit-identical to the batch column fold") {
    import spark.implicits._
    val batch = Dedup.simhashWide(corpus.toDF("doc_id", "text")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
      .as[(Long, Long)].collect().toMap
    corpus.foreach { case (id, text) =>
      assert(StreamingSimhash.wideHash(text.split(" ", -1).toIndexedSeq)
        == batch(id), s"doc $id")
    }
  }

  test("streamed pair set equals the batch join across batch boundaries " +
      "and arrival orders") {
    val (odd, even) = corpus.partition(_._1 % 2 == 1)
    assert(runStream(Seq(odd, even)) === batchPairs)
    assert(runStream(Seq(even.reverse, odd.reverse)) === batchPairs)
    assert(runStream(Seq(corpus)) === batchPairs, "single batch")
    assert(batchPairs.nonEmpty,
      "corpus has no near-dup pairs — test is vacuous")
  }

  test("source replay (duplicate doc rows in- and cross-batch) emits no " +
      "self-pairs and still equals the batch join") {
    val (odd, even) = corpus.partition(_._1 % 2 == 1)
    // hamming(h,h)=0 would self-pair without the pid != id guard
    val got = runStream(Seq(odd ++ odd, even ++ even.take(20), odd.take(10)))
    assert(got.forall { case (x, y) => x < y }, "self or unordered pair")
    assert(got === batchPairs)
  }

  test("streaming multi-probe embedding near-dup equals the batch join " +
      "across batch splits and orders") {
    import spark.implicits._
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val planes = data.filter(col("id") % 125 === 0).collect()
      .map(r => (1L << (r.getLong(0) / 125).toInt) ->
        r.getSeq[Double](1).toIndexedSeq).toIndexedSeq.sortBy(_._1)
    val batch = Dedup.embeddingNearDupLshMultiProbe(data, planes, 0.4)
      .as[(Long, Long)].collect().toSet
    val rows = data.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    def run(batches: Seq[Seq[(Long, Seq[Double])]]): Set[(Long, Long)] = {
      val s = spark
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = MemoryStream[(Long, Seq[Double])]
      val stream = mem.toDF().toDF("id", "vec")
      val acc = scala.collection.mutable.HashSet.empty[(Long, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-neardup-stream").toString
      val q = graft.streaming.StreamingNearDup.attachMultiProbe(stream,
        planes, 0.4, ckpt) { b =>
        val ps = b.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        acc.synchronized { ps.foreach(acc += _) }
      }
      try batches.foreach { g => mem.addData(g); q.processAllAvailable() }
      finally q.stop()
      acc.toSet
    }
    val (lo, hi) = rows.partition(_._1 < 250)
    assert(run(Seq(lo, hi)) === batch)
    assert(run(Seq(hi.reverse, lo.reverse)) === batch)
    assert(batch.nonEmpty)
  }
}
