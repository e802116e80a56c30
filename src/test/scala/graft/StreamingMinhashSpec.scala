package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup
import graft.streaming.StreamingMinhash

/** Streaming MinHash-LSH: the emitted pair SET must equal the batch
  * operator regardless of arrival order or micro-batch boundaries, and the
  * per-row signature kernel must be bit-identical to the batch table. */
class StreamingMinhashSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[(Long, String)]])
      : Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val acc = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-minhash-stream").toString
    val q = StreamingMinhash.attachLshPairs(stream, ckpt) { b =>
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
    Dedup.minhashLshPairs(
        Dedup.shingleCodeTable(corpus.toDF("doc_id", "text")))
      .as[(Long, Long)].collect().toSet
  }

  test("per-row signature kernel is bit-identical to the batch table") {
    import spark.implicits._
    val table = Dedup.minhashSigTable(
        Dedup.shingleCodeTable(corpus.take(20).toDF("doc_id", "text")))
      .as[(Long, Seq[Long])].collect().toMap
    corpus.take(20).foreach { case (id, text) =>
      val rowSigs = Dedup.minhashSigsOf(Dedup.shingleCodesOf(text, 2)).toSeq
      assert(rowSigs == table(id), s"doc $id")
    }
  }

  test("one batch equals the batch operator") {
    assert(runStream(Seq(corpus)) == batchPairs)
  }

  test("split batches and reversed arrival equal the batch operator") {
    val (a, b) = corpus.partition(_._1 % 2 == 1)
    assert(runStream(Seq(a, b)) == batchPairs)
    assert(runStream(Seq(b.reverse, a.reverse)) == batchPairs)
  }

  test("source replay (duplicate doc rows in- and cross-batch) emits no " +
      "self-pairs and still equals the batch operator") {
    val (a, b) = corpus.partition(_._1 % 2 == 1)
    // every doc twice within its batch, plus batch a fully replayed later
    val got = runStream(Seq(a ++ a, b ++ b.take(20), a.take(10)))
    assert(got.forall { case (x, y) => x < y }, "self or unordered pair")
    assert(got == batchPairs)
  }
}
