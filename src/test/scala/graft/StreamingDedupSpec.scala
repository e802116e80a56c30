package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** Stream ≡ batch for streaming exact dedup: the (min, sum) state merge must
  * converge to Dedup.exactByKey regardless of arrival order and micro-batch
  * boundaries. */
class StreamingDedupSpec extends SparkSpec {

  private def runStream(rows: Seq[(String, Long)], batches: Seq[Seq[(String,
      Long)]]): Map[String, (Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, Long)]
    val stream = mem.toDF().toDF("key", "id")
    val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-stream").toString
    val q = StreamingDedup.attachExact(stream, ckpt) { b =>
      val ups = b.select("key", "keep_id", "cnt").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      acc.synchronized { ups.foreach { case (k, v) => acc(k) = v } }
    }
    try {
      batches.foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    acc.toMap
  }

  test("streaming exact dedup equals batch exactByKey with keys spanning " +
      "micro-batches and ids arriving out of order") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("alpha", 7L), ("alpha", 3L), ("alpha", 11L),
      ("beta", 20L), ("beta", 5L),
      ("gamma", 1L),
      ("delta", 9L), ("delta", 9L + 4L))
    // descending ids, split mid-key: first arrival is NOT the min id
    val sorted = rows.sortBy(-_._2)
    val streamed = runStream(rows, Seq(sorted.take(4), sorted.drop(4)))
    val batch = Dedup.exactByKey(rows.toDF("key", "id"), col("key"),
        col("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(streamed === batch)
  }

  test("streaming exact dedup on documents equals the batch q17 result") {
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val keyed = docs.select(concat_ws(" ", element_at(toks, 1),
      element_at(toks, 2)).as("key"), col("doc_id").as("id"))
    val rows = keyed.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (odd, even) = rows.partition(_._2 % 2 == 1)
    val streamed = runStream(rows, Seq(odd, even))
    val batch = Dedup.exactByKey(keyed, col("key"), col("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(streamed === batch)
  }
}
