package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Mixture, TextAnalysis}

/** The shaping operators that are pure row-local Column expressions —
  * rate sampling, upsampling, the C4 gate — attach to a stream unchanged
  * (no state, no watermark) and emit exactly the batch result regardless
  * of micro-batch boundaries. This spec pins that: the streaming ingest
  * path of a corpus-shaping pipeline reuses the SAME certified operators,
  * not stream-specific twins. */
class StreamingShapingSpec extends SparkSpec {

  private def runStream(rows: Seq[(Long, String, String)],
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Seq[Seq[Any]] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val out = f(mem.toDF().toDF("doc_id", "source", "text"))
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rs = b.collect().map(_.toSeq.toList)
        acc.synchronized { acc ++= rs }
        ()
      }.start()
    try {
      rows.grouped(40).foreach { g =>
        mem.addData(g); q.processAllAvailable()
      }
    } finally q.stop()
    acc.toSeq
  }

  private val corpus = (0 until 200).map { i =>
    (i.toLong, s"src${i % 4}",
      (0 until 5 + i % 40).map(j => s"w${(i + j) % 17}").mkString(" "))
  }

  test("rate sampling on a stream equals the batch filter") {
    import spark.implicits._
    val batch = Mixture.sampleByRate(corpus.toDF("doc_id", "source",
        "text"), col("doc_id"), lit(0.4), 3L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val streamed = runStream(corpus, df =>
      Mixture.sampleByRate(df, col("doc_id"), lit(0.4), 3L)
        .select("doc_id"))
      .map(_.head.asInstanceOf[Long]).sorted
    assert(streamed === batch)
  }

  test("upsampling on a stream equals the batch explode") {
    import spark.implicits._
    val fac = Mixture.domainRates(col("source"),
      Map("src0" -> 2.5, "src1" -> 0.0), 1.0)
    val batch = Mixture.upsampleByFactor(corpus.toDF("doc_id", "source",
        "text"), col("doc_id"), fac, 3L)
      .select("doc_id", "repeat_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val streamed = runStream(corpus, df =>
      Mixture.upsampleByFactor(df, col("doc_id"), fac, 3L)
        .select("doc_id", "repeat_idx"))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).sorted
    assert(streamed === batch)
  }

  test("the C4 gate on a stream equals the batch gate") {
    import spark.implicits._
    val batch = TextAnalysis.c4Filters(corpus.toDF("doc_id", "source",
        "text")).select("doc_id", "kept").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    val streamed = runStream(corpus, df =>
      TextAnalysis.c4Filters(df).select("doc_id", "kept"))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Boolean]))
      .sorted
    assert(streamed === batch)
  }
}
