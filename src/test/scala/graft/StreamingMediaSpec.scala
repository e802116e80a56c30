package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Multimodal
import graft.streaming.StreamingMedia

/** Stream ≡ batch for the streaming multimodal-ingest surface: media decode
  * is per-document independent, so feeding the same containers through any
  * micro-batch split must reproduce the batch operators row-for-row. */
class StreamingMediaSpec extends SparkSpec {

  private def ckpt() =
    java.nio.file.Files.createTempDirectory("graft-media-stream").toString

  private def mediaRows: Seq[Multimodal.MediaRow] = {
    val s = spark
    import s.implicits._
    val docs = (0L until 24L).map(id => (id, s"doc$id"))
      .toDF("doc_id", "text")
    Multimodal.packY4m(docs).collect().toSeq
  }

  test("streaming Y4M stats over 3 micro-batches equal the batch operator") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = mediaRows
    val mem = MemoryStream[Multimodal.MediaRow]
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    val q = StreamingMedia.attachY4mStats(mem.toDF(), ckpt()) { res =>
      val got = res.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      buf.synchronized { buf ++= got }
    }
    try {
      // deliberately uneven, out-of-order batches: decode is stateless, so
      // arrival order must not matter
      val (a, rest) = rows.reverse.splitAt(5)
      val (b, c) = rest.splitAt(11)
      Seq(a, b, c).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val batch = Multimodal.y4mStats(rows.toDS()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    assert(buf.toSeq.sorted === batch)
    assert(batch.length === rows.length)
  }

  test("streaming feature extraction equals the batch embeddings and feeds " +
      "downstream search") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = mediaRows
    val mem = MemoryStream[Multimodal.MediaRow]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    val q = StreamingMedia.attachFeatures(mem.toDF(), dims = 8,
        Multimodal.RawCodec, ckpt()) { res =>
      val got = res.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      buf.synchronized { buf ++= got }
    }
    try {
      rows.grouped(7).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val batch = Multimodal.extractFeatures(rows.toDS(), dims = 8,
        Multimodal.RawCodec).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    assert(buf.toSeq.sortBy(_._1) === batch)
    // embeddings are well-formed vectors a kNN can consume
    assert(batch.forall(_._2.length == 8))
  }
}
