package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Packing
import graft.streaming.StreamingPacking

/** Stream ≡ batch for streaming greedy packing: when arrivals respect the
  * order column across micro-batch boundaries (append-only ingest log), the
  * stateful packer's bin assignment is bit-identical to the batch packer
  * over the full corpus — including within-batch arrival shuffling. */
class StreamingPackingSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[(String, Long, Long)]], cap: Long)
      : Map[(String, Long), (Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val stream = mem.toDF().toDF("grp", "ord", "sz")
    val acc = scala.collection.mutable.HashMap
      .empty[(String, Long), (Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pack-stream").toString
    val q = StreamingPacking.attachGreedy(stream, cap, ckpt) { b =>
      val rows = b.select("grp", "ord", "sz", "bin").collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3))))
      acc.synchronized { rows.foreach { case (k, v) => acc(k) = v } }
    }
    try {
      batches.foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    acc.toMap
  }

  test("streaming packing equals batch packGreedy under ordered-boundary, " +
      "shuffled-within-batch arrival") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(8L)
    val rows = (0 until 600).map { i =>
      (s"g${i % 3}", i.toLong, 1L + r.nextInt(150))
    }
    val cap = 256L
    // micro-batches split at ord boundaries; arrival within each batch
    // shuffled
    val batches = rows.grouped(200).map(b => r.shuffle(b)).toSeq
    val streamed = runStream(batches, cap)
    val batch = Packing.packGreedy(rows.toDF("grp", "ord", "sz"),
        "grp", "ord", "sz", cap)
      .select("grp", "ord", "sz", "bin").collect()
      .map(x => ((x.getString(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3)))).toMap
    assert(streamed === batch)
  }

  test("bins never overflow across micro-batch boundaries") {
    val rows = (0 until 100).map(i => ("g", i.toLong, 60L))
    val cap = 100L
    // 60+60 > 100: every bin holds exactly one doc... except the packer
    // only opens a new bin when the NEXT doc overflows, so each bin = 1 doc
    val streamed = runStream(rows.grouped(7).toSeq, cap)
    val bins = streamed.toSeq.groupBy(_._2._2)
    bins.foreach { case (b, docs) =>
      assert(docs.map(_._2._1).sum <= cap || docs.size == 1,
        s"bin $b overflows")
    }
    assert(bins.size === 100)
  }
}
