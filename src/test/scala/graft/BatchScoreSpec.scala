package graft

import graft.core.Metric
import graft.operators.BatchScore

/** The tiled (GEMM-shaped) probe scorer must be BIT-identical to the
  * per-query sweep — same per-pair fold, same centroid order, same
  * tie-breaks — for every metric, including under planted distance ties.
  * (Bit-equality is what lets the auto-switch engage without touching any
  * certified query.) */
class BatchScoreSpec extends SparkSpec {

  private def mkRows(n: Int, d: Int, seed: Long,
                     quantize: Boolean): Array[(Long, Array[Double])] =
    Array.tabulate(n) { i =>
      val r = new scala.util.Random(seed + i)
      // quantized coordinates force EXACT distance ties, exercising the
      // id tie-break across tile boundaries
      (i.toLong, Array.fill(d)(
        if (quantize) r.nextInt(3).toDouble else r.nextDouble()))
    }

  test("tiled equals sweep across metrics, sizes, and tie-heavy data") {
    for {
      metric <- Seq(Metric.L2, Metric.IP, Metric.Cosine)
      quantize <- Seq(false, true)
      // nC spans partial tiles (not multiples of CBlock), nQ spans
      // partial query tiles
      (nQ, nC) <- Seq((7, 100), (300, 5000), (130, 2049))
    } {
      val q = mkRows(nQ, 8, 42L, quantize)
      val c = mkRows(nC, 8, 1000L, quantize)
        .map { case (i, v) => (i, v.map(_ + 0.001)) }.toIndexedSeq
      val a = BatchScore.probeTopKSweep(q, c, 5, metric)
      val b = BatchScore.probeTopKTiled(q, c, 5, metric)
      assert(a.length == b.length)
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x.sameElements(y),
          s"$metric quantize=$quantize ($nQ,$nC) query $i: " +
            s"${x.mkString(",")} vs ${y.mkString(",")}")
      }
    }
  }

  test("probeTopK dispatches by size and honors nProbes > |C|") {
    val q = mkRows(3, 4, 7L, quantize = false)
    val c = mkRows(2, 4, 9L, quantize = false).toIndexedSeq
    val r = BatchScore.probeTopK(q, c, 5, Metric.L2)
    assert(r.forall(_.length == 2), "nProbes capped at centroid count")
  }

  test("distributed probe scoring equals the driver kernel bit-for-bit " +
      "under any query partitioning") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    for (metric <- Seq(Metric.L2, Metric.IP)) {
      val q = mkRows(257, 8, 5L, quantize = true)
      val c = mkRows(511, 8, 99L, quantize = true).toIndexedSeq
      val want = BatchScore.probeTopKSweep(q, c, 6, metric)
        .zip(q).flatMap { case (ids, (qid, _)) =>
          ids.zipWithIndex.map { case (cid, r) => (qid, cid, (r + 1).toLong) }
        }.toSet
      val qdf = q.toSeq.map { case (i, v) => (i, v.toSeq) }
        .toDF("query_id", "qvec")
      for (parts <- Seq(1, 3, 7)) {
        val got = BatchScore.probeTopKDistributed(
            qdf.repartition(parts, col("query_id")),
            c.map { case (i, v) => (i, v.toSeq) }, 6, metric)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got === want, s"$metric parts=$parts")
      }
    }
  }
}
