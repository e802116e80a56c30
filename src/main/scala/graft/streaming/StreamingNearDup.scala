package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}
import graft.core.Metric

/** Streaming embedding near-duplicate detection: the stream analog of
  * [[graft.operators.Dedup.embeddingNearDupLshMultiProbe]].
  *
  * Each arriving vector computes its hyperplane bucket (same sign fold as
  * the batch column expression), then probes its own bucket plus every
  * single-plane flip; per-bucket state stores the (id, vec) residents. A
  * pair whose buckets differ on at most one plane is therefore compared —
  * cosine-verified inline — when its LATER vector arrives (twice within
  * one micro-batch if both probes cross; the set-accumulating consumer
  * dedupes, exactly like the batch join's implicit one-match-per-pair).
  *
  * Scale: state shards by bucket — the batch join's shuffle key; new work
  * per trigger is bounded by (nPlanes+1) × bucket occupancy per arrival.
  */
object StreamingNearDup {

  /** Per-row hyperplane bucket — bit pw set iff dot(vec, plane) > 0, the
    * same IP fold as [[graft.operators.Dedup.hyperplaneBucket]]. */
  def bucketOf(vec: Array[Double], planes: Seq[(Long, Seq[Double])]): Long =
    planes.foldLeft(0L) { case (acc, (pw, p)) =>
      if (Metric.IP.compute(vec, p.toArray) > 0) acc | pw else acc
    }

  /** Attach to a streaming `(id, vec)` DataFrame. Emits cosine-verified
    * `(id_a, id_b)` candidate rows (possibly repeated across probes) to
    * `onBatch`; a set-accumulating consumer converges to the batch
    * `embeddingNearDupLshMultiProbe(data, planes, threshold)` pairs. */
  def attachMultiProbe(stream: DataFrame, planes: Seq[(Long, Seq[Double])],
                       threshold: Double, checkpoint: String)
                      (onBatch: DataFrame => Unit): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val planesB = planes.map { case (pw, p) => (pw, p.toIndexedSeq) }
    val t = threshold
    // (probeBucket, ownBucket, id, vec, isHome): one home row (stored +
    // compared) per vector plus nPlanes probe rows (compared only)
    val fanned = stream
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, v) =>
        val vec = v.toArray
        val b = bucketOf(vec, planesB)
        (b, b, id, v, true) +: planesB.map { case (pw, _) =>
          (b ^ pw, b, id, v, false)
        }
      }
    val pairs = fanned
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Long, Seq[Double], Boolean)],
         st: GroupState[Seq[(Long, Seq[Double])]]) =>
          val fresh = rows.toArray.sortBy(_._3)
          val seen = st.getOption.getOrElse(Seq.empty)
            .map { case (id, v) => (id, v.toArray) }
          val out = Seq.newBuilder[(Long, Long)]
          def emit(aId: Long, a: Array[Double], bId: Long,
                   b: Array[Double]): Unit =
            if (aId != bId &&
                Metric.Cosine.compute(a, b) >= t)
              out += (if (aId < bId) (aId, bId) else (bId, aId))
          var i = 0
          while (i < fresh.length) {
            val (_, _, id, v, _) = fresh(i)
            val vec = v.toArray
            // vs stored residents of this bucket
            seen.foreach { case (oid, ov) => emit(id, vec, oid, ov) }
            // vs earlier same-batch rows — only against HOME rows, so a
            // same-batch pair is emitted once per crossing probe, never
            // probe-vs-probe (which would fabricate hamming-2 pairs)
            var p = 0
            while (p < i) {
              val (_, _, pid, pv, pHome) = fresh(p)
              if (pHome) emit(id, vec, pid, pv.toArray)
              p += 1
            }
            i += 1
          }
          // a same-batch (probe row, later home row) crossing also counts:
          // home rows were compared against earlier rows only, so check
          // later home rows against earlier probe rows is already covered
          // by the loop above (the later row is the prober)
          val newHome = fresh.collect { case (_, _, id, v, true) => (id, v) }
          if (newHome.nonEmpty)
            st.update(st.getOption.getOrElse(Seq.empty) ++ newHome)
          out.result().iterator
      }
      .toDF("id_a", "id_b")
    StreamTuning.withStatePartitions(spark) {
      pairs.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) => onBatch(b) }
        .start()
    }
  }
}
