package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{DynamicVectorTable, KMeans, LeanVec}

/** Structured Streaming ingest (SURVEY §2 M1/M6): the reference's
  * `add_points` surface (include/svs/index/vamana/dynamic_index.h:630-745)
  * driven by a stream — each micro-batch appends one segment to a
  * [[DynamicVectorTable]]; with centroids supplied, rows are routed to their
  * nearest cluster first (dynamic IVF, index/ivf/dynamic_ivf.h), so probe
  * searches see new points on the next batch without any index rebuild.
  *
  * The reference has no true streaming (SURVEY §2.8) — Trigger-interval
  * micro-batching is the tumbling-window analog of its incremental mutation,
  * and no watermark/late-data semantics are required for parity. */
object StreamingIngest {

  /** Attach a streaming `(id, vec, ...)` DataFrame to a dynamic table.
    * With `centroids`, rows route to their nearest cluster (dynamic IVF);
    * with `reduce`, each micro-batch also gets its LeanVec `rvec` column
    * computed AT INGEST (the dynamic-LeanVec storage shape, reference
    * dynamic_vamana_index_leanvec_impl.h — new points are reduced with the
    * trained matrices as they arrive, so coarse searches see them on the
    * next batch). Returns the running query; callers own its lifecycle. */
  def attach(stream: DataFrame, table: DynamicVectorTable, checkpoint: String,
             centroids: Option[Seq[(Long, Seq[Double])]] = None,
             reduce: Option[LeanVec.Model] = None)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val routed = centroids match {
          case Some(c) => KMeans.assign(batch, c)
          case None => batch
        }
        val stored = reduce match {
          case Some(m) => routed.join(
            LeanVec.transform(routed.select("id", "vec"), m,
              outCol = "rvec"), Seq("id"))
          case None => routed
        }
        table.addPoints(stored)
      }
      .start()
}
