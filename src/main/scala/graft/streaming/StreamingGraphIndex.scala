package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.Metric
import graft.operators.{GraphLayout, KMeans, VamanaKernel}

/** Structured Streaming maintenance of a PERSISTED [[GraphLayout]] index —
  * the stream twin of `GraphLayout.upsert`, completing the lifecycle
  * symmetry the text side already has (`StreamingTextIndex` ↔
  * `TextIndex.replaceDocs`): each micro-batch routes its rows to their
  * nearest stored shard (dynamic-IVF routing, index/ivf/dynamic_ivf.h),
  * rebuilds exactly the touched shards, and rewrites only those
  * `cluster_id=` partitions on disk. Searches running against the store
  * see new points on the next probe with no global rebuild.
  *
  * Replay-safe by construction: `upsert` treats an added id as
  * REPLACE-on-add, so a redelivered micro-batch converges to the same
  * store instead of duplicating rows (the r5 ADVICE self-pair lesson,
  * applied to index maintenance).
  */
object StreamingGraphIndex {

  /** Attach a streaming `(id, vec[, op])` DataFrame to the stored index at
    * `path`. With `opCol`, rows whose op equals `"delete"` are removed and
    * every other row is upserted; without it, all rows are upserts.
    * Routing uses the CURRENT stored centroids each batch (so mass that
    * moved in earlier batches routes against refreshed means). `trigger`
    * passes any Structured Streaming trigger through —
    * `Trigger.AvailableNow()` is the catch-up recipe for a maintenance
    * backlog (drain every queued upsert batch, then stop; replay-safe:
    * replace-on-add converges and the crash marker brackets each
    * batch's commit). Returns the running query; callers own its
    * lifecycle. */
  def attach(stream: DataFrame, path: String, checkpoint: String,
             params: VamanaKernel.BuildParams, metric: Metric,
             opCol: Option[String] = None,
             trigger: Option[Trigger] = None): StreamingQuery = {
    val w0 = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    trigger.fold(w0)(w0.trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // skip empty triggers BEFORE any layout open (each upsert pays a
        // sidecar read + centroid collect) — the StreamingIndexLayout
        // guard: zero jobs for statically-empty plans, one take(1) else
        if (!StreamingServe.isKnownEmpty(batch) && !batch.isEmpty) {
          val (adds, dels) = opCol match {
            case Some(c) =>
              // null-safe: a NULL op means "plain add" (CDC sources often
              // set op only for deletes) — a bare =!= would null out the
              // predicate and silently drop the row from BOTH sides
              (batch.filter(coalesce(col(c) =!= "delete", lit(true)))
                .drop(c),
                batch.filter(col(c) === "delete").select("id"))
            case None =>
              (batch, batch.select("id").limit(0))
          }
          val layout = GraphLayout.open(spark, path)
          val routed = KMeans.assign(adds.select("id", "vec"),
            layout.centroids)
          GraphLayout.upsert(spark, path, routed, dels, params, metric)
        }
        ()
      }
      .start()
  }
}
