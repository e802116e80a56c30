package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{IndexLayout, KMeans}

/** Structured Streaming maintenance of a PERSISTED [[IndexLayout]] codec
  * store — [[IndexLayout.upsert]]'s stream twin, completing the lifecycle
  * symmetry across all three store families (graph:
  * [[StreamingGraphIndex]] ↔ `GraphLayout.upsert`; text:
  * `StreamingTextIndex` ↔ `TextIndex.replaceDocs`; IVF codecs: this ↔
  * `IndexLayout.upsert`; reference analog: the dynamic IVF index,
  * include/svs/index/ivf/dynamic_ivf.h). Each micro-batch routes its
  * rows to their nearest CURRENT stored centroid, rewrites exactly the
  * touched `cluster_id=` partitions with their codec columns re-encoded
  * (residual codes against the refreshed coarse centroid — the upsert's
  * no-drift invariant), and searches against the store see the new
  * points on their next probe with no global rebuild.
  *
  * Replay-safe by construction: upsert's REPLACE-on-add means a
  * redelivered micro-batch converges to the same store instead of
  * duplicating rows (the StreamingGraphIndex posture). */
object StreamingIndexLayout {

  /** Attach a streaming `(id, vec[, op])` DataFrame to the stored codec
    * layout at `path`. With `opCol`, rows whose op equals `"delete"` are
    * removed and every other row is upserted; without it, all rows are
    * upserts. `assign` is the ROUTING POLICY: given the batch's add rows
    * (id, vec) and the CURRENT stored centroids it must return
    * (id, vec, cluster_id) — the default routes each row to its nearest
    * stored centroid (dynamic-IVF routing; mass moved by earlier batches
    * routes against refreshed means), and a pinned router (e.g. by a
    * label column rejoined outside) slots in for deterministically
    * sharded corpora (q192). `trigger` passes any Structured Streaming
    * trigger through — `Trigger.AvailableNow()` is the CATCH-UP recipe
    * for a maintenance BACKLOG (drain every queued upsert batch in
    * rate-limited micro-batches, then stop; replay-safe: upsert's
    * replace-on-add converges and the crash marker brackets each
    * batch's commit), exactly the posture the serve-side twin
    * ([[StreamingServe.attach]]) certifies for query backlogs. Returns
    * the running query; callers own its lifecycle. */
  def attach(stream: DataFrame, path: String, checkpoint: String,
             opCol: Option[String] = None,
             assign: (DataFrame, Seq[(Long, Seq[Double])]) => DataFrame =
               KMeans.assign(_, _),
             trigger: Option[Trigger] = None): StreamingQuery = {
    val w0 = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    trigger.fold(w0)(w0.trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // skip empty triggers BEFORE any layout open: each upsert pays a
        // sidecar read + centroid collect (+ routing collects), and a
        // phantom batch would pay all of it for nothing — the
        // StreamingServe.isKnownEmpty plan check costs zero jobs for
        // statically-empty batches, one take(1) otherwise
        if (!StreamingServe.isKnownEmpty(batch) && !batch.isEmpty) {
        val (adds, dels) = opCol match {
          case Some(c) =>
            // null-safe: a NULL op means "plain add" (CDC sources often
            // set op only for deletes) — a bare =!= would null out the
            // predicate and silently drop the row from BOTH sides
            (batch.filter(coalesce(col(c) =!= "delete", lit(true))).drop(c),
              batch.filter(col(c) === "delete").select("id"))
          case None =>
            (batch, batch.select("id").limit(0))
        }
        val layout = IndexLayout.open(spark, path)
        val routed = assign(adds.select("id", "vec"), layout.centroids)
        IndexLayout.upsert(spark, path, routed, dels)
        }
        ()
      }
      .start()
  }
}
