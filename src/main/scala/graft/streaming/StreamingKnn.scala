package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Metric
import graft.operators.{FlatKnn, IvfIndex}

/** Structured Streaming similarity search: a stream of queries against a
  * static (built-once) index — the streaming twin of the reference's
  * batched search entry point (include/svs/index/flat/flat.h:321-464,
  * index/ivf/ivf.h search path), where callers hand the engine a query
  * matrix per call. Here each micro-batch IS that query matrix: bounded,
  * broadcast-small by the same contract, searched with the identical
  * batch kernels, so stream results are pair-for-pair equal to running
  * the batch search on the union of all micro-batches (per-query
  * independence; StreamingKnnSpec proves it).
  *
  * This shape scales the way the batch path does: the static side streams
  * from storage per micro-batch (or stays cached), queries broadcast, and
  * only |partitions|·|Q_batch|·k partial rows shuffle. State is zero —
  * kNN against a static index is embarrassingly per-query, so no
  * watermark or `GroupState` is needed (contrast `StreamingSessionize`,
  * which genuinely accumulates).
  */
object StreamingKnn {

  /** Attach a streaming `(query_id, qvec)` DataFrame to a static data
    * table; each micro-batch runs an exhaustive flat search and the
    * best-first result `(query_id, rnk, neighbor_id, dist)` is handed to
    * `emit`. Callers own the returned query's lifecycle. */
  def attachFlat(queryStream: DataFrame, data: DataFrame, k: Int,
                 metric: Metric, checkpoint: String)
                (emit: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) emit(FlatKnn.search(batch, data, k, metric))
      }
      .start()

  /** IVF variant: per micro-batch, probe the `nProbes` nearest clusters
    * only (partition-pruned scan over the clustered table). */
  def attachIvf(queryStream: DataFrame, clustered: DataFrame,
                centroids: Seq[(Long, Seq[Double])], k: Int, nProbes: Int,
                metric: Metric, checkpoint: String)
               (emit: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          emit(IvfIndex.search(batch, clustered, centroids, k, nProbes,
            metric))
      }
      .start()
}
