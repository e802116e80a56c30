package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Metric
import graft.operators.{GraphLayout, IndexLayout}

/** Serving a QUERY STREAM against a stored index layout — the deployment
  * shape of a 100 TB index: the index is a persisted store
  * ([[graft.operators.GraphLayout]] / [[graft.operators.IndexLayout]]),
  * queries arrive continuously, and every micro-batch is answered through
  * the family's ONE `serve()` entry point, so each batch gets the same
  * probe-once routing, regime auto-dispatch, and zero-corpus-shuffle
  * execution the batch API certifies (reference posture: the long-lived
  * orchestrator object queries flow through,
  * include/svs/orchestrators/manager.h:197-245 — here the "orchestrator"
  * is the opened layout plus this attached stream).
  *
  * Sink protocol (exactly-once): results land under `outPath`
  * partitioned by `batch_id` and each micro-batch writes with DYNAMIC
  * partition overwrite, so a REPLAYED batch (foreachBatch's at-least-once
  * redelivery after a failure) rewrites its own `batch_id=` partition
  * instead of appending duplicates — the same idempotence recipe as
  * [[graft.operators.GraphLayout.upsert]]'s dynamic partition overwrite,
  * applied to the result stream. Batch ≡ stream: the union of all batch
  * partitions is bit-identical to one batch `serve()` of the union of the
  * query batches (StreamingServeSpec; per-query top-k is independent
  * across queries, so micro-batch boundaries cannot change any row).
  *
  * Scale shape: each micro-batch pays I/O ∝ its probed shard union and
  * exchange ∝ |batch|·probes·k (SCALE.md serving laws) — a steady query
  * stream against a 100 TB store reads only what its batches probe. */
object StreamingServe {

  /** Attach a query stream to ANY per-batch serving function — the
    * generic core the four family overloads share. Each micro-batch is
    * served via `serve` and written to `outPath/batch_id=N/` with
    * dynamic partition overwrite (idempotent under replay). Callers own
    * the returned query's lifecycle. */
  def attach(queryStream: DataFrame, outPath: String, checkpoint: String)
            (serve: DataFrame => DataFrame): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          writeBatch(serve(batch), batchId, outPath)
      }
      .start()

  /** One micro-batch's results into its own `batch_id=` partition.
    * Dynamic overwrite is scoped to THIS WRITER via the per-write
    * option — NOT a session-conf set/restore, which would race across
    * concurrently attached streams sharing the session (a concurrent
    * restore to "static" would turn a batch's overwrite into a full-sink
    * truncation). A replay of batch N rewrites only `batch_id=N`;
    * earlier batches' partitions are untouched. */
  private def writeBatch(result: DataFrame, batchId: Long,
                         outPath: String): Unit =
    result.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outPath)

  /** Everything served so far, batch provenance dropped — read this
    * after the stream commits (or between batches) for the batch-shaped
    * result frame. */
  def results(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath).drop("batch_id")

  /** Full-precision graph serving: every micro-batch through
    * [[GraphLayout.serve]] (probe-once routing, Auto local/cogroup
    * dispatch, `keep` honored). */
  def attachGraph(queryStream: DataFrame, layout: GraphLayout.Layout,
                  outPath: String, checkpoint: String, k: Int,
                  searchWindow: Int, nProbes: Int, metric: Metric,
                  l1Probes: Int = 0,
                  keep: org.apache.spark.sql.Column = lit(true),
                  mode: GraphLayout.ServeMode = GraphLayout.ServeMode.Auto,
                  localMaxFraction: Double = 1.0): StreamingQuery =
    attach(queryStream, outPath, checkpoint)(batch =>
      GraphLayout.serve(layout, batch, k, searchWindow, nProbes, metric,
        l1Probes, keep, mode, localMaxFraction))

  /** Compressed (PQ/ADC) serving: every micro-batch through
    * [[GraphLayout.serveAdc]]. */
  def attachAdc(queryStream: DataFrame, layout: GraphLayout.Layout,
                outPath: String, checkpoint: String, k: Int,
                searchWindow: Int, nProbes: Int, kReorder: Int = 0,
                metric: Metric = Metric.L2,
                keep: org.apache.spark.sql.Column = lit(true),
                mode: GraphLayout.ServeMode = GraphLayout.ServeMode.Auto,
                localMaxFraction: Double = 1.0): StreamingQuery =
    attach(queryStream, outPath, checkpoint)(batch =>
      GraphLayout.serveAdc(layout, batch, k, searchWindow, nProbes,
        kReorder, metric, keep, mode, localMaxFraction))

  /** Binary (sign-bit / Hamming) serving: every micro-batch through
    * [[GraphLayout.serveHamming]]. */
  def attachHamming(queryStream: DataFrame, layout: GraphLayout.Layout,
                    outPath: String, checkpoint: String, k: Int,
                    searchWindow: Int, nProbes: Int, kReorder: Int,
                    rerankMetric: Metric = Metric.L2,
                    mode: GraphLayout.ServeMode =
                      GraphLayout.ServeMode.Auto,
                    localMaxFraction: Double = 1.0): StreamingQuery =
    attach(queryStream, outPath, checkpoint)(batch =>
      GraphLayout.serveHamming(layout, batch, k, searchWindow, nProbes,
        kReorder, rerankMetric, mode, localMaxFraction))

  /** Stored-IVF codec serving: every micro-batch through
    * [[IndexLayout.serve]] (routed through the persisted level-1 when
    * the layout has one and `l1Probes > 0`). */
  def attachIndex(queryStream: DataFrame, layout: IndexLayout.Layout,
                  outPath: String, checkpoint: String, k: Int,
                  nProbes: Int, metric: Metric, l1Probes: Int = 0,
                  kReorder: Int = 3): StreamingQuery =
    attach(queryStream, outPath, checkpoint)(batch =>
      IndexLayout.serve(layout, batch, k, nProbes, metric, l1Probes,
        kReorder))
}
