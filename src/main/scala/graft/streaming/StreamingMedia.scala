package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Multimodal

/** Structured Streaming multimodal ingest: a stream of media rows decoded
  * per micro-batch with the SAME batched-mapPartitions kernels as the batch
  * path — the corpus-ingest shape for continuously arriving video/audio at
  * scale (the reference has no streaming surface; this extends its data
  * model the way StreamingKnn extends its search entry point,
  * include/svs/index/flat/flat.h:321-464).
  *
  * Media decode is per-row independent — no state, watermark, or cross-row
  * merge — so the union of micro-batch outputs is row-for-row equal to the
  * batch operator on the union of the inputs (q71 certifies this against
  * q70's DuckDB oracle; StreamingMediaSpec proves arbitrary splits). Each
  * micro-batch scans its own bounded slice, decode cost is embarrassingly
  * parallel across executors, and nothing shuffles until the caller's own
  * downstream aggregation — the 100 TB shape.
  */
object StreamingMedia {

  /** Attach a streaming media-row DataFrame (doc_id, modality, content,
    * meta — [[Multimodal.MediaRow]] shape); each micro-batch's video rows
    * parse through the real Y4M reader and the per-document frame stats
    * (doc_id, n_frames, n_samples, sum1, sum_frame) are handed to `emit`.
    * Callers own the returned query's lifecycle. */
  def attachY4mStats(mediaStream: DataFrame, checkpoint: String)
                    (emit: DataFrame => Unit): StreamingQuery = {
    queryOf(mediaStream, checkpoint) { batch =>
      val spark = batch.sparkSession
      import spark.implicits._
      emit(Multimodal.y4mStats(batch.as[Multimodal.MediaRow]))
    }
  }

  /** Feature-extraction variant: per micro-batch, decode (any modality,
    * any codec) and emit the hash-folded `dims`-dim embeddings — the
    * media→embedding leg of a streaming corpus-build pipeline; plug the
    * emitted (id, vec) into [[StreamingKnn]]'s static-index search or a
    * downstream ANN build. */
  def attachFeatures(mediaStream: DataFrame, dims: Int,
                     codec: Multimodal.MediaCodec, checkpoint: String)
                    (emit: DataFrame => Unit): StreamingQuery = {
    queryOf(mediaStream, checkpoint) { batch =>
      val spark = batch.sparkSession
      import spark.implicits._
      emit(Multimodal.extractFeatures(batch.as[Multimodal.MediaRow], dims,
        codec))
    }
  }

  private def queryOf(mediaStream: DataFrame, checkpoint: String)
                     (run: DataFrame => Unit): StreamingQuery =
    mediaStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) run(batch)
      }
      .start()
}
