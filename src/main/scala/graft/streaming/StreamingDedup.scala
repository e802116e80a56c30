package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  StreamingQuery}

/** Streaming exact dedup for training-data ingest: the stream analog of
  * [[graft.operators.Dedup.exactByKey]]. Per content key the state store
  * holds (keep_id, cnt); each micro-batch folds its rows in with a
  * commutative, idempotent-per-row (min, sum) merge, so the converged output
  * is identical to the batch groupBy — independent of arrival order and
  * micro-batch boundaries. Updated groups re-emit their row each batch
  * (update mode); a sink keeping the LAST row per key converges to the batch
  * result.
  *
  * Scale: state is O(1) per distinct key and the state store shards by key
  * hash exactly like the batch groupBy's shuffle — at 100 TB both paths
  * partition on the same key and the streaming form additionally bounds
  * per-trigger work to the new rows. The reference has no streaming surface
  * (SURVEY §2.8); this extends its static dedup semantics to ingest.
  */
object StreamingDedup {

  /** Attach to a streaming `(key, id)` DataFrame. Emits `(key, keep_id,
    * cnt)` rows for groups updated in each micro-batch via `onBatch`.
    * Returns the running query; callers own its lifecycle. */
  def attachExact(stream: DataFrame, checkpoint: String)
                 (onBatch: DataFrame => Unit): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val updates = stream
      .select(col("key").cast("string"), col("id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         st: GroupState[(Long, Long)]) =>
          var mn = Long.MaxValue
          var n = 0L
          rows.foreach { r => if (r._2 < mn) mn = r._2; n += 1 }
          val (k0, c0) = st.getOption.getOrElse((Long.MaxValue, 0L))
          val merged = (math.min(k0, mn), c0 + n)
          st.update(merged)
          (key, merged._1, merged._2)
      }
      .toDF("key", "keep_id", "cnt")
    StreamTuning.withStatePartitions(spark) {
      updates.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) => onBatch(b) }
        .start()
    }
  }
}
