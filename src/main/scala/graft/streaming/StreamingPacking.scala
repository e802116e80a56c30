package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** Streaming sequence packing for training-data ingest: the stream analog
  * of [[graft.operators.Packing.packGreedy]]. Per packing stream (group
  * key) the state store holds the open bin's (index, fill); each
  * micro-batch sorts its arrivals by the order column and continues the
  * greedy first-fit walk from the stored state — so when arrivals respect
  * the order across micro-batch boundaries (each batch's orders follow the
  * previous batch's, the shape of an append-only ingest log), the bin
  * assignment is BIT-identical to running the batch packer over the full
  * corpus. Within a micro-batch, arrival order is free (sorted before
  * folding).
  *
  * Scale: state is two longs per stream; streams shard across the state
  * store by group-key hash exactly like the batch co-locating shuffle, and
  * per-trigger work is bounded by the new rows. */
object StreamingPacking {

  /** Attach to a streaming `(grp, ord, sz)` DataFrame; emits one
    * `(grp, ord, sz, bin)` row per arrived document via `onBatch`.
    * `shards` substreams (the batch operator's 100 TB lever) are expressed
    * upstream by folding the shard id into `grp`. */
  def attachGreedy(stream: DataFrame, capacity: Long, checkpoint: String)
      (onBatch: DataFrame => Unit): StreamingQuery = {
    require(capacity > 0, "capacity must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    val packed = stream
      .select(col("grp").cast("string"), col("ord").cast("long"),
        col("sz").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         st: GroupState[(Long, Long)]) =>
          // identical recurrence to Packing.packGreedy's partition walk
          var (bin, fill) = st.getOption.getOrElse((0L, 0L))
          val out = rows.toArray.sortBy(_._2).map { case (_, ord, sz) =>
            if (fill + sz > capacity && fill > 0) { bin += 1; fill = 0 }
            fill += sz
            (g, ord, sz, bin)
          }
          st.update((bin, fill))
          out.iterator
      }
      .toDF("grp", "ord", "sz", "bin")
    StreamTuning.withStatePartitions(spark) {
      packed.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) => onBatch(b) }
        .start()
    }
  }
}
