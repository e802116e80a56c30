package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the events table — the time-dimension half of a
  * training-data pipeline (log/session-derived data). The reference has no
  * event-time semantics (SURVEY §2.8: watermarks absent), so these are part
  * of the pipeline extras: batch forms here, with the identical windowed
  * aggregation runnable under Structured Streaming + watermark
  * (StreamingSpec proves batch ≡ streaming results).
  */
object EventOps {

  /** Tumbling event-time windows: counts and integer value sums per
    * (window_start, event_type). Output uses epoch seconds so hashes are
    * engine-portable. */
  def tumblingCounts(events: DataFrame, every: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Sessionization: a new session starts when a user's gap since the
    * previous event exceeds `gapMinutes`. Returns one row per session with
    * bounds and event count — the batch twin of
    * `session_window`/`flatMapGroupsWithState`. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts").cast("long")).as("start_epoch"),
        max(col("ts").cast("long")).as("end_epoch"))
  }

  /** Event-time interval self-join: for each event, the count and integer
    * value-sum of the SAME user's events in the strictly preceding
    * `windowMinutes`. Events with no preceding context keep a zero row.
    * Batch twin of `StreamingEventJoin.recentContextPairs` — the plan is an
    * equi-join on `user_id` with a time-range residual, so Spark
    * co-partitions both sides by user and never materializes a cross
    * product. */
  def recentContext(events: DataFrame, windowMinutes: Int): DataFrame = {
    val winSec = windowMinutes * 60L
    val l = events.select(col("event_id"), col("user_id"),
      col("ts").cast("long").as("e"))
    val r = events.select(col("user_id").as("r_user"),
      col("ts").cast("long").as("r_e"), col("value").as("r_value"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_e") >= col("e") - winSec && col("r_e") < col("e"), "left")
      .groupBy("event_id", "user_id")
      .agg(count(col("r_e")).as("n_recent"),
        coalesce(sum(round(col("r_value") * 100).cast("long")), lit(0L))
          .as("recent_value_cents"))
  }

  /** The raw joined pairs behind [[recentContext]] — `(event_id,
    * recent_event_id)` for every same-user event in the strictly preceding
    * window. This is the form the streaming twin emits. */
  def recentContextPairs(events: DataFrame, windowMinutes: Int): DataFrame = {
    val winSec = windowMinutes * 60L
    val l = events.select(col("event_id"), col("user_id"),
      col("ts").cast("long").as("e"))
    val r = events.select(col("event_id").as("recent_event_id"),
      col("user_id").as("r_user"), col("ts").cast("long").as("r_e"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_e") >= col("e") - winSec && col("r_e") < col("e"))
      .select("event_id", "recent_event_id")
  }

  /** Per-user ordered event-type path (bounded), for behavioral n-grams.
    * collect_list order is not guaranteed, so steps carry their rank and are
    * sorted inside the aggregate. */
  def userPaths(events: DataFrame, maxLen: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= maxLen)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("rn"), col("event_type"))))
        .as("steps"))
      .select(col("user_id"),
        concat_ws(">", transform(col("steps"), s => s.getField("event_type")))
          .as("path"),
        size(col("steps")).cast("long").as("path_len"))
  }
}
