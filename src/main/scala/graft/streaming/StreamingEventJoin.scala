package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the streaming twin of
  * `EventOps.recentContextPairs`. Joins a stream of events to itself on
  * `user_id` with a time-range condition, pairing each event with the same
  * user's events in the strictly preceding window.
  *
  * Both sides carry a watermark and the range condition bounds each side's
  * match horizon in BOTH directions (`l.ts - window ≤ r.ts < l.ts`), so
  * Spark can evict join state once the watermark passes a row's last
  * possible match — state stays O(events-per-window-per-user), not
  * O(stream). Inner-join matches emit as soon as both rows have arrived
  * (append mode), so results stream incrementally. */
object StreamingEventJoin {

  /** events: streaming (ts TIMESTAMP, user_id, event_id). Output:
    * `(event_id, recent_event_id)`. `watermarkMinutes` is the allowed
    * out-of-order lateness; it is independent of `windowMinutes`.
    *
    * Both sides are truncated to whole seconds (`date_trunc`) before the
    * join: the batch twin compares `ts.cast("long")` (second-floored), and
    * without the truncation sub-second events diverge at the strict `<` and
    * window edges (0.4 s apart in the same second: batch excludes, raw
    * timestamps would include). */
  def recentContextPairs(events: DataFrame, windowMinutes: Int,
                         watermarkMinutes: Int): DataFrame = {
    val l = events
      .select(date_trunc("second", col("ts")).as("l_ts"),
        col("user_id").as("l_user"), col("event_id"))
      .withWatermark("l_ts", s"$watermarkMinutes minutes")
    val r = events
      .select(date_trunc("second", col("ts")).as("r_ts"),
        col("user_id").as("r_user"), col("event_id").as("recent_event_id"))
      .withWatermark("r_ts", s"$watermarkMinutes minutes")
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("r_ts") < col("l_ts"))
      .select("event_id", "recent_event_id")
  }
}
