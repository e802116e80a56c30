package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Tables
import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {

  private def events = Tables.events(spark, sfDir)

  test("sessionize: gaps over the threshold split sessions; totals conserved") {
    val s = EventOps.sessionize(events, 30).cache()
    assert(s.agg(sum("n_events")).head.getLong(0) === events.count())
    // session bounds ordered and non-overlapping per user
    val bad = s.as("a").join(s.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_id") === col("b.session_id") - 1)
      .filter(col("b.start_epoch") - col("a.end_epoch") <= 30 * 60).count()
    assert(bad === 0, "adjacent sessions closer than the gap")
    assert(s.filter(col("start_epoch") > col("end_epoch")).count() === 0)
  }

  test("tumbling windows partition all events exactly once") {
    val w = EventOps.tumblingCounts(events)
    assert(w.agg(sum("n_events")).head.getLong(0) === events.count())
    // window starts are whole hours
    assert(w.filter(col("window_start") % 3600 =!= 0).count() === 0)
  }

  test("user paths are ordered prefixes with bounded length") {
    val p = EventOps.userPaths(events, 8)
    assert(p.filter(col("path_len") > 8).count() === 0)
    assert(p.count() === events.select("user_id").distinct().count())
  }

  test("stateful streaming sessionization closes sessions on gap and " +
      "timeout, matching batch semantics") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingSessionize
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_id")
    val out = StreamingSessionize.sessions(stream, gapMinutes = 30,
      watermarkMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      // batch 1: user 7 has two events 10 min apart (one open session)
      mem.addData((t("2024-01-01 00:00:00"), 7L, 1L),
        (t("2024-01-01 00:10:00"), 7L, 2L))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_out").count() === 0) // still open
      // batch 2: event 2 hours later → closes session 1, opens session 2
      mem.addData((t("2024-01-01 02:00:00"), 7L, 3L))
      q.processAllAvailable()
      val closed = spark.sql("SELECT * FROM sess_out").as[
        StreamingSessionize.ClosedSession].collect()
      assert(closed.length === 1)
      assert(closed(0) === StreamingSessionize.ClosedSession(7L, 1L, 2L,
        t("2024-01-01 00:00:00").getTime / 1000,
        t("2024-01-01 00:10:00").getTime / 1000))
      // batch 3: far-future event for ANOTHER user advances the watermark
      // past session 2's timeout → session 2 closes via EventTimeTimeout
      mem.addData((t("2024-01-01 09:00:00"), 99L, 4L))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 10:00:00"), 99L, 5L))
      q.processAllAvailable()
      val after = spark.sql("SELECT * FROM sess_out WHERE user_id = 7")
        .as[StreamingSessionize.ClosedSession].collect()
      assert(after.length === 2)
      assert(after.map(_.session_id).sorted.toSeq === Seq(1L, 2L))
      assert(after.find(_.session_id == 2L).get.n_events === 1L)
    } finally q.stop()
  }

  test("watermark late-data semantics: stragglers beyond the allowed " +
      "lateness are dropped, in-watermark stragglers are kept") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("long").as("window_start"),
        col("n_events"))
    // append mode: a window row is emitted once, when the watermark passes
    // its end — exactly the finalize-and-drop contract under test
    val q = agg.writeStream.format("memory").queryName("late_agg")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    def epoch(s: String) = t(s).getTime / 1000
    try {
      mem.addData((t("2024-01-01 00:10:00"), "a"),
        (t("2024-01-01 00:20:00"), "a"))
      q.processAllAvailable()
      // advance the watermark to 02:00 → the 00:00 window finalizes at 2
      mem.addData((t("2024-01-01 03:00:00"), "a"))
      q.processAllAvailable()
      // straggler far below the watermark: must be DROPPED (the 00:00
      // window was finalized without it); straggler above the watermark:
      // must be KEPT (02:30 joins the 02:00 window)
      mem.addData((t("2024-01-01 00:30:00"), "late"),
        (t("2024-01-01 02:30:00"), "ok"))
      q.processAllAvailable()
      // push the watermark past every open window to flush them
      mem.addData((t("2024-01-01 06:00:00"), "a"))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT window_start, n_events FROM late_agg")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows(epoch("2024-01-01 00:00:00")) === 2L,
        "dropped straggler must not reopen a finalized window")
      assert(rows(epoch("2024-01-01 02:00:00")) === 1L,
        "in-watermark straggler must be kept")
      assert(rows(epoch("2024-01-01 03:00:00")) === 1L)
      assert(!rows.contains(epoch("2024-01-01 00:30:00")))
    } finally q.stop()
  }

  test("stream-stream interval join emits exactly the batch recent-context " +
      "pairs, including across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingEventJoin
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_id")
    val out = StreamingEventJoin.recentContextPairs(stream,
      windowMinutes = 30, watermarkMinutes = 15)
    val q = out.writeStream.format("memory").queryName("ctx_pairs")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: three events inside one 30-min span + one far later
      (t("2024-01-01 00:00:00"), 1L, 10L),
      (t("2024-01-01 00:10:00"), 1L, 11L),
      (t("2024-01-01 00:25:00"), 1L, 12L),
      (t("2024-01-01 05:00:00"), 1L, 13L),
      // user 2: exactly-at-window-edge pair (30 min apart → included) and
      // a same-timestamp pair (strictly-preceding → excluded)
      (t("2024-01-01 01:00:00"), 2L, 20L),
      (t("2024-01-01 01:30:00"), 2L, 21L),
      (t("2024-01-01 01:30:00"), 2L, 22L),
      // user 3: sub-second timestamps — the batch twin compares second-
      // truncated epochs, so events 0.4 s apart in the SAME second are not
      // "strictly preceding" (30↛31), and the window edge is measured on
      // truncated seconds (33 is 30 min after 30/31 once truncated)
      (t("2024-01-01 02:00:00.4"), 3L, 30L),
      (t("2024-01-01 02:00:00.8"), 3L, 31L),
      (t("2024-01-01 02:30:00.2"), 3L, 32L),
      (t("2024-01-01 02:30:00.9"), 3L, 33L))
    try {
      val (first, rest) = rows.splitAt(3)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(rest: _*) // later arrivals must still match batch-1 state
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM ctx_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.EventOps.recentContextPairs(
          rows.toDF("ts", "user_id", "event_id"), 30)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(batch === Set((11L, 10L), (12L, 10L), (12L, 11L),
        (21L, 20L), (22L, 20L),
        (32L, 30L), (32L, 31L), (33L, 30L), (33L, 31L)))
    } finally q.stop()
  }

  test("sessionize late-data matrix: below-watermark stragglers are " +
      "dropped, in-watermark stragglers merge with batch-equal bounds") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingSessionize
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_id")
    // gap 30 min, lateness 60 min
    val out = StreamingSessionize.sessions(stream, gapMinutes = 30,
      watermarkMinutes = 60)
    val q = out.writeStream.format("memory").queryName("late_sess")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    def e(s: String) = t(s).getTime / 1000
    try {
      // user 1 opens a session [02:00, 02:10]
      mem.addData((t("2024-01-01 02:00:00"), 1L, 1L),
        (t("2024-01-01 02:10:00"), 1L, 2L))
      q.processAllAvailable()
      // IN-WATERMARK straggler 02:05 (watermark is 01:10): merges into the
      // open session without corrupting bounds; straggler 01:55 widens the
      // session START backwards — batch sorts first, bounds are min/max
      mem.addData((t("2024-01-01 02:05:00"), 1L, 3L),
        (t("2024-01-01 01:55:00"), 1L, 4L))
      q.processAllAvailable()
      // another user pushes the watermark to 03:10 > 02:10 + gap → user 1's
      // session times out and finalizes
      mem.addData((t("2024-01-01 04:10:00"), 9L, 5L))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 04:20:00"), 9L, 6L))
      q.processAllAvailable()
      val s1 = spark.sql("SELECT * FROM late_sess WHERE user_id = 1")
        .as[StreamingSessionize.ClosedSession].collect()
      assert(s1.length === 1)
      assert(s1(0) === StreamingSessionize.ClosedSession(1L, 1L, 4L,
        e("2024-01-01 01:55:00"), e("2024-01-01 02:10:00")))
      // batch twin on the same four events agrees exactly
      val batch = EventOps.sessionize(Seq(
          (t("2024-01-01 02:00:00"), 1L, 1L),
          (t("2024-01-01 02:10:00"), 1L, 2L),
          (t("2024-01-01 02:05:00"), 1L, 3L),
          (t("2024-01-01 01:55:00"), 1L, 4L))
        .toDF("ts", "user_id", "event_id"), 30)
        .select("user_id", "session_id", "n_events", "start_epoch",
          "end_epoch").collect()
      assert(batch.length === 1)
      assert((batch(0).getLong(2), batch(0).getLong(3),
        batch(0).getLong(4)) ===
        ((4L, e("2024-01-01 01:55:00"), e("2024-01-01 02:10:00"))))
      // BELOW-watermark straggler for user 1 (watermark now 03:20): must be
      // dropped — no reopened/extra session appears after a final flush
      mem.addData((t("2024-01-01 02:07:00"), 1L, 7L))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 08:00:00"), 9L, 8L))
      q.processAllAvailable()
      val after = spark.sql("SELECT * FROM late_sess WHERE user_id = 1")
        .collect()
      assert(after.length === 1,
        "a below-watermark straggler must not create or reopen a session")
    } finally q.stop()
  }

  test("interval-join late-data matrix: in-watermark stragglers pair in " +
      "both directions, below-watermark stragglers contribute nothing") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingEventJoin
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_id")
    val out = StreamingEventJoin.recentContextPairs(stream,
      windowMinutes = 60, watermarkMinutes = 30)
    val q = out.writeStream.format("memory").queryName("late_pairs")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      mem.addData((t("2024-01-01 00:00:00"), 1L, 1L),
        (t("2024-01-01 00:10:00"), 1L, 2L))
      q.processAllAvailable()
      // watermark → 23:40 prev day; advance it with a later event
      mem.addData((t("2024-01-01 02:00:00"), 1L, 3L))
      q.processAllAvailable()
      // watermark now 01:30. e4@00:20 is BELOW it → dropped on both join
      // sides; e5@01:45 is above it → pairs with e3 (01:45 ∈ [01:00,02:00))
      mem.addData((t("2024-01-01 00:20:00"), 1L, 4L),
        (t("2024-01-01 01:45:00"), 1L, 5L))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 06:00:00"), 1L, 6L))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM late_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin over the KEPT events (e4 dropped by the watermark)
      val batch = EventOps.recentContextPairs(Seq(
          (t("2024-01-01 00:00:00"), 1L, 1L),
          (t("2024-01-01 00:10:00"), 1L, 2L),
          (t("2024-01-01 02:00:00"), 1L, 3L),
          (t("2024-01-01 01:45:00"), 1L, 5L),
          (t("2024-01-01 06:00:00"), 1L, 6L))
        .toDF("ts", "user_id", "event_id"), 60)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed === Set((2L, 1L), (3L, 5L)),
        "late e4 must contribute no pairs; in-watermark e5 must pair")
    } finally q.stop()
  }

  test("recent-context counts agree with the pairs form and keep " +
      "zero-context events") {
    val ctx = EventOps.recentContext(events, 30).cache()
    assert(ctx.count() === events.count(), "left join must keep every event")
    val fromPairs = EventOps.recentContextPairs(events, 30)
      .groupBy("event_id").count()
    val joined = ctx.join(fromPairs, Seq("event_id"), "left")
      .filter(coalesce(col("count"), lit(0L)) =!= col("n_recent")).count()
    assert(joined === 0, "n_recent must equal the pair multiplicity")
  }

  test("streaming windowed aggregation with watermark equals the batch form") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val agg = streamDf
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("evt_agg")
      .outputMode("complete").start()
    try {
      val rows = Seq(
        ("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 00:50:00", "click", 2.0),
        ("2024-01-01 01:10:00", "view", 3.0),
        ("2024-01-01 01:20:00", "click", 4.0))
        .map { case (t, e, v) => (Timestamp.valueOf(t), e, v) }
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streaming = spark.sql(
          "SELECT window_start, event_type, n_events FROM evt_agg")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventOps.tumblingCounts(
          rows.toDF("ts", "event_type", "value"))
        .select("window_start", "event_type", "n_events")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streaming === batch)
      assert(streaming.map(_.getLong(2)).sum === 4L)
    } finally q.stop()
  }
}
