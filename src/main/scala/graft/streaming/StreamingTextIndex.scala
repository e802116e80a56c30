package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** Streaming inverted-index maintenance — the stream analog of
  * [[graft.operators.TextIndex.postings]]/`termStats`: documents arrive
  * on a stream and the pipeline maintains running `(term, df, cf)`.
  *
  * Design: two stages, mirroring `TextIndex.replaceDocs`' doc-level
  * replace semantics. Stage 1 keys state by **doc_id** — the state row
  * is that document's own term→tf map (bounded by document length, not
  * by term popularity). Each arrival is a full-document replace: the
  * stage diffs the new term map against the stored one and emits
  * per-term deltas, including NEGATIVE deltas for terms that vanished
  * from a re-ingested document (the tombstones that a per-(term,doc)
  * upsert design can never produce, because a doc's old terms live in
  * other groups' state). A re-delivered identical document diffs to
  * zero deltas, so replays are no-ops. Stage 2 is a plain streaming
  * aggregation: running `sum` of the df/cf deltas per term — two longs
  * of state per term, immune to hot-stopword posting-list growth.
  *
  * Updated terms re-emit `(term, df, cf)` each batch; a term whose df
  * reaches 0 emits a `(term, 0, 0)` row, which the sink should treat as
  * a delete. A last-row-per-term sink (dropping df=0 rows) converges to
  * the batch [[graft.operators.TextIndex.termStats]] over the final
  * version of every document — exactly `replaceDocs` symmetry.
  *
  * Scale: stage 1 shards by doc hash (the natural ingest partitioning),
  * stage 2 by term hash exactly like the batch build's shuffle; both
  * state rows are small and bounded.
  *
  * STATE SCHEMA v2: per-doc state is `(lastVersion, term→tf)` — not
  * compatible with a checkpoint written by the v1 (per-term posting
  * map) design. Restarting over a v1 checkpointLocation fails at the
  * first stateful batch (Spark's state encoder mismatch is loud, not
  * corrupting); start a fresh checkpoint and replay, or drain the old
  * query first. */
object StreamingTextIndex {

  /** Attach to a streaming `(doc_id, text)` DataFrame; emits updated
    * `(term, df, cf)` rows per micro-batch (df=0 ⇒ term deleted).
    *
    * `versionCol`: optional monotonically-increasing per-doc version
    * column. WITHOUT it, arrivals fold in group-iterator order, which
    * Spark does not guarantee matches arrival order across partitions —
    * fine for idempotent redelivery (identical text diffs to zero) but
    * order-UNDEFINED when one micro-batch carries two different versions
    * of the same doc. WITH it, the highest version wins regardless of
    * delivery order, and a stale version arriving in a LATER batch is
    * ignored (state remembers the last applied version) — the CDC
    * contract. */
  def attachTermStats(stream: DataFrame, checkpoint: String,
                      versionCol: Option[String] = None)
      (onBatch: DataFrame => Unit): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val docs = stream
      .select(col("doc_id").cast("long") +: col("text").cast("string") +:
        versionCol.map(c => col(c).cast("long")).toSeq: _*)
      .withColumn("__v", versionCol.map(c => col(c)).getOrElse(lit(0L)))
      .select(col("doc_id"), col("text"), col("__v").cast("long"))
      .as[(Long, String, Long)]
    val versioned = versionCol.isDefined
    // Stage 1 — per-doc replace + diff. State = (last version, term→tf).
    // Emits (term, d_df, d_cf).
    val deltas = docs
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rs: Iterator[(Long, String, Long)],
         st: GroupState[(Long, Map[String, Long])]) =>
          val (prevVer, prev) =
            st.getOption.getOrElse((Long.MinValue, Map.empty[String, Long]))
          // versioned: highest version wins, stale arrivals ignored;
          // unversioned: fold in iterator order (documented caveat)
          val winner: Option[(String, Long)] =
            if (versioned) {
              val cand = rs.maxBy(_._3)
              if (cand._3 > prevVer) Some((cand._2, cand._3)) else None
            } else {
              var last: Option[(String, Long)] = None
              rs.foreach { case (_, text, v) => last = Some((text, v)) }
              last
            }
          winner match {
            case None => Iterator.empty
            case Some((text, ver)) =>
              val curr = Option(text).getOrElse("")
                .split(" ").filter(_.nonEmpty)
                .groupBy(identity)
                .map { case (t, xs) => t -> xs.length.toLong }
              st.update((ver, curr))
              (prev.keySet ++ curr.keySet).iterator.flatMap { t =>
                val o = prev.getOrElse(t, 0L)
                val n = curr.getOrElse(t, 0L)
                if (o == n) Iterator.empty
                else {
                  val dDf =
                    if (o == 0L) 1L else if (n == 0L) -1L else 0L
                  Iterator.single((t, dDf, n - o))
                }
              }
          }
      }
      .toDF("term", "d_df", "d_cf")
    // Stage 2 — running totals per term (update mode re-emits only
    // terms touched this batch).
    val updates = deltas
      .groupBy("term")
      .agg(sum("d_df").as("df"), sum("d_cf").as("cf"))
    StreamTuning.withStatePartitions(spark) {
      updates.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) => onBatch(b) }
        .start()
    }
  }
}
