package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  StreamingQuery}

/** Streaming inverted-index maintenance — the stream analog of
  * [[graft.operators.TextIndex.postings]]/`termStats`: documents arrive
  * on a stream, and per term the state store holds the posting list
  * itself (doc_id → tf). Each micro-batch UPSERTS its docs' term
  * frequencies, so the merge is idempotent per (term, doc) — replays and
  * re-deliveries of a document converge to the same state instead of
  * double-counting (the self-guard lesson from the round-5 streaming
  * ADVICE items, applied from the start). Updated terms re-emit
  * (term, df, cf) each batch; a last-row-per-term sink converges to the
  * batch [[graft.operators.TextIndex.termStats]] exactly.
  *
  * Scale: state shards by term hash exactly like the batch build's
  * shuffle. The state row for a term IS its posting list — honest for an
  * incremental index (that list is the product), but a hot stopword's
  * row grows with df; a production deployment caps per-term state with
  * the usual stopword policy or periodically compacts hot terms into the
  * batch-built bucketed store ([[graft.operators.TextIndex.writePostings]])
  * and truncates their stream state. */
object StreamingTextIndex {

  /** Attach to a streaming `(doc_id, text)` DataFrame; emits updated
    * `(term, df, cf)` rows per micro-batch. */
  def attachTermStats(stream: DataFrame, checkpoint: String)
      (onBatch: DataFrame => Unit): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    // per arriving doc: its per-term tf, computed doc-locally (flatMap,
    // no pre-shuffle) — one (term, doc_id, tf) row per distinct term
    val rows = stream
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Option(text).getOrElse("").split(" ").filter(_.nonEmpty)
          .groupBy(identity)
          .map { case (t, xs) => (t, id, xs.length.toLong) }
      }
      .toDF("term", "doc_id", "tf")
    val updates = rows
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (term: String, rs: Iterator[(String, Long, Long)],
         st: GroupState[Map[Long, Long]]) =>
          val merged = rs.foldLeft(st.getOption.getOrElse(Map.empty)) {
            case (m, (_, id, tf)) => m.updated(id, tf) // upsert: replay-safe
          }
          st.update(merged)
          (term, merged.size.toLong, merged.valuesIterator.sum)
      }
      .toDF("term", "df", "cf")
    updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) => onBatch(b) }
      .start()
  }
}
