package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}
import graft.operators.Dedup

/** Streaming MinHash-LSH near-duplicate detection: the stream analog of
  * [[Dedup.minhashLshPairs]], completing the streaming dedup family
  * (exact: [[StreamingDedup]]; SimHash: [[StreamingSimhash]]; embedding
  * LSH: [[StreamingNearDup]]).
  *
  * Each arriving document shingles and minhashes per row with the SAME row
  * kernels as the batch operator ([[Dedup.shingleCodesOf]] /
  * [[Dedup.minhashSigsOf]] — bit-identical signatures by construction),
  * fans out to its band keys, and the per-(band, key) state stores every
  * doc_id seen in that bucket. A new document emits a candidate pair for
  * each stored or earlier-same-batch bucket-mate, so the accumulated SET of
  * pairs is arrival-order- and batch-boundary-invariant and equals the
  * batch operator's output after a distinct (pairs sharing several bands
  * repeat; the consumer dedupes, exactly like the batch `.distinct()`).
  *
  * Scale: state shards by (band, key) hash — the same key the batch join
  * shuffles on; per-trigger work is bounded by the new documents' bucket
  * occupancy. The reference has no streaming surface (SURVEY §2.8); this
  * extends its dedup family to ingest. */
object StreamingMinhash {

  /** Attach to a streaming `(doc_id, text)` DataFrame. Emits
    * `(doc_a, doc_b)` candidate rows (possibly repeated across bands) to
    * `onBatch`; a set-accumulating consumer converges to
    * `Dedup.minhashLshPairs(Dedup.shingleCodeTable(docs))`. */
  def attachLshPairs(stream: DataFrame, checkpoint: String)
                    (onBatch: DataFrame => Unit): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val r = Dedup.RowsPerBand
    val nBands = Dedup.NumBands
    val banded = stream
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sigs = Dedup.minhashSigsOf(Dedup.shingleCodesOf(text, 2))
        (0 until nBands).map { j =>
          val key = (0 until r).map(i => sigs(j * r + i)).mkString("_")
          (j, key, id)
        }
      }
    val pairs = banded
      .groupByKey(row => (row._1, row._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[(Int, String, Long)],
         st: GroupState[Seq[Long]]) =>
          // distinct: a doc_id replayed twice in one micro-batch must not
          // self-pair (batch minhashLshPairs's x.id < y.id never does) nor
          // be stored twice in state
          val seen = st.getOption.getOrElse(Seq.empty)
          val seenSet = seen.toSet
          val fresh = rows.map(_._3).toArray.distinct.sorted
          val out = Seq.newBuilder[(Long, Long)]
          var i = 0
          while (i < fresh.length) {
            val id = fresh(i)
            seen.foreach { oid =>
              if (oid != id)
                out += (if (oid < id) (oid, id) else (id, oid))
            }
            // earlier rows of this batch are sorted+distinct, so pair is
            // ordered and never a self-pair
            var p = 0
            while (p < i) { out += ((fresh(p), id)); p += 1 }
            i += 1
          }
          st.update(seen ++ fresh.filterNot(seenSet))
          out.result().iterator
      }
      .toDF("doc_a", "doc_b")
    StreamTuning.withStatePartitions(spark) {
      pairs.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, _: Long) => onBatch(b) }
        .start()
    }
  }
}
