package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}
import graft.operators.Dedup

/** Streaming near-duplicate detection: the stream analog of
  * [[Dedup.simhashWidePairs]] (60-bit wide SimHash, pigeonhole band join).
  *
  * Each arriving document hashes per row (same fold as the batch operator,
  * bit-identical — StreamingSimhashSpec), fans out to its `nBands` band
  * keys, and the per-(band, key) state stores every (doc_id, hash) seen in
  * that bucket. A new document emits a candidate pair for each stored or
  * same-batch bucket-mate within `maxHamming` (exact popcount check
  * in-line). A pair is emitted when its LATER document arrives, so the SET
  * of emitted pairs is arrival-order- and batch-boundary-invariant — equal
  * to the batch operator's output after a cross-band distinct (pairs
  * within hamming < nBands may share several bands; the consumer dedupes,
  * exactly like the batch `.distinct()`).
  *
  * Scale: state shards by (band, key) hash — the same key the batch join
  * shuffles on; per-trigger work is bounded by the new documents' bucket
  * occupancy. The reference has no streaming surface (SURVEY §2.8); this
  * extends its dedup family to ingest alongside [[StreamingDedup]]. */
object StreamingSimhash {

  /** Per-row 60-bit wide SimHash — the same votes as
    * [[Dedup.simhashWide]]'s column fold (token duplicates count, empty
    * tokens code to 0), so values are bit-identical to the batch path. */
  def wideHash(tokens: Seq[String]): Long = {
    val mults = Dedup.SimhashWideMults
    val sub = Dedup.SimhashWideSubBits
    val votes = new Array[Int](Dedup.SimhashWideBits)
    tokens.foreach { t =>
      val tc = (if (t.isEmpty) 0L else t.codePointAt(0).toLong) * 100L +
        t.length
      var k = 0
      while (k < mults.length) {
        val hv = tc * mults(k) % Dedup.SimhashWideSubMod
        var jj = 0
        while (jj < sub) {
          votes(k * sub + jj) += (if (((hv >> jj) & 1L) == 1L) 1 else -1)
          jj += 1
        }
        k += 1
      }
    }
    var v = 0L
    var j = 0
    while (j < votes.length) {
      if (votes(j) > 0) v |= (1L << j)
      j += 1
    }
    v
  }

  /** Attach to a streaming `(doc_id, text)` DataFrame (whitespace-tokenized
    * like the batch operator). Emits `(doc_a, doc_b)` candidate rows —
    * already popcount-verified, possibly repeated across bands — to
    * `onBatch`; a set-accumulating consumer converges to
    * `Dedup.simhashWidePairs(docs, maxHamming, nBands)`. */
  def attachWidePairs(stream: DataFrame, maxHamming: Int, nBands: Int,
                      checkpoint: String)
                     (onBatch: DataFrame => Unit): StreamingQuery = {
    require(nBands > maxHamming, "need nBands > maxHamming (pigeonhole)")
    require(Dedup.SimhashWideBits % nBands == 0,
      s"$nBands bands must divide ${Dedup.SimhashWideBits} bits")
    val bandBits = Dedup.SimhashWideBits / nBands
    val mask = (1L << bandBits) - 1
    val mh = maxHamming
    val spark = stream.sparkSession
    import spark.implicits._
    val banded = stream
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val h = wideHash(text.split(" ", -1).toIndexedSeq)
        (0 until nBands).map { b =>
          (b, (h >> (b * bandBits)) & mask, id, h)
        }
      }
    val pairs = banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Long)],
         st: GroupState[Seq[(Long, Long)]]) =>
          // distinct by id: a doc_id replayed twice in one micro-batch has
          // hamming(h,h)=0 and would self-pair (the batch operator cannot
          // produce (id,id)); it must also not be stored twice in state
          val seen = st.getOption.getOrElse(Seq.empty)
          val seenIds = seen.map(_._1).toSet
          val fresh = rows.map(r => (r._3, r._4)).toArray
            .distinctBy(_._1).sortBy(_._1)
          val out = Seq.newBuilder[(Long, Long)]
          var i = 0
          while (i < fresh.length) {
            val (id, h) = fresh(i)
            // vs already-stored bucket-mates
            seen.foreach { case (oid, oh) =>
              if (oid != id &&
                  java.lang.Long.bitCount(oh ^ h) <= mh)
                out += (if (oid < id) (oid, id) else (id, oid))
            }
            // vs earlier rows of this same batch (sorted+distinct, so a < b
            // and never a self-pair)
            var p = 0
            while (p < i) {
              val (pid, ph) = fresh(p)
              if (java.lang.Long.bitCount(ph ^ h) <= mh)
                out += ((pid, id))
              p += 1
            }
            i += 1
          }
          st.update(seen ++ fresh.filterNot(f => seenIds(f._1)))
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
