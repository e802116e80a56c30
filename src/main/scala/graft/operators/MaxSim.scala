package graft.operators

import graft.core.Metric
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction multi-vector scoring — ColBERT's MaxSim operator
  * (Khattab & Zaharia, SIGIR'20): a query and a document are each a BAG
  * of token vectors, and
  *
  *   score(q, d) = Σ_{t ∈ q} max_{u ∈ d} sim(t, u)
  *
  * — every query token casts a vote for its best-matching document token.
  * This is the retrieval scorer between single-vector ANN (the reference's
  * whole surface) and full cross-attention re-ranking, and the natural
  * consumer of the engine's chunked/multi-vector embedding columns.
  *
  * Certification: sim is the engine's certified metric expression
  * (exactly-rounded per-dim fold), `max` is exact selection, and the
  * per-(query, doc) reduction is an ORDERED fold over query-token id — so
  * the whole score hash-certifies with no transcendental caveat at all.
  *
  * Scale shape: the token-pair block (|q_toks| × |d_toks| sims) is the
  * honest MaxSim cost; the query side is a broadcast (token batches are
  * small), so the block is a map-side nested loop next to the document
  * scan, the per-(query, doc, qtok) max partial-aggregates map-side, and
  * only (query, doc, qtok) rows — not token pairs — ever shuffle. For a
  * 100 TB corpus the candidate set should first be cut by a single-vector
  * ANN pass (e.g. centroid or [[FlatKnn]] over pooled vectors), exactly
  * as ColBERT prescribes; this operator is the exact re-scorer on that
  * candidate stream. */
object MaxSim {

  /** Nano-scale for certified double scores (LmScore precedent). */
  val ScoreScale = 1000000000L

  /** Top-k MaxSim: `queries` is (query_id, qtok, qvec), `docsV` is
    * (doc_id, dtok, dvec) — both ARRAY<DOUBLE> token bags; returns
    * (query_id, doc_id, rnk, maxsim_nano), rnk 1..k best-first, ties by
    * doc_id. For ascending metrics (L2) "best match" is the MINIMUM
    * per-token distance and ranking is ascending by the summed score. */
  def topK(queries: DataFrame, docsV: DataFrame, k: Int,
      metric: Metric = Metric.Cosine): DataFrame = {
    val sim = metric.column(col("qvec"), col("dvec")).as("sim")
    val pairs = broadcast(queries).crossJoin(docsV)
      .select(col("query_id"), col("doc_id"), col("qtok"), sim)
    val best =
      if (metric.ascending) min(col("sim")) else max(col("sim"))
    val perTok = pairs
      .groupBy("query_id", "doc_id", "qtok")
      .agg(best.as("m"))
    val scored = perTok
      .groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("qtok"), col("m"))).as("ms"))
      .select(col("query_id"), col("doc_id"),
        aggregate(sort_array(col("ms")), lit(0.0),
          (acc, x) => acc + x.getField("m")).as("score"))
    val ord =
      if (metric.ascending) Seq(col("score").asc, col("doc_id").asc)
      else Seq(col("score").desc, col("doc_id").asc)
    val w = Window.partitionBy("query_id").orderBy(ord: _*)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"),
        floor(lit(ScoreScale.toDouble) * col("score")).cast("long")
          .as("maxsim_nano"))
  }

  /** Group a flat (vec_id, vec) table into token bags by integer
    * division: (vec_id / groupSize, vec_id % groupSize) — the fixture
    * adapter that turns the single-vector embeddings table into
    * multi-vector "documents" deterministically. */
  def groupTokens(vecs: DataFrame, groupSize: Int, idCol: String = "id",
      vecCol: String = "vec"): DataFrame =
    vecs.select(
      (col(idCol).cast("long") / groupSize).cast("long").as("doc_id"),
      (col(idCol).cast("long") % groupSize).as("dtok"),
      col(vecCol).as("dvec"))
}
