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
    val pairs = broadcast(queries).crossJoin(docsV)
      .select(col("query_id"), col("doc_id"), col("qtok"),
        metric.column(col("qvec"), col("dvec")).as("sim"))
    scoreAndRank(pairs, k, metric)
  }

  /** (query_id, doc_id, qtok, sim) pairs → per-qtok best, qtok-ordered
    * fold, windowed rank, nano floor — shared by the exhaustive and the
    * two-stage paths so both produce bit-identical scores. */
  private def scoreAndRank(pairs: DataFrame, k: Int, metric: Metric)
      : DataFrame = {
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

  /** Mean-pooled single vector per token bag — the stage-1 representation
    * for two-stage MaxSim retrieval. Per-dim sum folded in TOKEN-ID order
    * (collect → sort → zip_with fold) then one exact division per dim, so
    * pooled vectors are engine-replayable bit-for-bit (double addition
    * isn't associative; the fold order is part of the contract). */
  def pooled(bags: DataFrame, idCol: String, tokCol: String,
      vecCol: String, dims: Int): DataFrame =
    bags
      .groupBy(idCol)
      .agg(collect_list(struct(col(tokCol).as("t"), col(vecCol).as("v")))
        .as("ts"))
      .select(col(idCol),
        transform(
          aggregate(sort_array(col("ts")),
            array_repeat(lit(0.0), dims),
            (acc, x) => zip_with(acc, x.getField("v"), (a, b) => a + b)),
          e => e / size(col("ts"))).as("pool"))

  /** Two-stage MaxSim — the 100 TB shape the scaladoc above prescribes:
    * stage 1 ranks documents by `metric` on mean-POOLED vectors (a plain
    * single-vector kNN any of the engine's indexes can serve) and keeps
    * `candidates` per query; stage 2 re-scores ONLY those candidates with
    * exact MaxSim. At candidates ≥ |docs| this equals [[topK]] restricted
    * to nothing — the exhaustive twin (spec-pinned); at realistic
    * candidate counts the token-pair block shrinks from |corpus| to
    * |candidates| per query. */
  def topKTwoStage(queries: DataFrame, docsV: DataFrame, k: Int,
      candidates: Int, dims: Int, metric: Metric = Metric.Cosine)
      : DataFrame = {
    val qPool = pooled(queries, "query_id", "qtok", "qvec", dims)
      .withColumnRenamed("pool", "qpool")
    val dPool = pooled(docsV, "doc_id", "dtok", "dvec", dims)
    val sim = metric.column(col("qpool"), col("pool")).as("sim")
    val ord =
      if (metric.ascending) Seq(col("sim").asc, col("doc_id").asc)
      else Seq(col("sim").desc, col("doc_id").asc)
    val w = Window.partitionBy("query_id").orderBy(ord: _*)
    val cand = broadcast(qPool).crossJoin(dPool)
      .select(col("query_id"), col("doc_id"), sim)
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") <= candidates)
      .select("query_id", "doc_id")
    val pairs = broadcast(queries)
      .join(cand, Seq("query_id"))
      .join(docsV, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("qtok"),
        metric.column(col("qvec"), col("dvec")).as("sim"))
    scoreAndRank(pairs, k, metric)
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
