package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Exhaustive k-NN join (SURVEY §2 J1) — the reference's flat index
  * (include/svs/index/flat/flat.h:321-464) re-expressed as a broadcast
  * nested-loop join + bounded top-k aggregate:
  *
  *   broadcast(queries) ⨯ data → distance → partial top-k per partition
  *   (the analog of the reference's per-tile inserts, flat.h:338-375)
  *   → shuffle O(|Q|·k) → final merge.
  *
  * The big side (data) is never shuffled and never collected — at 100 TB the
  * scan streams through executors once; only per-query k-row partials move.
  *
  * Input: queries(query_id, qvec), data(id, vec). Output best-first:
  * (query_id, rnk, neighbor_id, dist).
  */
object FlatKnn {

  def search(queries: DataFrame, data: DataFrame, k: Int, metric: Metric)
      : DataFrame = {
    val pairs = broadcast(queries).crossJoin(data)
      .select(col("query_id"), col("id"),
        metric.column(col("qvec"), col("vec")).as("dist"))
    TopK.perKey(pairs, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** Window-rank reference semantics (shuffles all pairs) — oracle shape. */
  def searchViaWindow(queries: DataFrame, data: DataFrame, k: Int,
                      metric: Metric): DataFrame = {
    val pairs = broadcast(queries).crossJoin(data)
      .select(col("query_id"), col("id"),
        metric.column(col("qvec"), col("vec")).as("dist"))
    TopK.perKeyViaWindow(pairs, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** Search excluding a tombstone set (SURVEY §2 P8 soft-delete filter):
    * anti-join data against `tombstones(id)` before the scan — predicate
    * pushdown into kNN, free in Spark. */
  def searchWithTombstones(queries: DataFrame, data: DataFrame,
                           tombstones: DataFrame, k: Int, metric: Metric)
      : DataFrame =
    search(queries, data.join(tombstones, Seq("id"), "left_anti"), k, metric)
}
