package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** recall@k (SURVEY §2 A7/J5): id-set intersection per query between a result
  * and a groundtruth, both in exploded form (query_id, rnk, neighbor_id).
  * Reference: include/svs/core/recall.h:48-97. */
object Recall {

  /** Per-query intersection size: (query_id, matches). */
  def matchesPerQuery(result: DataFrame, truth: DataFrame): DataFrame = {
    val r = result.select("query_id", "neighbor_id")
    val t = truth.select("query_id", "neighbor_id")
    r.join(t, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("matches"))
  }

  /** Per-query matches including zero-match queries (one row per distinct
    * query in `truth`): (query_id, matches). */
  def matchesPerQueryComplete(result: DataFrame, truth: DataFrame): DataFrame =
    truth.select("query_id").distinct()
      .join(matchesPerQuery(result, truth), Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("matches"), lit(0L)).as("matches"))

  /** Mean recall@k over queries present in `truth`. */
  def recallAtK(result: DataFrame, truth: DataFrame, k: Int): Double = {
    val qs = truth.select("query_id").distinct()
    val m = matchesPerQuery(result, truth)
    val joined = qs.join(m, Seq("query_id"), "left")
      .select(coalesce(col("matches"), lit(0L)).as("matches"))
    val row = joined.agg(sum("matches").as("s"), count(lit(1)).as("n")).head
    if (row.getLong(1) == 0) 0.0
    else row.getLong(0).toDouble / (k.toDouble * row.getLong(1))
  }
}
