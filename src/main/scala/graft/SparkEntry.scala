package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators._

/** Driver contract — one `queries` entry + matching DuckDB `oracleSql` per
  * implemented operator from SURVEY.md §2. Output columns are integer-typed
  * (ids/ranks/counts) so the driver's hash compare is float-safe. */
object SparkEntry {

  private val K = 10

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flat_knn_l2")(spark, "/root/testdata/sf0.001")

  private def knnLineitem(metric: Metric)(s: SparkSession, dir: String)
      : DataFrame =
    FlatKnn.search(Tables.lineitemQueries(s, dir),
        Tables.lineitemVectors(s, dir), K, metric)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")

  private def knnEmbeddings(metric: Metric)(s: SparkSession, dir: String)
      : DataFrame =
    FlatKnn.search(Tables.embeddingQueries(s, dir),
        Tables.embeddingVectors(s, dir).select("id", "vec"), K, metric)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_flat_knn_l2" -> (knnLineitem(Metric.L2) _),
    "q02_flat_knn_ip" -> (knnLineitem(Metric.IP) _),
    "q03_flat_knn_cosine" -> (knnLineitem(Metric.Cosine) _),
    "q04_emb_knn_cosine" -> (knnEmbeddings(Metric.Cosine) _),
    "q05_emb_knn_l2" -> (knnEmbeddings(Metric.L2) _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_flat_knn_l2" -> OracleGen.lineitemKnn(Metric.L2, K),
    "q02_flat_knn_ip" -> OracleGen.lineitemKnn(Metric.IP, K),
    "q03_flat_knn_cosine" -> OracleGen.lineitemKnn(Metric.Cosine, K),
    "q04_emb_knn_cosine" -> OracleGen.embeddingKnn(Metric.Cosine, K),
    "q05_emb_knn_l2" -> OracleGen.embeddingKnn(Metric.L2, K),
  )
}
