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

  private val NProbes = 3

  private def kmeansAssignQ(s: SparkSession, dir: String): DataFrame =
    KMeans.assign(Tables.lineitemVectorsDedup(s, dir),
        Tables.lineitemCentroids(s, dir))
      .select("id", "cluster_id").orderBy("id")

  private def clusterSizesQ(s: SparkSession, dir: String): DataFrame =
    KMeans.assign(Tables.lineitemVectorsDedup(s, dir),
        Tables.lineitemCentroids(s, dir))
      .groupBy("cluster_id").agg(count(lit(1)).as("cnt"))
      .orderBy("cluster_id")

  private def ivfSearchQ(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitemCentroids(s, dir)
    val clustered = IvfIndex.cluster(Tables.lineitemVectorsDedup(s, dir), cents)
    IvfIndex.search(Tables.lineitemQueriesDedup(s, dir), clustered, cents,
        K, NProbes, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")
  }

  private def medioidQ(s: SparkSession, dir: String): DataFrame =
    Medioid.find(Tables.lineitemVectorsDedup(s, dir), Tables.liDims)

  private def sqCodesQ(s: SparkSession, dir: String): DataFrame = {
    val data = Tables.lineitemVectorsDedup(s, dir)
    val p = ScalarQuant.train(data)
    ScalarQuant.encodeExploded(data, p).orderBy("id", "pos")
  }

  private def recallQ(s: SparkSession, dir: String): DataFrame = {
    val data = Tables.lineitemVectorsDedup(s, dir)
    val q = Tables.lineitemQueriesDedup(s, dir)
    val cents = Tables.lineitemCentroids(s, dir)
    val ivf = IvfIndex.search(q, IvfIndex.cluster(data, cents), cents,
      K, NProbes, Metric.L2)
    val truth = FlatKnn.search(q, data, K, Metric.L2)
    Recall.matchesPerQueryComplete(ivf, truth).orderBy("query_id")
  }

  private def kmeansTrainQ(s: SparkSession, dir: String): DataFrame = {
    val data = Tables.embeddingVectors(s, dir).select("id", "vec")
    val init = Tables.embeddingQueries(s, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val cents = KMeans.lloyd(data, init, iters = 3, dims = Tables.embDims)
    KMeans.assign(data, cents)
      .groupBy("cluster_id").agg(count(lit(1)).as("cnt"))
      .orderBy("cluster_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_flat_knn_l2" -> (knnLineitem(Metric.L2) _),
    "q02_flat_knn_ip" -> (knnLineitem(Metric.IP) _),
    "q03_flat_knn_cosine" -> (knnLineitem(Metric.Cosine) _),
    "q04_emb_knn_cosine" -> (knnEmbeddings(Metric.Cosine) _),
    "q05_emb_knn_l2" -> (knnEmbeddings(Metric.L2) _),
    "q06_kmeans_assign" -> (kmeansAssignQ _),
    "q07_ivf_search_l2" -> (ivfSearchQ _),
    "q08_medioid" -> (medioidQ _),
    "q09_sq_codes" -> (sqCodesQ _),
    "q10_recall_ivf_vs_flat" -> (recallQ _),
    "q11_cluster_sizes" -> (clusterSizesQ _),
    "q12_kmeans_train" -> (kmeansTrainQ _),  // iterative: rows-only check
  )

  def oracleSql: Map[String, String] = Map(
    "q01_flat_knn_l2" -> OracleGen.lineitemKnn(Metric.L2, K),
    "q02_flat_knn_ip" -> OracleGen.lineitemKnn(Metric.IP, K),
    "q03_flat_knn_cosine" -> OracleGen.lineitemKnn(Metric.Cosine, K),
    "q04_emb_knn_cosine" -> OracleGen.embeddingKnn(Metric.Cosine, K),
    "q05_emb_knn_l2" -> OracleGen.embeddingKnn(Metric.L2, K),
    "q06_kmeans_assign" -> OracleGen.kmeansAssign,
    "q07_ivf_search_l2" -> OracleGen.ivfSearch(K, NProbes),
    "q08_medioid" -> OracleGen.medioid(3),
    "q09_sq_codes" -> OracleGen.sqCodes(8),
    "q10_recall_ivf_vs_flat" -> OracleGen.recallIvfVsFlat(K, NProbes),
    "q11_cluster_sizes" -> OracleGen.clusterSizes,
  )
}
