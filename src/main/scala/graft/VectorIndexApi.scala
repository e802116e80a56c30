package graft

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.operators._
import graft.operators.VamanaKernel.BuildParams

/** Type-erased index orchestrator (SURVEY §2.9 — the reference's
  * `orchestrators/manager.h:58-103` + runtime dispatcher `lib/dispatcher.h`):
  * every index family implements one trait; `VectorIndex.open(spark, dir)`
  * reads the sidecar and dispatches on `index_type`, the schema-driven
  * pattern match that replaces the reference's (eltype, extent, distance)
  * template dispatch. Persistence mirrors the reference's directory
  * save/load: parquet components + one JSON sidecar (S5).
  */
trait VectorIndex {
  def indexType: String
  def metric: Metric
  /** queries(query_id, qvec) → (query_id, rnk, neighbor_id, dist). */
  def search(queries: DataFrame, k: Int): DataFrame
  def save(dir: String): Unit

  /** Materialize a search under a named, cancellable job group — the Spark
    * analog of the reference's cancel predicate (`index/flat/flat.h:
    * 286-290` checks it between scan tiles; `tests/integration/
    * cancel.cpp`). Every job the search launches joins `jobGroup`;
    * [[VectorIndex.cancel]] from any other thread aborts them promptly
    * (interrupt-on-cancel, the per-tile granularity being Spark's task),
    * the action fails with a cancellation SparkException, the session
    * stays reusable, and no partial state stays cached. `action` is where
    * the caller materializes (collect / count / write). */
  def searchCancellable[T](queries: DataFrame, k: Int, jobGroup: String)
      (action: DataFrame => T): T =
    VectorIndex.runCancellable(queries.sparkSession, jobGroup,
      s"graft $indexType search (cancellable)")(action(search(queries, k)))
}

object VectorIndex {

  /** Run `body` (driver-side actions included) inside `jobGroup` with
    * interrupt-on-cancel, restoring the thread's previous group after.
    * Multi-job searches (IVF probe maps, iterative graph walks) are
    * covered wholesale: every job launched from this thread during `body`
    * belongs to the group. */
  def runCancellable[T](spark: SparkSession, jobGroup: String,
                        desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(jobGroup, desc, interruptOnCancel = true)
    try body finally sc.clearJobGroup()
  }

  /** Abort every running/pending job of `jobGroup` (thread-safe; callable
    * from any thread, like the reference's concurrent cancel functor). */
  def cancel(spark: SparkSession, jobGroup: String): Unit =
    spark.sparkContext.cancelJobGroup(jobGroup)

  private[graft] def metricOf(name: String): Metric =
    Metric.byName(name) // includes "_simd" twins, so a saved SIMD-metric
      .getOrElse(sys.error(s"unknown metric $name")) // index reopens

  private[graft] def writeJson(spark: SparkSession, dir: String,
                               json: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, "index.json"), true)
    out.write(json.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  private[graft] def readJson(spark: SparkSession, dir: String): String = {
    val p = new Path(dir, "index.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no index sidecar at $p")
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    new String(bytes, StandardCharsets.UTF_8)
  }

  private[graft] def field(json: String, key: String): String = {
    val p = ("\"" + key + "\"\\s*:\\s*(\"([^\"]*)\"|[-0-9.]+)").r
    p.findFirstMatchIn(json) match {
      case Some(m) => Option(m.group(2)).getOrElse(m.group(1))
      case None => sys.error(s"index sidecar missing $key")
    }
  }

  private[graft] def writeVecs(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  private[graft] def readCentroids(spark: SparkSession, path: String)
      : Seq[(Long, Seq[Double])] =
    spark.read.parquet(path).select("id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq.sortBy(_._1)

  /** Runtime dispatch on the persisted `index_type`. */
  def open(spark: SparkSession, dir: String): VectorIndex = {
    val json = readJson(spark, dir)
    val m = metricOf(field(json, "metric"))
    field(json, "index_type") match {
      case "flat" =>
        FlatVectorIndex(spark.read.parquet(s"$dir/data"), m)
      case "ivf" =>
        IvfVectorIndex(spark.read.parquet(s"$dir/data"),
          readCentroids(spark, s"$dir/centroids"),
          field(json, "n_probes").toInt, m)
      case "vamana" =>
        VamanaVectorIndex(spark.read.parquet(s"$dir/data"),
          spark.read.parquet(s"$dir/graph"),
          readCentroids(spark, s"$dir/centroids"),
          field(json, "search_window").toInt,
          field(json, "n_probes").toInt, m)
      case "inverted" =>
        InvertedVectorIndex(spark.read.parquet(s"$dir/data"),
          readCentroids(spark, s"$dir/leaders"),
          field(json, "n_leaders").toInt,
          field(json, "epsilon").toDouble, m)
      case t => sys.error(s"unknown index_type $t")
    }
  }
}

/** Exhaustive scan (J1). */
case class FlatVectorIndex(data: DataFrame, metric: Metric)
    extends VectorIndex {
  val indexType = "flat"
  def search(queries: DataFrame, k: Int): DataFrame =
    FlatKnn.search(queries, data.select("id", "vec"), k, metric)
  def save(dir: String): Unit = {
    VectorIndex.writeVecs(data, s"$dir/data")
    VectorIndex.writeJson(data.sparkSession, dir,
      s"""{"index_type":"flat","metric":"${metric.name}"}""")
  }
}

/** Probe search over a k-means clustering (J3). */
case class IvfVectorIndex(clustered: DataFrame,
                          centroids: Seq[(Long, Seq[Double])], nProbes: Int,
                          metric: Metric) extends VectorIndex {
  val indexType = "ivf"
  def search(queries: DataFrame, k: Int): DataFrame =
    IvfIndex.search(queries, clustered, centroids, k, nProbes, metric)
  def save(dir: String): Unit = {
    val spark = clustered.sparkSession
    import spark.implicits._
    VectorIndex.writeVecs(clustered, s"$dir/data")
    VectorIndex.writeVecs(centroids.toDF("id", "vec"), s"$dir/centroids")
    VectorIndex.writeJson(spark, dir,
      s"""{"index_type":"ivf","metric":"${metric.name}",""" +
        s""""n_probes":$nProbes}""")
  }

  /** B5 build entry: train (or take) centroids, assign, wrap. */
}

object IvfVectorIndex {
  def build(data: DataFrame, centroids: Seq[(Long, Seq[Double])],
            nProbes: Int, metric: Metric): IvfVectorIndex =
    IvfVectorIndex(KMeans.assign(data, centroids), centroids, nProbes, metric)
}

/** Sharded Vamana graph search (J2). */
case class VamanaVectorIndex(clustered: DataFrame, graph: DataFrame,
                             centroids: Seq[(Long, Seq[Double])],
                             searchWindow: Int, nProbes: Int, metric: Metric,
                             buildParams: Option[BuildParams] = None)
    extends VectorIndex {
  val indexType = "vamana"
  def search(queries: DataFrame, k: Int): DataFrame =
    Vamana.searchSharded(queries, clustered, graph, centroids, k,
      math.max(searchWindow, k), nProbes, metric)

  /** B7 window calibration over THIS index, routed through
    * [[Vamana.prepareShards]]: the clustered ⋈ graph co-location shuffle
    * is paid ONCE and cached; each of the ~log₂(maxWindow) probes pays
    * only the walk (reference experimental_calibrate re-searches the
    * resident index the same way — calibrate.h:91-160). The walk kernel
    * is the same as [[search]]'s, so the calibrated window transfers
    * exactly. Returns (re-dialed index, achieved recall); `truth` is
    * exact groundtruth (query_id, neighbor_id), k rows per query. */
  def calibrate(queries: DataFrame, truth: DataFrame, k: Int,
                targetRecall: Double, maxWindow: Int)
      : (VamanaVectorIndex, Double) = {
    val pre = Vamana.prepareShards(clustered, graph)
    try {
      val (w, rec) = Calibrate.calibrateWindow(
        wnd => Vamana.searchPrepared(queries, pre, centroids, k,
          math.max(wnd, k), nProbes, metric),
        truth, k, targetRecall, minWindow = k, maxWindow = maxWindow)
      (copy(searchWindow = w), rec)
    } finally { pre.unpersist(); () }
  }
  def save(dir: String): Unit = {
    val spark = clustered.sparkSession
    import spark.implicits._
    VectorIndex.writeVecs(clustered, s"$dir/data")
    VectorIndex.writeVecs(graph, s"$dir/graph")
    VectorIndex.writeVecs(centroids.toDF("id", "vec"), s"$dir/centroids")
    // Build provenance, when known: with batch_size = 0 (auto) the
    // EFFECTIVE insert-batch width is shard-size-dependent (64 below
    // auto_wide nodes, 256 at or above), so recording the policy +
    // threshold makes any rebuild reproduce the graph bit-for-bit even
    // after the corpus grows past the step.
    val buildJson = buildParams.map { p =>
      s""","build_params":{"max_degree":${p.maxDegree},""" +
        s""""build_window":${p.buildWindow},"alpha":${p.alpha},""" +
        s""""max_candidate_pool":${p.maxCandidatePool},""" +
        s""""prune_to":${p.pruneTo},"batch_size":${p.batchSize},""" +
        s""""auto_wide":${BuildParams.AutoWide}}"""
    }.getOrElse("")
    VectorIndex.writeJson(spark, dir,
      s"""{"index_type":"vamana","metric":"${metric.name}",""" +
        s""""search_window":$searchWindow,"n_probes":$nProbes$buildJson}""")
  }
}

object VamanaVectorIndex {
  def build(data: DataFrame, centroids: Seq[(Long, Seq[Double])],
            params: BuildParams, searchWindow: Int, nProbes: Int,
            metric: Metric): VamanaVectorIndex = {
    val clustered = KMeans.assign(data, centroids)
    VamanaVectorIndex(clustered,
      Vamana.buildSharded(clustered, params, metric), centroids,
      searchWindow, nProbes, metric, Some(params))
  }
}

/** Two-level inverted search (J4). */
case class InvertedVectorIndex(clustered: DataFrame,
                               leaders: Seq[(Long, Seq[Double])],
                               nLeaders: Int, epsilon: Double, metric: Metric)
    extends VectorIndex {
  val indexType = "inverted"
  def search(queries: DataFrame, k: Int): DataFrame =
    Inverted.search(queries, clustered, leaders, k, nLeaders, epsilon, metric)
  def save(dir: String): Unit = {
    val spark = clustered.sparkSession
    import spark.implicits._
    VectorIndex.writeVecs(clustered, s"$dir/data")
    VectorIndex.writeVecs(leaders.toDF("id", "vec"), s"$dir/leaders")
    VectorIndex.writeJson(spark, dir,
      s"""{"index_type":"inverted","metric":"${metric.name}",""" +
        s""""n_leaders":$nLeaders,"epsilon":$epsilon}""")
  }
}
