package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.operators.{FlatKnn, Vamana, VamanaKernel}
import graft.operators.VamanaKernel.BuildParams
import graft.sources.SyntheticData

/** Golden-recall parity run (BASELINE.md): rebuild the reference's flagship
  * experiment — 10k×128 synthetic uniform vectors, Vamana degree 64, build
  * window 128, α=1.2, L2 — and report recall@10 at search windows
  * 10/20/30/40. Reference goldens: 0.5664 / 0.7397 / 0.8288 / 0.8837
  * (examples/python/example_vamana.py:33-46) with ±0.05 tolerance.
  *
  * Run: `sbt "runMain graft.GoldenRecall"`. Prints one JSON line.
  */
object GoldenRecall {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 10000L
    val dims = 128
    val nq = 100
    val k = 10
    val data = SyntheticData.generateMixed(spark, n, dims)
    // query set disjoint in spirit: the last nq ids (reference uses a held
    // out test slice of its query file)
    val queries = SyntheticData.generateMixed(spark, n + nq, dims)
      .filter(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec"))

    val truth = FlatKnn.search(queries, data, k, Metric.L2)
      .select("query_id", "neighbor_id").cache()
    truth.count()
    val clustered = data.withColumn("cluster_id", lit(0L))
    val cents = Seq(0L -> Seq.fill(dims)(0.5))

    // build-config grid, vamana_reference.toml style: the flagship config
    // plus the goldens' smaller one
    val configs = Seq(
      ("deg64_w128", BuildParams(maxDegree = 64, buildWindow = 128,
        alpha = 1.2)),
      ("deg32_w64", BuildParams(maxDegree = 32, buildWindow = 64,
        alpha = 1.2, pruneTo = 28)))
    configs.foreach { case (label, params) =>
      val t0 = System.nanoTime()
      val graph = Vamana.buildSingle(data, params, Metric.L2).cache()
      graph.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val recalls = Seq(10, 20, 30, 40).map { w =>
        val res = Vamana.searchSharded(queries, clustered, graph, cents, k,
          searchWindow = w, nProbes = 1, Metric.L2)
        val hits = res.select("query_id", "neighbor_id").intersect(truth)
          .count()
        w -> hits.toDouble / (k * nq)
      }
      graph.unpersist()
      val rjson = recalls.map { case (w, r) => s""""w$w":$r""" }.mkString(",")
      println(s"""{"experiment":"golden_recall_vamana","config":"$label",""" +
        s""""n":$n,"dims":$dims,"build_sec":$buildSec,$rjson}""")
    }

    // IVF probe sweep on the same dataset (the reference's second golden
    // grid, ivf_reference.toml): recall@10 rises monotonically with
    // n_probes and reaches 1.0 when every cluster is probed.
    val seed0 = data.filter(col("id") % (n / 100) === 0).limit(100).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val ivfCents = graft.operators.KMeans.lloyd(
      data.sample(0.1, seed = 11), seed0, iters = 3, dims)
    val ivfClustered = graft.operators.KMeans.assign(data, ivfCents).cache()
    val ivfRecalls = Seq(1, 2, 4, 8, 16).map { p =>
      val res = graft.operators.IvfIndex.search(queries, ivfClustered,
        ivfCents, k, p, Metric.L2)
      val hits = res.select("query_id", "neighbor_id").intersect(truth).count()
      p -> hits.toDouble / (k * nq)
    }
    val ijson = ivfRecalls.map { case (p, r) => s""""p$p":$r""" }.mkString(",")
    println(s"""{"experiment":"golden_recall_ivf","n":$n,"dims":$dims,""" +
      s""""clusters":100,$ijson}""")
    spark.stop()
  }
}
