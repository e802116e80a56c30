package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators._
import graft.operators.VamanaKernel.BuildParams

class InvertedSpec extends SparkSpec {

  private def emb = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)

  test("inverted search: eps=inf with all leaders kept equals flat search") {
    val leaders = Inverted.pickLeaders(emb, col("id") % 25 === 7)
    val clustered = Inverted.cluster(emb, leaders)
    // keep every leader (eps huge) → scan everything → exact
    val res = Inverted.search(q, clustered, leaders, 10, 3, 1e18, Metric.L2)
    val exact = FlatKnn.search(q, emb, 10, Metric.L2)
    assert(res.select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
      .collect().toSeq ===
      exact.select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
        .collect().toSeq)
  }

  test("inverted search: tighter eps is a subset-quality result with recall " +
      "between probe floor and 1") {
    val leaders = Inverted.pickLeaders(emb, col("id") % 25 === 7)
    val clustered = Inverted.cluster(emb, leaders)
    val res = Inverted.search(q, clustered, leaders, 10, 3, 1.2, Metric.L2)
    val exact = FlatKnn.search(q, emb, 10, Metric.L2)
    val nq = q.count()
    val hits = res.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / (10 * nq)
    assert(recall > 0.3 && recall <= 1.0, s"recall $recall")
    // every query returns exactly k rows (clusters are never empty)
    assert(res.groupBy("query_id").count().filter(col("count") =!= 10)
      .count() === 0)
  }

  test("replicated clustering: (eps=0, max=1) ≡ single assignment; " +
      "replicas bounded; dedup'd search recall ≥ single-assignment recall") {
    val leaders = Inverted.pickLeaders(emb, col("id") % 25 === 7)
    val single = Inverted.cluster(emb, leaders)
      .select("id", "leader_id")
    val degenerate = Inverted.clusterReplicated(emb, leaders, 0.0, 1)
      .select("id", "leader_id")
    assert(degenerate.exceptAll(single).isEmpty &&
      single.exceptAll(degenerate).isEmpty)
    val rep = Inverted.clusterReplicated(emb, leaders, 0.25, 3).cache()
    // every row appears 1..3 times, each copy under a distinct leader
    val counts = rep.groupBy("id").count()
    assert(counts.filter(col("count") < 1 || col("count") > 3).count() === 0)
    assert(rep.count() > single.count(), "expected some replication")
    assert(rep.dropDuplicates("id", "leader_id").count() === rep.count())
    // nearest leader is always among a row's replicas
    assert(single.exceptAll(rep.select("id", "leader_id")).isEmpty)
    // dedup'd search returns k unique rows and never does worse than the
    // single-assignment probe at the same (nLeaders, eps)
    val exact = FlatKnn.search(q, emb, 10, Metric.L2)
      .select("query_id", "neighbor_id")
    def recallOf(res: org.apache.spark.sql.DataFrame): Double =
      res.select("query_id", "neighbor_id").intersect(exact).count()
        .toDouble / (10 * q.count())
    val repRes = Inverted.searchReplicated(q, rep, leaders, 10, 3, 1.2,
      Metric.L2).cache()
    assert(repRes.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count() === 0, "duplicate ids in top-k")
    val rSingle = recallOf(
      Inverted.search(q, single.join(emb, "id"), leaders, 10, 3, 1.2,
        Metric.L2))
    val rRep = recallOf(repRes)
    assert(rRep >= rSingle, s"replicated $rRep < single $rSingle")
    rep.unpersist()
  }

  test("vamana-over-leaders search equals the driver-scored search at " +
      "exhaustive leader window, and holds a recall floor realistically") {
    val leaders = Inverted.pickLeaders(emb, col("id") % 25 === 7)
    val clustered = Inverted.cluster(emb, leaders)
    val viaExact = Inverted.search(q, clustered, leaders, 10, 3, 1.2,
      Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    // exhaustive window + full fetch: the graph retrieval reproduces the
    // exact leader ranking, so the results must be identical
    val viaGraph = Inverted.searchWithLeaderIndex(q, clustered, leaders, 10,
        3, 1.2, Metric.L2, leaderWindow = 1 << 12,
        fetchLeaders = leaders.length)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(viaGraph === viaExact)
    // realistic window: distributed leader routing keeps a recall floor
    val approx = Inverted.searchWithLeaderIndex(q, clustered, leaders, 10,
      3, 1.2, Metric.L2)
    val exact = FlatKnn.search(q, emb, 10, Metric.L2)
    val recall = approx.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
      .toDouble / (10 * q.count())
    assert(recall > 0.3, s"recall $recall")
  }

  test("calibrate finds minimal window reaching target recall") {
    val data = emb.filter(col("id") < 300)
    val cents = data.filter(col("id") < 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 16, buildWindow = 32), Metric.L2).cache()
    val truth = FlatKnn.search(q, data, 10, Metric.L2).cache()
    def searchAt(w: Int) = Vamana.searchSharded(q, clustered, graph, cents,
      10, w, 2, Metric.L2)
    val (w, r) = Calibrate.calibrateWindow(searchAt, truth, 10,
      targetRecall = 0.95, minWindow = 10, maxWindow = 300)
    assert(r >= 0.95)
    assert(w >= 10 && w <= 300)
    if (w > 10) {
      // minimality: one step below the found window misses the target
      val truthPairs = truth.select("query_id", "neighbor_id")
      val below = searchAt(w - 1).select("query_id", "neighbor_id")
        .intersect(truthPairs).count().toDouble / (10 * q.count())
      assert(below < 0.95, s"window not minimal: $below at ${w - 1}")
    }
  }

  test("reconstruct returns original vectors; getDistance matches kernel") {
    import spark.implicits._
    val ids = Seq(3L, 5L).toDF("id")
    val rec = Reconstruct.reconstruct(ids, emb).orderBy("id").collect()
    assert(rec.length === 2 && rec(0).getLong(0) === 3L)
    val qv = emb.filter(col("id") === 0).collect()(0).getSeq[Double](1)
    val d = Reconstruct.getDistance(emb, 3L, qv, Metric.L2)
      .collect()(0).getDouble(1)
    val expected = Metric.L2.compute(qv.toArray,
      rec(0).getSeq[Double](1).toArray)
    assert(d === expected)
  }

  test("hierarchical assignment: l2 seed belongs to the row's l1 group") {
    val data = Tables.lineitemVectorsDedup(spark, sfDir)
    val l1 = Tables.lineitemCentroids(spark, sfDir)
    val seeds = Tables.lineitemL2Seeds(spark, sfDir)
    val res = KMeans.hierarchicalAssign(data, l1, seeds).cache()
    assert(res.count() === data.count())
    // seeds' own assignment must agree: join result rows for seed ids
    val seedAssign = KMeans.assign(seeds, l1)
      .select(col("id"), col("cluster_id").as("seed_l1"))
    val mismatches = res.join(seedAssign.withColumnRenamed("id", "l2_cluster"),
        Seq("l2_cluster"))
      .filter(col("l1_cluster") =!= col("seed_l1")).count()
    assert(mismatches === 0)
    // a seed row's nearest seed is itself
    val seedRows = res.join(seeds.select("id"), Seq("id"))
    assert(seedRows.filter(col("l2_cluster") =!= col("id")).count() === 0)
  }

  test("search fails loudly past the driver-side leader bound") {
    val tooMany = (0L to Inverted.MaxDriverLeaders.toLong)
      .map(i => (i, Seq(i.toDouble)))
    val e = intercept[IllegalArgumentException] {
      Inverted.search(q, emb.withColumn("leader_id", lit(0L)), tooMany,
        10, 3, 1e18, Metric.L2)
    }
    assert(e.getMessage.contains("searchWithLeaderIndex"))
  }
}
