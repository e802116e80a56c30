package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{BatchScore, FlatKnn, KMeans, Vamana}
import graft.operators.VamanaKernel.BuildParams

/** Two-level probe routing for the sharded graph index (the shard-count
  * scale path): exhaustive level-1 routing must be BIT-identical to flat
  * routing — same centroid fold, same global insert order, same
  * tie-breaks — and the full search composed with the walk must then be
  * bit-equal to searchSharded. Realistic level-1 probes trade routing
  * exactness for |L1| + l1Probes·(|C|/|L1|) cost; recall holds a floor. */
class HierRoutingSpec extends SparkSpec {

  private def mkRows(n: Int, d: Int, seed: Long)
      : Array[(Long, Array[Double])] =
    Array.tabulate(n) { i =>
      val r = new scala.util.Random(seed + i)
      (i.toLong, Array.fill(d)(r.nextDouble()))
    }

  test("exhaustive level-1 routing equals flat routing bit-for-bit; " +
      "tie-heavy data included") {
    for (quantize <- Seq(false, true)) {
      val q = mkRows(100, 8, 3L).map { case (i, v) =>
        (i, if (quantize) v.map(x => math.floor(x * 3)) else v) }
      val cents = mkRows(500, 8, 71L).map { case (i, v) =>
        (i, if (quantize) v.map(x => math.floor(x * 3)) else v) }
        .toIndexedSeq
      val (l1, groupOf) = Vamana.trainRoutingLevel(
        cents.map { case (i, v) => (i, v.toSeq) }, nGroups = 20)
      val l1Arr = l1.map { case (i, v) => (i, v.toArray) }.toIndexedSeq
      val flat = BatchScore.probeTopK(q, cents, 7, Metric.L2)
      val hier = BatchScore.probeTopKHierarchical(q, cents, l1Arr,
        groupOf, l1Probes = l1.length, nProbes = 7, Metric.L2)
      flat.zip(hier).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.sameElements(b), s"quantize=$quantize query $i")
      }
      // groupOf covers every centroid exactly once
      assert(groupOf.keySet === cents.map(_._1).toSet)
    }
  }

  test("hierarchical searchSharded at exhaustive l1Probes equals " +
      "searchSharded; realistic probes keep a recall floor") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    // many small shards: 50 clusters over 500 rows
    val cents = data.filter(col("id") % 10 === 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 12, buildWindow = 24), Metric.L2).cache()
    val (l1, groupOf) = Vamana.trainRoutingLevel(cents, nGroups = 7)
    val k = 10
    val exhaustive = Vamana.searchShardedHierarchical(q, clustered, graph,
        cents, l1, groupOf, k, 32, l1Probes = l1.length, nProbes = 8,
        Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val flat = Vamana.searchSharded(q, clustered, graph, cents, k, 32,
        nProbes = 8, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(exhaustive === flat)
    // realistic: 3 of 7 groups; every query still fills k, recall floor
    val real = Vamana.searchShardedHierarchical(q, clustered, graph, cents,
      l1, groupOf, k, 32, l1Probes = 3, nProbes = 8, Metric.L2)
    assert(real.groupBy("query_id").count()
      .filter(col("count") =!= k).count() === 0)
    val truth = FlatKnn.search(q, data, k, Metric.L2)
      .select("query_id", "neighbor_id")
    val nq = q.count()
    val rec = real.select("query_id", "neighbor_id").intersect(truth)
      .count().toDouble / (k * nq)
    assert(rec > 0.3, s"hierarchical recall floor broken: $rec")
  }

  test("stored layout persists the routing level: searchRouted at " +
      "exhaustive l1Probes equals search; missing routing fails loudly") {
    import graft.operators.GraphLayout
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val cents = data.filter(col("id") % 10 === 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 12, buildWindow = 24), Metric.L2)
    val path = "/tmp/graft_hier_layout"
    GraphLayout.write(clustered, graph, cents, path, routingGroups = 7)
    val layout = GraphLayout.open(spark, path)
    val (l1, groupOf) = layout.routing.get
    assert(l1.length === 7 && groupOf.keySet === cents.map(_._1).toSet)
    val routed = GraphLayout.searchRouted(layout, q, 10, 32,
        l1Probes = l1.length, nProbes = 8, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val flat = GraphLayout.search(layout, q, 10, 32, 8, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(routed === flat)
    // a layout written without routing refuses searchRouted loudly
    val pathNo = "/tmp/graft_hier_layout_none"
    GraphLayout.write(clustered, graph, cents, pathNo)
    val bare = GraphLayout.open(spark, pathNo)
    val e = intercept[RuntimeException] {
      GraphLayout.searchRouted(bare, q, 10, 32, 2, 8, Metric.L2)
    }
    assert(e.getMessage.contains("routingGroups"))
    // a REWRITE without routingGroups ignores the stale routing dirs
    // (sidecar-gated like pq/bin) instead of silently serving them
    GraphLayout.write(clustered, graph, cents, path)
    assert(GraphLayout.open(spark, path).routing.isEmpty,
      "stale routing served after a routing-less rewrite")
    // an upsert on a routed layout RETRAINS the level over the refreshed
    // centroids — groupOf covers exactly the post-upsert centroid set
    GraphLayout.write(clustered, graph, cents, path, routingGroups = 7)
    val added = data.filter(col("id") % 100 === 9).limit(8)
      .select((col("id") + 7000L).as("id"), col("vec"),
        lit(cents.head._1).as("cluster_id"))
    val delIds = clustered.filter(col("cluster_id") === cents(1)._1)
      .limit(3).select("id")
    val up = GraphLayout.upsert(spark, path,
      added, delIds, BuildParams(maxDegree = 12, buildWindow = 24),
      Metric.L2)
    val (_, g2) = up.routing.getOrElse(fail("routing lost by upsert"))
    assert(g2.keySet === up.centroids.map(_._1).toSet,
      "retrained routing does not cover the post-upsert centroids")
    val routedUp = GraphLayout.searchRouted(up, q, 10, 32,
        l1Probes = 7, nProbes = 8, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val flatUp = GraphLayout.search(up, q, 10, 32, 8, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(routedUp === flatUp)
  }
}
