package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, IndexLayout, KMeans, Pq, ScalarQuant}

/** Persisted two-level routing for the stored IVF layouts — the
  * [[IndexLayout]] twin of GraphLayout's routing level (HierRoutingSpec):
  * the level-1 table written by `write(routingGroups = …)` must reopen
  * and, at exhaustive l1Probes, make every codec's routed search
  * bit-identical to the flat-probing search; realistic l1Probes keep a
  * recall floor; metric mismatches and missing routing fail loudly. */
class IndexRoutingSpec extends SparkSpec {

  private def emb = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)

  private def cents = emb.filter(col("id") % 10 === 3).collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq

  private def pqParams = {
    val rows = emb.orderBy("id").limit(4).collect()
      .map(_.getSeq[Double](1).toArray).toSeq
    Pq.paramsFromRows(rows, m = 8, k = 4, dims = 64)
  }

  test("reopened stored layouts route through the persisted level: " +
      "exhaustive l1Probes ≡ flat search for every codec shape") {
    val cs = cents
    val clustered = KMeans.assign(emb, cs)
    val codecs: Seq[(String, IndexLayout.Codec)] = Seq(
      ("plain", IndexLayout.Uncompressed),
      ("sq", IndexLayout.Sq(ScalarQuant.Params(scale = 16.0, bias = 2.0,
        bits = 8))),
      ("pqres", IndexLayout.PqResC(pqParams)))
    for ((tag, codec) <- codecs) {
      val path = s"/tmp/graft_idx_routing_$tag"
      IndexLayout.write(clustered, cs, path, codec, routingGroups = 7)
      val layout = IndexLayout.open(spark, path)
      val (l1, groupOf) = layout.routing.getOrElse(
        fail(s"$tag: routing not persisted"))
      assert(l1.size === 7 && groupOf.keySet === cs.map(_._1).toSet, tag)
      assert(layout.routingMetricName === Some("l2"), tag)
      val routed = IndexLayout.searchRouted(layout, q, 10,
          l1Probes = l1.size, nProbes = 8, Metric.L2)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      val flat = IndexLayout.search(layout, q, 10, nProbes = 8, Metric.L2)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      assert(routed === flat, s"$tag: routed ≠ flat at exhaustive level-1")
      assert(routed.nonEmpty, tag)
      // serve(): the one entry point dispatches routed when asked
      // (l1Probes > 0) and flat otherwise — ≡ the manual calls for
      // every codec shape
      val servedRouted = IndexLayout.serve(layout, q, 10, nProbes = 8,
          Metric.L2, l1Probes = l1.size)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      assert(servedRouted === routed, s"$tag: serve(routed) ≠ searchRouted")
      val servedFlat = IndexLayout.serve(layout, q, 10, nProbes = 8,
          Metric.L2)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      assert(servedFlat === flat, s"$tag: serve(flat) ≠ search")
      // a layout with NO routing level serves flat even when the caller
      // asks for routing — serve() must not dispatch into a sys.error
      val bareLayout = layout.copy(routing = None)
      val servedBare = IndexLayout.serve(bareLayout, q, 10, nProbes = 8,
          Metric.L2, l1Probes = 3)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      assert(servedBare === flat, s"$tag: serve(bare) ≠ search")
    }
  }

  test("realistic l1Probes keep k results per query and a recall floor; " +
      "missing routing and metric mismatch fail loudly") {
    val cs = cents
    val clustered = KMeans.assign(emb, cs)
    val path = "/tmp/graft_idx_routing_real"
    IndexLayout.write(clustered, cs, path, IndexLayout.Uncompressed,
      routingGroups = 7)
    val layout = IndexLayout.open(spark, path)
    val k = 10
    val real = IndexLayout.searchRouted(layout, q, k, l1Probes = 3,
      nProbes = 8, Metric.L2)
    assert(real.groupBy("query_id").count()
      .filter(col("count") =!= k).count() === 0)
    val truth = FlatKnn.search(q, emb, k, Metric.L2)
      .select("query_id", "neighbor_id")
    val rec = real.select("query_id", "neighbor_id").intersect(truth)
      .count().toDouble / (k * q.count())
    assert(rec > 0.3, s"routed recall floor broken: $rec")
    // metric mismatch refused (the level was trained for L2)
    val e = intercept[IllegalArgumentException] {
      IndexLayout.searchRouted(layout, q, k, 3, 8, Metric.Cosine)
    }
    assert(e.getMessage.contains("trained for metric"))
    // a rewrite without routingGroups drops the routing (sidecar-gated)
    IndexLayout.write(clustered, cs, path, IndexLayout.Uncompressed)
    val bare = IndexLayout.open(spark, path)
    assert(bare.routing.isEmpty, "stale routing served after a rewrite")
    val e2 = intercept[RuntimeException] {
      IndexLayout.searchRouted(bare, q, k, 3, 8, Metric.L2)
    }
    assert(e2.getMessage.contains("routingGroups"))
  }
}
