package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, Vamana, VamanaKernel}
import graft.operators.VamanaKernel.BuildParams
import scala.collection.mutable.ArrayBuffer

class VamanaSpec extends SparkSpec {

  private def randVecs(n: Int, d: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rng.nextDouble()))
  }

  test("auto batch width: explicit wins, 64 below the threshold, 256 at it, " +
      "and the default-params graph equals the explicit-64 graph on small " +
      "shards") {
    val p = BuildParams()
    assert(p.batchSize == 0)
    assert(p.batchFor(1000) == 64)
    assert(p.batchFor(BuildParams.AutoWide - 1) == 64)
    assert(p.batchFor(BuildParams.AutoWide) == 256)
    assert(p.copy(batchSize = 32).batchFor(BuildParams.AutoWide) == 32)
    // every committed golden/certified artifact builds shards far below the
    // threshold, so the default change is bit-neutral there — prove it
    val vecs = randVecs(400, 16, seed = 3)
    val (adjAuto, eAuto) = VamanaKernel.build(vecs, p, Metric.L2)
    val (adj64, e64) = VamanaKernel.build(vecs, p.copy(batchSize = 64),
      Metric.L2)
    assert(eAuto == e64)
    assert(adjAuto.map(_.toSeq).toSeq === adj64.map(_.toSeq).toSeq)
  }

  test("robustPrune keeps ≤ maxDegree, drops self and duplicates, best first") {
    val vecs = randVecs(50, 4, seed = 7)
    val node = 0
    val pool = new ArrayBuffer[(Int, Double)]
    (0 until 50).foreach { s =>
      pool += ((s, Metric.L2.compute(vecs(node), vecs(s))))
    }
    pool += ((3, Metric.L2.compute(vecs(node), vecs(3)))) // duplicate
    val kept = VamanaKernel.robustPrune(node, pool, alpha = 1.2, maxDegree = 8,
      vecs, Metric.L2)
    assert(kept.length <= 8)
    assert(!kept.contains(node))
    assert(kept.distinct.length === kept.length)
    // first kept neighbor is the global nearest (never dominated)
    val nearest = (1 until 50).minBy(s => Metric.L2.compute(vecs(node), vecs(s)))
    assert(kept.head === nearest)
  }

  test("robustPrune with alpha=inf keeps exactly min(pool, maxDegree) nearest") {
    val vecs = randVecs(30, 4, seed = 11)
    val pool = new ArrayBuffer[(Int, Double)]
    (1 until 30).foreach { s =>
      pool += ((s, Metric.L2.compute(vecs(0), vecs(s))))
    }
    // huge alpha → domination threshold unreachable → plain nearest-k
    val kept = VamanaKernel.robustPrune(0, pool, alpha = 1e18, maxDegree = 5,
      vecs, Metric.L2)
    val nearest5 = (1 until 30).sortBy(s => Metric.L2.compute(vecs(0), vecs(s)))
      .take(5)
    assert(kept.toSeq === nearest5)
  }

  test("local build: degrees bounded, graph connected enough for exact recall " +
      "with full window") {
    val vecs = randVecs(200, 8, seed = 3)
    val (adj, entry) = VamanaKernel.build(vecs,
      BuildParams(maxDegree = 16, buildWindow = 32), Metric.L2)
    assert(adj.forall(_.length <= 16))
    assert(adj.count(_.nonEmpty) === 200)
    // with a window covering the whole set, greedy search from the medioid
    // must find the true nearest neighbor of every point (graph connectivity)
    var hits = 0
    (0 until 200).foreach { i =>
      val buf = VamanaKernel.greedySearch(adj, vecs, entry, vecs(i), 200,
        Metric.L2)
      if (buf.slots(0) == i) hits += 1
    }
    assert(hits === 200)
  }

  test("greedy search recall@10 ≥ 0.9 at window 40 on 500 random vectors") {
    val vecs = randVecs(500, 16, seed = 42)
    val (adj, entry) = VamanaKernel.build(vecs,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2)
    val queries = randVecs(20, 16, seed = 99)
    var inter = 0
    queries.foreach { q =>
      val approx = VamanaKernel.greedySearch(adj, vecs, entry, q, 40, Metric.L2)
      val approxIds = (0 until math.min(10, approx.n)).map(approx.slots).toSet
      val exact = vecs.indices.sortBy(i => Metric.L2.compute(q, vecs(i)))
        .take(10).toSet
      inter += approxIds.intersect(exact).size
    }
    val recall = inter.toDouble / (10 * queries.length)
    assert(recall >= 0.9, s"recall $recall")
  }

  test("sharded build+search on embeddings: deterministic and recall ≥ 0.8") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val queries = Tables.embeddingQueries(spark, sfDir)
    // 4 shards from the first 4 embedding vectors as seed centroids
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = graft.operators.KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2).cache()

    val truth = FlatKnn.search(queries, data, 10, Metric.L2)
    val nq = queries.count()
    def recallAt(nProbes: Int): Double = {
      val res = Vamana.searchSharded(queries, clustered, graph, cents, k = 10,
        searchWindow = 40, nProbes = nProbes, Metric.L2)
      val hits = res.select("query_id", "neighbor_id")
        .intersect(truth.select("query_id", "neighbor_id")).count()
      hits.toDouble / (10 * nq)
    }
    // probing every shard isolates graph quality from probe routing
    val fullRecall = recallAt(4)
    assert(fullRecall >= 0.9, s"full-probe recall $fullRecall")
    // partial probes lose only what routing misses
    val partialRecall = recallAt(2)
    assert(partialRecall >= 0.5 && partialRecall <= fullRecall,
      s"partial-probe recall $partialRecall vs $fullRecall")

    // determinism: rebuild produces the identical graph
    val graph2 = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2)
    assert(graph.orderBy("cluster_id", "id").collect().toSeq ===
      graph2.orderBy("cluster_id", "id").collect().toSeq)
  }

  test("connectivity patch: a triplicate-heavy membership strands nodes " +
      "without it, fully connects with it (cap held); no-op bit-identical " +
      "on a healthy membership") {
    def reach(adj: Array[Array[Int]], entry: Int): Int = {
      val reached = new java.util.BitSet(adj.length)
      var stack = List(entry); reached.set(entry)
      while (stack.nonEmpty) {
        val x = stack.head; stack = stack.tail
        adj(x).foreach { nb =>
          if (!reached.get(nb)) { reached.set(nb); stack = nb :: stack } }
      }
      reached.cardinality
    }
    val base = Tables.embeddingVectors(spark, sfDir)
      .filter(col("id") < 100).orderBy("id")
      .collect().map(_.getSeq[Double](1).toArray)
    // duplicate islands: the α-prune keeps duplicate pairs pointing at
    // each other and reverse-edge re-prunes can sever the inbound path
    val tricky = base ++ base.take(25) ++ base.take(25)
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val (offAdj, offEntry) = VamanaKernel.build(
      new VamanaKernel.DoubleStore(tricky),
      params.copy(patchStranded = false), Metric.L2, null)
    assert(reach(offAdj, offEntry) < tricky.length,
      "expected the unpatched build to strand nodes on this membership")
    val stats = new VamanaKernel.BuildStats
    val (onAdj, onEntry) = VamanaKernel.build(
      new VamanaKernel.DoubleStore(tricky), params, Metric.L2, stats)
    assert(reach(onAdj, onEntry) === tricky.length)
    assert(onAdj.map(_.length).max <= params.maxDegree)
    assert(stats.strandedPatched.sum > 0)
    // deterministic: rebuild is bit-identical
    val (onAdj2, _) = VamanaKernel.build(
      new VamanaKernel.DoubleStore(tricky), params, Metric.L2, null)
    assert(onAdj.map(_.toSeq).toSeq === onAdj2.map(_.toSeq).toSeq)
    // healthy membership: the patch never fires and the graph is
    // bit-identical to patchStranded = false (all certified artifacts —
    // q24/q25 shards, the golden grids — are in this regime)
    val s2 = new VamanaKernel.BuildStats
    val (hOn, _) = VamanaKernel.build(new VamanaKernel.DoubleStore(base),
      params, Metric.L2, s2)
    val (hOff, _) = VamanaKernel.build(new VamanaKernel.DoubleStore(base),
      params.copy(patchStranded = false), Metric.L2, null)
    assert(s2.strandedPatched.sum === 0)
    assert(hOn.map(_.toSeq).toSeq === hOff.map(_.toSeq).toSeq)
  }

  test("filtered search: full window ≡ exact-minus-excluded; excluded ids " +
      "never emitted at any window; keep=true ≡ unfiltered") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val queries = Tables.embeddingQueries(spark, sfDir)
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = graft.operators.KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2).cache()
    val keep = col("id") % 3 =!= 1
    // full window + all probes ⇒ the filtered walk must equal exact kNN
    // over the kept rows (traversal still crosses the excluded third)
    val full = Vamana.searchShardedFiltered(queries, clustered, graph, cents,
        k = 10, searchWindow = 1 << 14, nProbes = 4, Metric.L2, keep)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = FlatKnn.search(queries, data.filter(keep), 10, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === exact)
    // realistic window: approximate, but the contract "no excluded id is
    // ever emitted" is absolute
    val narrow = Vamana.searchShardedFiltered(queries, clustered, graph,
      cents, k = 10, searchWindow = 20, nProbes = 2, Metric.L2, keep)
    assert(narrow.filter(col("neighbor_id") % 3 === 1).count() === 0)
    assert(narrow.count() > 0)
    // degenerate predicate reproduces the unfiltered path bit-for-bit
    val unf = Vamana.searchSharded(queries, clustered, graph, cents, 10,
      searchWindow = 40, nProbes = 2, Metric.L2)
    val kept = Vamana.searchShardedFiltered(queries, clustered, graph, cents,
      10, searchWindow = 40, nProbes = 2, Metric.L2, lit(true))
    assert(unf.orderBy("query_id", "rnk").collect().toSeq ===
      kept.orderBy("query_id", "rnk").collect().toSeq)
    graph.unpersist()
  }

  test("searchPrepared over prepareShards equals searchSharded exactly " +
      "across windows (the repeated-search/calibration path)") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val queries = Tables.embeddingQueries(spark, sfDir)
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = graft.operators.KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2).cache()
    val pre = Vamana.prepareShards(clustered, graph)
    for (w <- Seq(10, 24, 64)) {
      val viaPrepared = Vamana.searchPrepared(queries, pre, cents, k = 10,
          searchWindow = w, nProbes = 2, Metric.L2)
        .orderBy("query_id", "rnk").collect().toSeq
      val viaSharded = Vamana.searchSharded(queries, clustered, graph, cents,
          k = 10, searchWindow = w, nProbes = 2, Metric.L2)
        .orderBy("query_id", "rnk").collect().toSeq
      assert(viaPrepared === viaSharded, s"window $w")
    }
    pre.unpersist()
    graph.unpersist()
  }

  test("similarity metrics (IP/cosine, descending) build and search " +
      "correctly: exhaustive window equals exact top-k") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
      .filter(col("id") < 150)
    val q = Tables.embeddingQueries(spark, sfDir).limit(5)
    for (m <- Seq(Metric.IP, Metric.Cosine)) {
      val graph = Vamana.buildSingle(data,
        BuildParams(maxDegree = 16, buildWindow = 32), m).cache()
      val clustered = data.withColumn("cluster_id", lit(0L))
      val cents = Seq(0L -> Seq.fill(64)(0.0))
      val res = Vamana.searchSharded(q, clustered, graph, cents, k = 10,
          searchWindow = 1 << 12, nProbes = 1, m)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      val exact = FlatKnn.search(q, data, 10, m)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      assert(res === exact, s"metric ${m.name}")
      // the mirrored α-rule keeps degrees bounded for similarity metrics too
      val stats = Vamana.degreeStats(graph).collect()(0)
      assert(stats.getAs[Long]("max_degree") <= 16, s"metric ${m.name}")
      graph.unpersist()
    }
  }

  test("degreeStats reports bounded max degree") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
      .filter(col("id") < 100)
    val graph = Vamana.buildSingle(data,
      BuildParams(maxDegree = 12, buildWindow = 24), Metric.L2)
    val stats = Vamana.degreeStats(graph).collect()
    assert(stats.length === 1)
    assert(stats(0).getAs[Long]("max_degree") <= 12)
    assert(stats(0).getAs[Long]("nodes") === 100)
  }
}
