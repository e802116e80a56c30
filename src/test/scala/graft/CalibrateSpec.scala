package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{Calibrate, FlatKnn, KMeans, Vamana, VamanaKernel}
import graft.operators.VamanaKernel.BuildParams

/** Split search-buffer (capacity > window) semantics + the two-axis
  * calibration (reference calibrate.h:40-77 / search_buffer.h:39-77). */
class CalibrateSpec extends SparkSpec {

  private def randVecs(n: Int, d: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rng.nextDouble()))
  }

  test("capacity == window reproduces the tied buffer exactly; " +
      "capacity > window only improves the retained top-k") {
    val vecs = randVecs(400, 16, seed = 5)
    val (adj, entry) = VamanaKernel.build(vecs,
      BuildParams(maxDegree = 16, buildWindow = 32), Metric.L2)
    val queries = randVecs(25, 16, seed = 31)
    val k = 10
    var tiedHits = 0
    var splitHits = 0
    queries.foreach { q =>
      val exact = vecs.indices.sortBy(i => Metric.L2.compute(q, vecs(i)))
        .take(k).toSet
      val tied = VamanaKernel.greedySearch(adj, vecs, entry, q, 12, Metric.L2)
      val tiedExplicit = VamanaKernel.greedySearch(adj, vecs, entry, q, 12,
        Metric.L2, capacity = 12)
      assert((0 until tied.n).map(i => (tied.slots(i), tied.dists(i))) ===
        (0 until tiedExplicit.n).map(i =>
          (tiedExplicit.slots(i), tiedExplicit.dists(i))))
      val split = VamanaKernel.greedySearch(adj, vecs, entry, q, 12,
        Metric.L2, capacity = 48)
      tiedHits += (0 until math.min(k, tied.n)).map(tied.slots)
        .count(exact)
      splitHits += (0 until math.min(k, split.n)).map(split.slots)
        .count(exact)
    }
    assert(splitHits >= tiedHits,
      s"split buffer lost recall: $splitHits < $tiedHits")
  }

  test("two-axis calibration: shrunken expansion window at held capacity " +
      "still meets the recall target") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2).cache()
    val k = 10
    val truth = FlatKnn.search(q, data, k, Metric.L2)
      .select("query_id", "neighbor_id").cache()
    val target = 0.9
    def searchAt(w: Int, cap: Int) =
      Vamana.searchSharded(q, clustered, graph, cents, k, w,
        nProbes = 4, Metric.L2, searchCapacity = cap)
    val (w, cap, rec) = Calibrate.calibrateWindowAndCapacity(searchAt,
      truth, k, target, minWindow = k, maxWindow = 128)
    assert(rec >= target, s"recall $rec below $target")
    assert(w <= cap, s"window $w should not exceed capacity $cap")
    // the split run at the calibrated point reproduces the recall
    val check = searchAt(w, cap).select("query_id", "neighbor_id")
      .intersect(truth).count().toDouble / (k * q.count())
    assert(math.abs(check - rec) < 1e-9)
  }

  test("calibrateReorder finds the minimal rerank width hitting the " +
      "target on the binary two-pass path") {
    import graft.operators.BinaryQuant
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val queries = Tables.embeddingQueries(spark, sfDir)
    val truth = FlatKnn.search(queries, data, 10, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
    val p = BinaryQuant.train(data)
    val codes = BinaryQuant.encode(data, p).cache()
    codes.count()
    def searchAt(kr: Int) =
      BinaryQuant.searchHammingRerank(queries, codes, p, data, 10, kr)
    // a reachable target: recall at the max dial
    val nq = queries.count()
    def recallOf(kr: Int): Double =
      searchAt(kr).select("query_id", "neighbor_id")
        .intersect(truth.select("query_id", "neighbor_id")).count()
        .toDouble / (10 * nq)
    val rMax = recallOf(16)
    val target = rMax * 0.8
    val (kr, rec) = Calibrate.calibrateReorder(searchAt, truth, 10,
      target, maxReorder = 16)
    assert(rec >= target)
    assert(kr >= 1 && kr <= 16)
    // minimality: one step below the calibrated dial misses the target
    if (kr > 1) assert(recallOf(kr - 1) < target,
      s"kr ${kr - 1} already reaches $target")
    // unreachable target reports the max dial
    val (krU, recU) = Calibrate.calibrateReorder(searchAt, truth, 10,
      targetRecall = 1.01, maxReorder = 16)
    assert(krU === 16 && recU === rMax)
    codes.unpersist()
  }

  test("VamanaVectorIndex.calibrate routes through the prepared layout " +
      "and finds the same window as the per-probe shard-join closure") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val idx = VamanaVectorIndex.build(data, cents,
      BuildParams(maxDegree = 24, buildWindow = 48), searchWindow = 10,
      nProbes = 4, Metric.L2)
    val k = 10
    val truth = FlatKnn.search(q, data, k, Metric.L2)
      .select("query_id", "neighbor_id").cache()
    val target = 0.9
    val (tuned, rec) = idx.calibrate(q, truth, k, target, maxWindow = 128)
    assert(rec >= target, s"recall $rec below $target")
    // same dial as calibrating with per-probe searchSharded closures
    // (searchPrepared ≡ searchSharded bit-for-bit, so the binary search
    // takes identical branches)
    val (wTwin, recTwin) = Calibrate.calibrateWindow(
      w => Vamana.searchSharded(q, idx.clustered, idx.graph, cents, k,
        math.max(w, k), 4, Metric.L2),
      truth, k, target, k, 128)
    assert(tuned.searchWindow === wTwin)
    assert(rec === recTwin)
    // the re-dialed index serves at the calibrated recall
    val nq = q.count()
    val servedRec = tuned.search(q, k).select("query_id", "neighbor_id")
      .intersect(truth).count().toDouble / (k * nq)
    assert(math.abs(servedRec - rec) < 1e-9)
    truth.unpersist()
  }

  test("calibrateWindowWith evaluates each dial AT MOST ONCE (a full " +
      "evaluation is a search + recall job chain — r16's memo win must " +
      "not regress): binary-search trajectory incl. the max-dial target " +
      "eval never repeats a window") {
    val evals = scala.collection.mutable.Map.empty[Int, Int]
    def recallAt(w: Int): Double = {
      evals.updateWith(w) { c => Some(c.getOrElse(0) + 1) }
      math.min(1.0, 0.1 + 0.9 * w / 64.0) // monotone in the dial
    }
    val (w, rec) = Calibrate.calibrateWindowWith(recallAt,
      targetRecall = 0.8, minWindow = 1, maxWindow = 64)
    assert(rec >= 0.8 && w >= 1 && w <= 64)
    assert(evals.values.forall(_ == 1),
      s"every dial must be evaluated exactly once, got $evals")
    // unreachable target: exactly one evaluation (the max dial), not a
    // futile descent
    evals.clear()
    val (wU, _) = Calibrate.calibrateWindowWith(recallAt,
      targetRecall = 1.01, minWindow = 1, maxWindow = 64)
    assert(wU === 64 && evals.size === 1 && evals(64) === 1)
  }
}
