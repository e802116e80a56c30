package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.operators.{FlatKnn, IndexLayout, Inverted, LeanVec, MaxSim, Pq, Vamana, VamanaKernel}
import graft.operators.VamanaKernel.BuildParams
import graft.sources.SyntheticData

/** Golden-recall parity grids (BASELINE.md), mirroring the reference's
  * committed machine-readable goldens (`vamana_reference.toml`,
  * `ivf_reference.toml`, `inverted_reference.toml`): (build config, search
  * config) → recall rows over a deterministic synthetic dataset.
  *
  * The flagship experiment reproduces `examples/python/example_vamana.py:
  * 33-46,112-130` — 10k × 128-d synthetic vectors, Vamana degree 64, window
  * 128, α=1.2, L2, 100 held-out queries, recall@10 at windows 10/20/30/40 —
  * whose published goldens are 0.5664/0.7397/0.8288/0.8837 (±0.05).
  *
  * Everything here is exactly deterministic: Murmur3-hashed data, no RNG
  * state, no `sample()` (whose output depends on partitioning), exact
  * distributed searches. `main` prints one JSON line per grid row AND writes
  * the full grid to `goldens/golden_grid.json` (override with
  * SPARK_GRAFT_GOLDEN_OUT) — the committed artifact that GoldenSpec
  * regression-pins.
  */
object GoldenRecall {

  case class Row(family: String, config: String, param: String, value: Int,
                 recall: Double, buildSec: Double)

  /** Dataset + queries + exact truth for one (n, dims, nq) shape. */
  def dataset(spark: SparkSession, n: Long, dims: Int, nq: Int, k: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val data = SyntheticData.generateMixed(spark, n, dims)
    val queries = SyntheticData.generateMixed(spark, n + nq, dims)
      .filter(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val truth = FlatKnn.search(queries, data, k, Metric.L2)
      .select("query_id", "neighbor_id").cache()
    truth.count()
    (data, queries, truth)
  }

  private def recallOf(res: DataFrame, truth: DataFrame, k: Int, nq: Int)
      : Double =
    res.select("query_id", "neighbor_id").intersect(truth).count()
      .toDouble / (k.toLong * nq)

  /** Vamana grid: one single-shard build per config, recall per window. */
  def vamanaGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                 dims: Int, k: Int, nq: Int,
                 configs: Seq[(String, BuildParams)], windows: Seq[Int],
                 metric: Metric = Metric.L2): Seq[Row] = {
    val clustered = data.withColumn("cluster_id", lit(0L))
    val cents = Seq(0L -> Seq.fill(dims)(0.5))
    configs.flatMap { case (label, params) =>
      val t0 = System.nanoTime()
      val graph = Vamana.buildSingle(data, params, metric).cache()
      graph.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val rows = windows.map { w =>
        val res = Vamana.searchSharded(queries, clustered, graph, cents, k,
          searchWindow = w, nProbes = 1, metric)
        Row("vamana", label, "window", w, recallOf(res, truth, k, nq),
          buildSec)
      }
      graph.unpersist()
      rows
    }
  }

  /** IVF grid: deterministic seed subset (id-striped, partitioning-proof),
    * Lloyd-trained centroids, recall per n_probes. */
  def ivfGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
              dims: Int, k: Int, nq: Int, n: Long, clusters: Int,
              probes: Seq[Int]): Seq[Row] = {
    val seed0 = data.filter(col("id") % (n / clusters) === 0).limit(clusters)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val t0 = System.nanoTime()
    val train = data.filter(col("id") % 10 === 1) // fixed 10% training stripe
    val cents = graft.operators.KMeans.lloyd(train, seed0, iters = 3, dims)
    val clustered = graft.operators.KMeans.assign(data, cents).cache()
    clustered.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val rows = probes.map { p =>
      val res = graft.operators.IvfIndex.search(queries, clustered, cents, k,
        p, Metric.L2)
      Row("ivf", s"c$clusters", "n_probes", p, recallOf(res, truth, k, nq),
        buildSec)
    }
    clustered.unpersist()
    rows
  }

  /** Inverted (two-level) grid: id-striped leaders, recall per n_leaders at
    * fixed ε — the `inverted_reference.toml` shape. */
  def invertedGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                   k: Int, nq: Int, n: Long, leaderCount: Int, eps: Double,
                   nLeaders: Seq[Int]): Seq[Row] = {
    val t0 = System.nanoTime()
    val leaders = Inverted.pickLeaders(data,
      col("id") % (n / leaderCount) === 3)
    val clustered = Inverted.cluster(data, leaders).cache()
    clustered.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val rows = nLeaders.map { nl =>
      val res = Inverted.search(queries, clustered, leaders, k, nl, eps,
        Metric.L2)
      Row("inverted", s"l$leaderCount-eps$eps", "n_leaders", nl,
        recallOf(res, truth, k, nq), buildSec)
    }
    clustered.unpersist()
    rows
  }

  /** Routed-search grid (reference analog: the per-config golden grids in
    * `data/test_dataset/reference/ivf_reference.toml`): the SAME Lloyd
    * clustering as [[ivfGrid]], searched through the two-level routing
    * path per (l1Probes × nProbes) — pinned so a routing change cannot
    * silently trade recall at realistic l1Probes. Config
    * `c<clusters>-g<groups>-l<l1Probes>`; at `l1Probes = nGroups`
    * (exhaustive level-1) each row must equal the flat-routing `ivf`
    * family at the same probes (GoldenSpec asserts the identity). */
  def routedGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                 dims: Int, k: Int, nq: Int, n: Long, clusters: Int,
                 nGroups: Int, l1Probes: Seq[Int], probes: Seq[Int])
      : Seq[Row] = {
    val seed0 = data.filter(col("id") % (n / clusters) === 0).limit(clusters)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val t0 = System.nanoTime()
    val train = data.filter(col("id") % 10 === 1)
    val cents = graft.operators.KMeans.lloyd(train, seed0, iters = 3, dims)
    val clustered = graft.operators.KMeans.assign(data, cents).cache()
    clustered.count()
    val (l1, groupOf) = Vamana.trainRoutingLevel(cents, nGroups)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val rows = for (lp <- l1Probes; p <- probes) yield {
      val res = graft.operators.IvfIndex.searchHierarchical(queries,
        clustered, cents, l1, groupOf, k, lp, p, Metric.L2)
      Row("ivf_routed", s"c$clusters-g$nGroups-l$lp", "n_probes", p,
        recallOf(res, truth, k, nq), buildSec)
    }
    clustered.unpersist()
    rows
  }

  /** Stored-layout routed grid per CODEC (the IVFADC/SQ/LVQ twin of
    * [[routedGrid]]): the same Lloyd clustering persisted through
    * [[graft.operators.IndexLayout.write]] with resident codes AND a
    * routing level, then served via `searchRouted` at each l1Probes —
    * pinned so the codec+routing interaction cannot silently trade
    * recall (IndexRoutingSpec pins only the exhaustive-level-1
    * identity; these rows pin the realistic-probe operating points).
    * Config `c<clusters>-g<groups>-l<l1Probes>`; recall judged against
    * the uncompressed exact truth like every compressed family. */
  def storedRoutedGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                       dims: Int, k: Int, nq: Int, n: Long, clusters: Int,
                       nGroups: Int, l1Probes: Seq[Int], nProbes: Int)
      : Seq[Row] = {
    val spark = data.sparkSession
    val seed0 = data.filter(col("id") % (n / clusters) === 0).limit(clusters)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val train = data.filter(col("id") % 10 === 1)
    val cents = graft.operators.KMeans.lloyd(train, seed0, iters = 3, dims)
    val clustered = graft.operators.KMeans.assign(data, cents).cache()
    clustered.count()
    // IVFADC codebooks train on RESIDUALS (vec − probe centroid) — the
    // space the codes actually live in (TPAMI'11 §IV); raw-row training
    // would mis-span it and depress the whole family's recall
    val residTrain = {
      import spark.implicits._
      graft.operators.KMeans.assign(
          data.filter(col("id") % 40 === 2), cents)
        .join(broadcast(cents.toDF("cluster_id", "cvec")), "cluster_id")
        .select(col("id"),
          zip_with(col("vec"), col("cvec"), (a, b) => a - b).as("vec"))
    }
    val codecs: Seq[(String, IndexLayout.Codec)] = Seq(
      ("ivfadc_routed", IndexLayout.PqResC(graft.operators.Pq.trainLloyd(
        residTrain, m = 16, k = 16, dims, iters = 2))),
      ("ivf_sq_routed", IndexLayout.Sq(
        graft.operators.ScalarQuant.train(data))),
      ("ivf_lvq_routed", IndexLayout.LvqC(graft.operators.Lvq.Params(
        graft.operators.Lvq.trainMean(data)))))
    val rows = codecs.flatMap { case (family, codec) =>
      val path = s"/tmp/graft_golden_stored_$family"
      val t0 = System.nanoTime()
      IndexLayout.write(clustered, cents, path, codec,
        routingGroups = nGroups)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val layout = IndexLayout.open(spark, path)
      l1Probes.map { lp =>
        val res = IndexLayout.searchRouted(layout, queries, k,
          l1Probes = lp, nProbes = nProbes, Metric.L2)
        Row(family, s"c$clusters-g$nGroups-l$lp", "n_probes", nProbes,
          recallOf(res, truth, k, nq), buildSec)
      }
    }
    clustered.unpersist()
    rows
  }

  /** IVF∘LVQ grid (the q58 composition): the same clustering as [[ivfGrid]]
    * with resident LVQ code columns, coarse-scanned on level-1 codes and
    * re-ranked on the two-level reconstruction; recall judged against the
    * UNCOMPRESSED truth — the reference's compressed-recall golden shape
    * composed with cluster probing. */
  def ivfLvqGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                 dims: Int, k: Int, nq: Int, n: Long, clusters: Int,
                 probes: Seq[Int], kReorder: Int = 3): Seq[Row] = {
    val seed0 = data.filter(col("id") % (n / clusters) === 0).limit(clusters)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val t0 = System.nanoTime()
    val train = data.filter(col("id") % 10 === 1)
    val cents = graft.operators.KMeans.lloyd(train, seed0, iters = 3, dims)
    val lvqP = graft.operators.Lvq.Params(
      graft.operators.Lvq.trainMean(data))
    val clustered = graft.operators.IvfIndex.withResidentLvq(
      graft.operators.KMeans.assign(data, cents), lvqP).cache()
    clustered.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val rows = probes.map { p =>
      val res = graft.operators.IvfIndex.searchWithLvqReorder(queries,
        clustered, cents, lvqP, k, p, kReorder)
      Row("ivf_lvq", s"c${clusters}_lvq8", "n_probes", p,
        recallOf(res, truth, k, nq), buildSec)
    }
    clustered.unpersist()
    rows
  }

  /** Capacity-split calibration golden (the reference's split-buffer tuning
    * axis, index/vamana/calibrate.h:40-77): phase 1 finds the minimal tied
    * window reaching `target`, phase 2 shrinks the expansion window at
    * fixed capacity — two rows pinning the calibrated (window, capacity)
    * and the recall they achieve, over the flagship single-shard build.
    * Searches run on a [[Vamana.prepareShards]] dataset, so the ~2·log₂
    * sweep pays one shuffle total. */
  def calibrationRows(data: DataFrame, queries: DataFrame, truth: DataFrame,
                      dims: Int, k: Int, target: Double): Seq[Row] = {
    val clustered = data.withColumn("cluster_id", lit(0L))
    val cents = Seq(0L -> Seq.fill(dims)(0.5))
    val t0 = System.nanoTime()
    val graph = Vamana.buildSingle(data,
      BuildParams(maxDegree = 64, buildWindow = 128, alpha = 1.2),
      Metric.L2).cache()
    graph.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val prepared = Vamana.prepareShards(clustered, graph)
    val (w, cap, rec) = graft.operators.Calibrate.calibrateWindowAndCapacity(
      (wi, c) => Vamana.searchPrepared(queries, prepared, cents, k, wi, 1,
        Metric.L2, c),
      truth, k, target, minWindow = k, maxWindow = 128)
    prepared.unpersist()
    graph.unpersist()
    val config = s"deg64_w128_t$target"
    Seq(Row("calibration", config, "window", w, rec, buildSec),
      Row("calibration", config, "capacity", cap, rec, buildSec))
  }

  def rowJson(r: Row): String =
    s"""{"family":"${r.family}","config":"${r.config}",""" +
      s""""param":"${r.param}","value":${r.value},"recall":${r.recall},""" +
      s""""build_sec":${r.buildSec}}"""

  /** LeanVec grid: one PCA training pass at `rDims`, recall per reorder
    * window (the quality axis of the two-pass search — coarse keeps
    * k_reorder·k candidates, full precision re-ranks). The `leanvec_ood`
    * twin runs the query-aware two-matrix training on the same data and
    * must track the self-query family (in-distribution queries). */
  def leanvecGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                  k: Int, nq: Int, rDims: Int, kReorders: Seq[Int])
      : Seq[Row] = {
    val t0 = System.nanoTime()
    val m = LeanVec.train(data, rDims)
    val rd = LeanVec.transform(data, m).cache()
    rd.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val rq = LeanVec.transform(queries, m, idCol = "query_id",
      vecCol = "qvec", outCol = "qvec")
    val plain = kReorders.map { kr =>
      val res = LeanVec.searchPrepared(rq, rd, queries, data, k, kr)
      Row("leanvec", s"r$rDims", "k_reorder", kr,
        recallOf(res, truth, k, nq), buildSec)
    }
    rd.unpersist()
    val t1 = System.nanoTime()
    val mo = LeanVec.trainOod(data, queries, rDims)
    val ad = LeanVec.augmentOodData(data, mo).cache()
    ad.count()
    val buildOod = (System.nanoTime() - t1) / 1e9
    val aq = LeanVec.augmentOodQueries(queries, mo)
    val ood = kReorders.map { kr =>
      val res = LeanVec.searchOodPrepared(aq, ad, queries, data, k, kr)
      Row("leanvec_ood", s"r$rDims", "k_reorder", kr,
        recallOf(res, truth, k, nq), buildOod)
    }
    ad.unpersist()
    // Same PCA subspace through the norm-carrying augmented surrogate
    // (A = B = P): isolates how much of leanvec_ood's win over leanvec is
    // the EXACT ‖x̃‖² term in the coarse score (big on flat-spectrum data,
    // where the discarded-subspace norm dominates L2) vs the two-matrix
    // training itself.
    val mpa = LeanVec.OodModel(m.mean, m.proj, m.proj, Array.empty)
    val pd = LeanVec.augmentOodData(data, mpa).cache()
    pd.count()
    val pq = LeanVec.augmentOodQueries(queries, mpa)
    val pcaAug = kReorders.map { kr =>
      val res = LeanVec.searchOodPrepared(pq, pd, queries, data, k, kr)
      Row("leanvec_pca_aug", s"r$rDims", "k_reorder", kr,
        recallOf(res, truth, k, nq), buildSec)
    }
    pd.unpersist()
    plain ++ ood ++ pcaAug
  }

  /** PQ families, recall judged against the UNCOMPRESSED exact truth (the
    * compressed-golden shape, like ivf_lvq):
    *  - `pq_adc`: flat ADC recall per subspace count m — the compression
    *    dial (128-d float64 → m bytes/vector at 16-centroid codebooks);
    *  - `pq_walk`: DiskANN-style codes-only graph walk on the flagship
    *    deg64/w128 build, recall per search window;
    *  - `pq_walk_rerank`: the two-pass serving dial — exact rerank of the
    *    walk's ADC top k_reorder·k, window = k_reorder·k. The rerank must
    *    dominate the walk-only recall at equal windows (GoldenSpec pins
    *    this in addition to the values). */
  def pqGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
             dims: Int, k: Int, nq: Int, ms: Seq[Int], kCode: Int,
             kReorders: Seq[Int]): Seq[Row] = {
    val m0 = ms.max
    var pServe: Pq.Params = null
    val adcRows = ms.map { m =>
      val t0 = System.nanoTime()
      val p = Pq.trainLloyd(data, m, kCode, dims, iters = 2)
      if (m == m0) pServe = p
      val codes = Pq.encode(data, p).cache()
      codes.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val res = Pq.searchAdc(queries, codes, p, k)
      val row = Row("pq_adc", s"k$kCode", "m", m,
        recallOf(res, truth, k, nq), buildSec)
      codes.unpersist()
      row
    }
    val clustered = data.withColumn("cluster_id", lit(0L))
    val cents = Seq(0L -> Seq.fill(dims)(0.5))
    val t0 = System.nanoTime()
    val graph = Vamana.buildSingle(data,
      BuildParams(maxDegree = 64, buildWindow = 128, alpha = 1.2),
      Metric.L2).cache()
    graph.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val codes = Pq.encodeClustered(clustered, pServe).cache()
    codes.count()
    val walkRows = Seq(10, 20, 30, 40).map { w =>
      val res = Vamana.searchShardedAdc(queries, codes, graph, cents,
        pServe, k, searchWindow = w, nProbes = 1)
      Row("pq_walk", s"deg64_w128_m$m0", "window", w,
        recallOf(res, truth, k, nq), buildSec)
    }
    val rerankRows = kReorders.map { kr =>
      val res = Vamana.searchShardedAdcRerank(queries, codes, graph, cents,
        pServe, clustered, k, kr, searchWindow = kr * k, nProbes = 1)
      Row("pq_walk_rerank", s"deg64_w128_m$m0", "k_reorder", kr,
        recallOf(res, truth, k, nq), buildSec)
    }
    codes.unpersist(); graph.unpersist()
    adcRows ++ walkRows ++ rerankRows
  }

  /** Binary (sign-bit) families: `binary` pins Hamming-only recall@k (one
    * row, the 64×-compression floor) and `binary_rerank` the exact-rerank
    * dial per k_reorder — recall vs the uncompressed truth, like every
    * compressed family. */
  def binaryGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
                 k: Int, nq: Int, kReorders: Seq[Int]): Seq[Row] = {
    import graft.operators.BinaryQuant
    val t0 = System.nanoTime()
    val p = BinaryQuant.train(data)
    val codes = BinaryQuant.encode(data, p).cache()
    codes.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val ham = Row("binary", "mean_thresh", "k", k,
      recallOf(BinaryQuant.searchHamming(queries, codes, p, k), truth, k,
        nq), buildSec)
    val rr = kReorders.map { kr =>
      Row("binary_rerank", "mean_thresh", "k_reorder", kr,
        recallOf(BinaryQuant.searchHammingRerank(queries, codes, p, data,
          k, kr), truth, k, nq), buildSec)
    }
    codes.unpersist()
    ham +: rr
  }

  /** Matryoshka truncated-search family: recall per k_reorder at a fixed
    * prefix width — the training-free twin of the `leanvec` family (same
    * two-pass contract, truncation instead of projection; on
    * uniform-random data the first r dims ARE a random projection, so the
    * gap to trained PCA quantifies what training buys). */
  def mrlGrid(data: DataFrame, queries: DataFrame, truth: DataFrame,
              k: Int, nq: Int, rDims: Int, kReorders: Seq[Int]): Seq[Row] =
    kReorders.map { kr =>
      val res = LeanVec.searchTruncated(queries, data, k, rDims, kr)
      Row("mrl", s"r$rDims", "k_reorder", kr, recallOf(res, truth, k, nq),
        0.0)
    }

  /** MaxSim two-stage grid: recall@k of the pooled-prefilter +
    * exact-rerank path against EXHAUSTIVE MaxSim over 4-token bags of the
    * same dataset, per candidate width — the quality/cost dial of q133's
    * composition, pinned like every other approximate family. */
  def maxSimGrid(data: DataFrame, dims: Int, k: Int, cands: Seq[Int])
      : Seq[Row] = {
    val bags = MaxSim.groupTokens(data.select("id", "vec"), 4).cache()
    val queries = bags.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"), col("dtok").as("qtok"),
        col("dvec").as("qvec"))
    val exact = MaxSim.topK(queries, bags, k, Metric.Cosine)
      .select(col("query_id"), col("doc_id")).cache()
    val nq = exact.select("query_id").distinct().count()
    val rows = cands.map { c =>
      val two = MaxSim
        .topKTwoStage(queries, bags, k, c, dims, Metric.Cosine)
        .select(col("query_id"), col("doc_id"))
      val recall = two.intersect(exact).count().toDouble / (k * nq)
      Row("maxsim_twostage", "bag4_cosine", "candidates", c, recall, 0.0)
    }
    bags.unpersist(); exact.unpersist()
    rows
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val out = sys.env.getOrElse("SPARK_GRAFT_GOLDEN_OUT",
      "goldens/golden_grid.json")
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
    val (data, queries, truth) = dataset(spark, n, dims, nq, k)

    // LVQ-compressed twin of the flagship config: build + search over the
    // level-1 reconstruction (full precision never read), recall judged
    // against the UNCOMPRESSED truth — the reference's compressed-recall
    // golden shape (example_vamana.py:47-61); must stay within ±0.05 of the
    // uncompressed grid at equal windows.
    val lvqP = graft.operators.Lvq.Params(
      graft.operators.Lvq.trainMean(data))
    val dec1 = graft.operators.Lvq.decode(
      graft.operators.Lvq.encode(data, lvqP), lvqP, twoLevel = false).cache()
    dec1.count()

    val rows =
      vamanaGrid(data, queries, truth, dims, k, nq,
        Seq(
          ("deg64_w128", BuildParams(maxDegree = 64, buildWindow = 128,
            alpha = 1.2)),
          ("deg32_w64", BuildParams(maxDegree = 32, buildWindow = 64,
            alpha = 1.2, pruneTo = 28))),
        windows = Seq(10, 20, 30, 40)) ++
      vamanaGrid(dec1, queries, truth, dims, k, nq,
        Seq(("deg64_w128_lvq8", BuildParams(maxDegree = 64,
          buildWindow = 128, alpha = 1.2))),
        windows = Seq(10, 20, 30, 40))
        .map(r => r.copy(family = "vamana_lvq")) ++
      // SIMD-kernel twin of the goldens config: graph built AND searched
      // with the Vector API fold. Last-ulp distance differences can flip
      // individual prune decisions, so the graph is not bit-identical to
      // the scalar one — this family pins that its RECALL is (the
      // production-safety evidence for Metric.simd at build time).
      vamanaGrid(data, queries, truth, dims, k, nq,
        Seq(("deg32_w64_simd", BuildParams(maxDegree = 32, buildWindow = 64,
          alpha = 1.2, pruneTo = 28))),
        windows = Seq(10, 20, 30, 40), metric = Metric.simd(Metric.L2))
        .map(r => r.copy(family = "vamana_simd")) ++
      ivfGrid(data, queries, truth, dims, k, nq, n, clusters = 100,
        probes = Seq(1, 2, 4, 8, 16)) ++
      ivfLvqGrid(data, queries, truth, dims, k, nq, n, clusters = 100,
        probes = Seq(1, 2, 4, 8, 16)) ++
      routedGrid(data, queries, truth, dims, k, nq, n, clusters = 100,
        nGroups = 10, l1Probes = Seq(2, 4, 10),
        probes = Seq(4, 8, 16)) ++
      storedRoutedGrid(data, queries, truth, dims, k, nq, n, clusters = 100,
        nGroups = 10, l1Probes = Seq(2, 4, 10), nProbes = 8) ++
      invertedGrid(data, queries, truth, k, nq, n, leaderCount = 100,
        eps = 1.2, nLeaders = Seq(1, 2, 4, 8)) ++
      leanvecGrid(data, queries, truth, k, nq, rDims = 32,
        kReorders = Seq(2, 4, 8, 16)) ++
      calibrationRows(data, queries, truth, dims, k, target = 0.85) ++
      maxSimGrid(data, dims, k, cands = Seq(10, 20, 50, 100)) ++
      pqGrid(data, queries, truth, dims, k, nq, ms = Seq(8, 16, 32),
        kCode = 16, kReorders = Seq(1, 2, 4, 8)) ++
      binaryGrid(data, queries, truth, k, nq,
        kReorders = Seq(1, 2, 4, 8, 16)) ++
      mrlGrid(data, queries, truth, k, nq, rDims = 32,
        kReorders = Seq(2, 4, 8, 16))

    rows.foreach(r => println(rowJson(r)))
    val json = rows.map(rowJson).mkString(
      s"""{"n":$n,"dims":$dims,"nq":$nq,"k":$k,"rows":[\n""", ",\n", "\n]}\n")
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(out), json)
    println(s"""{"golden_grid_written":"$out","rows":${rows.length}}""")
    spark.stop()
  }
}
