package graft

import java.nio.file.{Files, Paths}
import graft.operators.VamanaKernel.BuildParams

/** Regression pin against the committed golden-grid artifact
  * (goldens/golden_grid.json, written by `runMain graft.GoldenRecall`):
  * re-runs a sampled subset of the grid on the same deterministic dataset
  * and requires the recalls to reproduce within ±0.01. The grid is exactly
  * deterministic (hashed synthetic data, no RNG, exact searches), so any
  * drift means an algorithmic change — regenerate the artifact deliberately
  * when that is intended. */
class GoldenSpec extends SparkSpec {

  private val N = 10000L
  private val Dims = 128
  private val Nq = 100
  private val K = 10

  private lazy val grid: String = new String(
    Files.readAllBytes(Paths.get("goldens/golden_grid.json")))

  private def pinned(family: String, config: String, value: Int): Double = {
    val re = ("\\{\"family\":\"" + family + "\",\"config\":\"" + config +
      "\",\"param\":\"[^\"]+\",\"value\":" + value +
      ",\"recall\":([0-9.eE+-]+)").r
    re.findFirstMatchIn(grid).map(_.group(1).toDouble)
      .getOrElse(fail(s"no golden row for $family/$config/$value"))
  }

  test("sampled golden-grid rows reproduce the committed artifact (±0.01)") {
    val (data, queries, truth) =
      GoldenRecall.dataset(spark, N, Dims, Nq, K)
    val vam = GoldenRecall.vamanaGrid(data, queries, truth, Dims, K, Nq,
      Seq(("deg32_w64", BuildParams(maxDegree = 32, buildWindow = 64,
        alpha = 1.2, pruneTo = 28))), windows = Seq(10, 40))
    vam.foreach { r =>
      val p = pinned("vamana", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"vamana ${r.config} w${r.value}: ${r.recall} vs pinned $p")
    }
    val ivf = GoldenRecall.ivfGrid(data, queries, truth, Dims, K, Nq, N,
      clusters = 100, probes = Seq(4))
    ivf.foreach { r =>
      val p = pinned("ivf", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"ivf p${r.value}: ${r.recall} vs pinned $p")
    }
    val inv = GoldenRecall.invertedGrid(data, queries, truth, K, Nq, N,
      leaderCount = 100, eps = 1.2, nLeaders = Seq(2))
    inv.foreach { r =>
      val p = pinned("inverted", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"inverted nl${r.value}: ${r.recall} vs pinned $p")
    }
    val lvq = GoldenRecall.ivfLvqGrid(data, queries, truth, Dims, K, Nq, N,
      clusters = 100, probes = Seq(4))
    lvq.foreach { r =>
      val p = pinned("ivf_lvq", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"ivf_lvq p${r.value}: ${r.recall} vs pinned $p")
      // compressed-vs-uncompressed parity at the same probes (the
      // reference's compressed-golden criterion, ±0.05)
      val unc = pinned("ivf", "c100", r.value)
      assert(math.abs(r.recall - unc) <= 0.05,
        s"ivf_lvq p${r.value} drifted from uncompressed: ${r.recall} vs $unc")
    }
    // LeanVec two-pass families at one reorder window: plain PCA coarse,
    // OOD two-matrix coarse, and the PCA+norm-augmented control
    val lv = GoldenRecall.leanvecGrid(data, queries, truth, K, Nq,
      rDims = 32, kReorders = Seq(8))
    lv.foreach { r =>
      val p = pinned(r.family, r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"${r.family} kr${r.value}: ${r.recall} vs pinned $p")
    }
    // routed-search family: a sampled realistic row reproduces, and the
    // exhaustive-level-1 rows equal the flat-routing ivf family — the
    // identity that makes the routed grid an anchored pin, not a
    // free-floating number
    val routed = GoldenRecall.routedGrid(data, queries, truth, Dims, K, Nq,
      N, clusters = 100, nGroups = 10, l1Probes = Seq(2), probes = Seq(8))
    routed.foreach { r =>
      val p = pinned("ivf_routed", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"ivf_routed ${r.config} p${r.value}: ${r.recall} vs pinned $p")
    }
    for (p <- Seq(4, 8, 16)) {
      val exh = pinned("ivf_routed", "c100-g10-l10", p)
      val flat = pinned("ivf", "c100", p)
      assert(exh === flat,
        s"exhaustive-l1 routed golden p$p ($exh) ≠ flat ivf golden ($flat)")
    }
    // stored-layout routed families (codec ∘ routing): the realistic
    // l1Probes=2 rows reproduce, and in the artifact each codec's
    // realistic row sits within 0.05 of its own exhaustive-level-1 row —
    // routing may not silently trade compressed recall
    val stored = GoldenRecall.storedRoutedGrid(data, queries, truth, Dims,
      K, Nq, N, clusters = 100, nGroups = 10, l1Probes = Seq(2), nProbes = 8)
    assert(stored.map(_.family).toSet ===
      Set("ivfadc_routed", "ivf_sq_routed", "ivf_lvq_routed"))
    stored.foreach { r =>
      val p = pinned(r.family, r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"${r.family} ${r.config}: ${r.recall} vs pinned $p")
    }
    for (f <- Seq("ivfadc_routed", "ivf_sq_routed", "ivf_lvq_routed")) {
      val real = pinned(f, "c100-g10-l2", 8)
      val exh = pinned(f, "c100-g10-l10", 8)
      assert(exh - real <= 0.05,
        s"$f: realistic routing costs ${exh - real} recall vs exhaustive")
    }
    // SIMD-built/searched graph: recall pinned AND within the scalar
    // family's tolerance band (build-time Metric.simd production safety)
    if (graft.core.SimdSupport.available) {
      val simd = GoldenRecall.vamanaGrid(data, queries, truth, Dims, K, Nq,
        Seq(("deg32_w64_simd", BuildParams(maxDegree = 32, buildWindow = 64,
          alpha = 1.2, pruneTo = 28))), windows = Seq(40),
        metric = graft.core.Metric.simd(graft.core.Metric.L2))
      simd.foreach { r =>
        val p = pinned("vamana_simd", r.config, r.value)
        assert(math.abs(r.recall - p) <= 0.01,
          s"vamana_simd w${r.value}: ${r.recall} vs pinned $p")
        val scalar = pinned("vamana", "deg32_w64", r.value)
        assert(math.abs(r.recall - scalar) <= 0.05,
          s"vamana_simd w${r.value} drifted from scalar: ${r.recall} vs $scalar")
      }
    }
    truth.unpersist()
  }

  private def pinnedParam(family: String, config: String, param: String)
      : (Int, Double) = {
    val re = ("\\{\"family\":\"" + family + "\",\"config\":\"" + config +
      "\",\"param\":\"" + param + "\",\"value\":(\\d+)" +
      ",\"recall\":([0-9.eE+-]+)").r
    re.findFirstMatchIn(grid)
      .map(m => (m.group(1).toInt, m.group(2).toDouble))
      .getOrElse(fail(s"no golden row for $family/$config/$param"))
  }

  test("capacity-split calibration reproduces the pinned (window, " +
      "capacity, recall)") {
    val (data, queries, truth) =
      GoldenRecall.dataset(spark, N, Dims, Nq, K)
    val rows = GoldenRecall.calibrationRows(data, queries, truth, Dims, K,
      target = 0.85)
    val (pw, pr) = pinnedParam("calibration", "deg64_w128_t0.85", "window")
    val (pc, _) = pinnedParam("calibration", "deg64_w128_t0.85", "capacity")
    val w = rows.find(_.param == "window").get
    val c = rows.find(_.param == "capacity").get
    // the calibrated settings are part of the golden: the binary search is
    // deterministic, so the exact (window, capacity) must reproduce
    assert(w.value === pw, s"calibrated window ${w.value} vs pinned $pw")
    assert(c.value === pc, s"calibrated capacity ${c.value} vs pinned $pc")
    assert(math.abs(w.recall - pr) <= 0.01,
      s"calibration recall ${w.recall} vs pinned $pr")
    assert(w.value <= c.value, "split buffer: window must not exceed capacity")
    assert(w.recall >= 0.85, "calibration must reach its target")
    truth.unpersist()
  }

  test("pq families reproduce the committed artifact (±0.01); rerank " +
      "dominates walk-only at equal window") {
    val (data, queries, truth) = GoldenRecall.dataset(spark, N, Dims, Nq, K)
    val rows = GoldenRecall.pqGrid(data, queries, truth, Dims, K, Nq,
      ms = Seq(32), kCode = 16, kReorders = Seq(4))
    rows.foreach { r =>
      val p = pinned(r.family, r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"${r.family} ${r.param}=${r.value}: ${r.recall} vs pinned $p")
    }
    // the two-pass plan must not lose to codes-only at the same beam
    // width (kr=4 ⇒ window 40)
    val walk40 = rows.find(r => r.family == "pq_walk" && r.value == 40).get
    val rr4 = rows.find(r => r.family == "pq_walk_rerank" && r.value == 4).get
    assert(rr4.recall >= walk40.recall,
      s"rerank kr4 ${rr4.recall} < walk w40 ${walk40.recall}")
    truth.unpersist()
  }

  test("binary families reproduce the committed artifact (±0.01); " +
      "rerank dominates Hamming-only") {
    val (data, queries, truth) = GoldenRecall.dataset(spark, N, Dims, Nq, K)
    val rows = GoldenRecall.binaryGrid(data, queries, truth, K, Nq,
      kReorders = Seq(8))
    rows.foreach { r =>
      val p = pinned(r.family, r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"${r.family} ${r.param}=${r.value}: ${r.recall} vs pinned $p")
    }
    val ham = rows.find(_.family == "binary").get
    val rr = rows.find(_.family == "binary_rerank").get
    assert(rr.recall >= ham.recall)
    truth.unpersist()
  }

  test("mrl truncated family reproduces (±0.01) and tracks the leanvec " +
      "family within the random-projection gap") {
    val (data, queries, truth) = GoldenRecall.dataset(spark, N, Dims, Nq, K)
    val rows = GoldenRecall.mrlGrid(data, queries, truth, K, Nq,
      rDims = 32, kReorders = Seq(8))
    rows.foreach { r =>
      val p = pinned("mrl", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"mrl kr${r.value}: ${r.recall} vs pinned $p")
      // trained PCA must not lose to untrained truncation at the same
      // width and reorder dial
      val lv = pinned("leanvec", "r32", r.value)
      assert(lv >= r.recall - 0.01,
        s"leanvec $lv below truncation ${r.recall}")
    }
    truth.unpersist()
  }

  test("maxsim two-stage golden row reproduces (±0.01)") {
    val (data, _, truth) = GoldenRecall.dataset(spark, N, Dims, Nq, K)
    val rows = GoldenRecall.maxSimGrid(data, Dims, K, Seq(100))
    rows.foreach { r =>
      val p = pinned("maxsim_twostage", r.config, r.value)
      assert(math.abs(r.recall - p) <= 0.01,
        s"maxsim_twostage c${r.value}: ${r.recall} vs pinned $p")
    }
    truth.unpersist()
  }
}
