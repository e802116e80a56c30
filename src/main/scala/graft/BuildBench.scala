package graft

import graft.core.Metric
import graft.operators.VamanaKernel
import graft.operators.VamanaKernel.{BuildParams, BuildStats}

/** Single-shard Vamana build profiler: wall-clock + per-phase breakdown
  * (search/prune vs adjacency apply vs overflow re-prune) for the scalar
  * and SIMD kernels — the measurement behind SCALE.md's build-cost
  * attribution. No Spark: this is the per-task kernel a 100 TB build runs
  * once per shard inside `Vamana.buildSharded`.
  * Run: `sbt "runMain graft.BuildBench"`.
  * Env: SPARK_GRAFT_BUILD_N (default 20000), SPARK_GRAFT_BUILD_DIMS (64).
  */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BUILD_N", "20000").toInt
    val dims = sys.env.getOrElse("SPARK_GRAFT_BUILD_DIMS", "64").toInt
    val batchSize = sys.env.getOrElse("SPARK_GRAFT_BUILD_BATCH", "64").toInt
    val rnd = new scala.util.Random(7)
    // generate as float32 so f32/f64 stores hold identical values (the f32
    // build is then bit-identical to the f64 one; this bench isolates the
    // residency/bandwidth effect alone)
    val vecsF = Array.fill(n)(Array.fill(dims)(rnd.nextFloat() * 2f - 1f))
    val vecs = vecsF.map(_.map(_.toDouble))
    val f32 = sys.env.get("SPARK_GRAFT_BUILD_F32").exists(_.nonEmpty)
    // f16 mode: HalfStore residency (values re-quantized through binary16,
    // so this measures the half build's own wall — the decode-once prune
    // lever — not cross-residency bit-identity, which HalfKnnSpec pins)
    val f16 = sys.env.get("SPARK_GRAFT_BUILD_F16").exists(_.nonEmpty)
    val vecsH: Array[Array[Short]] =
      if (f16) vecsF.map(_.map(graft.functions.Binary16.floatToHalf))
      else null
    // degree/window knobs so the bench can reproduce any harness shape
    // (e.g. Scale100M's deg 16 / win 32 / pruneTo 14 small-shard config,
    // where the overflow pools are smallest and per-call overheads
    // matter most)
    val deg = sys.env.getOrElse("SPARK_GRAFT_BUILD_DEG", "32").toInt
    val win = sys.env.getOrElse("SPARK_GRAFT_BUILD_WIN",
      (deg * 2).toString).toInt
    val pruneTo = sys.env.getOrElse("SPARK_GRAFT_BUILD_PRUNETO",
      (deg * 7 / 8).toString).toInt
    val params = BuildParams(maxDegree = deg, buildWindow = win,
      alpha = 1.2, pruneTo = pruneTo, batchSize = batchSize)
    for (m <- Seq(Metric.L2, Metric.simd(Metric.L2))) {
      def store(take: Int): VamanaKernel.VecStore =
        if (f16) new VamanaKernel.HalfStore(vecsH.take(take), bf16 = false)
        else if (f32) new VamanaKernel.FloatStore(vecsF.take(take))
        else new VamanaKernel.DoubleStore(vecs.take(take))
      // one untimed warmup at n/4 so JIT state matches a long-running task
      VamanaKernel.build(store(n / 4), params, m, null)
      val stats = new BuildStats
      val t0 = System.nanoTime()
      val (adj, _) = VamanaKernel.build(store(n), params, m, stats)
      val wall = (System.nanoTime() - t0) / 1e9
      val deg = adj.iterator.map(_.length.toLong).sum.toDouble / n
      println(f"""{"experiment":"build_bench","n":$n,"dims":$dims,""" +
        f""""batch":$batchSize,"batch_effective":${stats.batchWidth.get},""" +
        f""""f32":$f32,"f16":$f16,""" +
        f""""metric":"${m.name}","wall_sec":$wall%.3f,""" +
        f""""search_sec":${stats.search.sum / 1e9}%.3f,""" +
        f""""greedy_cpu_sec":${stats.greedyCpu.sum / 1e9}%.3f,""" +
        f""""prune_cpu_sec":${stats.pruneCpu.sum / 1e9}%.3f,""" +
        f""""apply_sec":${stats.apply.sum / 1e9}%.3f,""" +
        f""""overflow_sec":${stats.overflow.sum / 1e9}%.3f,""" +
        f""""dist_calls":${stats.distCalls.sum},""" +
        f""""mean_degree":$deg%.2f}""")
    }
  }
}
