package graft

import graft.core.{Metric, SimdSupport}

/** Single-thread distance-kernel microbenchmark: scalar fold vs the JDK
  * Vector API kernels (graft.simd.SimdKernels) — the measurement behind
  * SCALE.md's kernel-rate numbers, and the Spark-side analog of the
  * reference's distance micro-benchmarks
  * (benchmark/include/svs-benchmark/datasets.h measurement model).
  * Run: `sbt "runMain graft.KernelBench"`. Emits one JSON line per
  * (dims, metric) with pairs/sec for both kernels.
  *
  * No SparkSession: this isolates the per-pair kernel cost that
  * mapPartitions loops (FlatKnn/VamanaKernel) pay per row, with the JIT
  * warmed the same way executor threads warm.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val dims = sys.env.get("SPARK_GRAFT_KERNEL_DIMS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(64, 128, 768))
    val n = 2000
    val reps = 50
    val rounds = 7
    val rnd = new scala.util.Random(42)
    println(s"""{"simd_available":${SimdSupport.available},""" +
      s""""lanes":${SimdSupport.lanes}}""")
    for (d <- dims) {
      val vecs = Array.fill(n)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
      val q = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      // best-of-rounds pairs/sec; the sink defeats dead-code elimination
      def bench(m: Metric): Double = {
        var best = Double.MaxValue
        var sink = 0.0
        for (_ <- 0 until rounds) {
          val t0 = System.nanoTime()
          var rep = 0
          while (rep < reps) {
            var i = 0
            while (i < n) { sink += m.compute(q, vecs(i)); i += 1 }
            rep += 1
          }
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        if (sink == Double.MinPositiveValue) print("") // keep sink live
        n.toDouble * reps / best
      }
      for (base <- Metric.all) {
        val scalar = bench(base)
        val simd = bench(Metric.SimdOf(base))
        println(f"""{"dims":$d,"metric":"${base.name}",""" +
          f""""scalar_pairs_per_sec":${scalar.toLong},""" +
          f""""simd_pairs_per_sec":${simd.toLong},""" +
          f""""speedup":${simd / scalar}%.3f}""")
      }
      // mixed-precision twins (f32-resident rows, double arithmetic) —
      // the FloatStore build path's per-pair kernels
      val vecsF = vecs.map(_.map(_.toFloat))
      val qF = q.map(_.toFloat)
      def benchFF(m: Metric): Double = {
        var best = Double.MaxValue
        var sink = 0.0
        for (_ <- 0 until rounds) {
          val t0 = System.nanoTime()
          var rep = 0
          while (rep < reps) {
            var i = 0
            while (i < n) { sink += m.computeFF(qF, vecsF(i)); i += 1 }
            rep += 1
          }
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        if (sink == Double.MinPositiveValue) print("")
        n.toDouble * reps / best
      }
      for (base <- Metric.all) {
        val ff = benchFF(base)
        val ffSimd = benchFF(Metric.SimdOf(base))
        println(f"""{"dims":$d,"metric":"${base.name}_f32",""" +
          f""""scalar_pairs_per_sec":${ff.toLong},""" +
          f""""simd_pairs_per_sec":${ffSimd.toLong},""" +
          f""""speedup":${ffSimd / ff}%.3f}""")
      }
      // byte-resident twins (i8/u8 rows, double arithmetic) — the
      // ByteStore/byte-scan per-pair kernels
      val vecsB = vecs.map(_.map(x => math.floor(x * 100).toByte))
      def benchDB(m: Metric, unsigned: Boolean): Double = {
        var best = Double.MaxValue
        var sink = 0.0
        for (_ <- 0 until rounds) {
          val t0 = System.nanoTime()
          var rep = 0
          while (rep < reps) {
            var i = 0
            while (i < n) {
              sink += m.computeDB(q, vecsB(i), unsigned); i += 1 }
            rep += 1
          }
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        if (sink == Double.MinPositiveValue) print("")
        n.toDouble * reps / best
      }
      for (base <- Metric.all; unsigned <- Seq(false, true)) {
        val db = benchDB(base, unsigned)
        val dbSimd = benchDB(Metric.SimdOf(base), unsigned)
        val tag = if (unsigned) "u8" else "i8"
        println(f"""{"dims":$d,"metric":"${base.name}_$tag%s",""" +
          f""""scalar_pairs_per_sec":${db.toLong},""" +
          f""""simd_pairs_per_sec":${dbSimd.toLong},""" +
          f""""speedup":${dbSimd / db}%.3f}""")
      }
    }
  }
}
