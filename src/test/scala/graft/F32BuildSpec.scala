package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, SimdSupport, Tables}
import graft.operators.{Vamana, VamanaKernel}
import graft.operators.VamanaKernel.BuildParams

/** Float32-resident graph builds: the mixed-precision kernels
  * (Metric.computeDF/FF) widen each float at the point of use into the
  * SAME double fold, so a build over float32-resident rows must be
  * BIT-IDENTICAL to building on a pre-widened copy — at half the resident
  * bytes. This suite pins (1) kernel-level bit equality, (2) the SIMD mixed
  * kernels against the SIMD double kernels, and (3) the end-to-end
  * schema-dispatched buildSharded graph equality. */
class F32BuildSpec extends SparkSpec {

  private def randVecs(n: Int, d: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rnd.nextFloat() * 2f - 1f))
  }

  test("mixed scalar kernels are bit-identical to compute on widened copies") {
    val rnd = new scala.util.Random(11)
    for (d <- Seq(1, 3, 7, 8, 9, 16, 17, 64, 65, 128); _ <- 0 until 10) {
      val af = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val bf = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val ad = af.map(_.toDouble)
      val bd = bf.map(_.toDouble)
      for (m <- Metric.all) {
        assert(m.computeFF(af, bf) == m.compute(ad, bd),
          s"${m.name} FF d=$d")
        assert(m.computeDF(ad, bf) == m.compute(ad, bd),
          s"${m.name} DF d=$d")
      }
    }
  }

  test("SIMD mixed kernels are bit-identical to SIMD double kernels on " +
      "widened copies") {
    assume(SimdSupport.available)
    val rnd = new scala.util.Random(13)
    for (d <- Seq(1, 7, 8, 9, 15, 16, 17, 64, 65, 129); _ <- 0 until 10) {
      val af = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val bf = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val ad = af.map(_.toDouble)
      val bd = bf.map(_.toDouble)
      for (m <- Metric.all) {
        val s = Metric.SimdOf(m)
        assert(s.computeFF(af, bf) == s.compute(ad, bd),
          s"${s.name} FF d=$d")
        assert(s.computeDF(ad, bf) == s.compute(ad, bd),
          s"${s.name} DF d=$d")
      }
    }
  }

  // FlatKnn accepts float query batches directly (no cast projection) and
  // widens them once at collect — the scan then runs the DF kernel, which
  // beats FF when the query batch is cache-resident (SCALE.md measurement).
  // Either kernel is bit-identical to the widened double fold; this pins it.
  test("FlatKnn with float queries AND float data is bit-identical " +
      "to the widened-double search") {
    val s = spark
    val raw = Tables.table(s, sfDir, "embeddings")
    val qF = raw.filter(expr(Tables.embQueryPredSql))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val dF = raw.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val qD = qF.withColumn("qvec", col("qvec").cast("array<double>"))
    val dD = dF.withColumn("vec", col("vec").cast("array<double>"))
    for (m <- Metric.all) {
      def run(q: org.apache.spark.sql.DataFrame,
              d: org.apache.spark.sql.DataFrame) =
        graft.operators.FlatKnn.search(q, d, 7, m)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq.sorted
      val ff = run(qF, dF)  // float queries, float data
      val df = run(qD, dF)  // double queries, float data → computeDF
      val fd = run(qF, dD)  // float queries, double data
      val dd = run(qD, dD)  // widened both sides → compute
      assert(ff === dd, s"${m.name}: float/float drifted from the double fold")
      assert(df === dd, s"${m.name}: DF drifted from the double fold")
      assert(fd === dd, s"${m.name}: float-query/double-data drifted")
      assert(ff.nonEmpty)
      if (SimdSupport.available) {
        // the SIMD FF twin must agree on the id ranking (lane fold may
        // differ in the last ulp, so distances are not compared)
        val sf = graft.operators.FlatKnn.search(qF, dF, 7, Metric.simd(m))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq.sorted
        assert(sf === ff.map(t => (t._1, t._2, t._3)), s"${m.name} simd ids")
      }
    }
  }

  test("FloatStore build is bit-identical to DoubleStore build") {
    val vecsF = randVecs(600, 24, seed = 5)
    val vecsD = vecsF.map(_.map(_.toDouble))
    val params = BuildParams(maxDegree = 16, buildWindow = 32, alpha = 1.2)
    for (m <- Seq(Metric.L2, Metric.Cosine)) {
      val (adjD, entryD) = VamanaKernel.build(vecsD, params, m)
      val (adjF, entryF) = VamanaKernel.build(
        new VamanaKernel.FloatStore(vecsF), params, m, null)
      assert(entryF === entryD, s"${m.name} entry")
      assert(adjF.map(_.toSeq).toSeq === adjD.map(_.toSeq).toSeq,
        s"${m.name} adjacency")
    }
  }

  test("buildSharded dispatches on ARRAY<FLOAT> and produces the identical " +
      "graph and search results") {
    val s = spark
    import s.implicits._
    val base = Tables.embeddingVectors(s, sfDir)
      .select(col("id"), col("vec"),
        (col("id") % 4).cast("long").as("cluster_id"))
      .cache()
    val asF32 = base.withColumn("vec", col("vec").cast("array<float>"))
    // building on f32 rows == building on their widened doubles: compare
    // against the f64 build of the SAME (already f32-rounded) values
    val asF64 = asF32.withColumn("vec", col("vec").cast("array<double>"))
    val params = BuildParams(maxDegree = 12, buildWindow = 24, alpha = 1.2)
    val gF = Vamana.buildSharded(asF32, params, Metric.L2)
      .select("cluster_id", "id", "entry_id", "neighbors")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toSeq)).toSeq.sortBy(t => (t._1, t._2))
    val gD = Vamana.buildSharded(asF64, params, Metric.L2)
      .select("cluster_id", "id", "entry_id", "neighbors")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toSeq)).toSeq.sortBy(t => (t._1, t._2))
    assert(gF === gD)
    assert(gF.nonEmpty)

    // the search path dispatches too: float-resident walks return results
    // bit-identical to the double walks over the same graph
    val graphDf = Vamana.buildSharded(asF32, params, Metric.L2).cache()
    val dims = base.select("vec").head.getSeq[Double](0).length
    val cents = (0L until 4L).map(c => c -> Seq.fill(dims)(0.0))
    val queries = Tables.embeddingQueries(s, sfDir).limit(5)
    def run(clustered: org.apache.spark.sql.DataFrame) =
      Vamana.searchSharded(queries, clustered, graphDf, cents, k = 5,
        searchWindow = 16, nProbes = 4, Metric.L2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
    val sF = run(asF32)
    val sD = run(asF64)
    assert(sF === sD)
    assert(sF.nonEmpty)

    // the f32-resident prepared layout (half the cached-index memory)
    // walks to the same results as the f64 prepared layout
    val preD = Vamana.prepareShards(asF64, graphDf)
    val preF = Vamana.prepareShardsF32(asF32, graphDf)
    val pD = Vamana.searchPrepared(queries, preD, cents, 5, 16, 4, Metric.L2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    val pF = Vamana.searchPreparedF32(queries, preF, cents, 5, 16, 4,
        Metric.L2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    assert(pF === pD)
    assert(pD === sD, "prepared path drifted from searchSharded")
    intercept[IllegalArgumentException] {
      Vamana.prepareShardsF32(asF64, graphDf) // wrong element type
    }
    preD.unpersist(); preF.unpersist()
    graphDf.unpersist()
    base.unpersist()
  }
}
