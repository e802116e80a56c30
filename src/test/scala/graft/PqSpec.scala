package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.Pq

/** Product quantization: encode = per-subspace argmin (driver reference),
  * ADC ranks = brute-force LUT reference, and the trained-Lloyd path
  * strictly reduces quantization distortion vs sampled codebooks. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4
  private val K = 8
  private def dims = Tables.embDims

  private def vecs() = Tables.embeddingVectors(spark, sfDir)
    .select("id", "vec")

  private def sampledParams(): Pq.Params = {
    val rows = vecs().filter(col("id") % 7 === 0 && col("id") < 7 * K)
      .orderBy("id").collect()
      .map(_.getAs[Seq[Double]]("vec").toArray).toSeq
    Pq.paramsFromRows(rows, M, K, dims)
  }

  private def refCode(v: Array[Double], p: Pq.Params): Array[Int] =
    Array.tabulate(p.m) { j =>
      val sub = v.slice(j * p.subDim, (j + 1) * p.subDim)
      (0 until p.k).minBy(c => Metric.L2.compute(sub, p.codebooks(j)(c)))
    }

  test("encode emits the per-subspace argmin codes") {
    val p = sampledParams()
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = Pq.encode(vecs(), p).collect()
      .map(r => r.getLong(0) -> (1 to M).map(r.getLong).toArray)
    got.foreach { case (id, codes) =>
      assert(codes.map(_.toInt).toSeq === refCode(data(id), p).toSeq,
        s"id $id")
      assert(codes.forall(c => c >= 0 && c < K))
    }
  }

  test("ADC ranks equal a brute-force LUT reference") {
    val p = sampledParams()
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val queries = Tables.embeddingQueries(spark, sfDir)
    val qs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val got = Pq.searchAdc(queries, Pq.encode(vecs(), p), p, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    qs.foreach { case (qid, q) =>
      val adc = data.toSeq.map { case (id, v) =>
        val codes = refCode(v, p)
        val d = (0 until p.m).foldLeft(0.0) { (acc, j) =>
          acc + Metric.L2.compute(q.slice(j * p.subDim, (j + 1) * p.subDim),
            p.codebooks(j)(codes(j)))
        }
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      assert(byQ(qid).sortBy(_._2).map(_._3).toSeq === adc, s"q$qid")
    }
  }

  test("IVFADC: residual codes match a driver reference; full-probe " +
      "search ≡ brute force; residual beats raw-ADC recall") {
    val p = sampledParams()
    val cents = vecs().filter(col("id") % 100 === 0).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    val centArr = cents.map { case (cid, cv) => (cid, cv.toArray) }
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def assignOf(v: Array[Double]): (Long, Array[Double]) = {
      val (cid, cv) = centArr.minBy { case (cid, cv) =>
        (Metric.L2.compute(v, cv), cid) }
      (cid, Array.tabulate(v.length)(i => v(i) - cv(i)))
    }
    val coded = graft.operators.Pq.encodeResiduals(
      graft.operators.KMeans.assign(vecs(), cents), cents, p)
    coded.collect().foreach { r =>
      val id = r.getLong(1)
      val (cid, res) = assignOf(data(id))
      assert(r.getLong(0) === cid, s"id $id cluster")
      assert((2 to 1 + M).map(r.getLong).map(_.toInt).toSeq ===
        refCode(res, p).toSeq, s"id $id codes")
    }
    // full-probe IVFADC = brute force over residual LUT distances
    val queries = Tables.embeddingQueries(spark, sfDir)
    val got = graft.operators.Pq.searchIvfAdc(queries, coded, cents, p,
        10, nProbes = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val qs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var adcHits = 0; var ivfHits = 0
    val exact = qs.map { case (qid, q) =>
      qid -> data.toSeq.map { case (id, v) =>
        (id, Metric.L2.compute(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }.toMap
    qs.foreach { case (qid, q) =>
      val ref = data.toSeq.map { case (id, v) =>
        val (cid, res) = assignOf(v)
        val cv = centArr.find(_._1 == cid).get._2
        val qres = Array.tabulate(q.length)(i => q(i) - cv(i))
        val codes = refCode(res, p)
        val dist = (0 until p.m).foldLeft(0.0) { (acc, j) =>
          acc + Metric.L2.compute(
            qres.slice(j * p.subDim, (j + 1) * p.subDim),
            p.codebooks(j)(codes(j)))
        }
        (id, dist)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
      assert(got(qid).sortBy(_._2).map(_._3).toSeq === ref, s"q$qid")
      ivfHits += ref.count(exact(qid))
    }
    // Recall comparison needs codebooks trained on their OWN input
    // distribution (with RAW-trained sampled codebooks, residual ADC
    // measured 16 vs 21 hits here — the codebook/input mismatch, which
    // is exactly why IVFADC trains on residuals). Same budget, each
    // path trained on what it quantizes:
    val rawTrained = graft.operators.Pq.trainLloyd(vecs(), M, K, dims, 3)
    val rawTop = graft.operators.Pq.searchAdc(queries,
        graft.operators.Pq.encode(vecs(), rawTrained), rawTrained, 10)
      .collect().groupBy(_.getLong(0))
    qs.foreach { case (qid, _) =>
      adcHits += rawTop(qid).map(_.getLong(2)).count(exact(qid)) }
    val residFrame = graft.operators.KMeans.assign(vecs(), cents)
      .join(broadcast(cents.toDF("cluster_id", "cvec")), Seq("cluster_id"))
      .select(col("id"),
        zip_with(col("vec"), col("cvec"), (a, b) => a - b).as("vec"))
    val resTrained = graft.operators.Pq.trainLloyd(residFrame, M, K,
      dims, 3)
    val codedT = graft.operators.Pq.encodeResiduals(
      graft.operators.KMeans.assign(vecs(), cents), cents, resTrained)
    val ivfTop = graft.operators.Pq.searchIvfAdc(queries, codedT, cents,
        resTrained, 10, nProbes = cents.size)
      .collect().groupBy(_.getLong(0))
    var ivfTrainedHits = 0
    qs.foreach { case (qid, _) =>
      ivfTrainedHits += ivfTop(qid).map(_.getLong(2)).count(exact(qid)) }
    assert(ivfTrainedHits >= adcHits,
      s"residual-trained recall $ivfTrainedHits < raw-trained $adcHits")
  }

  test("PQ-compressed Vamana walk (full window, all probes) ≡ global " +
      "ADC brute force; IP decomposes too; cosine is rejected") {
    val p = sampledParams()
    val clustered = Tables.embeddingVectors(spark, sfDir)
      .select(col("id"), col("vec"),
        col("label").cast("long").as("cluster_id"))
    val cents = clustered
      .select(col("cluster_id"), posexplode(col("vec")))
      .groupBy("cluster_id", "pos").agg(round(avg("col"), 6).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (cid, xs) => cid -> xs.sortBy(_._2).map(_._3).toIndexedSeq }
      .toIndexedSeq.sortBy(_._1)
    val graph = graft.operators.Vamana.buildSharded(clustered,
      graft.operators.VamanaKernel.BuildParams(maxDegree = 24,
        buildWindow = 48), Metric.L2)
    val codes = Pq.encodeClustered(clustered, p)
    val queries = Tables.embeddingQueries(spark, sfDir)
    // all shards probed + full window ⇒ the codes-only walk must equal
    // the certified flat ADC ranking bit-for-bit (ties by id)
    for (m <- Seq[Metric](Metric.L2, Metric.IP)) {
      val walked = graft.operators.Vamana.searchShardedAdc(queries, codes,
          graph, cents, p, k = 10, searchWindow = 1 << 14,
          nProbes = cents.size, metric = m)
        .select("query_id", "rnk", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val flat = Pq.searchAdc(queries, Pq.encode(vecs(), p), p, 10, m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(walked === flat, s"metric $m")
    }
    assertThrows[IllegalArgumentException] {
      graft.operators.Vamana.searchShardedAdc(queries, codes, graph, cents,
        p, 10, 1 << 14, cents.size, Metric.Cosine)
    }
  }

  test("two-pass rerank ≡ exact-L2 rerank of the ADC top-R reference, " +
      "and beats the walk-only recall") {
    val p = sampledParams()
    val clustered = Tables.embeddingVectors(spark, sfDir)
      .select(col("id"), col("vec"),
        col("label").cast("long").as("cluster_id"))
    val cents = clustered
      .select(col("cluster_id"), posexplode(col("vec")))
      .groupBy("cluster_id", "pos").agg(round(avg("col"), 6).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (cid, xs) => cid -> xs.sortBy(_._2).map(_._3).toIndexedSeq }
      .toIndexedSeq.sortBy(_._1)
    val graph = graft.operators.Vamana.buildSharded(clustered,
      graft.operators.VamanaKernel.BuildParams(maxDegree = 24,
        buildWindow = 48), Metric.L2)
    val codes = Pq.encodeClustered(clustered, p)
    val queries = Tables.embeddingQueries(spark, sfDir)
    val kNN = 10; val reorder = 4
    val got = graft.operators.Vamana.searchShardedAdcRerank(queries, codes,
        graph, cents, p, clustered, kNN, reorder,
        searchWindow = 1 << 14, nProbes = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val data = vecs().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var walkHits = 0; var rerankHits = 0
    val walkTop = Pq.searchAdc(queries, Pq.encode(vecs(), p), p, kNN)
      .collect().groupBy(_.getLong(0))
    qs.foreach { case (qid, q) =>
      // reference: global ADC top-R (all shards probed), exact-L2 rerank
      val adcTop = data.toSeq.map { case (id, v) =>
        val codesV = refCode(v, p)
        val d = (0 until p.m).foldLeft(0.0) { (acc, j) =>
          acc + Metric.L2.compute(q.slice(j * p.subDim, (j + 1) * p.subDim),
            p.codebooks(j)(codesV(j)))
        }
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(reorder * kNN).map(_._1)
      val ref = adcTop.map(id => (id, Metric.L2.compute(q, data(id))))
        .sortBy { case (id, d) => (d, id) }.take(kNN).map(_._1)
      assert(got(qid).sortBy(_._2).map(_._3).toSeq === ref, s"q$qid")
      val exact = data.toSeq.map { case (id, v) =>
        (id, Metric.L2.compute(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(kNN).map(_._1).toSet
      walkHits += walkTop(qid).map(_.getLong(2)).count(exact)
      rerankHits += ref.count(exact)
    }
    assert(rerankHits >= walkHits,
      s"rerank recall $rerankHits < walk-only $walkHits")
  }

  test("stored IVFADC layout (PqResC codec): sidecar codebooks bit-exact, " +
      "served search ≡ in-memory composition") {
    val p = sampledParams()
    val cents = vecs().filter(col("id") % 100 === 0).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    val clustered = graft.operators.KMeans.assign(vecs(), cents)
    val path = "/tmp/graft_pqres_layout_spec"
    graft.operators.IndexLayout.write(clustered, cents, path,
      graft.operators.IndexLayout.PqResC(p))
    val layout = graft.operators.IndexLayout.open(spark, path)
    val rp = layout.codec
      .asInstanceOf[graft.operators.IndexLayout.PqResC].p
    for (j <- 0 until p.m; c <- 0 until p.k)
      assert(rp.codebooks(j)(c).toSeq === p.codebooks(j)(c).toSeq)
    val queries = Tables.embeddingQueries(spark, sfDir)
    val served = graft.operators.IndexLayout.search(layout, queries, 10,
        nProbes = 3, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val mem = Pq.searchIvfAdc(queries,
        Pq.encodeResiduals(clustered, cents, p), cents, p, 10, 3)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(served === mem)
  }

  test("trained-Lloyd codebooks reduce distortion vs sampled rows") {
    def distortion(p: Pq.Params): Double = {
      val data = vecs().collect().map(_.getSeq[Double](1).toArray)
      data.map { v =>
        val codes = refCode(v, p)
        (0 until p.m).map(j => Metric.L2.compute(
          v.slice(j * p.subDim, (j + 1) * p.subDim),
          p.codebooks(j)(codes(j)))).sum
      }.sum / data.length
    }
    val trained = Pq.trainLloyd(vecs(), M, K, dims, iters = 3)
    assert(trained.codebooks.length === M)
    assert(trained.codebooks.forall(_.length === K))
    val dS = distortion(sampledParams())
    val dT = distortion(trained)
    assert(dT < dS, s"trained distortion $dT !< sampled $dS")
  }
}
