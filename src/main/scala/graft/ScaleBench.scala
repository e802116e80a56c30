package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.operators.{FlatKnn, IvfIndex, KMeans, LeanVec, MaxSim, Pq}
import graft.sources.SyntheticData

/** Scale probe beyond the driver's sf0.1: 1M × 64-d vectors (→ 100M
  * query-point distance computations for the flat path), exercising exactly
  * the plans that run at 100 TB — materialized parquet scan → partition-local
  * bounded heaps → k·partitions-row shuffle; and IVF probe search reading
  * only probed partitions. Run: `sbt "runMain graft.ScaleBench"`. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = 64
    val k = 10
    val nq = sys.env.getOrElse("SPARK_GRAFT_SCALE_NQ", "100").toInt
    val path = "/tmp/graft_scale_data"

    // NPY source probe (opt-in: SPARK_GRAFT_SCALE_NPY=1): the single-huge-
    // file story graftnpy exists for — ONE n×64-d f4 shard (the 100 GB
    // array in miniature), read whole-file by NpyIO (one task, the np.load
    // shape) vs the DSv2's row-aligned intra-file splits (every core busy).
    // Also times the pruned id-only scan, which never decodes payloads.
    if (sys.env.get("SPARK_GRAFT_SCALE_NPY").contains("1")) {
      def t[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val npyDir = "/tmp/graft_scale_npy"
      val src = SyntheticData.generateMixed(spark, n, dims)
        .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      val tWrite = t {
        src.write.format("graftnpy").mode("overwrite").save(npyDir) }
      val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        (16L << 20).toString)
      val ds = spark.read.format("graftnpy").load(s"$npyDir/*.npy")
      val nParts = ds.rdd.getNumPartitions
      def fullScan(df: org.apache.spark.sql.DataFrame): Double = t {
        df.agg(sum(element_at(col("vec"), 1))).head }
      val scanWarm = fullScan(ds) // page-cache warm
      val tScan = (0 until 3).map(_ => fullScan(ds)).min
      val tIdOnly = (0 until 3).map(_ =>
        t { ds.select("id").agg(sum("id")).head }).min
      // the whole-file reader rides binaryFile, whose content column caps
      // at 2 GB — past that a single shard is UNREADABLE without the
      // DSv2's range splits; report the leg as -1 rather than crash
      val tLegacy = if (n * dims * 4 < Int.MaxValue.toLong) {
        val legacy = graft.sources.NpyIO.read(spark, s"$npyDir/*.npy")
        (0 until 3).map(_ => fullScan(legacy)).min
      } else -1.0
      // byte-resident leg (the Deep1B ingest shape): same rows as u1 —
      // a QUARTER of the f4 bytes through the scan, raw bits to kernels
      val npyU8Dir = "/tmp/graft_scale_npy_u8"
      val srcU8 = graft.functions.ByteVecs.markUnsigned(
        SyntheticData.generateMixed(spark, n, dims)
          .select(col("id"), graft.functions.ByteVecs
            .quantizeUnsigned(col("vec"), 255.0).as("vec")))
        .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      val tWriteU8 = t {
        srcU8.write.format("graftnpy").mode("overwrite").save(npyU8Dir) }
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        (4L << 20).toString) // same ~16 splits as the f4 leg
      val dsU8 = spark.read.format("graftnpy").option("bytes", "true")
        .load(s"$npyU8Dir/*.npy")
      val u8Parts = dsU8.rdd.getNumPartitions
      def byteScan(): Double = t {
        dsU8.agg(sum(element_at(col("vec"), 1).cast("long"))).head }
      byteScan() // warm
      val tScanU8 = (0 until 3).map(_ => byteScan()).min
      spark.conf.set("spark.sql.files.maxPartitionBytes", before)
      println(s"""{"experiment":"npy_source","n":$n,"dims":$dims,""" +
        s""""file_bytes":${n * dims * 4},"write_sec":$tWrite,""" +
        s""""dsv2_splits":$nParts,"dsv2_scan_sec":$tScan,""" +
        s""""dsv2_scan_warmup_sec":$scanWarm,""" +
        s""""dsv2_id_only_sec":$tIdOnly,""" +
        s""""legacy_whole_file_scan_sec":$tLegacy,""" +
        s""""u8_file_bytes":${n * dims},"u8_write_sec":$tWriteU8,""" +
        s""""u8_splits":$u8Parts,"u8_scan_sec":$tScanU8}""")
      spark.stop()
      return
    }

    // materialize to parquet so the bench measures scan+search, not codegen
    // of the generator (at 100 TB the input is always storage)
    SyntheticData.generateMixed(spark, n, dims)
      .repartition(cpus.toInt * 4)
      .write.mode("overwrite").parquet(path)
    val data = spark.read.parquet(path)
    val queries = SyntheticData.generateMixed(spark, n + nq, dims)
      .filter(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (_, warm) = time(data.count()) // page cache warm + row count check

    val (_, tFlat) = time {
      FlatKnn.search(queries, data, k, Metric.L2).count() }
    val pairsPerSec = n.toDouble * nq / tFlat

    // float32 storage: half the bytes on disk and through the scan; the
    // kernel widens per-register, so results are bit-identical to a cast
    val pathF32 = "/tmp/graft_scale_data_f32"
    data.select(col("id"), col("vec").cast("array<float>").as("vec"))
      .write.mode("overwrite").parquet(pathF32)
    val dataF32 = spark.read.parquet(pathF32)
    dataF32.count()
    val (_, tFlat32) = time {
      FlatKnn.search(queries, dataF32, k, Metric.L2).count() }

    // fully f32-resident scan (float queries AND float rows → computeFF):
    // same bytes as the f32 scan; isolates the FF-vs-DF kernel effect
    val queriesF32 = queries
      .select(col("query_id"), col("qvec").cast("array<float>").as("qvec"))
    val (_, tFlatFF) = time {
      FlatKnn.search(queriesF32, dataF32, k, Metric.L2).count() }

    // i8 storage: an EIGHTH of the f64 scan bytes; computeDB widens each
    // byte at use — measures the byte-resident branch's scan rate (the
    // Deep1B residency story quantified)
    val pathI8 = "/tmp/graft_scale_data_i8"
    graft.functions.ByteVecs.markSigned(data.select(col("id"),
        graft.functions.ByteVecs.quantizeSigned(col("vec"), 100.0)
          .as("vec")))
      .write.mode("overwrite").parquet(pathI8)
    val dataI8 = spark.read.parquet(pathI8)
    dataI8.count()
    val (_, tFlatI8) = time {
      FlatKnn.search(queries, dataI8, k, Metric.L2).count() }

    // Focused scan benchmark (opt-in: SPARK_GRAFT_SCALE_FLATONLY=1): the
    // four flat legs + their SIMD twins only — for iterating on the scan
    // loop without paying the full suite.
    if (sys.env.get("SPARK_GRAFT_SCALE_FLATONLY").contains("1")) {
      val simdL2 = Metric.simd(Metric.L2)
      // best-of-3 after the single-shot legs above served as warmup:
      // single runs jitter ±15% at the sub-second scale these legs reach
      def best(f: => Unit): Double =
        (0 until 3).map { _ => time(f)._2 }.min
      val bFlat = best { FlatKnn.search(queries, data, k, Metric.L2).count() }
      val bFlatF32 = best {
        FlatKnn.search(queries, dataF32, k, Metric.L2).count() }
      val bFlatFF = best {
        FlatKnn.search(queriesF32, dataF32, k, Metric.L2).count() }
      val bFlatI8 = best {
        FlatKnn.search(queries, dataI8, k, Metric.L2).count() }
      val bFlatSimd = best {
        FlatKnn.search(queries, data, k, simdL2).count() }
      val bFlatFFSimd = best {
        FlatKnn.search(queriesF32, dataF32, k, simdL2).count() }
      val bFlatI8Simd = best {
        FlatKnn.search(queries, dataI8, k, simdL2).count() }
      println(s"""{"experiment":"scale_bench_flat","n":$n,"dims":$dims,""" +
        s""""flat_knn_sec":$bFlat,"flat_knn_f32_sec":$bFlatF32,""" +
        s""""flat_knn_ff_sec":$bFlatFF,"flat_knn_i8_sec":$bFlatI8,""" +
        s""""flat_knn_simd_sec":$bFlatSimd,""" +
        s""""flat_knn_ff_simd_sec":$bFlatFFSimd,""" +
        s""""flat_knn_i8_simd_sec":$bFlatI8Simd}""")
      spark.stop()
      return
    }

    // LeanVec (OOD-trained, r=16 of 64): the coarse pass scans a PERSISTED
    // augmented table of r+1 doubles per row (~4x fewer bytes than the f64
    // scan), full precision reads only the |Q|·kReorder·k shortlist — the
    // bandwidth-cut shape the reference deploys LeanVec for.
    val truth = FlatKnn.search(queries, data, k, Metric.L2)
      .select("query_id", "neighbor_id").cache()
    truth.count()
    val (lvModel, tLvTrain) = time(
      LeanVec.trainOod(data, queries, rDims = 16))
    val pathLv = "/tmp/graft_scale_leanvec"
    LeanVec.augmentOodData(data, lvModel)
      .write.mode("overwrite").parquet(pathLv)
    val augData = spark.read.parquet(pathLv)
    augData.count()
    val augQ = LeanVec.augmentOodQueries(queries, lvModel)
    val (lvRes, tLv) = time {
      val r = LeanVec.searchOodPrepared(augQ, augData, queries, data, k,
          kReorder = 8)
        .select("query_id", "neighbor_id").cache()
      r.count(); r
    }
    val lvRecall = lvRes.intersect(truth).count().toDouble / (k.toLong * nq)
    lvRes.unpersist()

    // IVF: 256 centroids from a deterministic sample, 8 probes
    val cents0 = data.filter(col("id") % (n / 256) === 0)
      .limit(256).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val (cents, tTrain) = time(KMeans.lloyd(
      data.sample(0.05, seed = 7), cents0, iters = 2, dims))
    val (clusteredPath, tPart) = time {
      val p = "/tmp/graft_scale_ivf"
      IvfIndex.writeClustered(KMeans.assign(data, cents), p); p }
    val stored = IvfIndex.readClustered(spark, clusteredPath)
    val (_, tIvf) = time {
      IvfIndex.search(queries, stored, cents, k, nProbes = 8,
        Metric.L2).count() }

    // IVF∘LeanVec layout (q92's path at 1M): the composition where the r/d
    // byte cut applies to the DOMINANT pass — coarse scan AND rerank are
    // both partition-pruned to the probed clusters, unlike the full-table
    // rerank of the two-pass scan above. Written + reopened from disk so
    // the measurement includes the layout's scan shape. Probed twice:
    // on the raw ISOTROPIC uniform data (no low-rank structure — LeanVec's
    // documented worst case, recall ≈ floor) and on an ANISOTROPIC twin
    // (per-dim exp decay, intrinsic dim ≪ d — the embedding-like case the
    // reference deploys LeanVec for).
    import graft.operators.{IndexLayout, LeanVec => LV}
    def layoutProbe(dataX: org.apache.spark.sql.DataFrame,
                    queriesX: org.apache.spark.sql.DataFrame,
                    tag: String): (Double, Double, Double) = {
      val truthX = FlatKnn.search(queriesX, dataX, k, Metric.L2)
        .select("query_id", "neighbor_id").cache()
      truthX.count()
      val init = dataX.filter(col("id") % (n / 256) === 0)
        .limit(256).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
        .toIndexedSeq
      val centsX = KMeans.lloyd(dataX.sample(0.05, seed = 7), init,
        iters = 2, dims)
      val (layout, tw) = time {
        val m = LV.train(dataX, rDims = 16)
        val p = s"/tmp/graft_scale_leanvec_ivf_$tag"
        IndexLayout.write(KMeans.assign(dataX, centsX), centsX, p,
          IndexLayout.LeanVecC(m))
        IndexLayout.open(spark, p)
      }
      val (res, ts) = time {
        val r = IndexLayout.search(layout, queriesX, k, nProbes = 8,
            Metric.L2, kReorder = 8)
          .select("query_id", "neighbor_id").cache()
        r.count(); r
      }
      val rec = res.intersect(truthX).count().toDouble / (k.toLong * nq)
      res.unpersist(); truthX.unpersist()
      (tw, ts, rec)
    }
    val (tLvIvfWrite, tLvIvf, lvIvfRecall) = layoutProbe(data, queries, "iso")
    // anisotropic twin: dim j scaled by exp(-j/8) — top ~16 dims carry
    // nearly all variance, the regime dimensionality reduction assumes
    def decay(vecCol: String) = transform(col(vecCol),
      (x, i) => x * exp(i.cast("double") * lit(-0.125)))
    val dataA = data.select(col("id"), decay("vec").as("vec"))
    val queriesA = queries.select(col("query_id"), decay("qvec").as("qvec"))
    val (tLvIvfWriteA, tLvIvfA, lvIvfRecallA) =
      layoutProbe(dataA, queriesA, "aniso")
    truth.unpersist()

    // Vamana at scale: size-bounded sharding (splitOversized enforces the
    // per-task cap) + batched-parallel graph build per shard — the exact
    // 100 TB shape: shard fanout across the cluster, parallel batches
    // inside each shard, probe-routed search touching nProbes shards.
    import graft.operators.Vamana
    import graft.operators.VamanaKernel.BuildParams
    val maxRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_SHARD", "20000").toLong
    val (splitRes, tSplit) = time {
      val (s, c) = Vamana.splitOversized(stored, cents, maxRows)
      (s.cache(), c)
    }
    val (split, splitCents) = splitRes
    split.count()
    val vParams = BuildParams(maxDegree = 32, buildWindow = 64)
    val (graph, tBuild) = time {
      val g = Vamana.buildSharded(split, vParams, Metric.L2).cache()
      g.count(); g
    }
    val (_, tVamana) = time {
      Vamana.searchSharded(queries, split, graph, splitCents, k,
        searchWindow = 64, nProbes = 8, Metric.L2).count() }

    // PQ serving (q147/q148's path at 1M): codes-only walk over the SAME
    // sharded graph — per-row walk state shrinks from d·8 = 512 bytes to
    // m = 16 bytes of codes (32×) — then the two-pass rerank reads full
    // precision for |Q|·kReorder·k rows only. Codebooks trained on the
    // same 5% sample as the IVF centroids; codes persisted so the walk
    // measures the stored-layout scan shape.
    import graft.operators.Pq
    val (pqP, tPqTrain) = time(
      Pq.trainLloyd(data.sample(0.05, seed = 7), m = 16, k = 16, dims,
        iters = 2))
    val pathPq = "/tmp/graft_scale_pq_codes"
    val (_, tPqEncode) = time {
      Pq.encodeClustered(split, pqP).write.mode("overwrite").parquet(pathPq) }
    val pqCodes = spark.read.parquet(pathPq)
    pqCodes.count()
    val truthPq = FlatKnn.search(queries, data, k, Metric.L2)
      .select("query_id", "neighbor_id").cache()
    truthPq.count()
    def recallPq(res: org.apache.spark.sql.DataFrame): Double =
      res.select("query_id", "neighbor_id").intersect(truthPq).count()
        .toDouble / (k.toLong * nq)
    val (rPqWalk, tPqWalk) = time {
      recallPq(Vamana.searchShardedAdc(queries, pqCodes, graph, splitCents,
        pqP, k, searchWindow = 64, nProbes = 8)) }
    val (rPqRerank, tPqRerank) = time {
      recallPq(Vamana.searchShardedAdcRerank(queries, pqCodes, graph,
        splitCents, pqP, split, k, kReorder = 8, searchWindow = 80,
        nProbes = 8)) }
    // Binary sign-bit serving at 1M: the 64× axis — coarse scan reads
    // two BIGINT words per row (16 B vs 512 B), bit_count(xor) ranking,
    // exact rerank of the Hamming top kReorder·k.
    import graft.operators.BinaryQuant
    val (binP, tBinTrain) = time(BinaryQuant.train(data))
    val pathBin = "/tmp/graft_scale_bin_codes"
    val (_, tBinEncode) = time {
      BinaryQuant.encode(data, binP).write.mode("overwrite")
        .parquet(pathBin) }
    val binCodes = spark.read.parquet(pathBin)
    binCodes.count()
    // reuse the PQ block's cached exact truth — the most expensive scan
    // in the bench, identical for both serving families
    def recallBin(res: org.apache.spark.sql.DataFrame): Double =
      recallPq(res)
    val (rBinHam, tBinHam) = time {
      recallBin(BinaryQuant.searchHamming(queries, binCodes, binP, k)) }
    val (rBinRr, tBinRr) = time {
      recallBin(BinaryQuant.searchHammingRerank(queries, binCodes, binP,
        data, k, kReorder = 16)) }
    truthPq.unpersist()
    println(s"""{"experiment":"scale_bench_binary","n":$n,"dims":$dims,""" +
      s""""bin_train_sec":$tBinTrain,"bin_encode_sec":$tBinEncode,""" +
      s""""bin_hamming_sec":$tBinHam,"bin_hamming_recall":$rBinHam,""" +
      s""""bin_rerank_sec":$tBinRr,"bin_rerank_recall":$rBinRr,""" +
      s""""flat_knn_sec":$tFlat}""")

    println(s"""{"experiment":"scale_bench_pq","n":$n,"dims":$dims,""" +
      s""""pq_train_sec":$tPqTrain,"pq_encode_sec":$tPqEncode,""" +
      s""""pq_walk_sec":$tPqWalk,"pq_walk_recall":$rPqWalk,""" +
      s""""pq_rerank_sec":$tPqRerank,"pq_rerank_recall":$rPqRerank,""" +
      s""""vamana_search_sec":$tVamana}""")

    println(s"""{"experiment":"scale_bench","n":$n,"dims":$dims,"nq":$nq,""" +
      s""""count_sec":$warm,"flat_knn_sec":$tFlat,""" +
      s""""flat_knn_f32_sec":$tFlat32,"flat_knn_ff_sec":$tFlatFF,""" +
      s""""flat_knn_i8_sec":$tFlatI8,""" +
      s""""flat_pairs_per_sec":${pairsPerSec.toLong},""" +
      s""""leanvec_train_sec":$tLvTrain,"leanvec_search_sec":$tLv,""" +
      s""""leanvec_recall":$lvRecall,""" +
      s""""kmeans_train_sec":$tTrain,"partition_write_sec":$tPart,""" +
      s""""ivf_search_sec":$tIvf,""" +
      s""""leanvec_ivf_write_sec":$tLvIvfWrite,""" +
      s""""leanvec_ivf_search_sec":$tLvIvf,""" +
      s""""leanvec_ivf_recall":$lvIvfRecall,""" +
      s""""leanvec_ivf_aniso_write_sec":$tLvIvfWriteA,""" +
      s""""leanvec_ivf_aniso_search_sec":$tLvIvfA,""" +
      s""""leanvec_ivf_aniso_recall":$lvIvfRecallA,""" +
      s""""vamana_split_sec":$tSplit,"vamana_shards":${splitCents.length},""" +
      s""""vamana_build_sec":$tBuild,"vamana_search_sec":$tVamana}""")

    // SIMD twins (opt-in: SPARK_GRAFT_SCALE_SIMD=1): the same split, same
    // params, kernels routed through the Vector API (Metric.simd). The flat
    // path is scan-bound so the win there is modest; the Vamana build is
    // kernel-bound (per-node beam searches + robust prune inside each
    // shard), which is where the 2-3.6x per-pair kernel rate (KernelBench)
    // should surface as wall-clock. Recall of both graphs is scored against
    // the exact flat result to show the SIMD-built graph is as good.
    if (sys.env.get("SPARK_GRAFT_SCALE_SIMD").exists(_.nonEmpty)) {
      val simdL2 = Metric.simd(Metric.L2)
      val truth = FlatKnn.search(queries, data, k, Metric.L2)
        .select("query_id", "neighbor_id").cache()
      truth.count()
      def recallOf(res: org.apache.spark.sql.DataFrame): Double =
        res.select("query_id", "neighbor_id").intersect(truth).count()
          .toDouble / (k.toLong * nq)
      val (_, tFlatSimd) = time {
        FlatKnn.search(queries, data, k, simdL2).count() }
      // the f32 SIMD lane kernels on fully-float pairs — the fastest scan
      val (_, tFlatFFSimd) = time {
        FlatKnn.search(queriesF32, dataF32, k, simdL2).count() }
      // i8 SIMD scan: the byte lane kernels (B2D widen) over the 1/8-byte
      // table — the capacity-AND-speed end of the residency spectrum
      val (_, tFlatI8Simd) = time {
        FlatKnn.search(queries, dataI8, k, simdL2).count() }
      val (gSimd, tBuildSimd) = time {
        val g = Vamana.buildSharded(split, vParams, simdL2).cache()
        g.count(); g
      }
      val (rSimd, tVamanaSimd) = time {
        recallOf(Vamana.searchSharded(queries, split, gSimd, splitCents, k,
          searchWindow = 64, nProbes = 8, simdL2)) }
      val rScalar = recallOf(Vamana.searchSharded(queries, split, graph,
        splitCents, k, searchWindow = 64, nProbes = 8, Metric.L2))
      // tuned: every round-5 lever at once — SIMD kernels, f32-resident
      // shards, wide batches — the recommended 100 TB build configuration
      val splitF32 = split
        .withColumn("vec", col("vec").cast("array<float>")).cache()
      splitF32.count()
      val (gTuned, tBuildTuned) = time {
        val g = Vamana.buildSharded(splitF32,
          vParams.copy(batchSize = 256), simdL2).cache()
        g.count(); g
      }
      val rTuned = recallOf(Vamana.searchSharded(queries, splitF32, gTuned,
        splitCents, k, searchWindow = 64, nProbes = 8, simdL2))
      println(s"""{"experiment":"scale_bench_simd","n":$n,"dims":$dims,""" +
        s""""flat_knn_simd_sec":$tFlatSimd,""" +
        s""""flat_knn_ff_simd_sec":$tFlatFFSimd,""" +
        s""""flat_knn_i8_simd_sec":$tFlatI8Simd,""" +
        s""""vamana_build_simd_sec":$tBuildSimd,""" +
        s""""vamana_search_simd_sec":$tVamanaSimd,""" +
        s""""vamana_recall_simd":$rSimd,"vamana_recall_scalar":$rScalar,""" +
        s""""vamana_build_tuned_sec":$tBuildTuned,""" +
        s""""vamana_recall_tuned":$rTuned,""" +
        s""""build_speedup":${tBuild / tBuildSimd}}""")
    }

    // MaxSim late-interaction at 1M token vectors (250k 4-token bags):
    // exhaustive vs the two-stage pooled-prefilter path — the measured
    // form of q133's quality/cost dial at scale.
    {
      val bags = MaxSim.groupTokens(data.select("id", "vec"), 4)
      val msQueries = bags.filter(col("doc_id") % 5000 === 0)
        .select(col("doc_id").as("query_id"), col("dtok").as("qtok"),
          col("dvec").as("qvec")).cache()
      val nMsQ = msQueries.select("query_id").distinct().count()
      val (msExact, tMsExact) = time {
        val r = MaxSim.topK(msQueries, bags, k, Metric.Cosine)
          .select("query_id", "doc_id").cache()
        r.count(); r
      }
      val (msTwo, tMsTwo) = time {
        val r = MaxSim.topKTwoStage(msQueries, bags, k, candidates = 256,
            dims, Metric.Cosine)
          .select("query_id", "doc_id").cache()
        r.count(); r
      }
      val msRecall = msTwo.intersect(msExact).count().toDouble /
        (k.toLong * nMsQ)
      println(s"""{"experiment":"maxsim_probe","n_token_vecs":$n,""" +
        s""""n_bags":${n / 4},"n_queries":$nMsQ,"k":$k,""" +
        s""""exhaustive_sec":$tMsExact,"two_stage_sec":$tMsTwo,""" +
        s""""two_stage_candidates":256,"two_stage_recall":$msRecall}""")
      msExact.unpersist(); msTwo.unpersist(); msQueries.unpersist()
    }

    // PQ/ADC at 1M: codes-only probe scans (m=8 × k=16 over 64 dims —
    // 8 bytes of codes per vector; larger k moves LUT construction to a
    // kernel, the array-expression form here is the certified shape)
    {
      val pqP = Pq.trainLloyd(data, m = 8, k = 16, dims, iters = 2)
      val (pqCodes, tPqEnc) = time {
        val c = Pq.encode(data, pqP).cache(); c.count(); c
      }
      val (_, tPqAdc) = time {
        Pq.searchAdc(queries, pqCodes, pqP, k).count()
      }
      val pqRes = Pq.searchAdc(queries, pqCodes, pqP, k)
        .select("query_id", "neighbor_id")
      val pqRecall = pqRes.intersect(truth).count().toDouble /
        (k.toLong * nq)
      println(s"""{"experiment":"pq_probe","n":$n,"dims":$dims,""" +
        s""""m":8,"k_cents":16,"encode_sec":$tPqEnc,""" +
        s""""adc_search_sec":$tPqAdc,"adc_recall":$pqRecall}""")
      pqCodes.unpersist()
    }

    // Worst-case hot-shard probe (opt-in: SPARK_GRAFT_SCALE_ONESHARD=1):
    // build ONE Vamana graph over the whole 1M×128 dataset — the un-split
    // pathological shard — then the same data through splitOversized, and
    // compare build times and full-probe recall. This is the measurement
    // behind the SCALE.md claim that splitOversized bounds worst-case
    // per-shard build time: the single-shard build is the upper bound a
    // 100 TB deployment would hit if it skipped the split.
    if (sys.env.get("SPARK_GRAFT_SCALE_ONESHARD").exists(_.nonEmpty)) {
      val dims2 = 128
      val bp = BuildParams(maxDegree = 32, buildWindow = 64, alpha = 1.2,
        pruneTo = 28)
      val d2 = SyntheticData.generateMixed(spark, n, dims2)
        .repartition(cpus.toInt * 4).cache()
      d2.count()
      val q2 = SyntheticData.generateMixed(spark, n + nq, dims2)
        .filter(col("id") >= n)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      val truth = FlatKnn.search(q2, d2, k, Metric.L2)
        .select("query_id", "neighbor_id").cache()
      truth.count()
      def recallOf(res: org.apache.spark.sql.DataFrame): Double =
        res.select("query_id", "neighbor_id").intersect(truth).count()
          .toDouble / (k.toLong * nq)
      val one = d2.withColumn("cluster_id", lit(0L)).cache()
      val oneCents = Seq(0L -> Seq.fill(dims2)(0.5))
      val (g1, tOne) = time {
        val g = Vamana.buildSharded(one, bp, Metric.L2).cache()
        g.count(); g
      }
      val (r1, tS1) = time(recallOf(Vamana.searchSharded(q2, one, g1,
        oneCents, k, searchWindow = 64, nProbes = 1, Metric.L2)))
      g1.unpersist()
      val ((spl, splCents), tSpl) = time {
        val r = Vamana.splitOversized(one, oneCents, maxRows)
        r._1.cache().count(); r
      }
      val (g2, tMany) = time {
        val g = Vamana.buildSharded(spl, bp, Metric.L2).cache()
        g.count(); g
      }
      val (r2, tS2) = time(recallOf(Vamana.searchSharded(q2, spl, g2,
        splCents, k, searchWindow = 64, nProbes = splCents.length,
        Metric.L2)))
      println(s"""{"experiment":"one_shard_probe","n":$n,"dims":$dims2,""" +
        s""""build_params":"deg32_w64","one_shard_build_sec":$tOne,""" +
        s""""one_shard_recall":$r1,"one_shard_search_sec":$tS1,""" +
        s""""split_sec":$tSpl,"split_shards":${splCents.length},""" +
        s""""split_build_sec":$tMany,"split_recall":$r2,""" +
        s""""split_search_sec":$tS2}""")
    }

    // GEMM-shaped probe scoring crossover (reference BLAS batch scoring,
    // index/ivf/common.h:242-303): per-query sweep vs cache-tiled at
    // growing |Q|×|C|, outputs asserted identical. Driver-side kernels —
    // no Spark jobs — because that is where probe selection runs.
    if (sys.env.get("SPARK_GRAFT_SCALE_PROBESCORE").contains("1")) {
      import graft.operators.BatchScore
      val d = 64
      def mkRows(n: Int, seed: Long): Array[(Long, Array[Double])] =
        Array.tabulate(n) { i =>
          val r = new scala.util.Random(seed + i)
          (i.toLong, Array.fill(d)(r.nextDouble()))
        }
      Seq((1000, 20000), (4000, 40000), (10000, 100000), (20000, 200000))
        .foreach {
        case (nQ, nC) =>
          val q = mkRows(nQ, 1L); val c = mkRows(nC, 777L).toIndexedSeq
          val (a, tSweep) = time(
            BatchScore.probeTopKSweep(q, c, 8, Metric.L2))
          val (b, tTile) = time(
            BatchScore.probeTopKTiled(q, c, 8, Metric.L2))
          require(a.zip(b).forall { case (x, y) => x.sameElements(y) },
            "tiled != sweep")
          println(s"""{"experiment":"probe_score","n_queries":$nQ,""" +
            s""""n_centroids":$nC,"dims":$d,"sweep_sec":$tSweep,""" +
            s""""tiled_sec":$tTile,""" +
            s""""auto_tiled":${nQ.toLong * nC >= BatchScore.GemmPairThreshold}}""")
      }
    }

    // Executor-side probe scoring past driver comfort: 1e5 queries ×
    // 1e5 centroids (1e10 pairs — the cluster-scale batch the driver
    // should never hold). Centroids broadcast once; query partitions run
    // the tiled kernel locally. Driver twin is run at 1/10 the query
    // batch (same per-query cost) for a per-pair-rate comparison; full
    // equality is BatchScoreSpec's job.
    if (sys.env.get("SPARK_GRAFT_SCALE_PROBEDIST").contains("1")) {
      import graft.operators.BatchScore
      import spark.implicits._
      val d = 64
      val nQ = 100000
      val nC = 100000
      def mkRows(n: Int, seed: Long): Array[(Long, Array[Double])] =
        Array.tabulate(n) { i =>
          val r = new scala.util.Random(seed + i)
          (i.toLong, Array.fill(d)(r.nextDouble()))
        }
      val cents = mkRows(nC, 777L).map { case (i, v) => (i, v.toSeq) }.toSeq
      val qdf = spark.range(nQ).select(col("id").as("query_id"))
        .map { row =>
          val i = row.getLong(0)
          val r = new scala.util.Random(1L + i)
          (i, Array.fill(d)(r.nextDouble()).toSeq)
        }.toDF("query_id", "qvec")
        .repartition(32).cache()
      qdf.count()
      val (nRows, tDist) = time(
        BatchScore.probeTopKDistributed(qdf, cents, 8, Metric.L2).count())
      require(nRows == nQ.toLong * 8, s"expected ${nQ * 8} rows, got $nRows")
      val qSmall = mkRows(nQ / 10, 1L)
      val cArr = cents.map { case (i, v) => (i, v.toArray) }.toIndexedSeq
      val (_, tDriver) = time(
        BatchScore.probeTopK(qSmall, cArr, 8, Metric.L2))
      println(s"""{"experiment":"probe_score_dist","n_queries":$nQ,""" +
        s""""n_centroids":$nC,"dims":$d,"dist_sec":$tDist,""" +
        s""""driver_tenth_sec":$tDriver,""" +
        s""""dist_pairs_per_sec":${(nQ.toLong * nC / tDist).toLong}}""")
    }

    // Hierarchical probe routing at graph-index shard counts where the
    // flat centroid sweep dominates: level-1 = √C groups, so per-query
    // cost drops |C| → ~2√|C|. Reports flat vs two-level routing time
    // and the probe-set agreement at equal nProbes (routing quality).
    if (sys.env.get("SPARK_GRAFT_SCALE_HIER").contains("1")) {
      import graft.operators.{BatchScore, Vamana}
      val d = 64
      def mkRows(n: Int, seed: Long): Array[(Long, Array[Double])] =
        Array.tabulate(n) { i =>
          val r = new scala.util.Random(seed + i)
          (i.toLong, Array.fill(d)(r.nextDouble()))
        }
      Seq(10000, 40000, 100000).foreach { nC =>
        val nQ = 1000
        val q = mkRows(nQ, 1L)
        val cents = mkRows(nC, 777L).toIndexedSeq
        val nG = math.max(1, math.sqrt(nC.toDouble).toInt)
        val ((l1, groupOf), tTrain) = time(Vamana.trainRoutingLevel(
          cents.map { case (i, v) => (i, v.toSeq) }, nG, iters = 3))
        val l1Arr = l1.map { case (i, v) => (i, v.toArray) }.toIndexedSeq
        val (flat, tFlat) = time(
          BatchScore.probeTopK(q, cents, 8, Metric.L2))
        val l1Probes = math.max(4, nG / 16)
        val (hier, tHier) = time(BatchScore.probeTopKHierarchical(
          q, cents, l1Arr, groupOf, l1Probes, 8, Metric.L2))
        val overlap = flat.zip(hier).map { case (a, b) =>
          a.toSet.intersect(b.toSet).size.toDouble / a.length }.sum / nQ
        println(s"""{"experiment":"hier_routing","n_shards":$nC,""" +
          s""""n_queries":$nQ,"dims":$d,"n_groups":$nG,""" +
          s""""l1_probes":$l1Probes,"train_sec":$tTrain,""" +
          s""""flat_sec":$tFlat,"hier_sec":$tHier,""" +
          s""""probe_overlap":$overlap}""")
      }
    }
    spark.stop()
  }
}
