package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.Vamana
import graft.operators.VamanaKernel.BuildParams
import graft.sources.SvsIndexDir

class IndexImportSpec extends SparkSpec {

  test("parses the reference's committed vamana_config.toml fixture") {
    val cfg = SvsIndexDir.loadConfig(spark,
      "/root/reference/data/test_dataset/vamana_config.toml"
        .stripSuffix("/vamana_config.toml"))
    assert(cfg.entryPoint === 9426L)
    assert(cfg.maxDegree === 128)
    assert(cfg.windowSize === 200)
    assert(cfg.pruneTo === 128)
    assert(math.abs(cfg.alpha - 1.2) < 1e-6)
    assert(cfg.maxCandidatePool === 1000)
  }

  test("index directory round trip through the reference byte format " +
      "hash-matches the in-memory search") {
    val root = "/tmp/graft_svsindex_spec"
    val params = BuildParams(maxDegree = 16, buildWindow = 32)
    val data = Tables.embeddingVectors(spark, sfDir)
      .select("id", "vec").filter(col("id") < 100)
    val graph = Vamana.buildSingle(data, params, Metric.L2).cache()
    SvsIndexDir.save(spark, root, data, graph, params)

    val imported = SvsIndexDir.load(spark, root)
    val q = Tables.embeddingQueries(spark, sfDir)
    val viaImport = imported.search(q, 10)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq

    val inMem = VamanaVectorIndex(
      data.withColumn("cluster_id", lit(0L)), graph,
      Seq(0L -> Seq.fill(Tables.embDims)(0.0)),
      searchWindow = params.buildWindow, nProbes = 1, Metric.L2)
      .search(q, 10)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq

    assert(viaImport === inMem)
    assert(viaImport.nonEmpty)

    // imported config reproduces the build parameters we exported
    val cfg = SvsIndexDir.loadConfig(spark, s"$root/config")
    assert(cfg.maxDegree === 16)
    assert(cfg.windowSize === 32)

    // vectors survive the float32 blob bit-exactly
    val back = SvsIndexDir.loadData(spark, s"$root/data")
      .withColumnRenamed("vec", "vec_back")
    val mismatches = data.join(back, Seq("id"))
      .filter(not(col("vec") === col("vec_back"))).count()
    assert(mismatches === 0L)
  }

  test("element-typed export: i8/u8 datasets persist at one byte per " +
      "element with their signedness, f16 at two — and round-trip " +
      "exactly (no silent float32 widening)") {
    import graft.functions.ByteVecs
    import graft.sources.SvsNative
    val params = BuildParams(maxDegree = 8, buildWindow = 16)
    val emb = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
      .filter(col("id") < 80)
    val dims = Tables.embDims
    val n = emb.count()
    def blobBytes(root: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$root/data/data_0.svs")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }
    def roundTrips(root: String, table: org.apache.spark.sql.DataFrame)
        : Unit = {
      val back = SvsIndexDir.loadData(spark, s"$root/data")
        .withColumnRenamed("vec", "vec_back")
      assert(table.join(back, Seq("id"))
        .filter(not(col("vec") === col("vec_back"))).count() === 0L, root)
    }
    // i8 — eltype auto-detected from the declared signedness
    val i8 = ByteVecs.markSigned(emb.select(col("id"),
      ByteVecs.quantizeSigned(col("vec"), 64.0).as("vec"))).cache()
    val gI8 = Vamana.buildSingle(i8, params, Metric.L2).cache()
    val rootI8 = "/tmp/graft_svsindex_i8"
    SvsIndexDir.save(spark, rootI8, i8, gI8, params)
    assert(blobBytes(rootI8) === SvsNative.HeaderSize + n * dims,
      "i8 blob widened past one byte per element")
    val backI8 = SvsIndexDir.loadData(spark, s"$rootI8/data")
    assert(ByteVecs.isByteVec(backI8.schema("vec").dataType))
    assert(!ByteVecs.isUnsigned(backI8.schema, "vec"))
    roundTrips(rootI8, i8)
    // and the imported directory still SERVES byte-resident
    val viaImport = SvsIndexDir.load(spark, rootI8).search(
        Tables.embeddingQueries(spark, sfDir), 5)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(viaImport.nonEmpty)
    // u8 — raw byte patterns, unsigned mark, unsigned value space
    val u8 = ByteVecs.markUnsigned(emb.select(col("id"),
      ByteVecs.quantizeUnsigned(col("vec"), 64.0).as("vec"))).cache()
    val gU8 = Vamana.buildSingle(u8, params, Metric.L2).cache()
    val rootU8 = "/tmp/graft_svsindex_u8"
    SvsIndexDir.save(spark, rootU8, u8, gU8, params)
    assert(blobBytes(rootU8) === SvsNative.HeaderSize + n * dims)
    val backU8 = SvsIndexDir.loadData(spark, s"$rootU8/data")
    assert(ByteVecs.isUnsigned(backU8.schema, "vec"),
      "u8 export lost the unsigned mark")
    roundTrips(rootU8, u8)
    // f16 — integer-valued doubles are exactly half-representable
    val f16 = i8.select(col("id"),
      ByteVecs.widen(col("vec"), unsigned = false).as("vec")).cache()
    val gF16 = Vamana.buildSingle(f16, params, Metric.L2).cache()
    val rootF16 = "/tmp/graft_svsindex_f16"
    SvsIndexDir.save(spark, rootF16, f16, gF16, params,
      eltype = "float16")
    assert(blobBytes(rootF16) === SvsNative.HeaderSize + n * dims * 2,
      "f16 blob widened past two bytes per element")
    roundTrips(rootF16, f16)
  }

  test("parses the reference's committed ivf_clustering fixture and " +
      "serves a probe search over it") {
    val (cents, assign) = SvsIndexDir.loadIvfClustering(spark,
      "/root/reference/data/test_dataset/ivf_clustering")
    // structure: 128 clusters of 128-d bf16 centroids over 10k points,
    // every point assigned exactly once
    assert(cents.length === 128)
    assert(cents.forall(_._2.length === 128))
    assert(cents.forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
    assert(assign.count() === 10000L)
    assert(assign.select("id").distinct().count() === 10000L)
    assert(assign.agg(min("id"), max("id")).head().toSeq ===
      Seq(0L, 9999L))
    assert(assign.select("cluster_id").distinct().count() === 128L)

    // serve the q07 shape over the IMPORTED clustering: the fixture's
    // data blob is not in the snapshot, so attach deterministic vectors
    // by id; with exhaustive probes the imported-clustering search must
    // equal flat kNN over the same table (routing-independent truth)
    val data = graft.sources.SyntheticData.generate(spark, 10000L, 128)
    val clustered = data.join(assign, Seq("id"))
    val q = graft.sources.SyntheticData
      .generateQueries(spark, 10000L, 128, 2000L)
    val viaIvf = graft.operators.IvfIndex
      .search(q, clustered, cents, 10, nProbes = 128, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val flat = graft.operators.FlatKnn.search(q, data, 10, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(viaIvf === flat)
    assert(viaIvf.nonEmpty)
    // realistic probes return k rows per query through the imported
    // routing (centroids are usable, not just parseable)
    val probed = graft.operators.IvfIndex
      .search(q, clustered, cents, 10, nProbes = 8, Metric.L2)
    assert(probed.groupBy("query_id").count()
      .filter(col("count") =!= 10).count() === 0)
  }

  test("IVF clustering save/load round trip — including re-exporting " +
      "the reference's committed fixture byte-compatibly") {
    // the committed fixture re-exported through saveIvfClustering and
    // reloaded must be IDENTICAL (bf16 centroid values are exact in
    // float32; cluster ids are already dense)
    val (cents0, assign0) = SvsIndexDir.loadIvfClustering(spark,
      "/root/reference/data/test_dataset/ivf_clustering")
    val out = "/tmp/graft_ivf_clustering_rt"
    SvsIndexDir.saveIvfClustering(spark, out, cents0, assign0)
    val (cents1, assign1) = SvsIndexDir.loadIvfClustering(spark, out)
    assert(cents1 === cents0)
    assert(assign1.orderBy("cluster_id", "id").collect().map(_.toSeq)
      .toSeq ===
      assign0.orderBy("cluster_id", "id").collect().map(_.toSeq).toSeq)
    // non-dense original cluster ids remap densely but keep the
    // partition structure
    val s = spark
    import s.implicits._
    val myCents = Seq((10L, Seq(0.0, 0.0)), (20L, Seq(1.0, 1.0)))
    val myAssign = Seq((10L, 0L), (10L, 2L), (20L, 1L))
      .toDF("cluster_id", "id")
    val out2 = "/tmp/graft_ivf_clustering_rt2"
    SvsIndexDir.saveIvfClustering(spark, out2, myCents, myAssign)
    val (c2, a2) = SvsIndexDir.loadIvfClustering(spark, out2)
    assert(c2.map(_._1) === Seq(0L, 1L))
    assert(c2.map(_._2) === myCents.map(_._2))
    assert(a2.orderBy("cluster_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 0L), (0L, 2L), (1L, 1L)))
    // an assignment referencing a centroid-less cluster fails loudly at
    // save (it would otherwise drop members and pad the blob)
    val badAssign = Seq((10L, 0L), (77L, 1L)).toDF("cluster_id", "id")
    val eOrphan = intercept[IllegalArgumentException] {
      SvsIndexDir.saveIvfClustering(spark,
        "/tmp/graft_ivf_clustering_bad", myCents, badAssign)
    }
    assert(eOrphan.getMessage.contains("no centroid"))
  }
}
