package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Import/export of the reference's saved Vamana index directories
  * (reference `index/vamana/index.h:782-818`: three directories — config,
  * graph, data — each holding an `svs_config.toml` plus, for graph/data, a
  * native `.svs` blob):
  *
  *  - config: `vamana_index_parameters` table — entry_point + build/search
  *    parameters (`data/test_dataset/vamana_config.toml` is the committed
  *    fixture of this shape).
  *  - graph: `default_graph` table (`core/graph/graph.h:277-304`) over a v1
  *    `.svs` blob of `uint32` rows with `dims = max_degree + 1`; each row is
  *    `[degree, n_0 … n_{degree-1}, 0-pad]` (`graph.h:51-79`).
  *  - data: `uncompressed_data` table (`core/data/simple.h`) over a v1
  *    `.svs` blob of `eltype` elements (float32/float16/bfloat16/float64).
  *
  * A user migrating from the reference imports an existing index instead of
  * rebuilding; `save` writes the same layout back for the reverse trip.
  * Blobs are single dense files (the reference's fixture/export format, not
  * bulk storage) — convert to parquet once imported if the index will live
  * in this engine.
  */
object SvsIndexDir {

  case class VamanaConfig(entryPoint: Long, alpha: Double, maxDegree: Int,
                          windowSize: Int, maxCandidatePool: Int,
                          pruneTo: Int)

  case class ComponentMeta(schema: String, fields: Map[String, String])

  // ---- minimal TOML field scraper -----------------------------------------
  // The reference configs are flat `key = value` tables under nested
  // [object...] headers with unique keys per file, so a line scraper
  // suffices; values keep their last occurrence.

  private def readText(spark: SparkSession, p: Path): String = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"missing $p")
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    new String(bytes, StandardCharsets.UTF_8)
  }

  private val KeyVal = """^\s*([A-Za-z0-9_]+)\s*=\s*(.+?)\s*$""".r

  def parseToml(text: String): Map[String, String] =
    text.linesIterator.collect {
      case KeyVal(k, v) =>
        k -> v.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
    }.toMap

  private def configToml(spark: SparkSession, dir: String): Map[String, String] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val candidates = Seq("svs_config.toml", "vamana_config.toml")
      .map(new Path(d, _)).filter(fs.exists) ++ {
      if (fs.exists(d) && fs.getFileStatus(d).isDirectory)
        fs.listStatus(d).map(_.getPath)
          .filter(_.getName.endsWith(".toml")).toSeq
      else Seq.empty
    }
    require(candidates.nonEmpty, s"no TOML in $dir")
    parseToml(readText(spark, candidates.head))
  }

  /** Parse a `vamana_index_parameters` config directory (or file). */
  def loadConfig(spark: SparkSession, dir: String): VamanaConfig = {
    val t = configToml(spark, dir)
    require(t.get("__schema__").forall(s =>
      s == "vamana_index_parameters" || s == "vamana index parameters") ||
      t.contains("entry_point"), s"not a vamana index config: $dir")
    VamanaConfig(
      entryPoint = t("entry_point").toLong,
      alpha = t.get("alpha").map(_.toDouble).getOrElse(1.2),
      maxDegree = t.get("graph_max_degree").map(_.toInt).getOrElse(0),
      windowSize = t.get("window_size").map(_.toInt).getOrElse(0),
      maxCandidatePool =
        t.get("max_candidate_pool_size").map(_.toInt).getOrElse(0),
      pruneTo = t.get("prune_to").map(_.toInt).getOrElse(0))
  }

  private def readBlob(spark: SparkSession, dir: String, name: String)
      : Array[Byte] = {
    val p = new Path(new Path(dir), name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    bytes
  }

  /** Load a saved `default_graph` directory → (id BIGINT, neighbors
    * ARRAY<BIGINT>), ids dense row order. */
  def loadGraph(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = configToml(spark, dir)
    require(t.get("__schema__").forall(_ == "default_graph") ||
      t.contains("max_degree"), s"not a graph dir: $dir")
    require(t.get("eltype").forall(_ == "uint32"),
      s"unsupported graph index type ${t.get("eltype")}")
    val maxDegree = t("max_degree").toInt
    val bytes = readBlob(spark, dir, t("binary_file"))
    val h = SvsNative.readHeader(bytes)
    require(h.dims == maxDegree + 1,
      s"graph blob dims ${h.dims} != max_degree+1 ${maxDegree + 1}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(SvsNative.HeaderSize)
    val rows = (0 until h.numVectors.toInt).map { r =>
      val deg = bb.getInt
      require(deg >= 0 && deg <= maxDegree, s"row $r: degree $deg")
      val nbs = new Array[Long](deg)
      var i = 0
      while (i < deg) { nbs(i) = bb.getInt.toLong & 0xffffffffL; i += 1 }
      var skip = maxDegree - deg
      while (skip > 0) { bb.getInt; skip -= 1 }
      (r.toLong, nbs.toSeq)
    }
    spark.createDataset(rows).toDF("id", "neighbors")
  }

  /** Load a saved `uncompressed_data` directory → (id BIGINT, vec
    * ARRAY<DOUBLE>), ids dense row order. f16/bf16 payloads widen through
    * the same conversions as graft.functions.Binary16. */
  def loadData(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = configToml(spark, dir)
    val dims = t("dims").toInt
    val el = t.getOrElse("eltype", "float32")
    val bytes = readBlob(spark, dir, t("binary_file"))
    val h = SvsNative.readHeader(bytes)
    require(h.dims == dims, s"data blob dims ${h.dims} != $dims")
    val rows = decodeSvsVectors(bytes, h.numVectors.toInt, dims, el)
    val df = spark.createDataset(rows).toDF("id", "vec")
    // byte eltypes land BYTE-RESIDENT with the matching signedness mark
    // (values from the decode are exact integers): full residency parity
    // with the on-disk width, same as the engine's own byte tables
    el match {
      case "int8" =>
        graft.functions.ByteVecs.markSigned(df.select(col("id"),
          org.apache.spark.sql.functions.transform(col("vec"),
            x => x.cast("byte")).as("vec")))
      case "uint8" =>
        graft.functions.ByteVecs.markUnsigned(df.select(col("id"),
          org.apache.spark.sql.functions.transform(col("vec"), x =>
            org.apache.spark.sql.functions.when(x > 127, x - 256)
              .otherwise(x).cast("byte")).as("vec")))
      case _ => df
    }
  }

  /** Decode an eltype-tagged v1 `.svs` payload into dense-id rows —
    * shared by [[loadData]] and [[loadIvfClustering]]'s centroid blob. */
  private def decodeSvsVectors(bytes: Array[Byte], n: Int, dims: Int,
                               el: String): Seq[(Long, Seq[Double])] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(SvsNative.HeaderSize)
    (0 until n).map { r =>
      val v = new Array[Double](dims)
      var i = 0
      el match {
        case "float32" =>
          while (i < dims) { v(i) = bb.getFloat.toDouble; i += 1 }
        case "float64" =>
          while (i < dims) { v(i) = bb.getDouble; i += 1 }
        case "float16" =>
          while (i < dims) {
            v(i) = graft.functions.Binary16.halfToFloat(bb.getShort).toDouble
            i += 1 }
        case "bfloat16" =>
          while (i < dims) {
            v(i) = java.lang.Float
              .intBitsToFloat((bb.getShort & 0xffff) << 16).toDouble
            i += 1 }
        case "int8" =>
          while (i < dims) { v(i) = bb.get.toDouble; i += 1 }
        case "uint8" =>
          while (i < dims) { v(i) = (bb.get & 0xff).toDouble; i += 1 }
        case other => sys.error(s"unsupported data eltype $other")
      }
      (r.toLong, v.toSeq)
    }
  }

  /** Load a saved `IVF clustering` directory (reference
    * index/ivf/clustering.h:166-210, fixture
    * data/test_dataset/ivf_clustering): `svs_config.toml` + a clusters
    * blob — `u64 n_clusters`, then per cluster `u64 size` + `size`
    * member ids of `integer_type` — + the centroid table's v1 `.svs`
    * blob ([object.centroids], any supported eltype). Returns the
    * engine's IVF shape: (centroids for probe routing, assignment
    * DataFrame (cluster_id BIGINT, id BIGINT)). Join the assignment with
    * a vector table on `id` and the result serves [[graft.operators
    * .IvfIndex.search]] directly (IndexImportSpec does exactly this). */
  def loadIvfClustering(spark: SparkSession, dir: String)
      : (Seq[(Long, Seq[Double])], DataFrame) = {
    import spark.implicits._
    val text = readText(spark,
      new Path(new Path(dir), "svs_config.toml"))
    require(text.contains("'IVF clustering'") ||
      text.contains("\"IVF clustering\""),
      s"not an IVF clustering directory: $dir")
    // flat scrape is safe here: the keys we need are unique across the
    // top-level table and the single [object.centroids] sub-table
    val t = parseToml(text)
    val intType = t.getOrElse("integer_type", "uint32")
    require(intType == "uint32" || intType == "uint64",
      s"unsupported clustering integer_type $intType")
    val nClusters = t("num_clusters").toLong
    val blob = readBlob(spark, dir, t("filepath"))
    t.get("filesize").foreach { fsz =>
      require(blob.length.toLong == fsz.toLong,
        s"clusters blob ${blob.length} bytes, config says $fsz") }
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong
    require(n == nClusters, s"blob has $n clusters, config says $nClusters")
    val members = Seq.newBuilder[(Long, Long)]
    var c = 0L
    while (c < n) {
      var sz = bb.getLong
      require(sz >= 0 && sz <= Int.MaxValue, s"cluster $c size $sz")
      while (sz > 0) {
        val id =
          if (intType == "uint32") bb.getInt.toLong & 0xffffffffL
          else bb.getLong
        members += ((c, id))
        sz -= 1
      }
      c += 1
    }
    require(bb.remaining() == 0,
      s"${bb.remaining()} trailing bytes in ${t("filepath")}")
    // centroids: the [object.centroids] sub-table's .svs blob
    val cBytes = readBlob(spark, dir, t("binary_file"))
    val h = SvsNative.readHeader(cBytes)
    val dims = t("dims").toInt
    require(h.dims == dims && h.numVectors == nClusters,
      s"centroid blob ${h.numVectors}x${h.dims}, config $nClusters x $dims")
    val cents = decodeSvsVectors(cBytes, nClusters.toInt, dims,
      t.getOrElse("eltype", "float32"))
    (cents, spark.createDataset(members.result())
      .toDF("cluster_id", "id"))
  }

  /** Import a full saved index. `root` either contains `config`, `graph`,
    * `data` subdirectories (the bindings' conventional layout) or the three
    * directories are given explicitly. Returns a ready-to-search
    * [[graft.VamanaVectorIndex]] (single shard, the reference's
    * whole-dataset graph shape). */
  def load(spark: SparkSession, root: String): graft.VamanaVectorIndex =
    load(spark, s"$root/config", s"$root/graph", s"$root/data")

  def load(spark: SparkSession, configDir: String, graphDir: String,
           dataDir: String): graft.VamanaVectorIndex = {
    val cfg = loadConfig(spark, configDir)
    val data = loadData(spark, dataDir)
    val graph = loadGraph(spark, graphDir)
    val dims = data.select(size(col("vec"))).first().getInt(0)
    val clustered = data.withColumn("cluster_id", lit(0L))
    val graphTable = graph
      .withColumn("cluster_id", lit(0L))
      .withColumn("entry_id", lit(cfg.entryPoint))
      .select("cluster_id", "id", "entry_id", "neighbors")
    graft.VamanaVectorIndex(clustered, graphTable,
      Seq(0L -> Seq.fill(dims)(0.0)),
      searchWindow = math.max(cfg.windowSize, 1), nProbes = 1,
      graft.core.Metric.L2)
  }

  /** Reverse trip of [[loadIvfClustering]] (reference `save_clustering`,
    * bindings ivf.cpp): write (centroids, assignment) in the saved
    * `IVF clustering` layout — clusters blob (u64 count + per-cluster
    * u64 size + uint32 member ids, clusters ascending, members in
    * ascending id order) + float32 centroid `.svs` + `svs_config.toml`.
    * Member ids must fit uint32 (the fixture's integer_type). Cluster
    * ids REMAP to dense 0..n−1 in ascending original order (the format's
    * cluster index IS its blob position) — a reload therefore returns
    * dense ids; already-dense inputs round-trip identically. */
  def saveIvfClustering(spark: SparkSession, dir: String,
                        centroids: Seq[(Long, Seq[Double])],
                        assignment: DataFrame): Unit = {
    val cents = centroids.sortBy(_._1)
    require(cents.nonEmpty, "no centroids")
    val dims = cents.head._2.length
    val members = assignment
      .select(col("cluster_id").cast("long"), col("id").cast("long"))
      .orderBy("cluster_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    members.foreach { case (_, id) =>
      require(id >= 0 && id <= 0xffffffffL, s"id $id does not fit uint32") }
    val byCluster = members.groupBy(_._1)
    // every assigned cluster must have a centroid — an orphan member
    // would be silently dropped AND leave zero-padding the loader rejects
    val orphans = byCluster.keySet -- cents.map(_._1).toSet
    require(orphans.isEmpty,
      s"assignment references cluster(s) ${orphans.take(5).mkString(", ")}" +
        " with no centroid")
    // clusters blob: every cluster id 0..n-1 present (empty ⇒ size 0)
    val n = cents.length
    val total = members.length
    val bb = ByteBuffer.allocate(8 + n * 8 + total * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(n.toLong)
    cents.foreach { case (cid, _) =>
      val ms = byCluster.getOrElse(cid, Array.empty[(Long, Long)])
      bb.putLong(ms.length.toLong)
      ms.foreach { case (_, id) => bb.putInt(id.toInt) }
    }
    val blobName = "clusters_0.bin"
    val bp = new Path(new Path(dir), blobName)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(bp, true)
    os.write(bb.array()); os.close()
    // centroid .svs (float32), dense ids 0..n-1 in cluster-id order
    import spark.implicits._
    SvsNative.write(
      cents.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
        .toDF("id", "vec"),
      s"$dir/data_1.svs", VecsIO.F32)
    writeText(spark, new Path(new Path(dir), "svs_config.toml"),
      s"""__version__ = 'v0.0.2'
         |
         |[object]
         |__schema__ = 'IVF clustering'
         |__version__ = 'v0.0.0'
         |data_type = 'float32'
         |filepath = '$blobName'
         |filesize = ${bb.array().length}
         |integer_type = 'uint32'
         |num_clusters = $n
         |
         |    [object.centroids]
         |    __schema__ = 'uncompressed_data'
         |    __version__ = 'v0.0.0'
         |    binary_file = 'data_1.svs'
         |    dims = $dims
         |    eltype = 'float32'
         |    name = 'uncompressed'
         |    num_vectors = $n
         |    uuid = '00000000-0000-0000-0000-000000000000'
         |""".stripMargin)
  }

  // ---- export (the reverse trip) ------------------------------------------

  private def writeText(spark: SparkSession, p: Path, text: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    os.write(text.getBytes(StandardCharsets.UTF_8))
    os.close()
  }

  /** Write (config, graph, data) in the reference's directory layout under
    * `root/{config,graph,data}`. `graph` must be a single-shard graph table
    * (cluster_id, id, entry_id, neighbors) with dense ids 0..n-1.
    *
    * `eltype` picks the data blob's element width (reference
    * svs_config.toml vocabulary: float64/float32/float16/bfloat16/
    * int8/uint8); empty = auto — byte-resident tables export at their
    * DECLARED signedness (int8/uint8, one byte per element, mark-aware
    * value space), everything else as float32 (the historical default).
    * Before round 9 byte and half datasets silently widened to
    * float32 here while the import side already dispatched eltypes. */
  def save(spark: SparkSession, root: String, data: DataFrame,
           graph: DataFrame, params: graft.operators.VamanaKernel.BuildParams,
           eltype: String = ""): Unit = {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val el =
      if (eltype.nonEmpty) eltype
      else data.schema("vec").dataType match {
        case ArrayType(ByteType, _) =>
          if (graft.functions.ByteVecs.requireSignedness(data.schema, "vec"))
            "uint8"
          else "int8"
        case _ => "float32"
      }
    // byte vecs widen mark-aware into VALUE space first (a raw
    // array<tinyint> → array<double> cast would sign-extend u8 raw
    // bytes); writeEltype then re-narrows into the declared eltype
    val dataV = graft.functions.ByteVecs.widenedForMath(data, "vec")
    val entry = graph.select("entry_id").first().getLong(0)
    // config
    writeText(spark, new Path(s"$root/config/svs_config.toml"),
      s"""__version__ = 'v0.0.2'
         |
         |[object]
         |__schema__ = 'vamana_index_parameters'
         |__version__ = 'v0.0.3'
         |entry_point = $entry
         |name = 'vamana index parameters'
         |
         |    [object.build_parameters]
         |    __schema__ = 'vamana_build_parameters'
         |    __version__ = 'v0.0.1'
         |    alpha = ${params.alpha}
         |    graph_max_degree = ${params.maxDegree}
         |    max_candidate_pool_size = ${params.maxCandidatePool}
         |    name = 'vamana build parameters'
         |    prune_to = ${params.pruneTarget}
         |    use_full_search_history = true
         |    window_size = ${params.buildWindow}
         |
         |    [object.search_parameters]
         |    __schema__ = 'vamana_search_parameters'
         |    __version__ = 'v0.0.1'
         |    prefetch_lookahead = 0
         |    prefetch_step = 0
         |    search_buffer_capacity = 0
         |    search_buffer_visited_set = false
         |    search_window_size = 0
         |""".stripMargin)

    // data blob (element-typed v1 .svs) + component toml — dims/count
    // from cheap aggregates; writeEltype does the single full collect
    val dims = dataV
      .select(org.apache.spark.sql.functions.size(col("vec"))).first()
      .getInt(0)
    val nRows = dataV.count()
    SvsNative.writeEltype(dataV, s"$root/data/data_0.svs", el)
    writeText(spark, new Path(s"$root/data/svs_config.toml"),
      s"""__version__ = 'v0.0.2'
         |
         |[object]
         |__schema__ = 'uncompressed_data'
         |__version__ = 'v0.0.0'
         |binary_file = 'data_0.svs'
         |dims = $dims
         |eltype = '$el'
         |name = 'uncompressed'
         |num_vectors = $nRows
         |uuid = '00000000-0000-0000-0000-000000000000'
         |""".stripMargin)

    // graph blob: uint32 rows [degree, neighbors..., pad] with
    // dims = max_degree + 1
    val graphRows = graph.select(col("id").cast("long"),
        col("neighbors").cast("array<long>")).orderBy("id").collect()
    val maxDegree = params.maxDegree
    val bb = ByteBuffer.allocate(SvsNative.HeaderSize +
        graphRows.length * (maxDegree + 1) * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(SvsNative.Magic)
    bb.put(new Array[Byte](16))
    bb.putLong(graphRows.length.toLong)
    bb.putLong(maxDegree.toLong + 1)
    bb.position(SvsNative.HeaderSize)
    graphRows.foreach { r =>
      val nbs = r.getSeq[Long](1)
      require(nbs.length <= maxDegree,
        s"row ${r.getLong(0)}: degree ${nbs.length} > $maxDegree")
      bb.putInt(nbs.length)
      nbs.foreach(nb => bb.putInt(nb.toInt))
      var pad = maxDegree - nbs.length
      while (pad > 0) { bb.putInt(0); pad -= 1 }
    }
    val gp = new Path(s"$root/graph/graph_0.svs")
    val gfs = gp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gos = gfs.create(gp, true)
    gos.write(bb.array()); gos.close()
    writeText(spark, new Path(s"$root/graph/svs_config.toml"),
      s"""__version__ = 'v0.0.2'
         |
         |[object]
         |__schema__ = 'default_graph'
         |__version__ = 'v0.0.0'
         |binary_file = 'graph_0.svs'
         |eltype = 'uint32'
         |max_degree = $maxDegree
         |name = 'graph'
         |num_vertices = ${graphRows.length}
         |uuid = '00000000-0000-0000-0000-000000000000'
         |""".stripMargin)
  }
}
