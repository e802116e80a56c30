package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Metric

/** The single documented entry point for the clustered on-disk index layout
  * (the reference's serialized index directory: data + codec config in one
  * place, svs/index/ivf/index.h + its save/load schema): cluster-partitioned
  * parquet with the chosen codec's resident code columns attached at write
  * time, plus a `layout.json` sidecar recording the codec and its trained
  * parameters. `open` re-reads both, so a search over the layout can never
  * run against data whose codes were attached with different parameters —
  * the mistake this API removes.
  *
  * Layout on disk:
  * {{{
  * <path>/data/cluster_id=<c>/part-*.parquet   (codes resident per codec)
  * <path>/centroids/part-*.parquet
  * <path>/layout.json
  * }}}
  */
object IndexLayout {

  /** Resident-code codec for the coarse scan. */
  sealed trait Codec
  /** Full-precision layout: no code columns, coarse pass reads `vec`. */
  case object Uncompressed extends Codec
  /** Scalar quantization: resident `codes` ARRAY<SMALLINT> column
    * ([[IvfIndex.withResidentCodes]]); decode-free L2/IP/cosine scans. */
  final case class Sq(p: ScalarQuant.Params) extends Codec
  /** LVQ two-level residual codec: resident `(c1, lo1, s1, c2, lo2, s2)`
    * columns ([[IvfIndex.withResidentLvq]]). */
  final case class LvqC(p: Lvq.Params) extends Codec
  /** LeanVec learned reduction: resident `rvec` r-dim column
    * ([[IvfIndex.withResidentLeanVec]]); the trained model (mean +
    * projection + spectrum) persists in the sidecar — the reference's
    * LeanVecTrainingData save/load (training_impl.h:68-79). */
  final case class LeanVecC(m: LeanVec.Model) extends Codec
  /** IVFADC (Jégou et al. TPAMI'11 §IV): resident residual-PQ code
    * columns `c0..c{m−1}` quantizing `vec − coarse_centroid`; search
    * ranks by probe-pruned residual-LUT sums over codes only, so the
    * stored coarse pass never reads `vec`. Codebooks persist in the
    * sidecar with shortest-round-trip doubles. */
  final case class PqResC(p: Pq.Params) extends Codec

  final case class Layout(clustered: DataFrame,
                          centroids: Seq[(Long, Seq[Double])], codec: Codec,
                          routing: Option[(Seq[(Long, Seq[Double])],
                            Map[Long, Long])] = None,
                          routingMetricName: Option[String] = None)

  /** Write the clustered table (id, vec, cluster_id) + centroids + codec in
    * one call: attaches the codec's resident columns, then persists
    * cluster-partitioned so probe joins prune partitions at the source. */
  def write(clustered: DataFrame, centroids: Seq[(Long, Seq[Double])],
            path: String, codec: Codec = Uncompressed,
            routingGroups: Int = 0,
            routingMetric: Metric = Metric.L2): Unit = {
    val spark = clustered.sparkSession
    import spark.implicits._
    // byte stores persist their declared signedness in the sidecar (the
    // authoritative copy of the ByteVecs mark — open() restores it);
    // unmarked byte input fails loudly rather than writing ambiguity
    val byteU: Option[Boolean] =
      if (graft.functions.ByteVecs.isByteVec(clustered.schema("vec").dataType))
        Some(graft.functions.ByteVecs.requireSignedness(
          clustered.schema, "vec"))
      else None
    // half stores persist their declared f16/bf16 format the same way
    val halfF: Option[String] =
      if (graft.functions.HalfVecs.isShortVec(
        clustered.schema("vec").dataType))
        Some(graft.functions.HalfVecs.requireFormat(clustered.schema, "vec"))
      else None
    // Codec attachment is VALUE arithmetic (residual/quantize folds run on
    // element values): byte-resident inputs widen through the shared
    // mark-aware helper first so u8 never encodes in the sign-extended
    // space. The widened frame feeds ONLY the code computation — added
    // code columns join back onto the raw frame, so the persisted `vec`
    // stays byte-resident on disk.
    val wide = graft.functions.HalfVecs.widenedForMath(
      graft.functions.ByteVecs.widenedForMath(clustered, "vec"), "vec")
    def attach(f: DataFrame => DataFrame): DataFrame =
      if (wide eq clustered) f(clustered)
      else {
        val coded = f(wide)
        val newCols = coded.columns.filterNot(clustered.columns.contains)
        clustered.join(
          coded.select("cluster_id", ("id" +: newCols.toSeq): _*),
          Seq("cluster_id", "id"))
      }
    val withCodes = codec match {
      case Uncompressed => clustered
      case Sq(p) => attach(IvfIndex.withResidentCodes(_, p))
      case LvqC(p) => attach(IvfIndex.withResidentLvq(_, p))
      case LeanVecC(m) => attach(IvfIndex.withResidentLeanVec(_, m))
      case PqResC(p) => clustered.join(
        Pq.encodeResiduals(wide, centroids, p), Seq("cluster_id", "id"))
    }
    IvfIndex.writeClustered(withCodes, s"$path/data")
    centroids.toDF("id", "vec").write.mode("overwrite")
      .parquet(s"$path/centroids")
    // optional persisted level-1 routing table — the stored-IVF analog of
    // GraphLayout.write(routingGroups): trained for the serving metric,
    // persisted with the metric's name so a reopened layout routes
    // hierarchically without retraining and a mismatched searchRouted
    // fails loudly (reference: index/ivf/hierarchical_kmeans.h)
    if (routingGroups > 0) {
      require(Metric.byName(routingMetric.name.stripSuffix("_simd")).isDefined,
        s"routing metric '${routingMetric.name}' cannot round-trip the " +
          "sidecar (Metric.byName) — route with l2/ip/cosine")
      val (l1, groupOf) = Vamana.trainRoutingLevel(centroids, routingGroups,
        metric = routingMetric)
      l1.toDF("id", "vec").write.mode("overwrite")
        .parquet(s"$path/routing_l1")
      groupOf.toSeq.toDF("cluster_id", "group_id").write.mode("overwrite")
        .parquet(s"$path/routing_groups")
    }
    val codecJson = codec match {
      case Uncompressed => """{"type":"none"}"""
      case Sq(p) =>
        s"""{"type":"sq","scale":${p.scale},"bias":${p.bias},""" +
          s""""bits":${p.bits}}"""
      case LvqC(p) =>
        s"""{"type":"lvq","bits1":${p.bits1},"bits2":${p.bits2},""" +
          s""""mean":[${p.mean.mkString(",")}]}"""
      case LeanVecC(m) =>
        // Double.toString is shortest-round-trip, so the model reopens
        // bit-exactly and re-derived reductions match the resident column
        s"""{"type":"leanvec","mean":[${m.mean.mkString(",")}],""" +
          s""""proj":[${m.proj.map(r => s"[${r.mkString(",")}]")
            .mkString(",")}],""" +
          s""""eigvals":[${m.eigvals.mkString(",")}]}"""
      case PqResC(p) =>
        s"""{"type":"pqres","m":${p.m},"k":${p.k},"dims":${p.dims},""" +
          s""""books":[${p.codebooks.map(cb => "[" + cb.map(c =>
            "[" + c.mkString(",") + "]").mkString(",") + "]")
            .mkString(",")}]}"""
    }
    writeSidecar(spark, s"$path/layout.json",
      s"""{"codec":$codecJson,""" +
        s""""byte_unsigned":${byteU.map(_.toString).getOrElse("null")},""" +
        s""""half_format":${halfF.map(f => s""""$f"""").getOrElse("null")},""" +
        s""""routing_groups":$routingGroups,""" +
        s""""routing_metric":"${routingMetric.name.stripSuffix("_simd")}"}""")
  }

  /** Re-open a written layout: clustered data with its resident codes, the
    * centroid table, and the codec parameters the codes were built with. */
  def open(spark: SparkSession, path: String): Layout = {
    val json = readSidecar(spark, s"$path/layout.json")
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    val c = parsed \ "codec"
    val codec = (c \ "type").extract[String] match {
      case "none" => Uncompressed
      case "sq" => Sq(ScalarQuant.Params((c \ "scale").extract[Double],
        (c \ "bias").extract[Double], (c \ "bits").extract[Int]))
      case "lvq" => LvqC(Lvq.Params((c \ "mean").extract[Seq[Double]],
        (c \ "bits1").extract[Int], (c \ "bits2").extract[Int]))
      case "leanvec" => LeanVecC(LeanVec.Model(
        (c \ "mean").extract[Seq[Double]].toArray,
        (c \ "proj").extract[Seq[Seq[Double]]].map(_.toArray).toArray,
        (c \ "eigvals").extract[Seq[Double]].toArray))
      case "pqres" => PqResC(Pq.Params((c \ "m").extract[Int],
        (c \ "k").extract[Int], (c \ "dims").extract[Int],
        (c \ "books").extract[Seq[Seq[Seq[Double]]]]
          .map(_.map(_.toArray).toArray).toArray))
      case t => sys.error(s"unknown layout codec '$t' in $path/layout.json")
    }
    val byteU = (parsed \ "byte_unsigned") match {
      case JNull | JNothing => None
      case node             => Some(node.extract[Boolean])
    }
    val halfF = (parsed \ "half_format") match {
      case JNull | JNothing => None
      case node             => Some(node.extract[String])
    }
    val data0 = spark.read.parquet(s"$path/data")
    val data = (byteU, halfF) match {
      case (Some(u), _) if graft.functions.ByteVecs.isByteVec(
        data0.schema("vec").dataType) =>
        graft.functions.ByteVecs.markSignedness(data0, "vec", u)
      case (_, Some(f)) if graft.functions.HalfVecs.isShortVec(
        data0.schema("vec").dataType) =>
        graft.functions.HalfVecs.markHalf(data0, f, "vec")
      case _ => data0
    }
    // routing is sidecar-gated like the codec: a rewrite without
    // routingGroups records 0 and stale routing dirs are ignored
    val routingGroups = (parsed \ "routing_groups") match {
      case JNull | JNothing => 0
      case node             => node.extract[Int]
    }
    val routingMetricName = (parsed \ "routing_metric") match {
      case JNull | JNothing => None
      case node             => Some(node.extract[String])
    }
    val fsR = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val routing =
      if (routingGroups > 0 &&
        fsR.exists(new org.apache.hadoop.fs.Path(s"$path/routing_l1")) &&
        fsR.exists(new org.apache.hadoop.fs.Path(s"$path/routing_groups")))
        Some((
          spark.read.parquet(s"$path/routing_l1").select("id", "vec")
            .collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
            .toIndexedSeq.sortBy(_._1).toSeq,
          spark.read.parquet(s"$path/routing_groups")
            .select("cluster_id", "group_id").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap))
      else None
    Layout(data,
      spark.read.parquet(s"$path/centroids").select("id", "vec").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
        .toIndexedSeq.sortBy(_._1),
      codec, routing,
      if (routingGroups > 0) routingMetricName else None)
  }

  /** Search the layout with the codec-matched coarse scan: SQ layouts run
    * the decode-free code scan + full-precision reorder, LVQ layouts the
    * two-level re-rank, uncompressed layouts the plain probe join. */
  def search(layout: Layout, queries: DataFrame, k: Int, nProbes: Int,
             metric: Metric, kReorder: Int = 3): DataFrame = {
    // byte-resident stores serve through the mark-aware widen: the
    // declarative scans (metric.column, re-rank passes) accept
    // ARRAY<FLOAT|DOUBLE> only, and an unwidened cast would sign-extend
    // u8. The transform is column-pruned away wherever a pass reads only
    // code columns, so codes-only coarse passes pay nothing.
    val cl = graft.functions.HalfVecs.widenedForMath(
      graft.functions.ByteVecs.widenedForMath(layout.clustered, "vec"),
      "vec")
    layout.codec match {
      case Uncompressed =>
        IvfIndex.search(queries, cl, layout.centroids, k, nProbes, metric)
      case Sq(p) =>
        require(metric == Metric.L2, "SQ layout reorder search is L2-only")
        IvfIndex.searchWithReorder(queries, cl, layout.centroids,
          p, k, nProbes, kReorder)
      case LvqC(p) =>
        require(metric == Metric.L2, "LVQ layout search is L2-only")
        IvfIndex.searchWithLvqReorder(queries, cl,
          layout.centroids, p, k, nProbes, kReorder)
      case LeanVecC(m) =>
        require(metric == Metric.L2, "LeanVec layout search is L2-only")
        IvfIndex.searchWithLeanVecReorder(queries, cl,
          layout.centroids, m, k, nProbes, kReorder)
      case PqResC(p) =>
        require(metric == Metric.L2, "IVFADC layout search is L2-only " +
          "(the residual decomposition is an L2 identity)")
        Pq.searchIvfAdc(queries, cl, layout.centroids, p, k, nProbes)
    }
  }

  /** [[search]] routed through the PERSISTED level-1 table
    * ([[write]]'s `routingGroups`) — the stored-IVF twin of
    * [[GraphLayout.searchRouted]]: probe selection scores the l1 groups
    * first and only their member centroids after
    * ([[BatchScore.probeTopKHierarchical]]), then the codec-matched scan
    * runs unchanged on the selected probes. At `l1Probes = |l1|` probe
    * selection is bit-identical to the flat sweep, so searchRouted ≡
    * [[search]] (IndexRoutingSpec). */
  def searchRouted(layout: Layout, queries: DataFrame, k: Int,
                   l1Probes: Int, nProbes: Int, metric: Metric,
                   kReorder: Int = 3): DataFrame = {
    val (l1, groupOf) = layout.routing.getOrElse(sys.error(
      "layout has no routing level — write(routingGroups = …) first"))
    layout.routingMetricName.foreach { rm =>
      require(metric.name.stripSuffix("_simd") == rm,
        s"layout routing level was trained for metric '$rm' but " +
          s"searchRouted got '${metric.name}' — rewrite the layout with " +
          s"routingMetric = ${metric.name} or serve with '$rm'")
    }
    // one route closure shared by every codec branch (the Uncompressed
    // branch routes through IvfIndex.searchHierarchical, which rebuilds
    // the same selection from (l1, groupOf) — same inputs, same kernel)
    lazy val route: IvfIndex.ProbeRoute = {
      val l1Arr = l1.sortBy(_._1)
        .map { case (i, v) => (i, v.toArray) }.toIndexedSeq
      BatchScore.probeTopKHierarchical(_, _, l1Arr, groupOf, l1Probes,
        nProbes, metric)
    }
    val cl = graft.functions.HalfVecs.widenedForMath(
      graft.functions.ByteVecs.widenedForMath(layout.clustered, "vec"),
      "vec")
    layout.codec match {
      case Uncompressed =>
        IvfIndex.searchHierarchical(queries, cl,
          layout.centroids, l1, groupOf, k, l1Probes, nProbes, metric)
      case Sq(p) =>
        require(metric == Metric.L2, "SQ layout reorder search is L2-only")
        IvfIndex.searchWithReorder(queries, cl,
          layout.centroids, p, k, nProbes, kReorder, Some(route))
      case LvqC(p) =>
        require(metric == Metric.L2, "LVQ layout search is L2-only")
        IvfIndex.searchWithLvqReorder(queries, cl,
          layout.centroids, p, k, nProbes, kReorder, Some(route))
      case LeanVecC(m) =>
        require(metric == Metric.L2, "LeanVec layout search is L2-only")
        IvfIndex.searchWithLeanVecReorder(queries, cl,
          layout.centroids, m, k, nProbes, kReorder, Some(route))
      case PqResC(p) =>
        require(metric == Metric.L2, "IVFADC layout search is L2-only " +
          "(the residual decomposition is an L2 identity)")
        Pq.searchIvfAdc(queries, cl, layout.centroids, p, k,
          nProbes, Some(route))
    }
  }

  /** ONE serving entry point for the stored-IVF codec layouts — the
    * [[GraphLayout.serve]] posture (reference: one type-erased
    * `search()`, orchestrators/manager.h:217) applied here: routes
    * through the persisted level-1 when the layout HAS one and the
    * caller asks for routing (`l1Probes > 0`), falls back to the flat
    * probe sweep otherwise — so one call signature serves every codec
    * (Uncompressed/SQ/LVQ/LeanVec/IVFADC) and every layout, routed or
    * not. There is no local/cogroup regime choice on this family: every
    * coarse pass already broadcasts the probe list and scans only the
    * probed `cluster_id=` partitions (PlanSpec pins the
    * PartitionFilters), so corpus rows never shuffle on ANY path.
    * At `l1Probes = |l1|` routed ≡ flat bit-for-bit (IndexRoutingSpec),
    * making the dispatch a pure cost decision like serve()'s. */
  def serve(layout: Layout, queries: DataFrame, k: Int, nProbes: Int,
            metric: Metric, l1Probes: Int = 0,
            kReorder: Int = 3): DataFrame =
    if (layout.routing.isDefined && l1Probes > 0)
      searchRouted(layout, queries, k, l1Probes, nProbes, metric, kReorder)
    else
      search(layout, queries, k, nProbes, metric, kReorder)

  private def writeSidecar(spark: SparkSession, path: String,
                           json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  private def readSidecar(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no layout sidecar at $p")
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
