package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Persisted sharded-Vamana index directory — the graph analog of
  * [[IndexLayout]] (IVF layouts) and `TextIndex.buildIndex` (text), and the
  * Spark equivalent of the reference's three-directory Vamana save
  * (index/vamana/index.h:788-802: config TOML + graph blob + data blob,
  * loaded back by `SvsIndexDir` for the reference fixtures):
  *
  *   path/data      — (id, vec) cluster-partitioned parquet
  *   path/graph     — (id, entry_id, neighbors) cluster-partitioned parquet
  *   path/centroids — probe-routing centroids
  *   path/codes     — optional PQ codes, cluster-partitioned (DiskANN
  *                    serving: the walk reads THIS, never `data`)
  *   path/bincodes  — optional sign-bit word codes (8 B/row — the
  *                    smallest serving footprint), cluster-partitioned
  *   path/layout.json — PQ codebooks / binary thresholds sidecar
  *                    (shortest-round-trip doubles, so reopened ADC and
  *                    Hamming arithmetic are bit-identical)
  *
  * Every component is partitioned by `cluster_id`, so a served search reads
  * only the probed shards' partitions of graph + codes (plus the candidate
  * rows of `data` when reranking) — the corpus is never rescanned. At
  * 100 TB this is the index lifecycle: build once with
  * [[Vamana.buildSharded]], persist, serve probe-pruned from object
  * storage.
  */
object GraphLayout {

  final case class Layout(clustered: DataFrame, graph: DataFrame,
                          codes: Option[DataFrame],
                          centroids: Seq[(Long, Seq[Double])],
                          pq: Option[Pq.Params],
                          binCodes: Option[DataFrame] = None,
                          bin: Option[BinaryQuant.Params] = None,
                          binVersion: Int = 1,
                          routing: Option[(Seq[(Long, Seq[Double])],
                            Map[Long, Long])] = None,
                          routingMetricName: Option[String] = None,
                          path: Option[String] = None)

  /** Byte vec columns widened for VALUE arithmetic (centroid means, PQ /
    * sign-bit encodes) — the shared mark-aware helper: a raw TINYINT fold
    * would sign-extend u8 raw bytes (200 → −56) into the wrong value
    * space, silently skewing refreshed centroids and re-encoded codes. */
  private def widenedForMath(df: DataFrame): DataFrame =
    graft.functions.HalfVecs.widenedForMath(
      graft.functions.ByteVecs.widenedForMath(df, "vec"), "vec")

  /** Persist a built index. `clustered` (id, vec, cluster_id) and `graph`
    * are [[Vamana.buildSharded]]'s input/output; when `pq` is given the
    * codes table is derived here so codes and codebooks can never drift. */
  def write(clustered: DataFrame, graph: DataFrame,
            centroids: Seq[(Long, Seq[Double])], path: String,
            pq: Option[Pq.Params] = None,
            bin: Option[BinaryQuant.Params] = None,
            routingGroups: Int = 0,
            routingMetric: Metric = Metric.L2,
            binVersion: Int = 2): Unit = {
    // bincodes layout versions: 1 = 32 bits per BIGINT word (words-as-
    // doubles heritage), 2 = full 64-bit density (DEFAULT — half the
    // store bytes and walk state; serving is bit-identical, see
    // BinaryQuant.codeColumns64). The version is a STORE property
    // recorded in the sidecar; v1 remains writable for old readers.
    require(binVersion == 1 || binVersion == 2,
      s"unknown bincodes layout version $binVersion (supported: 1, 2)")
    val spark = clustered.sparkSession
    import spark.implicits._
    // byte stores persist their DECLARED signedness in the sidecar: the
    // schema mark alone can be stripped by external rewrites of the data
    // dir, and a u8 store served as i8 is silent corruption — open()
    // restores the mark from here. Unmarked byte input fails loudly now
    // rather than writing an ambiguous store.
    val byteU: Option[Boolean] =
      if (graft.functions.ByteVecs.isByteVec(clustered.schema("vec").dataType))
        Some(graft.functions.ByteVecs.requireSignedness(
          clustered.schema, "vec"))
      else None
    // half stores persist their DECLARED format the same way: an f16
    // store reopened as bf16 (or served bare) is silent corruption
    val halfF: Option[String] =
      if (graft.functions.HalfVecs.isShortVec(
        clustered.schema("vec").dataType))
        Some(graft.functions.HalfVecs.requireFormat(clustered.schema, "vec"))
      else None
    // the rebuild is itself a multi-artifact commit: bracket it with a
    // rebuild-kind marker (superseding any stale upsert marker) and lift
    // it only after the LAST artifact (the sidecar) lands — a crash
    // mid-rebuild leaves a marked, open()-refused store instead of an
    // unmarked inconsistent one (the pre-r16 delete-marker-first order
    // dropped the protection exactly when the store was being remade)
    StoreMarker.bracket(spark, path, "rebuild", Nil) {
      // optional persisted level-1 routing table (the 10⁵-shard dial):
      // trained deterministically from the centroids FOR THE SERVING METRIC
      // (similarity metrics get spherical groups), stored with that metric's
      // name so a reopened index routes hierarchically without re-training
      // and a metric-mismatched searchRouted fails loudly. Trained before
      // the concurrent writes (driver-side, milliseconds) so its two
      // table writes can join them.
      val routing =
        if (routingGroups > 0) {
          require(
            Metric.byName(routingMetric.name.stripSuffix("_simd")).isDefined,
            s"routing metric '${routingMetric.name}' cannot round-trip the " +
              "sidecar (Metric.byName) — route with l2/ip/cosine")
          Some(Vamana.trainRoutingLevel(centroids, routingGroups,
            metric = routingMetric))
        } else None
      // encodes are VALUE arithmetic: widen byte-resident vecs first so
      // u8 codes land in the unsigned value space (data stays raw on disk)
      lazy val clusteredW = widenedForMath(clustered)
      // every artifact write below is independent (disjoint dirs, shared
      // read-only inputs) and the rebuild marker covers the whole commit —
      // run them concurrently (guide §2.6) so the write fixture is bound
      // by the largest artifact, not the sum; the sidecar stays LAST (its
      // arrival plus the lifted marker is the completion signal)
      UpsertBatch.runConcurrently(Seq(
        () => IvfIndex.writeClustered(clustered, s"$path/data"),
        () => graph.write.partitionBy("cluster_id").mode("overwrite")
          .parquet(s"$path/graph"),
        () => centroids.toDF("id", "vec").write.mode("overwrite")
          .parquet(s"$path/centroids")) ++
        routing.map { case (l1, groupOf) => () =>
          l1.toDF("id", "vec").write.mode("overwrite")
            .parquet(s"$path/routing_l1")
          groupOf.toSeq.toDF("cluster_id", "group_id").write
            .mode("overwrite").parquet(s"$path/routing_groups")
        } ++
        pq.map { p => () =>
          Pq.encodeClustered(clusteredW, p).write.partitionBy("cluster_id")
            .mode("overwrite").parquet(s"$path/codes")
        } ++
        bin.map { b => () =>
          val wordCols =
            if (binVersion >= 2) BinaryQuant.codeColumns64(col("vec"), b)
            else BinaryQuant.codeColumns(col("vec"), b)
          clusteredW.select(col("cluster_id") +: col("id") +:
              wordCols.zipWithIndex.map {
                case (c, w) => c.as(s"w$w") }: _*)
            .write.partitionBy("cluster_id").mode("overwrite")
            .parquet(s"$path/bincodes")
        })
      val pqJson = pq match {
        case None => "null"
        case Some(p) =>
          s"""{"m":${p.m},"k":${p.k},"dims":${p.dims},"books":[""" +
            p.codebooks.map(cb => "[" + cb.map(c =>
              "[" + c.mkString(",") + "]").mkString(",") + "]")
              .mkString(",") + "]}"
      }
      val binJson = bin match {
        case None => "null"
        case Some(b) =>
          s"""{"version":$binVersion,"thresholds":[${
            b.thresholds.mkString(",")}]}"""
      }
      writeSidecar(spark, s"$path/layout.json",
        s"""{"pq":$pqJson,"bin":$binJson,""" +
          s""""routing_groups":$routingGroups,""" +
          s""""routing_metric":"${routingMetric.name.stripSuffix("_simd")}",""" +
          s""""byte_unsigned":${byteU.map(_.toString).getOrElse("null")},""" +
          s""""half_format":${halfF.map(f => s""""$f"""").getOrElse("null")}}""")
    }
  }

  /** Re-open a written layout. FAILS LOUDLY if an upsert's in-progress
    * marker is present: the multi-dir commit (data → graph → codes →
    * bincodes → centroids) cannot be atomic, and a crash between the
    * data write and a codes/bincodes write leaves touched shards' codes
    * describing DELETED rows — a `kReorder = 0` pure-ADC/Hamming serve
    * walks codes ⋈ graph without ever touching `data`, so it can EMIT a
    * deleted id (reranked serves drop it in the inner data join — that
    * window is answer-grade only on the code-only paths). Run [[repair]]
    * to restore the codes ≡ centroids ≡ data-rows invariant, then
    * re-apply the upsert batch (replace-on-add converges). */
  def open(spark: SparkSession, path: String): Layout = {
    // marker triage is mechanized (StoreMarker): a fresh heartbeat means
    // a LIVE writer (do not repair under it), a stale upsert marker
    // directs to repair(), a stale rebuild marker to re-running write()
    StoreMarker.guard(spark, path, "graph layout",
      "GraphLayout.repair(spark, path)", "GraphLayout.write")
    openUnchecked(spark, path)
  }

  private def markerPath(path: String): String = StoreMarker.markerPath(path)

  /** Everything [[openUnchecked]] reads EXCEPT the big cluster-partitioned
    * directories (data/graph/codes/bincodes) — sidecar params, centroid
    * table, routing level. None of it scales with shard count; the big
    * dirs' partition LISTING is the one open cost ∝ total shards, which
    * the serve*Cold twins avoid by listing only probed `cluster_id=` dirs
    * (the [[IndexLayout.serveCold]] pattern, r15/r16 scale finding). */
  private case class GMeta(pq: Option[Pq.Params],
                           bin: Option[BinaryQuant.Params], binVersion: Int,
                           centroids: IndexedSeq[(Long, Seq[Double])],
                           routing: Option[(Seq[(Long, Seq[Double])],
                             Map[Long, Long])],
                           routingMetricName: Option[String],
                           byteU: Option[Boolean], halfF: Option[String],
                           hasCodesDir: Boolean, hasBinDir: Boolean)

  /** [[open]] minus the marker guard — [[repair]]'s entry point. */
  private def openUnchecked(spark: SparkSession, path: String): Layout = {
    val m = readMetaG(spark, path)
    assembleLayout(spark, path, m,
      sub => spark.read.parquet(s"$path/$sub"))
  }

  /** Build the served frames from [[GMeta]] + a reader for the big
    * cluster-partitioned dirs (full listing for [[openUnchecked]], probed
    * dirs only for the cold serves). */
  private def assembleLayout(spark: SparkSession, path: String, m: GMeta,
                             readBig: String => DataFrame): Layout = {
    val codes = if (m.pq.isDefined && m.hasCodesDir) Some(readBig("codes"))
      else None
    val binCodes = if (m.bin.isDefined && m.hasBinDir) Some(readBig("bincodes"))
      else None
    val data0 = readBig("data")
    val data = (m.byteU, m.halfF) match {
      case (Some(u), _) if graft.functions.ByteVecs.isByteVec(
        data0.schema("vec").dataType) =>
        graft.functions.ByteVecs.markSignedness(data0, "vec", u)
      case (_, Some(f)) if graft.functions.HalfVecs.isShortVec(
        data0.schema("vec").dataType) =>
        graft.functions.HalfVecs.markHalf(data0, f, "vec")
      case _ => data0
    }
    Layout(data, readBig("graph"), codes, m.centroids, m.pq, binCodes,
      m.bin, m.binVersion, m.routing,
      if (m.routing.isDefined) m.routingMetricName else None, Some(path))
  }

  private def readMetaG(spark: SparkSession, path: String): GMeta = {
    // crash recovery for the centroid swap: if an upsert died between
    // delete and rename, finish the rename (centroids.tmp holds the
    // complete new table)
    val cfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cDst = new org.apache.hadoop.fs.Path(s"$path/centroids")
    val cTmp = new org.apache.hadoop.fs.Path(s"$path/centroids.tmp")
    if (!cfs.exists(cDst) && cfs.exists(cTmp))
      require(cfs.rename(cTmp, cDst), s"failed to recover $cDst from $cTmp")
    val json = readSidecar(spark, s"$path/layout.json")
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    val pqNode = parsed \ "pq"
    val pq = pqNode match {
      case JNull | JNothing => None
      case node => Some(Pq.Params((node \ "m").extract[Int],
        (node \ "k").extract[Int], (node \ "dims").extract[Int],
        (node \ "books").extract[Seq[Seq[Seq[Double]]]]
          .map(_.map(_.toArray).toArray).toArray))
    }
    val fs = new org.apache.hadoop.fs.Path(s"$path/codes")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCodesDir =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/codes"))
    val binNode = parsed \ "bin"
    val bin = binNode match {
      case JNull | JNothing => None
      case node => Some(BinaryQuant.Params(
        (node \ "thresholds").extract[Seq[Double]]))
    }
    // sidecar version gate: absent = v1 (every pre-v2 store), known
    // versions open, unknown versions fail loudly rather than serve
    // garbage Hamming distances off a misread word layout
    val binVersion = binNode match {
      case JNull | JNothing => 1
      case node => (node \ "version") match {
        case JNull | JNothing => 1
        case v                => v.extract[Int]
      }
    }
    require(binVersion == 1 || binVersion == 2,
      s"bincodes layout at $path has version $binVersion, which this " +
        "reader does not understand (supported: 1, 2) — refusing to " +
        "serve rather than misread the word packing")
    val hasBinDir =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/bincodes"))
    // routing is SIDECAR-gated like pq/bin: a rewrite without
    // routingGroups records 0 and stale routing dirs are ignored rather
    // than silently served
    val routingGroups = (parsed \ "routing_groups") match {
      case JNull | JNothing => 0
      case node             => node.extract[Int]
    }
    val routingMetricName = (parsed \ "routing_metric") match {
      case JNull | JNothing => None
      case node             => Some(node.extract[String])
    }
    val routing =
      if (routingGroups > 0 &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/routing_l1")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/routing_groups")))
        Some((
          spark.read.parquet(s"$path/routing_l1").select("id", "vec")
            .collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
            .toIndexedSeq.sortBy(_._1).toSeq,
          spark.read.parquet(s"$path/routing_groups")
            .select("cluster_id", "group_id").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap))
      else None
    // restore byte signedness from the sidecar: the authoritative copy of
    // the mark — a data dir whose schema metadata was stripped by an
    // external rewrite still reopens in the declared value space
    val byteU = (parsed \ "byte_unsigned") match {
      case JNull | JNothing => None
      case node             => Some(node.extract[Boolean])
    }
    val halfF = (parsed \ "half_format") match {
      case JNull | JNothing => None
      case node             => Some(node.extract[String])
    }
    GMeta(pq, bin, binVersion,
      spark.read.parquet(s"$path/centroids").select("id", "vec").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
        .toIndexedSeq.sortBy(_._1),
      routing, if (routingGroups > 0) routingMetricName else None,
      byteU, halfF, hasCodesDir, hasBinDir)
  }

  /** Cold one-shot serves — [[IndexLayout.serveCold]]'s graph-store twins.
    * [[open]]'s `spark.read.parquet` over the four cluster-partitioned
    * dirs lists EVERY `cluster_id=` partition up front, a driver-side
    * cost ∝ total shards (measured 34.7 s at 20k shards on the IVF store,
    * SCALE.md r16) that an amortized server pays once but a cold one-shot
    * serve pays per call. These twins read the sidecar + centroids +
    * routing (none of it scales with shard count), choose the probe union
    * DRIVER-SIDE with the SAME routing kernels the warm serve uses, and
    * build the layout over ONLY the probed `cluster_id=` dirs — then
    * dispatch through the very same serve entry point with the probe map
    * attached, so rows are bit-identical to `serve*(open(path), …)`
    * (GraphLayoutSpec pins each family). Listing cost becomes ∝ probes,
    * not shards. The marker guard still runs — a crashed store is
    * refused, not partially served. */
  private def coldLayout(spark: SparkSession, path: String, m: GMeta,
                         pm: ProbeMap): (Layout, ProbeMap) = {
    require(pm.nonEmpty, s"cold serve: no probed shards for $path " +
      "(empty query batch or empty centroid table)")
    val probed = pm.keySet.toSeq.sorted
    (assembleLayout(spark, path, m, sub =>
      spark.read.option("basePath", s"$path/$sub")
        .parquet(probed.map(c => s"$path/$sub/cluster_id=$c"): _*)), pm)
  }

  /** Regression seam (r16 verdict: the cold path must keep its listing
    * ∝ probes, not shards): the cold layout [[serveCold]] would build for
    * a flat probe set, so a spec can assert every big-dir FileIndex is
    * rooted at probed `cluster_id=` dirs — never the store-wide dir
    * whose listing the cold twins exist to avoid. */
  private[graft] def coldLayoutFor(spark: SparkSession, path: String,
      queries: DataFrame, nProbes: Int, metric: Metric): Layout = {
    val m = readMetaG(spark, path)
    coldLayout(spark, path, m,
      Vamana.flatProbeMap(queries, m.centroids, nProbes, metric))._1
  }

  /** Full-precision cold serve ≡ `serve(open(path), …)` (flat or routed
    * by `l1Probes`, the [[serve]] contract). */
  def serveCold(spark: SparkSession, path: String, queries: DataFrame,
                k: Int, searchWindow: Int, nProbes: Int, metric: Metric,
                l1Probes: Int = 0,
                keep: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    StoreMarker.guard(spark, path, "graph layout",
      "GraphLayout.repair(spark, path)", "GraphLayout.write")
    val m = readMetaG(spark, path)
    val routed = m.routing.isDefined && l1Probes > 0
    if (routed) m.routingMetricName.foreach { rm =>
      require(metric.name.stripSuffix("_simd") == rm,
        s"layout routing level was trained for metric '$rm' but " +
          s"serveCold got '${metric.name}' — rewrite the layout with " +
          s"routingMetric = ${metric.name} or serve with '$rm'")
    }
    val pm =
      if (routed) {
        val (l1, groupOf) = m.routing.get
        Vamana.hierProbeMap(queries, m.centroids, l1, groupOf,
          l1Probes, nProbes, metric)
      } else Vamana.flatProbeMap(queries, m.centroids, nProbes, metric)
    val (layout, pmm) = coldLayout(spark, path, m, pm)
    serve(layout, queries, k, searchWindow, nProbes, metric, l1Probes,
      keep, prebuiltProbes = Some(pmm))
  }

  /** DiskANN (PQ codes) cold serve ≡ `serveAdc(open(path), …)`. */
  def serveAdcCold(spark: SparkSession, path: String, queries: DataFrame,
                   k: Int, searchWindow: Int, nProbes: Int,
                   kReorder: Int = 0, metric: Metric = Metric.L2,
                   keep: org.apache.spark.sql.Column = lit(true))
      : DataFrame = {
    StoreMarker.guard(spark, path, "graph layout",
      "GraphLayout.repair(spark, path)", "GraphLayout.write")
    val m = readMetaG(spark, path)
    // probe on the WALK metric, exactly like serveAdc
    val walkM =
      if (metric == Metric.L2 || metric == Metric.IP) metric else Metric.L2
    val pm = Vamana.flatProbeMap(queries, m.centroids, nProbes, walkM)
    val (layout, pmm) = coldLayout(spark, path, m, pm)
    serveAdc(layout, queries, k, searchWindow, nProbes, kReorder, metric,
      keep, prebuiltProbes = Some(pmm))
  }

  /** Binary (sign-bit) cold serve ≡ `serveHamming(open(path), …)`. */
  def serveHammingCold(spark: SparkSession, path: String,
                       queries: DataFrame, k: Int, searchWindow: Int,
                       nProbes: Int, kReorder: Int,
                       rerankMetric: Metric = Metric.L2): DataFrame = {
    StoreMarker.guard(spark, path, "graph layout",
      "GraphLayout.repair(spark, path)", "GraphLayout.write")
    val m = readMetaG(spark, path)
    val b = m.bin.getOrElse(
      sys.error("layout has no binary codes — write(bin = Some(...)) first"))
    // probe ONCE in the word-encoded Hamming space, exactly like
    // serveHamming
    val wordCents = m.centroids.map { case (cid, cv) =>
      (cid, BinaryQuant.encodeWords(cv, b)) }
    val qWords = queries.select(col("query_id"),
      array(BinaryQuant.codeColumns(col("qvec"), b)
        .map(_.cast("double")): _*).as("qvec"))
    val pm = Vamana.flatProbeMap(qWords, wordCents, nProbes, Metric.Hamming)
    val (layout, pmm) = coldLayout(spark, path, m, pm)
    serveHamming(layout, queries, k, searchWindow, nProbes, kReorder,
      rerankMetric, prebuiltProbes = Some(pmm))
  }

  /** Full-precision probe-and-walk over the stored shards — identical rows
    * to [[Vamana.searchSharded]] on the in-memory frames. */
  def search(layout: Layout, queries: DataFrame, k: Int, searchWindow: Int,
             nProbes: Int, metric: Metric): DataFrame =
    Vamana.searchSharded(queries, layout.clustered, layout.graph,
      layout.centroids, k, searchWindow, nProbes, metric)

  /** [[search]] routed through the PERSISTED level-1 table
    * ([[write]]'s `routingGroups`): probe selection scores the l1 groups
    * then only their member centroids — the shard-count scale dial for
    * stored indexes. At `l1Probes = |l1|` it is bit-identical to
    * [[search]] (HierRoutingSpec). */
  def searchRouted(layout: Layout, queries: DataFrame, k: Int,
                   searchWindow: Int, l1Probes: Int, nProbes: Int,
                   metric: Metric): DataFrame = {
    val (l1, groupOf) = layout.routing.getOrElse(sys.error(
      "layout has no routing level — write(routingGroups = …) first"))
    // the persisted groups partition centroid space for ONE metric; an
    // IP/cosine search over L2-shaped groups (or vice versa) silently
    // degrades routing recall at realistic l1Probes — fail loudly instead
    layout.routingMetricName.foreach { rm =>
      require(metric.name.stripSuffix("_simd") == rm,
        s"layout routing level was trained for metric '$rm' but " +
          s"searchRouted got '${metric.name}' — rewrite the layout with " +
          s"routingMetric = ${metric.name} or serve with '$rm'")
    }
    Vamana.searchShardedHierarchical(queries, layout.clustered,
      layout.graph, layout.centroids, l1, groupOf, k, searchWindow,
      l1Probes, nProbes, metric)
  }

  /** [[searchRouted]] with ZERO corpus shuffle: each probed shard's
    * `data/cluster_id=c` and `graph/cluster_id=c` dirs load as
    * single-partition scans zipped NARROWLY into the same walk kernel
    * ([[Vamana.searchStoredHierarchical]]) — bit-identical rows, I/O =
    * the probed dirs' bytes, and the only exchange is the final
    * |Q|·nProbes·k top-k partials. The serving path for selective probe
    * batches at 10⁵+ shards; a store-saturating query sweep does equally
    * well on [[searchRouted]]. */
  def searchRoutedLocal(layout: Layout, queries: DataFrame, k: Int,
                        searchWindow: Int, l1Probes: Int, nProbes: Int,
                        metric: Metric,
                        keep: org.apache.spark.sql.Column = lit(true),
                        prebuiltProbes: Option[Map[Long,
                          Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val path = layout.path.getOrElse(sys.error(
      "searchRoutedLocal serves straight off the stored partition dirs — " +
        "open the layout from disk (GraphLayout.open) first"))
    val (l1, groupOf) = layout.routing.getOrElse(sys.error(
      "layout has no routing level — write(routingGroups = …) first"))
    layout.routingMetricName.foreach { rm =>
      require(metric.name.stripSuffix("_simd") == rm,
        s"layout routing level was trained for metric '$rm' but " +
          s"searchRoutedLocal got '${metric.name}' — rewrite the layout " +
          s"with routingMetric = ${metric.name} or serve with '$rm'")
    }
    Vamana.searchStoredHierarchical(queries, s"$path/data", s"$path/graph",
      layout.clustered.schema, layout.graph.schema, layout.centroids,
      l1, groupOf, k, searchWindow, l1Probes, nProbes, metric,
      keep = keep, prebuiltProbes = prebuiltProbes)
  }

  /** DiskANN serving from the stored layout: codes-only walk (reads
    * `codes` + `graph` partitions of the probed shards, never `data`),
    * optional exact rerank reading only the candidate rows of `data`.
    * kReorder = 0 skips the rerank (pure ADC ranks). `keep` is the
    * traverse-but-filter predicate over the codes columns (practically
    * `id` — the tombstone shape): excluded rows keep the graph connected
    * through them but are never emitted or reranked. */
  /** The exact-rerank's `data` side, partition-pruned to the PROBED
    * shards when the caller's probe map is available: every rerank
    * candidate comes from a probed `cluster_id=` partition by
    * construction (the walk reads only those dirs and graph edges stay
    * in-shard), so the filter is a pure partition-prune — bit-identical
    * rows, rerank scan I/O ∝ the probed union instead of the full
    * corpus. At 10⁸ the un-pruned rerank's data scan (~12.4 GB) was the
    * dominant wall slice of the binary serve (SCALE.md r13 Hamming leg);
    * pruned it reads the probed ~600 MB. Without a probe map (manual
    * paths compute probes inside the walk) the full frame is used —
    * same rows, the historical shape.
    *
    * HARD CONTRACT (the prune feeds an INNER join in `Rerank.exact`, so
    * a violation drops valid candidates silently): every walk candidate
    * must come from a probed `cluster_id=` partition. Today that holds
    * by construction — [[Vamana.buildSharded]] builds each shard's graph
    * independently (groupByKey on cluster_id), so edges never cross
    * shards and the walk can only ever visit ids of the shards it was
    * handed. Any future layout with CROSS-SHARD edges or shard
    * reassignment (e.g. a merged/global graph over sharded data) MUST
    * NOT use this prune — pass `pm = None` (full frame) or extend the
    * filter to the reachable shard set. `graft.debug.rerank.assert`
    * (session conf / JVM property, default off) verifies the invariant
    * per serve by anti-joining candidates against the pruned frame. */
  private def rerankData(layout: Layout,
                         pm: Option[Map[Long,
                           Array[(Long, Array[Double])]]]): DataFrame =
    pm match {
      case Some(m) =>
        layout.clustered.filter(col("cluster_id").isin(m.keySet.toSeq: _*))
      case None => layout.clustered
    }

  /** [[Rerank.exact]] over [[rerankData]]'s pruned frame, with the
    * opt-in invariant check: `graft.debug.rerank.assert=true` (session
    * conf or JVM property) anti-joins the candidate ids against the
    * pruned frame before reranking and fails loudly on any candidate
    * outside the probed partitions — the guard for a future layout that
    * breaks the in-shard-edges contract (see [[rerankData]]). Off by
    * default: the check is one extra job over the shortlist. Covers
    * every GraphLayout rerank that consumes the pruned frame directly
    * (Hamming local + cogroup, local ADC rerank); the cogroup ADC
    * rerank reranks inside [[Vamana.searchShardedAdcRerank]] from the
    * same probe map, so a violation would trip here first on the
    * bit-identical local path. */
  private def rerankExact(cand: DataFrame, queries: DataFrame,
                          layout: Layout,
                          pm: Option[Map[Long,
                            Array[(Long, Array[Double])]]],
                          k: Int, metric: Metric): DataFrame = {
    val data = rerankData(layout, pm)
    val spark = cand.sparkSession
    val flag = spark.conf.getOption("graft.debug.rerank.assert")
      .orElse(sys.props.get("graft.debug.rerank.assert"))
      .exists(_.equalsIgnoreCase("true"))
    if (flag && pm.isDefined) {
      val missing = cand.select(col("neighbor_id")).distinct()
        .join(data.select(col("id").as("neighbor_id")),
          Seq("neighbor_id"), "left_anti")
        .limit(5).collect().map(_.getLong(0))
      require(missing.isEmpty,
        s"rerank candidates outside the probed partitions (in-shard-" +
          s"edges contract violated): ids ${missing.mkString(", ")} — " +
          "this layout must rerank against the full frame (pm = None)")
    }
    Rerank.exact(cand, queries, data, k, metric)
  }

  def searchAdc(layout: Layout, queries: DataFrame, k: Int,
                searchWindow: Int, nProbes: Int, kReorder: Int = 0,
                metric: Metric = Metric.L2,
                keep: org.apache.spark.sql.Column = lit(true),
                prebuiltProbes: Option[Map[Long,
                  Array[(Long, Array[Double])]]] = None): DataFrame = {
    val codes = layout.codes.getOrElse(
      sys.error("layout has no PQ codes — write(pq = Some(...)) first"))
    val p = layout.pq.get
    if (kReorder <= 0)
      Vamana.searchShardedAdc(queries, codes, layout.graph, layout.centroids,
        p, k, searchWindow, nProbes, metric, keep, prebuiltProbes)
    else {
      // walk on a subspace-decomposable metric, rerank on the requested
      // one — this is how cosine serves from the stored layout (the walk
      // metric stays L2; searchShardedAdcRerank's documented contract)
      val walkM =
        if (metric == Metric.L2 || metric == Metric.IP) metric else Metric.L2
      Vamana.searchShardedAdcRerank(queries, codes, layout.graph,
        layout.centroids, p, rerankData(layout, prebuiltProbes), k,
        kReorder, searchWindow, nProbes, walkMetric = walkM,
        rerankMetric = metric, keep = keep,
        prebuiltProbes = prebuiltProbes)
    }
  }

  /** [[search]] with ZERO corpus shuffle — [[searchRoutedLocal]] for
    * layouts written WITHOUT a routing level: probe selection runs flat
    * over all centroids (implemented as a single-group hierarchical
    * sweep, which HierRoutingSpec pins bit-identical to flat at
    * exhaustive level-1), and the per-shard walk is the same narrow
    * zipPartitions serve. */
  def searchLocal(layout: Layout, queries: DataFrame, k: Int,
                  searchWindow: Int, nProbes: Int, metric: Metric,
                  keep: org.apache.spark.sql.Column = lit(true),
                  prebuiltProbes: Option[Map[Long,
                    Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val path = layout.path.getOrElse(sys.error(
      "searchLocal serves straight off the stored partition dirs — " +
        "open the layout from disk (GraphLayout.open) first"))
    // trivial single-group level: the one group is always selected, so
    // level-2 scores every centroid — exactly the flat probe sweep
    // (HierRoutingSpec pins the bit-identity, so a FLAT prebuilt probe
    // map from serve() slots in unchanged)
    val l1 = Seq(0L -> layout.centroids.head._2)
    val groupOf = layout.centroids.map { case (cid, _) => cid -> 0L }.toMap
    Vamana.searchStoredHierarchical(queries, s"$path/data", s"$path/graph",
      layout.clustered.schema, layout.graph.schema, layout.centroids,
      l1, groupOf, k, searchWindow, l1Probes = 1, nProbes, metric,
      keep = keep, prebuiltProbes = prebuiltProbes)
  }

  /** [[searchAdc]] with ZERO corpus shuffle ([[searchRoutedLocal]]'s
    * DiskANN twin): the codes-only walk zips each probed shard's
    * `codes/cluster_id=c` + `graph/cluster_id=c` dirs narrowly into the
    * PqStore walk task — bit-identical candidates, I/O = the probed CODE
    * partitions (never `data` during the walk), exchange = top-k
    * partials only. `kReorder > 0` reranks exactly like [[searchAdc]]:
    * the rerank join touches only the |Q|·kReorder·k candidate rows.
    * `keep` = [[searchAdc]]'s traverse-but-filter predicate, evaluated
    * against the codes FILE columns (`id`, `c0`..) on the local path. */
  def searchAdcLocal(layout: Layout, queries: DataFrame, k: Int,
                     searchWindow: Int, nProbes: Int, kReorder: Int = 0,
                     metric: Metric = Metric.L2,
                     keep: org.apache.spark.sql.Column = lit(true),
                     prebuiltProbes: Option[Map[Long,
                       Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val path = layout.path.getOrElse(sys.error(
      "searchAdcLocal serves straight off the stored partition dirs — " +
        "open the layout from disk (GraphLayout.open) first"))
    val codes = layout.codes.getOrElse(
      sys.error("layout has no PQ codes — write(pq = Some(...)) first"))
    val p = layout.pq.get
    if (kReorder <= 0)
      Vamana.searchStoredAdc(queries, s"$path/codes", s"$path/graph",
        codes.schema, layout.graph.schema, layout.centroids, p, k,
        searchWindow, nProbes, metric, keep, prebuiltProbes)
    else {
      val walkM =
        if (metric == Metric.L2 || metric == Metric.IP) metric else Metric.L2
      val cand = Vamana.searchStoredAdc(queries, s"$path/codes",
        s"$path/graph", codes.schema, layout.graph.schema,
        layout.centroids, p, kReorder * k, searchWindow, nProbes, walkM,
        keep, prebuiltProbes)
      rerankExact(cand, queries, layout, prebuiltProbes, k, metric)
    }
  }

  /** [[serve]]'s dispatch override: Auto picks local iff the layout is
    * stored on disk (see [[autoPick]] — the fraction dial is a
    * documented tautology at the default, and cache residency
    * deliberately does not flip the choice); Local / Cogroup force a
    * path (the measured escape hatch). */
  sealed trait ServeMode
  object ServeMode {
    case object Auto extends ServeMode
    case object Local extends ServeMode
    case object Cogroup extends ServeMode
  }

  /** A probe map as the routing kernels emit it: probed shard id → the
    * (query_id, query vector) pairs probing it. [[serveDecisionProbed]]
    * returns one; `serve*`'s `prebuiltProbes` accepts it back, so a
    * caller inspecting the decision before serving pays the routing
    * kernel ONCE end-to-end. */
  type ProbeMap = Map[Long, Array[(Long, Array[Double])]]

  /** The shared Auto rule (identical across all three codec families and
    * their decision twins): an in-memory layout can only cogroup;
    * otherwise local iff the probe-union fraction clears
    * `localMaxFraction`. At the DEFAULT dial (1.0) the fraction test is
    * a tautology — post-r12 O(1)-planning, local wins every measured
    * on-disk regime on both wall and exchange (SCALE.md), so Auto
    * reduces to "local iff stored"; the dial exists for callers who have
    * measured their own crossover.
    *
    * CACHE RESIDENCY deliberately does NOT flip the choice. Round 13
    * implemented the obvious rule (cached layout frames ⇒ cogroup, the
    * regime where local's store re-read looked like the extra cost) and
    * MEASURED it at 10M (SCALE.md scale10m_serve_cached): with
    * clustered+graph fully cache-resident the cogroup walk took 34.8 s /
    * 4.68 GB exchange vs the local path's 4.2 s / 174 KB on the SAME
    * cached store — the corpus exchange dominates regardless of where
    * the input rows live, and 15 GB of cached row objects made cogroup
    * SLOWER than its uncached run (12.1 s; columnar parquet reads beat
    * deserialized-object scans). The rule was reversed on that
    * measurement; `mode = ServeMode.Cogroup` remains the explicit dial
    * for topologies where the store read is genuinely costlier than the
    * exchange. */
  private def autoPick(fraction: Double, localMaxFraction: Double,
                       onDisk: Boolean): String =
    if (!onDisk) "cogroup"
    else if (fraction <= localMaxFraction) "local"
    else "cogroup"

  /** The dispatch [[serve]] will take for this batch, without running
    * it: ("local" | "cogroup", probe-union fraction). Exposed so specs
    * and capacity planning can pin the decision itself, not just the
    * (bit-identical) rows. Routing is the same kernel the search paths
    * use, so the fraction is exactly the store fraction the chosen path
    * will read.
    *
    * `localMaxFraction` defaults to 1.0 — local whenever the store is on
    * disk. Round 10's local path lost the SATURATING regime to serial
    * per-shard planning (23.3 s vs 16.3 s at 10M × 100 q); the round-12
    * O(1)-planning zipServe removed that cost and the measurement
    * flipped: local 5.1 s / 176 KB shuffle vs cogroup 23.7–33.3 s /
    * 4.68 GB on the same store — local wins BOTH regimes on wall AND by
    * 26 000× on exchange volume (both paths are one task per probed
    * shard, so there is no parallelism regime left where the corpus
    * exchange pays). Cache residency does NOT flip the choice either:
    * r13 measured the cached-frame regime (SCALE.md
    * scale10m_serve_cached — cogroup 34.8 s / 4.68 GB vs local 4.2 s /
    * 174 KB on the SAME cached store) and the exchange still dominates;
    * see [[autoPick]] for the full adjudication. The threshold dial and
    * `mode` override remain for callers who measured their own
    * crossover. */
  def serveDecision(layout: Layout, queries: DataFrame, nProbes: Int,
                    metric: Metric, l1Probes: Int = 0,
                    localMaxFraction: Double = 1.0): (String, Double) = {
    val (m, f, _) = serveDecisionProbed(layout, queries, nProbes, metric,
      l1Probes, localMaxFraction)
    (m, f)
  }

  /** [[serveDecision]] that also RETURNS the probe map it computed —
    * hand it to [[serve]]'s `prebuiltProbes` so inspect-then-serve pays
    * the routing kernel once (the map is the same one serve would build:
    * same kernel, same metric, same routing level). */
  def serveDecisionProbed(layout: Layout, queries: DataFrame, nProbes: Int,
                          metric: Metric, l1Probes: Int = 0,
                          localMaxFraction: Double = 1.0)
      : (String, Double, ProbeMap) = {
    val routed = layout.routing.isDefined && l1Probes > 0
    val pm: ProbeMap =
      if (routed) {
        val (l1, groupOf) = layout.routing.get
        Vamana.hierProbeMap(queries, layout.centroids, l1, groupOf,
          l1Probes, nProbes, metric)
      } else Vamana.flatProbeMap(queries, layout.centroids, nProbes, metric)
    val fraction = pm.size.toDouble / layout.centroids.size
    val mode = autoPick(fraction, localMaxFraction, layout.path.isDefined)
    (mode, fraction, pm)
  }

  /** ONE serving entry point — the reference posture of a single
    * type-erased `search()` (orchestrators/manager.h:217) applied to the
    * stored layout's two execution paths:
    *
    *   - the zero-corpus-shuffle LOCAL walk ([[searchRoutedLocal]] /
    *     [[searchLocal]]) — I/O = probed dirs, exchange = top-k partials
    *     only. Since the round-12 O(1)-planning zipServe this path wins
    *     BOTH regimes measured (10M × 100 q saturating: 5.1 s / 176 KB
    *     vs cogroup 23.7–33.3 s / 4.68 GB; 5 q selective: 1.4 s /
    *     8.8 KB vs 2.6 s / 451 MB), so Auto picks it whenever the store
    *     is on disk.
    *   - the COGROUP walk ([[searchRouted]] / [[search]]) — required for
    *     in-memory layouts (no partition dirs to read), and the explicit
    *     `mode` dial for topologies where the store read is genuinely
    *     costlier than the corpus exchange. Cache residency of the
    *     layout frames deliberately does NOT auto-flip to cogroup: the
    *     regime was MEASURED and local still wins 8× on wall and
    *     26,800× on exchange (see [[autoPick]]).
    *
    * Auto mode computes the probe-union fraction from the same routing
    * kernel the search itself uses (milliseconds, driver-side, queries
    * are broadcast-small by the serving contract) and dispatches at
    * `localMaxFraction` (see [[serveDecision]]; at the default 1.0 the
    * fraction never flips the choice — local wins every measured on-disk
    * uncached regime, SCALE.md); both paths return bit-identical rows
    * (HierRoutingSpec/GraphLayoutSpec), so the dispatch is a pure cost
    * decision — the wrong MANUAL choice costs 26,000× shuffle or 4–6×
    * wall (SCALE.md), which is why this entry point exists.
    *
    * Routed when the layout has a persisted level-1 AND `l1Probes > 0`;
    * flat otherwise. `keep` is the traverse-but-filter predicate over
    * the data columns, honored on every path. `mode` forces a path
    * (Local requires a disk-opened layout). `prebuiltProbes` accepts
    * [[serveDecisionProbed]]'s map so inspect-then-serve probes once;
    * it must come from the SAME (queries, nProbes, l1Probes, metric) —
    * the search reads exactly the shards the map names. */
  def serve(layout: Layout, queries: DataFrame, k: Int, searchWindow: Int,
            nProbes: Int, metric: Metric, l1Probes: Int = 0,
            keep: org.apache.spark.sql.Column = lit(true),
            mode: ServeMode = ServeMode.Auto,
            localMaxFraction: Double = 1.0,
            prebuiltProbes: Option[ProbeMap] = None): DataFrame = {
    val routed = layout.routing.isDefined && l1Probes > 0
    // metric-vs-routing mismatch fails BEFORE any probing work
    if (routed) layout.routingMetricName.foreach { rm =>
      require(metric.name.stripSuffix("_simd") == rm,
        s"layout routing level was trained for metric '$rm' but " +
          s"serve got '${metric.name}' — rewrite the layout with " +
          s"routingMetric = ${metric.name} or serve with '$rm'")
    }
    // the query batch is collected and probe-scored exactly ONCE — the
    // dispatch decision and the dispatched search share this map (the
    // same routing kernel, Vamana.hierProbeMap/flatProbeMap, so the
    // planner provably probes the shards the search reads); a caller who
    // already paid the kernel via serveDecisionProbed hands the map in
    val pm = prebuiltProbes.getOrElse {
      if (routed) {
        val (l1, groupOf) = layout.routing.get
        Vamana.hierProbeMap(queries, layout.centroids, l1, groupOf,
          l1Probes, nProbes, metric)
      } else Vamana.flatProbeMap(queries, layout.centroids, nProbes, metric)
    }
    val chosen = mode match {
      case ServeMode.Local   => "local"
      case ServeMode.Cogroup => "cogroup"
      case ServeMode.Auto    =>
        autoPick(pm.size.toDouble / layout.centroids.size,
          localMaxFraction, layout.path.isDefined)
    }
    (chosen, routed) match {
      case ("local", true) =>
        searchRoutedLocal(layout, queries, k, searchWindow, l1Probes,
          nProbes, metric, keep, prebuiltProbes = Some(pm))
      case ("local", false) =>
        searchLocal(layout, queries, k, searchWindow, nProbes, metric,
          keep, prebuiltProbes = Some(pm))
      case ("cogroup", true) =>
        val (l1, groupOf) = layout.routing.get
        Vamana.searchShardedHierarchical(queries, layout.clustered,
          layout.graph, layout.centroids, l1, groupOf, k, searchWindow,
          l1Probes, nProbes, metric, keep = keep,
          prebuiltProbes = Some(pm))
      case _ =>
        Vamana.searchShardedFiltered(queries, layout.clustered,
          layout.graph, layout.centroids, k, searchWindow, nProbes,
          metric, keep, prebuiltProbes = Some(pm))
    }
  }

  /** [[serve]]'s DiskANN twin — ONE entry point for compressed serving
    * that dispatches between the two ADC execution paths:
    *
    *   - the zero-corpus-shuffle LOCAL codes walk ([[searchAdcLocal]]) —
    *     I/O = the probed shards' CODE partitions (64× smaller than
    *     data), exchange = top-k partials (+ the |Q|·kReorder·k rerank
    *     rows when kReorder > 0). SCALE.md 10M/10⁸: 174 KB/168 KB
    *     exchange vs the cogroup's 1.55 GB on the same store — Auto
    *     picks it whenever the codes dirs are on disk.
    *   - the COGROUP codes walk ([[searchAdc]]) — required for in-memory
    *     layouts, the explicit `mode` dial otherwise. At the DEFAULT
    *     `localMaxFraction` (1.0) the probe-union fraction never flips
    *     the choice (it is ≤ 1.0 by construction), so Auto reduces to
    *     "local iff stored"; cache residency deliberately does not flip
    *     it either (measured — see [[autoPick]]); the dial exists for
    *     callers who measured their own crossover.
    *
    * Probing runs EXACTLY ONCE on the WALK metric (ADC probe routing is
    * flat — codes shards carry no level-1) and the map threads through
    * whichever path is dispatched, so the planner provably probes the
    * shards the walk reads. Walk-metric rules are [[searchAdc]]'s: with
    * `kReorder ≤ 0` the metric must be subspace-decomposable (L2/IP);
    * with a rerank, a non-decomposable metric (cosine) walks on L2 and
    * reranks exactly. `keep` is the traverse-but-filter predicate over
    * the codes columns on BOTH paths. Both paths return bit-identical
    * rows (GraphLayoutSpec), so the dispatch is a pure cost decision —
    * the reference posture of one type-erased `search()`
    * (orchestrators/manager.h:217) extended to its compressed datasets. */
  def serveAdc(layout: Layout, queries: DataFrame, k: Int,
               searchWindow: Int, nProbes: Int, kReorder: Int = 0,
               metric: Metric = Metric.L2,
               keep: org.apache.spark.sql.Column = lit(true),
               mode: ServeMode = ServeMode.Auto,
               localMaxFraction: Double = 1.0,
               prebuiltProbes: Option[ProbeMap] = None): DataFrame = {
    require(layout.codes.isDefined,
      "serveAdc needs PQ codes — write(pq = Some(...)) first")
    val walkM =
      if (metric == Metric.L2 || metric == Metric.IP) metric
      else {
        require(kReorder > 0,
          s"ADC requires a subspace-decomposable metric (L2/IP) unless " +
            s"kReorder > 0 reranks exactly — got $metric with no rerank")
        Metric.L2
      }
    // probe ONCE, on the metric the codes walk will use (or reuse the
    // map serveAdcDecisionProbed already built for this batch)
    val pm = prebuiltProbes.getOrElse(
      Vamana.flatProbeMap(queries, layout.centroids, nProbes, walkM))
    val chosen = mode match {
      case ServeMode.Local   => "local"
      case ServeMode.Cogroup => "cogroup"
      case ServeMode.Auto    =>
        autoPick(pm.size.toDouble / layout.centroids.size,
          localMaxFraction, layout.path.isDefined)
    }
    if (chosen == "local")
      searchAdcLocal(layout, queries, k, searchWindow, nProbes, kReorder,
        metric, keep, prebuiltProbes = Some(pm))
    else
      searchAdc(layout, queries, k, searchWindow, nProbes, kReorder,
        metric, keep, prebuiltProbes = Some(pm))
  }

  /** The dispatch [[serveAdc]] will take for this batch, without running
    * it — [[serveDecision]]'s ADC twin: ("local" | "cogroup",
    * probe-union fraction), probed on the walk metric like the serve
    * itself. */
  def serveAdcDecision(layout: Layout, queries: DataFrame, nProbes: Int,
                       metric: Metric = Metric.L2,
                       localMaxFraction: Double = 1.0): (String, Double) = {
    val (m, f, _) = serveAdcDecisionProbed(layout, queries, nProbes,
      metric, localMaxFraction)
    (m, f)
  }

  /** [[serveAdcDecision]] that also returns its probe map — feed it to
    * [[serveAdc]]'s `prebuiltProbes` (same batch, same nProbes, same
    * metric) so inspect-then-serve probes once. */
  def serveAdcDecisionProbed(layout: Layout, queries: DataFrame,
                             nProbes: Int, metric: Metric = Metric.L2,
                             localMaxFraction: Double = 1.0)
      : (String, Double, ProbeMap) = {
    val walkM =
      if (metric == Metric.L2 || metric == Metric.IP) metric else Metric.L2
    val pm = Vamana.flatProbeMap(queries, layout.centroids, nProbes, walkM)
    val fraction = pm.size.toDouble / layout.centroids.size
    val m = autoPick(fraction, localMaxFraction, layout.path.isDefined)
    (m, fraction, pm)
  }

  /** Incremental maintenance of the persisted index — the M1–M4 lifecycle
    * for the graph store (the vector analog of `TextIndex.replaceDocs`):
    * `added` rows (id, vec, cluster_id) join their shards, `deletedIds`
    * rows leave theirs, touched shards are rebuilt from scratch via
    * [[Vamana.updateShards]] (bit-identical to a full rebuild of the
    * merged corpus, since untouched shards' rows are unchanged), and ONLY
    * the touched `cluster_id=` partitions of data/graph/codes are
    * rewritten (dynamic partition overwrite — at 100 TB an upsert touching
    * 3 of 10⁴ shards rewrites 0.03% of the store). Touched shards'
    * centroids are re-derived with the same rounded-mean fold so probe
    * routing tracks the moved mass. Returns the reopened layout.
    *
    * ID-level UPSERT semantics (the q134 text-lifecycle contract, and what
    * makes micro-batch REPLAYS converge instead of duplicating): an added
    * id that already exists in the store REPLACES its old row — the old
    * row's shard is touched and loses it even when the new row routes to a
    * different shard. */
  def upsert(spark: SparkSession, path: String, added: DataFrame,
             deletedIds: DataFrame, params: VamanaKernel.BuildParams,
             metric: Metric): Layout = {
    val layout = open(spark, path)
    import spark.implicits._
    val stored = layout.clustered
      .select(col("id").cast("long").as("id"), col("vec"),
        col("cluster_id").cast("long").as("cluster_id"))
    // batch hygiene, in precedence order:
    //  1. exact duplicate added rows collapse (at-least-once redelivery);
    //  2. two DIFFERENT payloads for one id in one batch is ambiguous —
    //     fail loudly rather than pick one;
    //  3. an id in both added and deletedIds is DELETED (delete wins, so
    //     a redelivered stale add can never resurrect a deleted row).
    // Micro-batch fast path: batches within the UpsertBatch bound collect
    // ONCE and run that contract driver-side (the distributed twin below
    // spent ~10 fixed-cost jobs on contractually tiny frames).
    // delete-only batches (CDC) carry a placeholder vec type on an EMPTY
    // adds frame — zero added rows substitute a schema-matched empty
    // frame (the store's own schema, marks included) so the value-space
    // checks and the merge union cannot fail. A batch whose adds are all
    // deleted in-batch flows through typed (its frame carried payloads).
    val (addedFinal, removed) = UpsertBatch.prep(added, deletedIds) match {
      case Some(p) =>
        // raw-empty adds (CDC delete-only) substitute the store-schema
        // empty frame; a batch whose adds were all deleted IN-BATCH keeps
        // the batch's own schema (empty rows) so the value-space checks
        // below fire exactly like the distributed path's typed flow
        (if (p.addedRows.isEmpty && !p.hadRows)
          stored.select("id", "vec", "cluster_id").limit(0)
        else p.addedDF(spark),
          p.removedDF(spark))
      case None => // bulk batch — the distributed path, unchanged
        val dels = deletedIds.select(col("id").cast("long").as("id"))
          .distinct()
        val af =
          if (added.isEmpty)
            stored.select("id", "vec", "cluster_id").limit(0)
          else {
            val addedDistinct = added.distinct()
            // only a handful of ids are reported — bound the collect
            // BEFORE it reaches the driver (a batch could conflict en
            // masse)
            val conflicted = addedDistinct.groupBy("id").count()
              .filter(col("count") > 1).select(col("id").cast("long"))
              .limit(6).as[Long].collect()
            require(conflicted.isEmpty,
              s"upsert: conflicting added payloads for ids " +
                s"${conflicted.take(5).mkString(", ")}" +
                (if (conflicted.length > 5) ", …" else ""))
            addedDistinct.join(dels, Seq("id"), "left_anti")
          }
        // rows to remove = explicit deletes ∪ re-added ids
        // (replace-on-add)
        (af, dels
          .unionByName(af.select(col("id").cast("long").as("id")))
          .distinct())
    }
    // byte stores: added rows must DECLARE the same signedness as the
    // store (an unmarked or mismatched byte add fails loudly — mixing
    // value spaces in one store is silent corruption), and the merged
    // frame re-carries the mark below in case a union drops metadata
    val storedSig =
      graft.functions.ByteVecs.signednessOf(stored.schema, "vec")
    storedSig.foreach { u =>
      require(graft.functions.ByteVecs.isByteVec(
        addedFinal.schema("vec").dataType),
        s"upsert: the store is byte-resident (${if (u) "u8" else "i8"}) " +
          s"but added rows have ${addedFinal.schema("vec").dataType} — " +
          "quantize and mark them to match the store")
      val au = graft.functions.ByteVecs.requireSignedness(
        addedFinal.schema, "vec")
      require(au == u,
        s"upsert: added rows are ${if (au) "u8" else "i8"} but the store " +
          s"is ${if (u) "u8" else "i8"}")
    }
    // half stores: the same declare-to-match contract as bytes (an f16
    // add into a bf16 store — or an unmarked one — is silent corruption)
    val storedHalf =
      graft.functions.HalfVecs.formatOf(stored.schema, "vec")
    storedHalf.foreach { f =>
      require(graft.functions.HalfVecs.isShortVec(
        addedFinal.schema("vec").dataType),
        s"upsert: the store is half-resident ($f) but added rows have " +
          s"${addedFinal.schema("vec").dataType} — encode and mark them " +
          "to match the store")
      val af = graft.functions.HalfVecs.requireFormat(
        addedFinal.schema, "vec")
      require(af == f,
        s"upsert: added rows are $af but the store is $f")
    }
    val (nc0, ng, touched) = Vamana.updateShardsTouched(stored, layout.graph,
      addedFinal, removed, params, metric)
    val nc1 = storedSig.map(u => graft.functions.ByteVecs
      .markSignedness(nc0, "vec", u)).getOrElse(nc0)
    val nc = storedHalf.map(f => graft.functions.HalfVecs
      .markHalf(nc1, f, "vec")).getOrElse(nc1)
    if (touched.isEmpty) return layout // nothing changed on disk
    // the in-progress marker brackets the multi-artifact commit
    // (data → graph → codes → bincodes → centroids cannot commit
    // atomically): a crash anywhere inside leaves the marker behind,
    // open() refuses to serve the store (a kReorder=0 code-only serve
    // of a crashed upsert can emit deleted ids), and repair()
    // restores the codes ≡ centroids ≡ data-rows invariant from the
    // marker's touched list
    val (mergedCents, routing) =
      StoreMarker.bracket(spark, path, "upsert", touched) {
        // materialize the touched shards' new rows BEFORE overwriting: the
        // plans read the very partitions the writes replace, and the source
        // DataFrames' cached file listing would otherwise chase deleted
        // part-files mid-job (eager localCheckpoint severs the lineage —
        // the Dedup.jaccardPairsPrefix epilogue lesson applied to writes)
        val ncT = nc.filter(col("cluster_id").isin(touched: _*))
          .localCheckpoint(true)
        val ngT = ng.filter(col("cluster_id").isin(touched: _*))
          .localCheckpoint(true)
        // VALUE arithmetic below (re-encodes, centroid means) must widen
        // byte-resident vecs mark-aware — matching write()'s encode space;
        // the persisted data/graph partitions keep the raw bytes
        lazy val ncW = widenedForMath(ncT)
        // the four per-dir writes are independent reads of the two
        // checkpoints targeting disjoint directories — run them
        // concurrently so each write's task tail back-fills with the
        // next's (marker semantics unchanged: any failure keeps the
        // marker). Dynamic overwrite is set PER WRITE
        // (DataFrameWriter.option), not via the session conf — a
        // concurrent overwrite on the same SparkSession must not inherit
        // dynamic semantics from this job.
        UpsertBatch.runConcurrently(Seq(
          () => ncT.repartition(col("cluster_id")).write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cluster_id").parquet(s"$path/data"),
          () => ngT.repartition(col("cluster_id")).write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cluster_id").parquet(s"$path/graph")) ++
          layout.pq.map { p => () =>
            Pq.encodeClustered(ncW, p).repartition(col("cluster_id"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("cluster_id").parquet(s"$path/codes")
          } ++
          layout.bin.map { b => () =>
            // re-encode in the STORE's word layout (sidecar version): a v1
            // store must keep v1 words — mixed packings across partitions
            // of one bincodes dir would be silent Hamming corruption
            val wordCols =
              if (layout.binVersion >= 2)
                BinaryQuant.codeColumns64(col("vec"), b)
              else BinaryQuant.codeColumns(col("vec"), b)
            ncW.select(col("cluster_id") +: col("id") +:
                wordCols.zipWithIndex.map {
                  case (c, w) => c.as(s"w$w") }: _*)
              .repartition(col("cluster_id"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("cluster_id").parquet(s"$path/bincodes")
          })
        // a shard emptied by deletes writes zero rows, and dynamic overwrite
        // cannot delete a partition it never writes — drop those dirs (and
        // their centroids, via the kept-filter below) explicitly
        val liveCids = ncT.select(col("cluster_id")).distinct()
          .as[Long].collect().toSet
        val fsE = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        touched.filterNot(liveCids).foreach { cid =>
          Seq("data", "graph", "codes", "bincodes").foreach { sub =>
            fsE.delete(new org.apache.hadoop.fs.Path(
              s"$path/$sub/cluster_id=$cid"), true)
          }
        }
        // refresh touched centroids with the same rounded-mean fold the
        // build used; untouched entries carry over verbatim
        val touchedSet = touched.toSet
        // the shared rounded-mean fold (KMeans.roundedMeans) — one
        // definition with the oracle replays and IndexLayout's refresh
        val newCents = KMeans.roundedMeans(ncW)
        val kept = layout.centroids.filterNot(c => touchedSet.contains(c._1))
        val mergedCents = (kept ++ newCents).sortBy(_._1)
        mergedCents.toDF("id", "vec")
          .write.mode("overwrite").parquet(s"$path/centroids.tmp")
        // two-step swap: centroids is a whole-file artifact (no
        // partitions). A crash between delete and rename leaves only
        // centroids.tmp — open() recovers by completing the rename, so the
        // store is never unopenable; the rename result is checked (HDFS
        // returns false instead of throwing).
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/centroids"), true)
        require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/centroids.tmp"),
          new org.apache.hadoop.fs.Path(s"$path/centroids")),
          s"failed to swap $path/centroids.tmp into place")
        // the upsert changed centroids (refreshed / dropped), so a
        // persisted routing level would be stale: retrain it from the
        // just-committed centroid table at the recorded group count
        // (driver-side Lloyd over the broadcast-small centroids —
        // milliseconds; mergedCents ≡ the parquet read-back, doubles
        // round-trip bit-exactly)
        val rg = routingGroupsOf(spark, path)
        val routingNew =
          if (rg > 0) {
            // retrain with the metric the level was written for (sidecar),
            // not the upsert's build metric — the serving contract is the
            // writer's; absent (pre-metric sidecars) default L2, but an
            // unresolvable RECORDED name fails loudly rather than silently
            // retraining L2-shaped groups under a sidecar that still
            // advertises the original metric
            val rm = layout.routingMetricName match {
              case Some(name) => Metric.byName(name).getOrElse(sys.error(
                s"layout routing_metric '$name' is not a routable metric"))
              case None => Metric.L2
            }
            val (l1, groupOf) = Vamana.trainRoutingLevel(mergedCents, rg,
              metric = rm)
            import spark.implicits._
            l1.toDF("id", "vec").write.mode("overwrite")
              .parquet(s"$path/routing_l1")
            groupOf.toSeq.toDF("cluster_id", "group_id")
              .write.mode("overwrite").parquet(s"$path/routing_groups")
            Some((l1, groupOf))
          } else None
        (mergedCents, routingNew)
      }
    // construct the reopened layout directly instead of a full open():
    // the rewritten dirs need fresh reads (new file listings), but the
    // centroid table, codec params and routing level are the values this
    // very commit just wrote (parquet round-trips the doubles
    // bit-exactly; GraphLayoutSpec pins upsert ≡ reopen) — the sidecar +
    // centroid re-read cost several more driver jobs per upsert
    val data0 = spark.read.parquet(s"$path/data")
    val dataR = (storedSig, storedHalf) match {
      case (Some(u), _) =>
        graft.functions.ByteVecs.markSignedness(data0, "vec", u)
      case (_, Some(f)) =>
        graft.functions.HalfVecs.markHalf(data0, f, "vec")
      case _ => data0
    }
    val fsR = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val codesR =
      if (layout.pq.isDefined && fsR.exists(
        new org.apache.hadoop.fs.Path(s"$path/codes")))
        Some(spark.read.parquet(s"$path/codes"))
      else None
    val binCodesR =
      if (layout.bin.isDefined && fsR.exists(
        new org.apache.hadoop.fs.Path(s"$path/bincodes")))
        Some(spark.read.parquet(s"$path/bincodes"))
      else None
    Layout(dataR, spark.read.parquet(s"$path/graph"), codesR, mergedCents,
      layout.pq, binCodesR, layout.bin, layout.binVersion, routing,
      layout.routingMetricName, Some(path))
  }

  /** Restore a graph store whose upsert crashed mid-commit (open()
    * refuses it by the in-progress marker): re-derive the DERIVED
    * artifacts of the marker's touched shards FROM THE DATA ROWS
    * CURRENTLY ON DISK — PQ codes and sign-bit word codes re-encoded
    * (both are centroid-INDEPENDENT, so this is cheaper than
    * [[IndexLayout.repair]]'s: no coupled centroid/code ordering),
    * touched centroids refreshed with the shared rounded-mean fold,
    * centroid table swapped, persisted routing retrained — so no
    * code-only serve (ADC or Hamming, any kReorder) can ever emit an id
    * the data partitions no longer hold, whatever subset of the five
    * writes committed.
    *
    * The GRAPH gets a parameter-free CONSISTENCY pass, not a rebuild (a
    * rebuild needs the caller's BuildParams): touched shards' graph rows
    * are pruned to live data ids, dangling neighbor edges dropped
    * (original order kept), and a shard whose ENTRY node died gets the
    * smallest live graph node as its entry — without this, a
    * post-repair walk of that shard fails loudly on the dead entry.
    * Connectivity QUALITY stays degraded until the batch replays
    * (pruned edges are not re-linked; data rows the crashed upsert
    * added are code-served but unreachable by walks — both
    * recall-grade). This restores the INVARIANT — no code-only serve
    * can emit an id the data partitions no longer hold, and every
    * touched shard is servable; re-applying the interrupted upsert
    * batch afterwards restores the CONTENT (replace-on-add re-routes,
    * rebuilds the touched shards' graphs, and converges). Idempotent; a
    * store without a marker is returned unchanged. */
  def repair(spark: SparkSession, path: String): Layout = {
    import spark.implicits._
    // the guard refuses LIVE markers (repair under a running writer
    // interleaves two commits) and stale REBUILD markers (no touched
    // list exists — only re-running write() helps); what remains is the
    // stale upsert marker repair exists for
    val info = StoreMarker.guard(spark, path, "graph layout",
      "GraphLayout.repair(spark, path)", "GraphLayout.write",
      forRepair = true)
    if (info.isEmpty) return open(spark, path)
    val touched = info.get.touched.sorted
    // re-mark with a fresh session + heartbeat for the repair's own
    // rewrite: a crash mid-repair leaves the same stale-upsert state
    // (repair is idempotent), and the heartbeat keeps a concurrent
    // open() from reading "stale — repair me" under a live repair
    StoreMarker.bracket(spark, path, "upsert", touched) {
      val layout = openUnchecked(spark, path)
      val touchedRows = layout.clustered
        .select(col("id").cast("long").as("id"), col("vec"),
          col("cluster_id").cast("long").as("cluster_id"))
        .filter(col("cluster_id").isin(touched: _*))
        .localCheckpoint(true)
      lazy val touchedW = widenedForMath(touchedRows)
      // re-encode the DERIVED code artifacts from the rows on disk, in the
      // store's own packing — exactly the encode write()/upsert() run
      layout.pq.foreach { p =>
        Pq.encodeClustered(touchedW, p).repartition(col("cluster_id"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cluster_id").parquet(s"$path/codes")
      }
      layout.bin.foreach { b =>
        val wordCols =
          if (layout.binVersion >= 2) BinaryQuant.codeColumns64(col("vec"), b)
          else BinaryQuant.codeColumns(col("vec"), b)
        touchedW.select(col("cluster_id") +: col("id") +:
            wordCols.zipWithIndex.map {
              case (c, w) => c.as(s"w$w") }: _*)
          .repartition(col("cluster_id"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cluster_id").parquet(s"$path/bincodes")
      }
      // graph consistency pass (parameter-free — NOT a rebuild): keep only
      // live nodes, prune dangling neighbor edges preserving their original
      // order, and remap a DEAD entry to the smallest live graph node so
      // the shard stays servable (a walk fails loudly on a dead entry)
      val liveIds = touchedRows.select(col("cluster_id"), col("id"))
      val gTouched = layout.graph
        .select(col("id").cast("long").as("id"),
          col("entry_id").cast("long").as("entry_id"), col("neighbors"),
          col("cluster_id").cast("long").as("cluster_id"))
        .filter(col("cluster_id").isin(touched: _*))
      val gLive = gTouched.join(liveIds, Seq("cluster_id", "id"))
      val entryOf = gLive.groupBy(col("cluster_id")).agg(
        coalesce(max(when(col("id") === col("entry_id"), col("id"))),
          min(col("id"))).as("live_entry"))
      val gFixed = gLive
        .select(col("cluster_id"), col("id"),
          posexplode_outer(col("neighbors")).as(Seq("pos", "nbr")))
        .join(liveIds.withColumnRenamed("id", "nbr")
          .withColumn("nbr_live", lit(true)),
          Seq("cluster_id", "nbr"), "left_outer")
        .groupBy(col("cluster_id"), col("id"))
        .agg(expr("transform(sort_array(collect_list(" +
          "case when nbr_live then struct(pos, nbr) end)), s -> s.nbr)")
          .as("neighbors"))
        .join(entryOf, Seq("cluster_id"))
        .select(col("id"), col("live_entry").as("entry_id"),
          col("neighbors"), col("cluster_id"))
        .localCheckpoint(true)
      gFixed.repartition(col("cluster_id")).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster_id").parquet(s"$path/graph")
      // shards whose data partitions are gone (emptied by the crashed
      // upsert) must lose their code partitions and centroid entries too —
      // dynamic overwrite cannot delete a partition it never writes. The
      // graph deletion keys on the PRUNED graph's live shards instead: a
      // data-live shard whose every graph node died (all pre-crash rows
      // deleted, only crashed-batch adds remain) would otherwise keep its
      // stale dead-node partition; dropping it leaves the shard walkless
      // (zero candidates) until the replay rebuilds it — recall-grade.
      val liveCids = touchedRows.select(col("cluster_id")).distinct()
        .as[Long].collect().toSet
      val gLiveCids = gFixed.select(col("cluster_id")).distinct()
        .as[Long].collect().toSet
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.filterNot(liveCids).foreach { cid =>
        Seq("codes", "bincodes").foreach { sub =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$path/$sub/cluster_id=$cid"), true)
        }
      }
      touched.filterNot(gLiveCids).foreach { cid =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$path/graph/cluster_id=$cid"), true)
      }
      // refresh touched centroids from the rows on disk (the ONE shared
      // rounded-mean fold) and swap with open()-side crash recovery
      val touchedSet = touched.toSet
      val newCents = KMeans.roundedMeans(touchedW)
      val kept = layout.centroids.filterNot(c => touchedSet.contains(c._1))
      (kept ++ newCents).sortBy(_._1).toDF("id", "vec")
        .write.mode("overwrite").parquet(s"$path/centroids.tmp")
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/centroids"), true)
      require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/centroids.tmp"),
        new org.apache.hadoop.fs.Path(s"$path/centroids")),
        s"failed to swap $path/centroids.tmp into place")
      // refreshed centroids make a persisted routing level stale
      val rg = routingGroupsOf(spark, path)
      if (rg > 0) {
        val newCentTable = spark.read.parquet(s"$path/centroids")
          .select("id", "vec").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
          .toIndexedSeq.sortBy(_._1)
        val rm = layout.routingMetricName match {
          case Some(name) => Metric.byName(name).getOrElse(sys.error(
            s"layout routing_metric '$name' is not a routable metric"))
          case None => Metric.L2
        }
        val (l1, groupOf) = Vamana.trainRoutingLevel(newCentTable, rg,
          metric = rm)
        l1.toDF("id", "vec").write.mode("overwrite")
          .parquet(s"$path/routing_l1")
        groupOf.toSeq.toDF("cluster_id", "group_id").write.mode("overwrite")
          .parquet(s"$path/routing_groups")
      }
    }
    open(spark, path)
  }

  private def routingGroupsOf(spark: SparkSession, path: String): Int = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    (org.json4s.jackson.JsonMethods.parse(
      readSidecar(spark, s"$path/layout.json")) \ "routing_groups") match {
      case JNull | JNothing => 0
      case node             => node.extract[Int]
    }
  }

  /** Binary serving from the store: Hamming walk over the persisted
    * word-codes + graph partitions (8 bytes/row of walk state — the
    * smallest serving footprint), probe routing by Hamming distance to
    * the word-encoded centroids, then exact `metric` rerank touching
    * only the |Q|·kReorder·k candidate rows of `data`. */
  def searchHamming(layout: Layout, queries: DataFrame, k: Int,
                    searchWindow: Int, nProbes: Int, kReorder: Int,
                    rerankMetric: Metric = Metric.L2,
                    prebuiltProbes: Option[Map[Long,
                      Array[(Long, Array[Double])]]] = None): DataFrame = {
    val b = layout.bin.getOrElse(
      sys.error("layout has no binary codes — write(bin = Some(...)) first"))
    val codes = layout.binCodes.getOrElse(sys.error(
      "layout has no bincodes table — rewrite with bin = Some(...) " +
        "(sidecar thresholds present but bincodes directory missing)"))
    // v2 stores re-split their 64-bit words into the v1 word-double
    // space for the cogroup walk (bit-identical values — the split IS
    // codeColumns' packing); v1 stores cast their words directly
    val wv =
      if (layout.binVersion >= 2)
        codes.select(col("cluster_id"), col("id"),
          array(BinaryQuant.splitWords64(b.words,
            (0 until b.words64).map(j => col(s"w$j"))): _*).as("vec"))
      else codes.select(col("cluster_id"), col("id"),
        array((0 until b.words).map(w => col(s"w$w").cast("double")): _*)
          .as("vec"))
    val wordCents = layout.centroids.map { case (cid, cv) =>
      (cid, BinaryQuant.encodeWords(cv, b)) }
    val qWords = queries.select(col("query_id"),
      array(BinaryQuant.codeColumns(col("qvec"), b)
        .map(_.cast("double")): _*).as("qvec"))
    val cand = Vamana.searchSharded(qWords, wv, layout.graph, wordCents,
      kReorder * k, searchWindow, nProbes, Metric.Hamming,
      prebuiltProbes = prebuiltProbes)
    rerankExact(cand, queries, layout, prebuiltProbes, k, rerankMetric)
  }

  /** [[searchHamming]] with ZERO corpus shuffle ([[searchAdcLocal]]'s
    * binary twin, completing the local serving family): the Hamming walk
    * zips each probed shard's `bincodes/cluster_id=c` +
    * `graph/cluster_id=c` dirs narrowly into the walk task — candidates
    * bit-identical to [[searchHamming]], I/O = the probed BINCODE
    * partitions (8 bytes of walk state per row, the smallest serving
    * read of any codec), exchange = the |Q|·nProbes·(kReorder·k) walk
    * partials plus the exact rerank's candidate rows of `data`. */
  def searchHammingLocal(layout: Layout, queries: DataFrame, k: Int,
                         searchWindow: Int, nProbes: Int, kReorder: Int,
                         rerankMetric: Metric = Metric.L2,
                         prebuiltProbes: Option[Map[Long,
                           Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val path = layout.path.getOrElse(sys.error(
      "searchHammingLocal serves straight off the stored partition dirs " +
        "— open the layout from disk (GraphLayout.open) first"))
    val b = layout.bin.getOrElse(
      sys.error("layout has no binary codes — write(bin = Some(...)) first"))
    val codes = layout.binCodes.getOrElse(sys.error(
      "layout has no bincodes table — rewrite with bin = Some(...) " +
        "(sidecar thresholds present but bincodes directory missing)"))
    val wordCents = layout.centroids.map { case (cid, cv) =>
      (cid, BinaryQuant.encodeWords(cv, b)) }
    val qWords = queries.select(col("query_id"),
      array(BinaryQuant.codeColumns(col("qvec"), b)
        .map(_.cast("double")): _*).as("qvec"))
    val cand = Vamana.searchStoredHamming(qWords, s"$path/bincodes",
      s"$path/graph", codes.schema, layout.graph.schema, wordCents,
      b.wordsFor(layout.binVersion), kReorder * k, searchWindow, nProbes,
      prebuiltProbes, fullDensity = layout.binVersion >= 2)
    rerankExact(cand, queries, layout, prebuiltProbes, k, rerankMetric)
  }

  /** [[serve]]'s BINARY twin — ONE entry point for sign-bit serving
    * that dispatches between [[searchHammingLocal]] (zero corpus
    * shuffle; 8 bytes of walk state per row) and [[searchHamming]]
    * (cogroup — required for in-memory layouts, the explicit `mode`
    * dial otherwise; at the default `localMaxFraction` = 1.0 the
    * fraction never flips the choice, and cache residency deliberately
    * does not either — measured, see [[autoPick]]). Probing runs
    * EXACTLY ONCE, by Hamming
    * distance over the word-encoded query batch and centroids — the
    * same routing both manual paths compute — and threads through the
    * dispatched path. Both paths return bit-identical rows
    * (GraphLayoutSpec), so the dispatch is a pure cost decision,
    * completing the one-`search()` posture
    * (orchestrators/manager.h:217) across every layout codec family:
    * full-precision ([[serve]]), PQ ([[serveAdc]]), binary (this), and
    * the IVF codecs ([[IndexLayout.serve]]). */
  def serveHamming(layout: Layout, queries: DataFrame, k: Int,
                   searchWindow: Int, nProbes: Int, kReorder: Int,
                   rerankMetric: Metric = Metric.L2,
                   mode: ServeMode = ServeMode.Auto,
                   localMaxFraction: Double = 1.0,
                   prebuiltProbes: Option[ProbeMap] = None): DataFrame = {
    val b = layout.bin.getOrElse(
      sys.error("layout has no binary codes — write(bin = Some(...)) first"))
    val wordCents = layout.centroids.map { case (cid, cv) =>
      (cid, BinaryQuant.encodeWords(cv, b)) }
    val qWords = queries.select(col("query_id"),
      array(BinaryQuant.codeColumns(col("qvec"), b)
        .map(_.cast("double")): _*).as("qvec"))
    // probe ONCE in the word-encoded Hamming space (or reuse the map
    // serveHammingDecisionProbed already built for this batch)
    val pm = prebuiltProbes.getOrElse(
      Vamana.flatProbeMap(qWords, wordCents, nProbes, Metric.Hamming))
    val chosen = mode match {
      case ServeMode.Local   => "local"
      case ServeMode.Cogroup => "cogroup"
      case ServeMode.Auto    =>
        autoPick(pm.size.toDouble / layout.centroids.size,
          localMaxFraction, layout.path.isDefined)
    }
    if (chosen == "local")
      searchHammingLocal(layout, queries, k, searchWindow, nProbes,
        kReorder, rerankMetric, prebuiltProbes = Some(pm))
    else
      searchHamming(layout, queries, k, searchWindow, nProbes, kReorder,
        rerankMetric, prebuiltProbes = Some(pm))
  }

  /** The dispatch [[serveHamming]] will take for this batch, without
    * running it — [[serveDecision]]'s binary twin (probed by Hamming
    * over the word-encoded batch, like the serve itself). */
  def serveHammingDecision(layout: Layout, queries: DataFrame,
                           nProbes: Int,
                           localMaxFraction: Double = 1.0)
      : (String, Double) = {
    val (m, f, _) = serveHammingDecisionProbed(layout, queries, nProbes,
      localMaxFraction)
    (m, f)
  }

  /** [[serveHammingDecision]] that also returns its (word-space) probe
    * map — feed it to [[serveHamming]]'s `prebuiltProbes` (same batch,
    * same nProbes) so inspect-then-serve probes once. */
  def serveHammingDecisionProbed(layout: Layout, queries: DataFrame,
                                 nProbes: Int,
                                 localMaxFraction: Double = 1.0)
      : (String, Double, ProbeMap) = {
    val b = layout.bin.getOrElse(
      sys.error("layout has no binary codes — write(bin = Some(...)) first"))
    val wordCents = layout.centroids.map { case (cid, cv) =>
      (cid, BinaryQuant.encodeWords(cv, b)) }
    val qWords = queries.select(col("query_id"),
      array(BinaryQuant.codeColumns(col("qvec"), b)
        .map(_.cast("double")): _*).as("qvec"))
    val pm = Vamana.flatProbeMap(qWords, wordCents, nProbes,
      Metric.Hamming)
    val fraction = pm.size.toDouble / layout.centroids.size
    val m = autoPick(fraction, localMaxFraction, layout.path.isDefined)
    (m, fraction, pm)
  }

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
    in.readFully(bytes)
    in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
