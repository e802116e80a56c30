package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.operators.VamanaKernel.BuildParams

/** Distributed Vamana index (SURVEY §2 J2/B1-B4) as a **sharded graph**: rows
  * are routed to shards (k-means clusters, reusing IVF's A2-A4 machinery), a
  * local Vamana graph is built per shard inside `flatMapGroups`, and search
  * probes the nProbes nearest shards per query, runs the executor-local greedy
  * beam walk on each, and merges with the bounded top-k.
  *
  * Scale rationale (SURVEY §7 hard parts): the reference's greedy search
  * (include/svs/index/vamana/greedy_search.h:124-203) is a sequential pointer
  * chase — antithetical to bulk dataflow. Sharding keeps each walk local to
  * one executor while Spark parallelizes across shards × queries; at 100 TB
  * each shard's (vectors + graph) stays executor-memory-sized via the k-means
  * fanout (hierarchical at extreme scale), graphs are built once in parallel
  * with zero driver involvement, and only |Q|·nProbes·k partial rows shuffle
  * at search time. A single-shard build (`buildSingle`) reproduces the
  * reference's whole-dataset graph semantics exactly.
  *
  * Graph table schema: (cluster_id, id, entry_id, neighbors Array[Long]) —
  * SURVEY §1.4's adjacency mapping; `entry_id` is the shard medioid
  * (core/medioid.h:292).
  */
object Vamana {

  /** Build one Vamana graph per cluster. clustered: (id, vec, cluster_id).
    *
    * Element-type aware: an `ARRAY<FLOAT>` source keeps shard vectors
    * RESIDENT as float32 (`VamanaKernel.FloatStore`) — half the task
    * memory, twice the rows per cache line through the memory-bound build —
    * while all arithmetic widens per element into the identical double
    * fold, so the graph is bit-identical to casting the source to
    * `ARRAY<DOUBLE>` first (F32BuildSpec asserts this; the reference makes
    * the same float32-native choice, core/data/simple.h). */
  /** Spark-accumulator twin of [[VamanaKernel.BuildStats]] for the
    * SHARDED build: per-phase nanos and distance-call counts summed
    * across every shard task — the 10M/10⁸-scale attribution SCALE.md
    * reports (task-CPU sums, so phase seconds ≫ wall at 32-way
    * parallelism; fractions are the signal). DIAGNOSTIC, not exact:
    * the adds run inside a transformation, so a retried/speculated/
    * recomputed shard task counts again (Spark guarantees exactly-once
    * accumulators only for actions) — per-phase FRACTIONS stay
    * representative because a retry re-pays every phase proportionally,
    * but absolute sums can exceed one clean pass; never gate
    * correctness on them. */
  final case class ShardedBuildStats(
      search: org.apache.spark.util.LongAccumulator,
      greedyCpu: org.apache.spark.util.LongAccumulator,
      pruneCpu: org.apache.spark.util.LongAccumulator,
      applyNs: org.apache.spark.util.LongAccumulator,
      overflow: org.apache.spark.util.LongAccumulator,
      distCalls: org.apache.spark.util.LongAccumulator) {
    def jsonFields: String =
      s""""build_search_task_sec":${search.value / 1e9},""" +
        s""""build_greedy_cpu_sec":${greedyCpu.value / 1e9},""" +
        s""""build_prune_cpu_sec":${pruneCpu.value / 1e9},""" +
        s""""build_apply_task_sec":${applyNs.value / 1e9},""" +
        s""""build_overflow_task_sec":${overflow.value / 1e9},""" +
        s""""build_dist_calls":${distCalls.value}"""
  }

  def newBuildStats(spark: org.apache.spark.sql.SparkSession)
      : ShardedBuildStats = {
    val sc = spark.sparkContext
    ShardedBuildStats(sc.longAccumulator("vamana.build.search"),
      sc.longAccumulator("vamana.build.greedyCpu"),
      sc.longAccumulator("vamana.build.pruneCpu"),
      sc.longAccumulator("vamana.build.apply"),
      sc.longAccumulator("vamana.build.overflow"),
      sc.longAccumulator("vamana.build.distCalls"))
  }

  def buildSharded(clustered: DataFrame, params: BuildParams, metric: Metric,
                   stats: Option[ShardedBuildStats] = None)
      : DataFrame = {
    val spark = clustered.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType}
    val isFloat = clustered.schema("vec").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    val isByte = clustered.schema("vec").dataType match {
      case ArrayType(ByteType, _) => true
      case _                      => false
    }
    val unsigned =
      if (isByte) graft.functions.ByteVecs.requireSignedness(
        clustered.schema, "vec")
      else false
    val isHalf =
      graft.functions.HalfVecs.isShortVec(clustered.schema("vec").dataType)
    val bf16 = isHalf && graft.functions.HalfVecs.requireFormat(
      clustered.schema, "vec") == graft.functions.HalfVecs.BF16
    val built =
      if (isByte)
        // i8/u8 sources build byte-resident (ByteStore): 1/8 the task
        // memory of f64, bit-identical graphs (ByteKnnSpec)
        clustered
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec"))
          .as[(Long, Long, Seq[Byte])]
          .groupByKey(_._1)
          .flatMapGroups { (cid, it) =>
            val rows = it.toArray.sortBy(_._2)
            emitGraph(cid, rows.map(_._2),
              new VamanaKernel.ByteStore(rows.map(_._3.toArray), unsigned),
              params, metric, stats)
          }
      else if (isHalf)
        // f16/bf16 sources build half-resident (HalfStore): 1/4 the task
        // memory of f64, bit-identical graphs (HalfKnnSpec)
        clustered
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec"))
          .as[(Long, Long, Seq[Short])]
          .groupByKey(_._1)
          .flatMapGroups { (cid, it) =>
            val rows = it.toArray.sortBy(_._2)
            emitGraph(cid, rows.map(_._2),
              new VamanaKernel.HalfStore(rows.map(_._3.toArray), bf16),
              params, metric, stats)
          }
      else if (isFloat)
        clustered
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec"))
          .as[(Long, Long, Array[Float])]
          .groupByKey(_._1)
          .flatMapGroups { (cid, it) =>
            val rows = it.toArray.sortBy(_._2)
            emitGraph(cid, rows.map(_._2),
              new VamanaKernel.FloatStore(rows.map(_._3)), params, metric,
              stats)
          }
      else
        clustered
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec").cast("array<double>"))
          .as[(Long, Long, Array[Double])]
          .groupByKey(_._1)
          .flatMapGroups { (cid, it) =>
            // deterministic slot order: ascending external id
            val rows = it.toArray.sortBy(_._2)
            emitGraph(cid, rows.map(_._2),
              new VamanaKernel.DoubleStore(rows.map(_._3)), params, metric,
              stats)
          }
    built.toDF("cluster_id", "id", "entry_id", "neighbors")
  }

  private def emitGraph(cid: Long, ids: Array[Long],
                        store: VamanaKernel.VecStore, params: BuildParams,
                        metric: Metric,
                        stats: Option[ShardedBuildStats])
      : Iterator[(Long, Long, Long, Array[Long])] = {
    val local = if (stats.isDefined) new VamanaKernel.BuildStats else null
    val (adj, entry) = VamanaKernel.build(store, params, metric, local)
    stats.foreach { s =>
      s.search.add(local.search.sum); s.greedyCpu.add(local.greedyCpu.sum)
      s.pruneCpu.add(local.pruneCpu.sum); s.applyNs.add(local.apply.sum)
      s.overflow.add(local.overflow.sum)
      s.distCalls.add(local.distCalls.sum)
    }
    val entryId = ids(entry)
    ids.indices.iterator.map { i =>
      (cid, ids(i), entryId, adj(i).map(ids(_)))
    }
  }

  /** Whole-dataset single graph — the reference's exact shape (one entry
    * point, one adjacency). Only for shards that fit one executor. */
  def buildSingle(data: DataFrame, params: BuildParams, metric: Metric)
      : DataFrame =
    buildSharded(data.withColumn("cluster_id", lit(0L)), params, metric)

  /** Skew hardening for [[buildSharded]]: any cluster holding more than
    * `maxRows` rows (a hot key — one 10× shard would otherwise pin one task
    * while the rest of the cluster idles) is split into ceil(size/maxRows)
    * equal sub-shards by deterministic rank round-robin. Every cluster id is
    * remapped to `cid·splitBase (+ subIdx)`, and split clusters get
    * per-sub-shard mean centroids (rounded, engine-portable) so probe
    * routing keeps working — a hot region's sub-centroids are near-equal,
    * so raise nProbes to sweep them. Returns (clustered', centroids').
    * Deterministic: rank order is by ascending id. */
  def splitOversized(clustered: DataFrame,
                     centroids: Seq[(Long, Seq[Double])], maxRows: Long,
                     splitBase: Long = 1024)
      : (DataFrame, Seq[(Long, Seq[Double])]) = {
    require(maxRows >= 1, "maxRows must be >= 1")
    // partitioned-parquet round trips read cluster_id back as INT; widen
    val cl = clustered.withColumn("cluster_id", col("cluster_id").cast("long"))
    val sizes = cl.groupBy("cluster_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val kOf: Map[Long, Long] = sizes.collect {
      case (cid, s) if s > maxRows => cid -> ((s + maxRows - 1) / maxRows)
    }
    if (kOf.isEmpty) (cl, centroids)
    else {
      require(kOf.values.max <= splitBase,
        s"split fanout ${kOf.values.max} exceeds splitBase $splitBase")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id").orderBy("id")
      val kCol = coalesce(
        element_at(typedlit(kOf), col("cluster_id")), lit(1L))
      val reclustered = cl
        .withColumn("rn", row_number().over(w).cast("long") - 1)
        .withColumn("cluster_id",
          col("cluster_id") * splitBase + col("rn") % kCol)
        .drop("rn")
      val keptCents = centroids.collect {
        case (cid, v) if !kOf.contains(cid) => (cid * splitBase, v)
      }
      // sub-centroid means are VALUE arithmetic: widen byte-resident vecs
      // mark-aware first (a raw TINYINT avg would run u8 in the
      // sign-extended space, 200 → −56, skewing routing sub-centroids);
      // `reclustered` itself stays byte-resident in the returned frame
      val subCents = graft.functions.HalfVecs.widenedForMath(
        graft.functions.ByteVecs.widenedForMath(reclustered))
        .filter(element_at(typedlit(kOf),
          floor(col("cluster_id") / lit(splitBase)).cast("long")).isNotNull)
        .select(col("cluster_id"), posexplode(col("vec")))
        .groupBy("cluster_id", "pos").agg(round(avg("col"), 6).as("m"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (cid, xs) =>
          cid -> xs.sortBy(_._2).map(_._3).toIndexedSeq }
        .toSeq
      (reclustered, (keptCents ++ subCents).sortBy(_._1))
    }
  }

  /** Probe-and-walk search. queries(query_id, qvec) must be broadcast-small
    * (the reference holds the query batch in memory too); clustered and graph
    * are the `buildSharded` inputs/outputs. nProbes clusters per query are
    * chosen by centroid distance exactly like IVF (J3a); the per-shard walk
    * uses `searchWindow ≥ k`. Output: (query_id, rnk, neighbor_id, dist). */
  def searchSharded(queries: DataFrame, clustered: DataFrame, graph: DataFrame,
                    centroids: Seq[(Long, Seq[Double])], k: Int,
                    searchWindow: Int, nProbes: Int, metric: Metric,
                    searchCapacity: Int = 0,
                    prebuiltProbes: Option[Map[Long,
                      Array[(Long, Array[Double])]]] = None): DataFrame =
    searchShardedImpl(queries, clustered, graph, centroids, k, searchWindow,
      nProbes, metric, searchCapacity, lit(true), prebuiltProbes)

  /** Predicate-filtered probe-and-walk: rows failing `keep` (a boolean
    * Column over the clustered table) are still TRAVERSED — they sit in
    * the store and the graph, keeping connectivity intact — but never
    * emitted, the reference's deleted-slot search semantics
    * (index/vamana/dynamic_index.h:617-629: skip non-Valid slots from
    * results while walking through them; docstring
    * bindings/python/src/dynamic_vamana.cpp:196-198). Per shard the walk
    * keeps collecting past filtered entries until k kept rows emerge (or
    * the beam is exhausted), so with a full window the result is exactly
    * "kNN over probed shards WHERE keep" — the SQL the oracle states.
    * Pushing the filter BEFORE the walk instead would sever graph edges
    * through filtered nodes (the q27 flat anti-join shape is right for
    * flat scans, wrong for graphs). */
  def searchShardedFiltered(queries: DataFrame, clustered: DataFrame,
                            graph: DataFrame,
                            centroids: Seq[(Long, Seq[Double])], k: Int,
                            searchWindow: Int, nProbes: Int, metric: Metric,
                            keep: org.apache.spark.sql.Column,
                            searchCapacity: Int = 0,
                            prebuiltProbes: Option[Map[Long,
                              Array[(Long, Array[Double])]]] = None)
      : DataFrame =
    searchShardedImpl(queries, clustered, graph, centroids, k, searchWindow,
      nProbes, metric, searchCapacity, keep, prebuiltProbes)

  /** Two-level routed [[searchSharded]] — the shard-count scale path
    * (reference hierarchical_kmeans.h posture): probe selection scores
    * the `l1` group centroids first and only the chosen groups' shard
    * centroids after ([[BatchScore.probeTopKHierarchical]]). The walk is
    * the searchSharded walk unchanged; with `l1Probes = |l1|` the whole
    * search is bit-identical to [[searchSharded]] (HierRoutingSpec).
    * Build (l1, groupOf) once with [[trainRoutingLevel]]. */
  def searchShardedHierarchical(queries: DataFrame, clustered: DataFrame,
                                graph: DataFrame,
                                centroids: Seq[(Long, Seq[Double])],
                                l1: Seq[(Long, Seq[Double])],
                                groupOf: Map[Long, Long], k: Int,
                                searchWindow: Int, l1Probes: Int,
                                nProbes: Int, metric: Metric,
                                searchCapacity: Int = 0,
                                keep: org.apache.spark.sql.Column = lit(true),
                                prebuiltProbes: Option[Map[Long,
                                  Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val pm = prebuiltProbes.getOrElse(hierProbeMap(queries, centroids, l1,
      groupOf, l1Probes, nProbes, metric))
    searchShardedImpl(queries, clustered, graph, centroids, k, searchWindow,
      nProbes, metric, searchCapacity, keep, Some(pm))
  }

  /** THE two-level routing kernel — the one definition every
    * hierarchical path (cogroup, stored-local, and serve()'s dispatch
    * planning) shares, so the planner provably probes exactly the
    * shards the search reads. Returns cluster → (query_id, qvec) batch. */
  private[operators] def hierProbeMap(queries: DataFrame,
      centroids: Seq[(Long, Seq[Double])], l1: Seq[(Long, Seq[Double])],
      groupOf: Map[Long, Long], l1Probes: Int, nProbes: Int,
      metric: Metric): Map[Long, Array[(Long, Array[Double])]] =
    probeMapWith(queries, centroids, metric) { (qRows, cents) =>
      BatchScore.probeTopKHierarchical(qRows, cents,
        l1.sortBy(_._1).map { case (i, v) => (i, v.toArray) }.toIndexedSeq,
        groupOf, l1Probes, nProbes, metric)
    }

  /** Flat twin of [[hierProbeMap]] for layouts without a routing level. */
  private[operators] def flatProbeMap(queries: DataFrame,
      centroids: Seq[(Long, Seq[Double])], nProbes: Int, metric: Metric)
      : Map[Long, Array[(Long, Array[Double])]] =
    probeMap(queries, centroids, nProbes, metric)

  /** The DISTINCT shards a query batch will probe under flat routing —
    * the [[graft.operators.GraphLayout.serveDecision]] planning input
    * (same routing kernel as the search paths, so the fraction it
    * implies is exactly the fraction the chosen path will read). */
  def probedShards(queries: DataFrame, centroids: Seq[(Long, Seq[Double])],
                   nProbes: Int, metric: Metric): Set[Long] =
    flatProbeMap(queries, centroids, nProbes, metric).keySet

  /** [[probedShards]] under the persisted two-level routing. */
  def probedShardsHierarchical(queries: DataFrame,
                               centroids: Seq[(Long, Seq[Double])],
                               l1: Seq[(Long, Seq[Double])],
                               groupOf: Map[Long, Long], l1Probes: Int,
                               nProbes: Int, metric: Metric): Set[Long] =
    hierProbeMap(queries, centroids, l1, groupOf, l1Probes, nProbes,
      metric).keySet

  /** [[searchShardedHierarchical]] served straight off a PERSISTED
    * sharded layout with ZERO corpus shuffle — the 100 TB serving shape
    * (reference posture: the serialized index IS the serving format and
    * each cluster's file is walked where it is read,
    * include/svs/index/ivf/index.h:299-332 cluster pruning).
    *
    * The stored layout keeps `data/cluster_id=c/` and `graph/cluster_id=c/`
    * as sibling partition dirs, so for each PROBED shard one task reads
    * both sides straight off the shard's parquet files (no scan plan per
    * shard — see [[zipServe]]) and hands them to the same per-shard
    * merge + walk kernel the cogroup path uses — results are
    * bit-identical to [[searchShardedHierarchical]]
    * over the reopened frames, but corpus rows never enter a shuffle: the
    * only exchange is the |Q|·nProbes·k partials of the final top-k.
    * I/O is the probed dirs' bytes (partition pruning by construction),
    * parallelism is one task per probed shard. Planning is O(1) in
    * probed shards (one distributed listing job + one reader per side),
    * so the path serves BOTH regimes; the cogroup path remains ahead
    * only when a saturating sweep benefits from multi-task shards.
    *
    * `clusteredSchema`/`graphSchema` come from the reopened layout — the
    * vec element type plus its signedness/half-format marks (restored
    * from the sidecar) pick the same element-resident store the cogroup
    * branches do. A probed shard missing either dir emits nothing, the
    * inner-join semantics of the frame path.
    *
    * `keep` carries the [[searchShardedFiltered]] traverse-but-filter
    * semantics into the local path: rows failing it are walked through
    * but never emitted. It may reference the data FILE columns (`id`,
    * `vec`) — `cluster_id` lives in the directory name, not the files. */
  /** The stored zero-shuffle serve scaffold shared by
    * [[searchStoredHierarchical]] and [[searchStoredAdc]]: for each
    * probed shard with data files under BOTH `cluster_id=` dirs, one
    * task reads the shard's two sides straight off the parquet files and
    * feeds them to `walk`; the bounded per-query top-k finishes. A shard
    * missing either dir — or with zero data files — emits nothing: the
    * inner-join semantics of the frame path.
    *
    * Planning is O(1) in probed shards: file enumeration is ONE Spark
    * job (each task lists its shard's two dirs — the per-shard RPCs run
    * on executors, in parallel, bounded by Spark's own task machinery
    * instead of an unbounded driver-side Await), and the parquet readers
    * are built ONCE driver-side (`Bridge.parquetRowReader` — the same
    * reader FileSourceScanExec ships) rather than two scan plans per
    * shard. The former per-shard planning was ~100 ms × shards of
    * serial driver wall — the serve bottleneck at 10⁴+ probed shards.
    *
    * `leftKeep` is the traverse-but-filter predicate, analyzer-resolved
    * and ordinal-bound against the LEFT side's file schema driver-side
    * ([[org.apache.spark.sql.graftbridge.Bridge.resolveBoundPredicate]])
    * and evaluated per file row task-side before decode — rows failing
    * it reach `walk` flagged keep=false (null counts as false, SQL
    * filter semantics). */
  private def zipServe(spark: org.apache.spark.sql.SparkSession,
      probed: Seq[Long], leftPath: String, graphPath: String,
      leftSchema: org.apache.spark.sql.types.StructType,
      graphSchema: org.apache.spark.sql.types.StructType,
      leftKeep: Option[org.apache.spark.sql.Column],
      walk: (Long, Iterator[(org.apache.spark.sql.Row, Boolean)],
             Iterator[org.apache.spark.sql.Row])
        => Iterator[(Long, Long, Double)],
      k: Int, metric: Metric): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import spark.implicits._
    val sc = spark.sparkContext
    val hconf =
      new org.apache.spark.util.SerializableConfiguration(
        sc.hadoopConfiguration)
    // one distributed listing job: (cid, left files, graph files); data
    // files only (committer markers like _SUCCESS and hidden names are
    // not parquet), deterministic per-shard file order
    val lp = leftPath; val gp = graphPath
    val shards: Array[(Long, Array[(String, Long, Long)],
        Array[(String, Long, Long)])] =
      if (probed.isEmpty) Array.empty
      else sc.parallelize(probed.sorted,
          math.max(1, math.min(probed.size, sc.defaultParallelism * 4)))
        .map { cid =>
          def files(root: String): Array[(String, Long, Long)] = {
            val dir = new org.apache.hadoop.fs.Path(root, s"cluster_id=$cid")
            val fs = dir.getFileSystem(hconf.value)
            try fs.listStatus(dir).collect {
              case st if st.isFile &&
                  !st.getPath.getName.startsWith("_") &&
                  !st.getPath.getName.startsWith(".") =>
                (st.getPath.toString, st.getLen, st.getModificationTime)
            }.sortBy(_._1)
            catch { case _: java.io.FileNotFoundException => Array.empty }
          }
          (cid, files(lp), files(gp))
        }
        .collect()
        .filter(s => s._2.nonEmpty && s._3.nonEmpty)
        .sortBy(_._1)
    val leftReader = Bridge.parquetRowReader(spark, leftSchema)
    val graphReader = Bridge.parquetRowReader(spark, graphSchema)
    val leftDec = Bridge.rowDecoder(leftSchema)
    val graphDec = Bridge.rowDecoder(graphSchema)
    val keepBound = leftKeep.map { c =>
      Bridge.resolveBoundPredicate(spark,
        Bridge.toCatalyst(c.cast("boolean")),
        leftSchema.map(f =>
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            f.name, f.dataType, f.nullable, f.metadata)()))
    }
    val partials =
      (if (shards.isEmpty) sc.emptyRDD[(Long, Long, Double)]
       // one ELEMENT per slice ⇒ one task per probed shard, the exact
       // parallelism of the former per-shard zipPartitions union
       else sc.parallelize(shards.toIndexedSeq, shards.length)
         .flatMap { case (cid, lFiles, gFiles) =>
           val pred = keepBound.map(Bridge.createPredicate)
           val lDes = leftDec.createDeserializer()
           val gDes = graphDec.createDeserializer()
           def rows(reader: org.apache.spark.sql.execution.datasources
                 .PartitionedFile => Iterator[
                   org.apache.spark.sql.catalyst.InternalRow],
               fs: Array[(String, Long, Long)]) =
             fs.iterator.flatMap { case (p, len, mod) =>
               Bridge.flattenToRows(
                 reader(Bridge.partitionedFile(p, len, mod)))
             }
           // eval keep on the raw InternalRow BEFORE decode: batch-backed
           // rows are reused views, and the decoder's output is a copy
           val lRows = rows(leftReader, lFiles).map { ir =>
             val kp = pred.forall(_(ir))
             (lDes(ir), kp)
           }
           val gRows = rows(graphReader, gFiles).map(gDes(_))
           walk(cid, lRows, gRows)
         })
        .toDF("query_id", "id", "dist")
    TopK.perKeyViaWindow(partials, Seq("query_id"), col("id"), col("dist"),
      k, metric.ascending)
  }

  /** The shared per-shard shape of every stored zero-shuffle walk
    * ([[searchStoredHierarchical]]'s residency branches,
    * [[searchStoredAdc]], [[searchStoredHamming]]): broadcast the probe
    * map, read each probed shard's two dirs through [[zipServe]],
    * extract (id, payload) per left-file row, id-sort, merge with the
    * graph rows, and walk. One definition so the sort/merge/emptiness
    * contract cannot diverge across the variants. */
  private def zipServeMerged[P](spark: org.apache.spark.sql.SparkSession,
      pm: Map[Long, Array[(Long, Array[Double])]],
      leftPath: String, graphPath: String,
      leftSub: org.apache.spark.sql.types.StructType,
      gSub: org.apache.spark.sql.types.StructType,
      keep: Option[org.apache.spark.sql.Column],
      extract: org.apache.spark.sql.Row => (Long, P),
      mkStore: IndexedSeq[P] => VamanaKernel.VecStore,
      k: Int, searchWindow: Int, metric: Metric,
      searchCapacity: Int = 0): DataFrame = {
    val bc = spark.sparkContext.broadcast(pm)
    val gIdIx = gSub.fieldIndex("id")
    val gEntryIx = gSub.fieldIndex("entry_id")
    val gNbrIx = gSub.fieldIndex("neighbors")
    zipServe(spark, pm.keys.toSeq, leftPath, graphPath, leftSub, gSub,
      keep,
      (cid, lIt, gIt) => {
        val qs = bc.value.getOrElse(cid, Array.empty[(Long, Array[Double])])
        if (qs.isEmpty) Iterator.empty
        else {
          val g = gIt.map(r => (cid, longAt(r, gIdIx),
            longAt(r, gEntryIx), longArrayAt(r, gNbrIx)))
          val rows = lIt.map { case (r, kp) =>
            val (id, p) = extract(r); (id, p, kp) }.toArray.sortBy(_._1)
          walkMerged(cid, rows.map(x => (x._1, x._3)),
            idxs => mkStore(idxs.toIndexedSeq.map(ix => rows(ix)._2)),
            g, qs, k, searchWindow, searchCapacity, metric)
        }
      }, k, metric)
  }

  def searchStoredHierarchical(queries: DataFrame, dataPath: String,
                               graphPath: String,
                               clusteredSchema: org.apache.spark.sql.types.StructType,
                               graphSchema: org.apache.spark.sql.types.StructType,
                               centroids: Seq[(Long, Seq[Double])],
                               l1: Seq[(Long, Seq[Double])],
                               groupOf: Map[Long, Long], k: Int,
                               searchWindow: Int, l1Probes: Int,
                               nProbes: Int, metric: Metric,
                               searchCapacity: Int = 0,
                               keep: org.apache.spark.sql.Column = lit(true),
                               prebuiltProbes: Option[Map[Long,
                                 Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(searchWindow >= k, "searchWindow must be ≥ k")
    val pm = prebuiltProbes.getOrElse(hierProbeMap(queries, centroids, l1,
      groupOf, l1Probes, nProbes, metric))
    import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType, StructType}
    val isFloat = clusteredSchema("vec").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    val isByte = clusteredSchema("vec").dataType match {
      case ArrayType(ByteType, _) => true
      case _                      => false
    }
    val unsigned =
      if (isByte) graft.functions.ByteVecs.requireSignedness(
        clusteredSchema, "vec")
      else false
    val isHalf =
      graft.functions.HalfVecs.isShortVec(clusteredSchema("vec").dataType)
    val bf16 = isHalf && graft.functions.HalfVecs.requireFormat(
      clusteredSchema, "vec") == graft.functions.HalfVecs.BF16
    val dSub = StructType(clusteredSchema.filterNot(_.name == "cluster_id"))
    val gSub = StructType(graphSchema.filterNot(_.name == "cluster_id"))
    // field lookups + element widening resolved ONCE against the file
    // schemas (the walk reads raw file rows now; the former per-dir
    // select's casts are applied here in Scala)
    val dIdIx = dSub.fieldIndex("id"); val dVecIx = dSub.fieldIndex("vec")
    val vecIsDouble = dSub("vec").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    // residency dispatch picks the (row payload, store) pair once; the
    // shard shape is the shared zipServeMerged scaffold
    if (isHalf)
      zipServeMerged[Array[Short]](spark, pm, dataPath, graphPath, dSub,
        gSub, Some(keep),
        r => (longAt(r, dIdIx), r.getSeq[Short](dVecIx).toArray),
        xs => new VamanaKernel.HalfStore(xs.toArray, bf16),
        k, searchWindow, metric, searchCapacity)
    else if (isByte)
      zipServeMerged[Array[Byte]](spark, pm, dataPath, graphPath, dSub,
        gSub, Some(keep),
        r => (longAt(r, dIdIx), r.getSeq[Byte](dVecIx).toArray),
        xs => new VamanaKernel.ByteStore(xs.toArray, unsigned),
        k, searchWindow, metric, searchCapacity)
    else if (isFloat)
      zipServeMerged[Array[Float]](spark, pm, dataPath, graphPath, dSub,
        gSub, Some(keep),
        r => (longAt(r, dIdIx), r.getSeq[Float](dVecIx).toArray),
        xs => new VamanaKernel.FloatStore(xs.toArray),
        k, searchWindow, metric, searchCapacity)
    else
      zipServeMerged[Array[Double]](spark, pm, dataPath, graphPath, dSub,
        gSub, Some(keep),
        r => (longAt(r, dIdIx), doubleArrayAt(r, dVecIx, vecIsDouble)),
        xs => new VamanaKernel.DoubleStore(xs.toArray),
        k, searchWindow, metric, searchCapacity)
  }

  /** The former per-dir scan selects applied `cast("long")` /
    * `cast("array<long>")` / `cast("array<double>")` defensively; the
    * zipServe walk reads raw file rows, so these helpers keep that
    * tolerance (a store written with int ids by an external tool still
    * serves) without a per-row schema dispatch in the common case. */
  private def longAt(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i) match {
      case l: Long           => l
      case n: java.lang.Number => n.longValue()
    }

  private def longArrayAt(r: org.apache.spark.sql.Row, i: Int)
      : Array[Long] =
    r.getSeq[Any](i) match {
      case s if s.isEmpty => Array.empty[Long]
      case s => s.head match {
        case _: Long => s.asInstanceOf[Seq[Long]].toArray
        case _ => s.map(_.asInstanceOf[java.lang.Number].longValue()).toArray
      }
    }

  private def doubleArrayAt(r: org.apache.spark.sql.Row, i: Int,
                            isDouble: Boolean): Array[Double] =
    if (isDouble) r.getSeq[Double](i).toArray
    else r.getSeq[Any](i)
      .map(_.asInstanceOf[java.lang.Number].doubleValue()).toArray

  /** Broadcast-small ceiling for [[trainRoutingLevel]]'s input: the shard
    * centroid table is held, trained, and broadcast whole — at 64-d
    * doubles, 2²⁰ centroids ≈ 0.5 GB, the edge of driver/broadcast
    * comfort. Past it, shard coarser or add another routing level. */
  val MaxRoutingCentroids: Int = 1 << 20

  /** Deterministic driver-side Lloyd over the SHARD CENTROIDS themselves
    * — builds the level-1 routing table for
    * [[searchShardedHierarchical]]. Seeds are the first `nGroups`
    * centroids in ascending id order; ties to the smaller group id; empty
    * groups keep their seed. Returns (l1 centroids, shard-cid → group-id).
    * Runs on the centroid table only (broadcast-small by the routing
    * contract, enforced via `maxCentroids`), so even 10⁶ shards train in
    * milliseconds.
    *
    * `metric` is the SERVING metric: groups must partition the centroid
    * space the way [[BatchScore.probeTopKHierarchical]] will score it, so
    * assignment uses `metric.compute` with the metric's own ordering.
    * Similarity metrics (IP/cosine) route by DIRECTION, so their group
    * representatives are unit-normalized means (spherical k-means,
    * Dhillon & Modha '01) — a raw-mean representative would hand every
    * query to whichever group's mean has the largest norm under IP
    * scoring. L2 keeps the plain Lloyd mean, bit-identical to the
    * historical behavior. */
  def trainRoutingLevel(centroids: Seq[(Long, Seq[Double])], nGroups: Int,
                        iters: Int = 5,
                        metric: Metric = graft.core.Metric.L2,
                        maxCentroids: Int = MaxRoutingCentroids)
      : (Seq[(Long, Seq[Double])], Map[Long, Long]) = {
    require(nGroups >= 1 && centroids.nonEmpty)
    require(centroids.length <= maxCentroids,
      s"${centroids.length} shard centroids exceed the broadcast-small " +
        s"routing contract (max $maxCentroids): the centroid table is " +
        "driver-held and broadcast whole — shard coarser, or raise the " +
        "per-shard row budget so the shard count stays within the limit")
    def unit(v: Array[Double]): Array[Double] = {
      var n = 0.0; var j = 0
      while (j < v.length) { n += v(j) * v(j); j += 1 }
      if (n == 0.0) v
      else { val s = math.sqrt(n); v.map(_ / s) }
    }
    val spherical = !metric.ascending
    val cents = centroids.sortBy(_._1)
      .map { case (i, v) => (i, v.toArray) }.toIndexedSeq
    val g = math.min(nGroups, cents.length)
    var l1 = cents.take(g).zipWithIndex.map { case ((_, v), gi) =>
      (gi.toLong, if (spherical) unit(v.clone()) else v.clone()) }
    var assign: Map[Long, Long] = Map.empty
    for (_ <- 0 until iters) {
      assign = cents.map { case (cid, v) =>
        var bestG = 0L; var bestD = Double.NaN
        l1.foreach { case (gid, gv) =>
          val d = metric.compute(v, gv)
          val closer = if (metric.ascending) d < bestD else d > bestD
          if (bestD.isNaN || closer ||
            (d == bestD && gid < bestG)) { bestD = d; bestG = gid }
        }
        cid -> bestG
      }.toMap
      l1 = l1.map { case (gid, seed) =>
        val mem = cents.filter { case (cid, _) => assign(cid) == gid }
        if (mem.isEmpty) (gid, seed)
        else {
          val d = seed.length
          val acc = new Array[Double](d)
          mem.foreach { case (_, v) =>
            var j = 0; while (j < d) { acc(j) += v(j); j += 1 } }
          var j = 0
          while (j < d) { acc(j) /= mem.length; j += 1 }
          (gid, if (spherical) unit(acc) else acc)
        }
      }
    }
    (l1.map { case (gid, v) => (gid, v.toSeq) }, assign)
  }

  private def searchShardedImpl(queries: DataFrame, clustered: DataFrame,
                                graph: DataFrame,
                                centroids: Seq[(Long, Seq[Double])], k: Int,
                                searchWindow: Int, nProbes: Int,
                                metric: Metric, searchCapacity: Int,
                                keep: org.apache.spark.sql.Column,
                                prebuiltProbes: Option[Map[Long,
                                  Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val spark = clustered.sparkSession
    import spark.implicits._
    require(searchWindow >= k, "searchWindow must be ≥ k")

    // (a) per-query probe list — tiny; computed on the driver so the probe
    // map broadcasts with the query vectors attached.
    val probesByCluster = prebuiltProbes.getOrElse(
      probeMap(queries, centroids, nProbes, metric))
    val bc = spark.sparkContext.broadcast(probesByCluster)
    val probedIds = probesByCluster.keys.toSeq

    // (b) partition-pruned co-group: only probed clusters are read at all
    // (isin filter reaches the parquet scan when clustered is partitioned by
    // cluster_id), then each shard walks its local graph for its queries.
    // Element-type aware like buildSharded: ARRAY<FLOAT> sources stay
    // float-resident through the walk (half the per-task bytes; identical
    // double fold via the mixed kernels, F32BuildSpec asserts equality).
    import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType}
    val isFloat = clustered.schema("vec").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    val isByte = clustered.schema("vec").dataType match {
      case ArrayType(ByteType, _) => true
      case _                      => false
    }
    val unsigned =
      if (isByte) graft.functions.ByteVecs.requireSignedness(
        clustered.schema, "vec")
      else false
    val isHalf =
      graft.functions.HalfVecs.isShortVec(clustered.schema("vec").dataType)
    val bf16 = isHalf && graft.functions.HalfVecs.requireFormat(
      clustered.schema, "vec") == graft.functions.HalfVecs.BF16
    // ONE shuffle per side, not three: the former
    // `clustered ⋈ graph on (cluster_id, id)` + `groupByKey(cluster_id)`
    // moved the corpus rows twice (join exchange, then regroup exchange).
    // A typed cogroup on cluster_id exchanges each side exactly once and
    // the per-shard id-merge happens in the walk task — bit-identical
    // rows (inner-join semantics, ascending-id order) at half the
    // shuffle bytes, which is THE cost of scattered-probe serving when
    // uniform queries touch every shard (SCALE.md 10M routed-walk row).
    val dataPruned = clustered
      .withColumn("keep", keep)
      .filter(col("cluster_id").isin(probedIds: _*))
    val graphK = graph
      .filter(col("cluster_id").isin(probedIds: _*))
      .select(col("cluster_id").cast("long"), col("id").cast("long"),
        col("entry_id").cast("long"), col("neighbors").cast("array<long>"))
      .as[(Long, Long, Long, Array[Long])]
      .groupByKey(_._1)

    val m = metric

    val partials = (
      if (isHalf)
        // half-resident walk (f16/bf16 datatype parity): same shape as
        // the float branch at half its per-task bytes, bit-identical
        // results (HalfKnnSpec)
        dataPruned
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec"), col("keep"))
          .as[(Long, Long, Seq[Short], Boolean)]
          .groupByKey(_._1)
          .cogroup(graphK) { (cid, dIt, gIt) =>
            val qs = bc.value.getOrElse(cid,
              Array.empty[(Long, Array[Double])])
            if (qs.isEmpty) Iterator.empty
            else {
              val rows = dIt.toArray.sortBy(_._2)
              walkMerged(cid, rows.map(r => (r._2, r._4)),
                idxs => new VamanaKernel.HalfStore(
                  idxs.map(ix => rows(ix)._3.toArray), bf16), gIt, qs,
                k, searchWindow, searchCapacity, m)
            }
          }
      else if (isByte)
        // byte-resident walk (i8/u8 datatype parity): same shape as the
        // float branch at 1/8 the per-task bytes, bit-identical results
        dataPruned
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec"), col("keep"))
          .as[(Long, Long, Seq[Byte], Boolean)]
          .groupByKey(_._1)
          .cogroup(graphK) { (cid, dIt, gIt) =>
            val qs = bc.value.getOrElse(cid,
              Array.empty[(Long, Array[Double])])
            if (qs.isEmpty) Iterator.empty
            else {
              val rows = dIt.toArray.sortBy(_._2)
              walkMerged(cid, rows.map(r => (r._2, r._4)),
                idxs => new VamanaKernel.ByteStore(
                  idxs.map(ix => rows(ix)._3.toArray), unsigned), gIt, qs,
                k, searchWindow, searchCapacity, m)
            }
          }
      else if (isFloat)
        dataPruned
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec"), col("keep"))
          .as[(Long, Long, Array[Float], Boolean)]
          .groupByKey(_._1)
          .cogroup(graphK) { (cid, dIt, gIt) =>
            val qs = bc.value.getOrElse(cid,
              Array.empty[(Long, Array[Double])])
            if (qs.isEmpty) Iterator.empty
            else {
              val rows = dIt.toArray.sortBy(_._2)
              walkMerged(cid, rows.map(r => (r._2, r._4)),
                idxs => new VamanaKernel.FloatStore(
                  idxs.map(ix => rows(ix)._3)), gIt, qs,
                k, searchWindow, searchCapacity, m)
            }
          }
      else
        dataPruned
          .select(col("cluster_id").cast("long"), col("id").cast("long"),
            col("vec").cast("array<double>"), col("keep"))
          .as[(Long, Long, Array[Double], Boolean)]
          .groupByKey(_._1)
          .cogroup(graphK) { (cid, dIt, gIt) =>
            val qs = bc.value.getOrElse(cid,
              Array.empty[(Long, Array[Double])])
            if (qs.isEmpty) Iterator.empty
            else {
              val rows = dIt.toArray.sortBy(_._2)
              walkMerged(cid, rows.map(r => (r._2, r._4)),
                idxs => new VamanaKernel.DoubleStore(
                  idxs.map(ix => rows(ix)._3)), gIt, qs,
                k, searchWindow, searchCapacity, m)
            }
          }
      ).toDF("query_id", "id", "dist")

    // (c) merge: |Q|·nProbes·k rows — window rank is exact and cheap
    TopK.perKeyViaWindow(partials, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** DiskANN-style compressed serving (Subramanya et al. NeurIPS'19;
    * the open-source analog of the reference's LVQ-compressed walk —
    * README.md:36 keeps LVQ closed, so SVS users compose Vamana with a
    * quantized dataset exactly like this): walk the sharded Vamana graph
    * scoring candidates by PQ ASYMMETRIC distance over a CODES-ONLY scan.
    * The walk input is `codes ⋈ graph` — full-precision vectors are never
    * read at search time; per (query, shard) the [[VamanaKernel.PqStore]]
    * builds one LUT (k·d multiplies) and every candidate costs m lookups
    * + m−1 adds, the TPAMI'11 §V ADC contract.
    *
    * `codes`: (cluster_id, id, c0..c{m−1}) from [[Pq.encodeClustered]] —
    * cluster-partitioned like the data, so the probe `isin` prunes the
    * scan to probed shards. Metric must decompose over subspaces (L2 or
    * inner product — NOT cosine; rerank with [[searchShardedAdcRerank]]
    * handles the rest). At 100 TB this is the shape that fits graphs in
    * executor memory: 64-d float64 rows shrink 64× (4 bytes of codes vs
    * 512), so a shard's walk state is codes + adjacency only. */
  def searchShardedAdc(queries: DataFrame, codes: DataFrame,
                       graph: DataFrame,
                       centroids: Seq[(Long, Seq[Double])], p: Pq.Params,
                       k: Int, searchWindow: Int, nProbes: Int,
                       metric: Metric = Metric.L2,
                       keep: org.apache.spark.sql.Column = lit(true),
                       prebuiltProbes: Option[Map[Long,
                         Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    require(searchWindow >= k, "searchWindow must be ≥ k")
    require(metric == Metric.L2 || metric == Metric.IP,
      s"ADC requires a subspace-decomposable metric (L2/IP), got $metric")

    val probesByCluster =
      prebuiltProbes.getOrElse(probeMap(queries, centroids, nProbes, metric))
    val bc = spark.sparkContext.broadcast(probesByCluster)
    val probedIds = probesByCluster.keys.toSeq
    val m = metric
    val books = p.codebooks

    // one exchange per side (the searchShardedImpl cogroup shape): codes
    // and graph each move once; the per-shard id-merge in the walk task
    // reproduces the former inner join bit-for-bit
    val codeArr = array((0 until p.m).map(j => col(s"c$j").cast("int")): _*)
    val graphK = graph
      .filter(col("cluster_id").isin(probedIds: _*))
      .select(col("cluster_id").cast("long"), col("id").cast("long"),
        col("entry_id").cast("long"), col("neighbors").cast("array<long>"))
      .as[(Long, Long, Long, Array[Long])]
      .groupByKey(_._1)
    val partials = codes
      .withColumn("keep", keep)
      .filter(col("cluster_id").isin(probedIds: _*))
      .select(col("cluster_id").cast("long"), col("id").cast("long"),
        codeArr.as("code"), col("keep"))
      .as[(Long, Long, Array[Int], Boolean)]
      .groupByKey(_._1)
      .cogroup(graphK) { (cid, dIt, gIt) =>
        val qs = bc.value.getOrElse(cid, Array.empty[(Long, Array[Double])])
        if (qs.isEmpty) Iterator.empty
        else {
          val rows = dIt.toArray.sortBy(_._2)
          walkMerged(cid, rows.map(r => (r._2, r._4)),
            idxs => new VamanaKernel.PqStore(
              idxs.map(ix => rows(ix)._3), books), gIt, qs,
            k, searchWindow, 0, m)
        }
      }
      .toDF("query_id", "id", "dist")

    TopK.perKeyViaWindow(partials, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** The two-pass DiskANN serving plan: ADC walk keeps the best
    * `kReorder·k` candidates per query (first pass, codes only), then the
    * tiny candidate list — |Q|·kReorder·k rows, broadcast — joins the
    * full-precision table ONCE for an exact-distance rerank (the
    * reference's k_reorder pattern, index/ivf/index.h:284, applied to the
    * graph walk). Full-precision reads are O(|Q|·kReorder·k), independent
    * of corpus size — the property that makes PQ-in-RAM / vectors-on-disk
    * serving work at 100 TB. Exact rerank also restores cosine (the walk
    * metric stays L2/IP). */
  def searchShardedAdcRerank(queries: DataFrame, codes: DataFrame,
                             graph: DataFrame,
                             centroids: Seq[(Long, Seq[Double])],
                             p: Pq.Params, data: DataFrame, k: Int,
                             kReorder: Int, searchWindow: Int, nProbes: Int,
                             walkMetric: Metric = Metric.L2,
                             rerankMetric: Metric = Metric.L2,
                             keep: org.apache.spark.sql.Column = lit(true),
                             prebuiltProbes: Option[Map[Long,
                               Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val cand = searchShardedAdc(queries, codes, graph, centroids, p,
      kReorder * k, searchWindow, nProbes, walkMetric, keep, prebuiltProbes)
    Rerank.exact(cand, queries, data, k, rerankMetric)
  }

  /** [[searchShardedAdc]] served straight off a PERSISTED layout's
    * `codes/cluster_id=c` + `graph/cluster_id=c` dirs with ZERO corpus
    * shuffle — the codes twin of [[searchStoredHierarchical]]: one task
    * per probed shard reads codes + graph files directly (O(1) planning,
    * see [[zipServe]]) into the same PqStore walk; the
    * only exchange is the |Q|·nProbes·k top-k partials. At 100 TB this
    * is DiskANN serving with per-query I/O = probed CODE partitions
    * (64× smaller than data) and network = walk output. `keep` is the
    * traverse-but-filter predicate over the codes file columns —
    * [[searchShardedAdc]]'s deleted-slot semantics on the stored path
    * (reference: index/vamana/dynamic_index.h:617-629). */
  def searchStoredAdc(queries: DataFrame, codesPath: String,
                      graphPath: String,
                      codesSchema: org.apache.spark.sql.types.StructType,
                      graphSchema: org.apache.spark.sql.types.StructType,
                      centroids: Seq[(Long, Seq[Double])], p: Pq.Params,
                      k: Int, searchWindow: Int, nProbes: Int,
                      metric: Metric = Metric.L2,
                      keep: org.apache.spark.sql.Column = lit(true),
                      prebuiltProbes: Option[Map[Long,
                        Array[(Long, Array[Double])]]] = None)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(searchWindow >= k, "searchWindow must be ≥ k")
    require(metric == Metric.L2 || metric == Metric.IP,
      s"ADC requires a subspace-decomposable metric (L2/IP), got $metric")
    val pm = prebuiltProbes.getOrElse(
      probeMap(queries, centroids, nProbes, metric))
    import org.apache.spark.sql.types.StructType
    val cSub = StructType(codesSchema.filterNot(_.name == "cluster_id"))
    val gSub = StructType(graphSchema.filterNot(_.name == "cluster_id"))
    val cIdIx = cSub.fieldIndex("id")
    val cIxs = (0 until p.m).map(j => cSub.fieldIndex(s"c$j")).toArray
    val books = p.codebooks
    // `keep` carries [[searchShardedAdc]]'s traverse-but-filter semantics
    // into the stored path: it may reference the CODES file columns
    // (`id`, `c0`..`c{m-1}` — practically id, the tombstone shape);
    // `cluster_id` lives in the directory name, not the files
    zipServeMerged[Array[Int]](spark, pm, codesPath, graphPath, cSub,
      gSub, Some(keep),
      r => (longAt(r, cIdIx), cIxs.map(ix => intAt(r, ix))),
      xs => new VamanaKernel.PqStore(xs.toArray, books),
      k, searchWindow, metric)
  }

  private def intAt(r: org.apache.spark.sql.Row, i: Int): Int =
    r.get(i) match {
      case x: Int              => x
      case n: java.lang.Number => n.intValue()
    }

  /** The binary (sign-bit word) twin of [[searchStoredAdc]]: Hamming
    * walk served straight off a persisted layout's
    * `bincodes/cluster_id=c` + `graph/cluster_id=c` dirs with ZERO
    * corpus shuffle — one task per probed shard reads word codes + graph
    * files directly into a Hamming walk kernel. With
    * `fullDensity = false` (bincodes layout v1) that is the
    * words-as-doubles `DoubleStore` + `Metric.Hamming` — exactly the
    * frame [[graft.operators.GraphLayout.searchHamming]] builds; with
    * `fullDensity = true` (layout v2, the write default) rows stay raw
    * 64-bit words in a [[VamanaKernel.WordStore]] (native xor/popcount,
    * half the walk state) while QUERIES remain in the v1 word-double
    * space — the store recombines them once per search, and the
    * word-grouping identity (BinaryQuant.codeColumns64) makes every
    * distance bit-identical across the two paths (GraphLayoutSpec pins
    * v2 ≡ v1 serving). Candidates are bit-identical either way and the
    * only exchange is the |Q|·nProbes·k top-k partials. At 100 TB this
    * is the smallest serving I/O shape of all: 8 bytes of walk state
    * per row at 64 dims.
    * `queries` must already be word-encoded (query_id, qvec of
    * word-doubles); `wordCents` are the word-encoded centroids the probe
    * routing scores — both exactly as the cogroup path prepares them. */
  def searchStoredHamming(queries: DataFrame, codesPath: String,
                          graphPath: String,
                          codesSchema: org.apache.spark.sql.types.StructType,
                          graphSchema: org.apache.spark.sql.types.StructType,
                          wordCents: Seq[(Long, Seq[Double])], words: Int,
                          k: Int, searchWindow: Int, nProbes: Int,
                          prebuiltProbes: Option[Map[Long,
                            Array[(Long, Array[Double])]]] = None,
                          fullDensity: Boolean = false)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(searchWindow >= k, "searchWindow must be ≥ k")
    val pm = prebuiltProbes.getOrElse(
      probeMap(queries, wordCents, nProbes, Metric.Hamming))
    import org.apache.spark.sql.types.StructType
    val cSub = StructType(codesSchema.filterNot(_.name == "cluster_id"))
    val gSub = StructType(graphSchema.filterNot(_.name == "cluster_id"))
    val cIdIx = cSub.fieldIndex("id")
    val wIxs = (0 until words).map(j => cSub.fieldIndex(s"w$j")).toArray
    // v2 (fullDensity): rows stay raw 64-bit words in a WordStore — half
    // the walk state; queries remain in the v1 word-double space and the
    // store recombines them once per search. Hamming sums are invariant
    // to the word grouping, so candidates are bit-identical to v1.
    if (fullDensity)
      zipServeMerged[Array[Long]](spark, pm, codesPath, graphPath, cSub,
        gSub, None,
        r => (longAt(r, cIdIx), wIxs.map(ix => longAt(r, ix))),
        xs => new VamanaKernel.WordStore(xs.toArray),
        k, searchWindow, Metric.Hamming)
    else
      zipServeMerged[Array[Double]](spark, pm, codesPath, graphPath, cSub,
        gSub, None,
        r => (longAt(r, cIdIx), wIxs.map(ix => longAt(r, ix).toDouble)),
        xs => new VamanaKernel.DoubleStore(xs.toArray),
        k, searchWindow, Metric.Hamming)
  }

  /** Driver-side probe routing shared by [[searchSharded]] and
    * [[searchPrepared]]: nProbes nearest centroids per query, inverted to
    * cluster → query-batch for broadcast. Queries must be broadcast-small
    * (the reference holds the query batch in memory too). */
  private def probeMap(queries: DataFrame,
                       centroids: Seq[(Long, Seq[Double])], nProbes: Int,
                       metric: Metric)
      : Map[Long, Array[(Long, Array[Double])]] =
    // Shared probe kernel (BatchScore): per-query sweep or GEMM-style
    // tiling by size, bit-identical either way.
    probeMapWith(queries, centroids, metric)(
      BatchScore.probeTopK(_, _, nProbes, metric))

  /** Collect the query batch, route each query with `route`, and invert
    * the probe lists to cluster → query-batch for the broadcast. */
  private def probeMapWith(queries: DataFrame,
                           centroids: Seq[(Long, Seq[Double])],
                           metric: Metric)
      (route: (Array[(Long, Array[Double])],
               IndexedSeq[(Long, Array[Double])]) => Array[Array[Long]])
      : Map[Long, Array[(Long, Array[Double])]] = {
    val qRows = queries
      .select(col("query_id").cast("long"), col("qvec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = centroids.sortBy(_._1)
      .map { case (i, v) => (i, v.toArray) }.toIndexedSeq
    val probeIds = route(qRows, cents)
    qRows.toSeq.zipWithIndex
      .flatMap { case ((qid, qvec), i) =>
        probeIds(i).map(cid => (cid, (qid, qvec))) }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).toArray }
  }

  /** Executor-local beam walk over one shard's rows (sorted ascending by id)
    * for a query batch — the shared kernel behind [[searchSharded]] and
    * [[searchPrepared]]. Rows: (cluster_id, id, vec, entry_id, neighbors). */
  /** null when every row passes (the common unfiltered case — keeps the
    * walk's emit loop branch-free), else per-slot keep flags. */
  /** Per-shard inner merge of the cogrouped data and graph runs (both
    * sorted ascending by id): the surviving rows, their order, and
    * dangling-id behavior match the former `clustered ⋈ graph` inner
    * join exactly, with the store built from just the surviving rows
    * (`mkStore` receives their data-row indices). Object-level (not a
    * local def inside searchShardedImpl) so cogroup closures capture
    * only serializable primitives, never the planning frame. */
  private def walkMerged(cid: Long, dRows: Array[(Long, Boolean)],
      mkStore: Array[Int] => VamanaKernel.VecStore,
      gIt: Iterator[(Long, Long, Long, Array[Long])],
      qs: Array[(Long, Array[Double])], k: Int, searchWindow: Int,
      searchCapacity: Int, m: Metric): Iterator[(Long, Long, Double)] = {
    val g = gIt.toArray.sortBy(_._2)
    val ids = Array.newBuilder[Long]
    val keeps = Array.newBuilder[Boolean]
    val nbrs = Array.newBuilder[Array[Long]]
    val dataIdx = Array.newBuilder[Int]
    var entry = Long.MinValue
    var di = 0; var gi = 0
    while (di < dRows.length && gi < g.length) {
      val dId = dRows(di)._1; val gId = g(gi)._2
      if (dId < gId) di += 1
      else if (dId > gId) gi += 1
      else {
        ids += dId; keeps += dRows(di)._2; nbrs += g(gi)._4; dataIdx += di
        if (entry == Long.MinValue) entry = g(gi)._3
        di += 1; gi += 1
      }
    }
    val idArr = ids.result()
    if (qs.isEmpty || idArr.isEmpty) Iterator.empty
    else
      walkShardCore(cid, idArr, mkStore(dataIdx.result()), entry,
        nbrs.result(), qs, k, searchWindow, searchCapacity, m,
        allowedOf(keeps.result()))
  }

  private def allowedOf(keeps: Array[Boolean]): Array[Boolean] =
    if (keeps.forall(identity)) null else keeps

  /** Element-type-erased shard walk shared by the f64 and f32 search
    * paths: slot resolution, dangling-edge drops, and the per-query greedy
    * walk over a [[VamanaKernel.VecStore]]. `allowed` (by slot; null = all)
    * filters EMISSION only — filtered rows are traversed so graph
    * connectivity through them is preserved, and the walk keeps taking
    * buffer entries past them until k allowed rows are out. */
  private def walkShardCore(cid: Long, ids: Array[Long],
                            store: VamanaKernel.VecStore, entryId: Long,
                            neighborIds: Array[Array[Long]],
                            qs: Array[(Long, Array[Double])], k: Int,
                            searchWindow: Int, searchCapacity: Int, m: Metric,
                            allowed: Array[Boolean] = null)
      : Iterator[(Long, Long, Double)] = {
    val slotOf = new java.util.HashMap[Long, Integer](ids.length * 2)
    ids.indices.foreach(i => slotOf.put(ids(i), i))
    val entrySlot = {
      val e = slotOf.get(entryId)
      require(e != null, s"vamana shard $cid: entry id $entryId " +
        "not present in the clustered rows (stale graph vs data?)")
      e.intValue()
    }
    // a graph row may reference a neighbor absent from the joined rows
    // (e.g. a tombstone-filtered table searched with a stale graph);
    // drop the dangling edge instead of dying with an opaque NPE —
    // matching the reference's skip-deleted posture during traversal
    val adj = neighborIds.map(_.flatMap { n =>
      val s = slotOf.get(n)
      if (s == null) None else Some(s.intValue())
    })
    qs.iterator.flatMap { case (qid, qvec) =>
      val buf = VamanaKernel.greedySearch(adj, store, entrySlot, qvec,
        searchWindow, m, searchCapacity)
      if (allowed == null)
        (0 until math.min(k, buf.n)).iterator.map { i =>
          (qid, ids(buf.slots(i)), buf.dists(i))
        }
      else {
        val out = Seq.newBuilder[(Long, Long, Double)]
        var taken = 0
        var i = 0
        while (taken < k && i < buf.n) {
          val s = buf.slots(i)
          if (allowed(s)) { out += ((qid, ids(s), buf.dists(i))); taken += 1 }
          i += 1
        }
        out.result().iterator
      }
    }
  }

  /** Co-locate clustered ⋈ graph by shard ONCE for repeated searches
    * (calibration sweeps, batch-iterator paging, recall grids). The returned
    * Dataset is hash-partitioned by cluster_id with whole shards contiguous
    * and id-sorted inside each partition, and cached — so every subsequent
    * [[searchPrepared]] call is a shuffle-free mapPartitions + the tiny
    * |Q|·nProbes·k partial merge, instead of re-paying the join + groupByKey
    * shuffle per search the way repeated [[searchSharded]] calls do. Caller
    * unpersists. At 100 TB the same shape holds: the prepared dataset is the
    * bucketed index layout, built once per calibration session. */
  def prepareShards(clustered: DataFrame, graph: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Array[Double], Long,
          Array[Long])] = {
    val spark = clustered.sparkSession
    import spark.implicits._
    clustered
      .join(graph, Seq("cluster_id", "id"))
      .select(col("cluster_id").cast("long"), col("id").cast("long"),
        col("vec").cast("array<double>"), col("entry_id").cast("long"),
        col("neighbors").cast("array<long>"))
      .as[(Long, Long, Array[Double], Long, Array[Long])]
      .repartition(col("cluster_id"))
      .sortWithinPartitions("cluster_id", "id")
      .cache()
  }

  /** f32-resident twin of [[prepareShards]]: the cached index layout holds
    * float32 vectors — HALF the executor storage memory for the prepared
    * dataset (the residency that sizes a calibration session at 100 TB) —
    * and [[searchPreparedF32]] walks it with the mixed kernels for
    * bit-identical results. Requires an `ARRAY<FLOAT>` vec column. */
  def prepareShardsF32(clustered: DataFrame, graph: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Array[Float], Long,
          Array[Long])] = {
    val spark = clustered.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    require(clustered.schema("vec").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }, "prepareShardsF32 requires an ARRAY<FLOAT> vec column")
    clustered
      .join(graph, Seq("cluster_id", "id"))
      .select(col("cluster_id").cast("long"), col("id").cast("long"),
        col("vec"), col("entry_id").cast("long"),
        col("neighbors").cast("array<long>"))
      .as[(Long, Long, Array[Float], Long, Array[Long])]
      .repartition(col("cluster_id"))
      .sortWithinPartitions("cluster_id", "id")
      .cache()
  }

  /** [[searchSharded]] semantics over a [[prepareShards]] dataset: identical
    * results (same walk kernel, same merge), no per-call shard shuffle. */
  def searchPrepared(queries: DataFrame,
                     prepared: org.apache.spark.sql.Dataset[(Long, Long,
                       Array[Double], Long, Array[Long])],
                     centroids: Seq[(Long, Seq[Double])], k: Int,
                     searchWindow: Int, nProbes: Int, metric: Metric,
                     searchCapacity: Int = 0): DataFrame =
    searchPreparedImpl[Array[Double]](queries, prepared,
      vs => new VamanaKernel.DoubleStore(vs), centroids, k, searchWindow,
      nProbes, metric, searchCapacity)

  /** [[searchPrepared]] over an f32-resident [[prepareShardsF32]] dataset —
    * same walk via the mixed kernels, bit-identical output. */
  def searchPreparedF32(queries: DataFrame,
                        prepared: org.apache.spark.sql.Dataset[(Long, Long,
                          Array[Float], Long, Array[Long])],
                        centroids: Seq[(Long, Seq[Double])], k: Int,
                        searchWindow: Int, nProbes: Int, metric: Metric,
                        searchCapacity: Int = 0): DataFrame =
    searchPreparedImpl[Array[Float]](queries, prepared,
      vs => new VamanaKernel.FloatStore(vs), centroids, k, searchWindow,
      nProbes, metric, searchCapacity)

  private def searchPreparedImpl[V: scala.reflect.ClassTag](
      queries: DataFrame,
      prepared: org.apache.spark.sql.Dataset[(Long, Long, V, Long,
        Array[Long])],
      mkStore: Array[V] => VamanaKernel.VecStore,
      centroids: Seq[(Long, Seq[Double])], k: Int, searchWindow: Int,
      nProbes: Int, metric: Metric, searchCapacity: Int): DataFrame = {
    val spark = prepared.sparkSession
    import spark.implicits._
    require(searchWindow >= k, "searchWindow must be ≥ k")
    val bc = spark.sparkContext.broadcast(
      probeMap(queries, centroids, nProbes, metric))
    val m = metric
    // whole shards are contiguous and id-sorted within each cached partition,
    // so grouping is a linear scan over consecutive same-cid runs
    val partials = prepared.mapPartitions { it =>
      val rowsIt = it.buffered
      new Iterator[Iterator[(Long, Long, Double)]] {
        def hasNext: Boolean = rowsIt.hasNext
        def next(): Iterator[(Long, Long, Double)] = {
          val cid = rowsIt.head._1
          val run = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, V, Long, Array[Long])]
          while (rowsIt.hasNext && rowsIt.head._1 == cid)
            run += rowsIt.next()
          val qs = bc.value
            .getOrElse(cid, Array.empty[(Long, Array[Double])])
          if (qs.isEmpty) Iterator.empty[(Long, Long, Double)]
          else {
            val rows = run.toArray
            walkShardCore(cid, rows.map(_._2), mkStore(rows.map(_._3)),
              rows(0)._4, rows.map(_._5), qs, k, searchWindow,
              searchCapacity, m)
          }
        }
      }.flatten
    }.toDF("query_id", "id", "dist")
    TopK.perKeyViaWindow(partials, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** Bulk-synchronous (Pregel-style) greedy search — the pure-dataflow
    * reference semantics from SURVEY §7: all queries advance one hop per
    * round (frontier ⋈ graph → explode neighbors → score → per-query top-W),
    * converging when no query's window improves. Pays one shuffle per hop, so
    * it is the *cross-check* path; `searchSharded` is the production path.
    * Single-graph input (one cluster). Output: (query_id, rnk, neighbor_id,
    * dist). */
  def searchBsp(queries: DataFrame, data: DataFrame, graph: DataFrame, k: Int,
                searchWindow: Int, metric: Metric, maxHops: Int = 64)
      : DataFrame = {
    val spark = data.sparkSession
    require(searchWindow >= k)
    val entryId = graph.select("entry_id").first().getLong(0)
    val adj = graph.select(col("id"), col("neighbors"))
    val dataV = data.select(col("id"), col("vec"))

    def score(cand: DataFrame): DataFrame =
      cand.join(dataV, Seq("id"))
        .join(queries, Seq("query_id"))
        .select(col("query_id"), col("id"),
          metric.column(col("qvec"), col("vec")).as("dist"))

    // window state: per query the best ≤W scored nodes; frontier: nodes not
    // yet expanded. Seed both with the entry point. Every loop state is an
    // EAGER local checkpoint so the superseded round's blocks can be freed
    // immediately — the lazy-checkpoint version leaked ~3 RDDs per hop into
    // executor storage for the life of the session.
    var window = score(queries.select(col("query_id"))
      .withColumn("id", lit(entryId))).localCheckpoint(eager = true)
    var frontier = window.select("query_id", "id")
      .localCheckpoint(eager = true)
    // same rows as the seed frontier — share the checkpoint (unpersist is
    // idempotent, so the round-1 double-unpersist is harmless)
    var scored = frontier
    var hops = 0
    while (hops < maxHops && frontier.count() > 0) {
      val expanded = frontier.join(adj, Seq("id"))
        .select(col("query_id"), explode(col("neighbors")).as("id"))
        .distinct()
        .join(scored, Seq("query_id", "id"), "left_anti")
      val newScores = score(expanded)
      val scoredNext = scored.union(newScores.select("query_id", "id"))
        .localCheckpoint(eager = true)
      val merged = TopK.perKeyViaWindow(window.union(newScores),
          Seq("query_id"), col("id"), col("dist"), searchWindow,
          metric.ascending)
        .select(col("query_id"), col("neighbor_id").as("id"), col("dist"))
        .localCheckpoint(eager = true)
      // next frontier: window entries newly scored this round (the BSP analog
      // of "best unexpanded" — expanding all unexpanded window nodes per
      // round preserves the convergence property)
      val frontierNext = merged.join(newScores.select("query_id", "id"),
        Seq("query_id", "id")).select("query_id", "id")
        .localCheckpoint(eager = true)
      scored.unpersist(blocking = false)
      window.unpersist(blocking = false)
      frontier.unpersist(blocking = false)
      scored = scoredNext
      window = merged
      frontier = frontierNext
      hops += 1
    }
    // materialize the (|Q|·k)-row result so the loop state can be freed
    // before returning — the caller holds only the small final checkpoint
    val out = TopK.perKeyViaWindow(window, Seq("query_id"), col("id"),
      col("dist"), k, metric.ascending).localCheckpoint(eager = true)
    scored.unpersist(blocking = false)
    window.unpersist(blocking = false)
    frontier.unpersist(blocking = false)
    out
  }

  /** Incremental mutation (SURVEY §2 M1-M3 for the graph index): apply a
    * batch of additions (already routed: (id, vec, cluster_id)) and deletions
    * to a sharded index by rebuilding ONLY the touched shards — the Spark
    * form of the reference's incremental insert + consolidate
    * (dynamic_index.h:630-745,950): work is proportional to the delta's
    * shard fanout, not the index size, and untouched graph rows pass through
    * byte-identical. Returns (newClustered, newGraph). */
  def updateShards(clustered: DataFrame, graph: DataFrame, added: DataFrame,
                   deletedIds: DataFrame, params: BuildParams, metric: Metric)
      : (DataFrame, DataFrame) = {
    val (c, g, _) = updateShardsTouched(clustered, graph, added, deletedIds,
      params, metric)
    (c, g)
  }

  /** Locate fast-path bound: id sets at or below this push as a scan
    * predicate; larger sets fall back to the join. */
  private[graft] val LocateIsinMax = 10000

  /** The shards holding any of `ids` — the upsert delete-LOCATE, shared
    * by the graph and codec stores. Fast path: delete/replace batches
    * are micro-batch-small by the maintenance contract, so pushing the
    * id set as a SCAN PREDICATE lets parquet row-group min/max stats
    * (and dictionary filters) prune untouched FILES from the locate
    * entirely — the SCALE.md r15 measurement shows the join-based
    * full-store id scan going file-open-bound at 2×10⁴ shards. Large
    * In sets push down as a min/max RANGE, so range-sharded /
    * time-ordered id layouts still prune to the touched files while
    * hash-scattered layouts degrade to today's column scan — never
    * worse than the join. Batches above [[LocateIsinMax]] fall back to
    * the join (a multi-million-literal predicate would bloat the plan
    * for no pruning win). Result: a (cluster_id) frame, not collected. */
  private[graft] def locateShards(stored: DataFrame,
                                  ids: DataFrame): DataFrame = {
    import stored.sparkSession.implicits._
    // ONE deduped projection feeds both the size probe and (on
    // fallback) the join side, so an oversized duplicate-heavy batch
    // neither re-derives ids nor fans duplicate cluster_id rows into
    // the downstream distinct; the bounded take is the size probe's
    // only extra pass, and it is capped at LocateIsinMax+1 rows.
    // NULL ids (plausible from a CDC delete feed) drop here — the
    // pre-fast-path join ignored them silently, and a null can match
    // no stored row either way; without the filter the typed collect
    // fails the whole batch on "Null value in non-nullable field"
    val idsL = ids.select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
    val bounded = idsL.limit(LocateIsinMax + 1).as[Long].collect()
    if (bounded.isEmpty) stored.select(col("cluster_id")).limit(0)
    else if (bounded.length <= LocateIsinMax)
      stored.filter(col("id").isin(bounded: _*)).select(col("cluster_id"))
    else stored.join(idsL, Seq("id")).select(col("cluster_id"))
  }

  /** [[updateShards]] + the touched-cluster set it derived — so callers
    * that need the set (partition-scoped store rewrites) don't recompute
    * the same join + collects over the store. */
  def updateShardsTouched(clustered: DataFrame, graph: DataFrame,
                          added: DataFrame, deletedIds: DataFrame,
                          params: BuildParams, metric: Metric)
      : (DataFrame, DataFrame, Seq[Long]) = {
    val touched = added.select(col("cluster_id").cast("long"))
      .union(locateShards(clustered, deletedIds)
        .select(col("cluster_id").cast("long")))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val newClustered = clustered
      .join(deletedIds.select("id"), Seq("id"), "left_anti")
      .unionByName(added)
    val rebuilt = buildSharded(
      newClustered.filter(col("cluster_id").isin(touched: _*)), params, metric)
    val untouched = graph.filter(!col("cluster_id").isin(touched: _*))
    (newClustered, untouched.unionByName(rebuilt), touched)
  }

  /** Out-degree distribution of a graph table (SURVEY §2 A8). */
  def degreeStats(graph: DataFrame): DataFrame =
    graph.select(col("cluster_id"),
        size(col("neighbors")).cast("long").as("degree"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("nodes"), max("degree").as("max_degree"),
        min("degree").as("min_degree"),
        sum("degree").as("total_edges"))
}
