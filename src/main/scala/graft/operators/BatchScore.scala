package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.core.Metric

/** GEMM-shaped batch scoring of a query block against a centroid table —
  * the Spark-side analog of the reference's BLAS batch centroid scoring
  * (`index/ivf/common.h:242-303`, which tiles queries × centroids through
  * a matrix multiply).
  *
  * The per-pair arithmetic here is EXACTLY `Metric.compute` — the win is
  * loop ORDER, not a different expression, so results (and therefore probe
  * routing and every certified query) are bit-identical to the per-query
  * sweep. The per-query sweep streams the whole centroid table from RAM
  * once per query: at 10k × 100k × 64-d that is ~500 GB of memory traffic.
  * Tiling queries×centroids into cache-resident blocks (a `qB`-query tile
  * holds its slice of Q in L1/L2 while a `cB`-centroid tile is reused
  * across all of it) re-reads the centroid table once per query TILE —
  * a ~qB-fold traffic cut, which is the entire BLAS-level-3 trick minus
  * the FMA reassociation a true GEMM would add (rejected here: it would
  * change summation order and break oracle parity).
  *
  * [[probeTopK]] auto-engages blocking past [[GemmPairThreshold]] pairs;
  * below it the straightforward parallel per-query loop wins (no tile
  * bookkeeping, and certified workloads are all far below the
  * threshold). ScaleBench's `probe_score_*` rows measure the crossover.
  */
object BatchScore {

  /** Engage tiling when |Q|·|C| reaches ~134M scored pairs — measured
    * crossover (SCALE.md probe_score rows): at 1k×20k (20M pairs) the
    * flat-pack overhead still loses to the sweep; by 10k×100k (1G pairs,
    * the reference's BLAS regime) tiling wins 1.35× and grows with size. */
  val GemmPairThreshold: Long = 1L << 27

  /** Query-tile height: 8 KiB/row at 64-d keeps a tile ≲ L2. */
  val QBlock = 128
  /** Centroid-tile width: reused across the whole query tile. */
  val CBlock = 2048

  /** Per-query top-`nProbes` centroids (rank order, ties to smaller id —
    * LocalTopK semantics, identical to the TopK aggregate). Picks the
    * tiled or per-query path by problem size; both are bit-identical. */
  def probeTopK(qRows: Array[(Long, Array[Double])],
                cents: IndexedSeq[(Long, Array[Double])], nProbes: Int,
                metric: Metric): Array[Array[Long]] =
    if (qRows.length.toLong * cents.length < GemmPairThreshold)
      probeTopKSweep(qRows, cents, nProbes, metric)
    else probeTopKTiled(qRows, cents, nProbes, metric)

  /** Executor-side probe scoring for query batches past driver comfort
    * (the reference's BLAS batch regime at cluster scale): the centroid
    * table — the broadcast-small side — ships once to every executor;
    * each query partition runs the SAME auto-dispatched kernel
    * ([[probeTopK]]: sweep below [[GemmPairThreshold]] partition-local
    * pairs, tiled above) over its local rows. Per query the centroid
    * fold and insert order are identical to the driver path, so the
    * probe lists are bit-identical however the queries are partitioned
    * (BatchScoreSpec). Output: (query_id, cluster_id, rnk) rows,
    * rnk 1-based best-first — |Q|·nProbes rows total, the only thing
    * that ever shuffles. */
  def probeTopKDistributed(queries: DataFrame,
      cents: Seq[(Long, Seq[Double])], nProbes: Int, metric: Metric)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centArr = cents.sortBy(_._1)
      .map { case (i, v) => (i, v.toArray) }.toIndexedSeq
    val bc = spark.sparkContext.broadcast(centArr)
    val m = metric
    queries
      .select(col("query_id").cast("long"),
        col("qvec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = probeTopK(rows, bc.value, nProbes, m)
          rows.iterator.zipWithIndex.flatMap { case ((qid, _), i) =>
            ids(i).iterator.zipWithIndex.map { case (cid, r) =>
              (qid, cid, (r + 1).toLong) }
          }
        }
      }
      .toDF("query_id", "cluster_id", "rnk")
  }

  /** Two-level (hierarchical) probe selection — the reference's
    * hierarchical-kmeans routing posture (index/ivf/
    * hierarchical_kmeans.h) for shard counts where the flat sweep is the
    * bottleneck: score the |L1| group centroids first, keep the
    * `l1Probes` best groups, then score ONLY those groups' shard
    * centroids. Per-query cost falls from |C| to |L1| + l1Probes·(|C|/
    * |L1|) — ~2·√|C| at the √-sized level-1 — which is what keeps
    * routing at 10⁵–10⁶ shards off the critical path.
    *
    * Determinism contract: selected groups' members are scored in
    * ascending GLOBAL centroid order (the flat sweep's order filtered),
    * so with `l1Probes = |L1|` the insert sequence — and therefore every
    * tie-break — is IDENTICAL to [[probeTopK]]: exhaustive level-1
    * routing is bit-equal to flat routing (HierRoutingSpec). */
  def probeTopKHierarchical(qRows: Array[(Long, Array[Double])],
      cents: IndexedSeq[(Long, Array[Double])],
      l1: IndexedSeq[(Long, Array[Double])], groupOf: Map[Long, Long],
      l1Probes: Int, nProbes: Int, metric: Metric): Array[Array[Long]] = {
    require(l1.nonEmpty && l1Probes >= 1, "need a level-1 table")
    val missing = cents.collect {
      case (cid, _) if !groupOf.contains(cid) => cid }
    require(missing.isEmpty,
      s"routing table missing group assignments for shard(s) " +
        s"${missing.take(5).mkString(", ")} — retrain the routing level " +
        "(Vamana.trainRoutingLevel) after adding shards")
    // members of each group, as ascending global centroid indexes
    val membersOf: Map[Long, Array[Int]] = cents.indices
      .groupBy(i => groupOf(cents(i)._1))
      .map { case (g, is) => g -> is.toArray.sorted }
    val out = new Array[Array[Long]](qRows.length)
    java.util.stream.IntStream.range(0, qRows.length).parallel().forEach {
      i =>
        val qvec = qRows(i)._2
        val topG = new LocalTopK(l1Probes, metric.ascending)
        l1.foreach { case (gid, gvec) =>
          topG.insert(metric.compute(qvec, gvec), gid) }
        val selected = java.util.Arrays.copyOf(topG.ids, topG.n)
        val cand = selected.flatMap(g =>
          membersOf.getOrElse(g, Array.empty[Int])).sorted
        val top = new LocalTopK(nProbes, metric.ascending)
        cand.foreach { ci =>
          val (cid, cvec) = cents(ci)
          top.insert(metric.compute(qvec, cvec), cid)
        }
        out(i) = java.util.Arrays.copyOf(top.ids, top.n)
    }
    out
  }

  /** The parallel per-query sweep (small-problem path). */
  private[graft] def probeTopKSweep(qRows: Array[(Long, Array[Double])],
      cents: IndexedSeq[(Long, Array[Double])], nProbes: Int,
      metric: Metric): Array[Array[Long]] = {
    val out = new Array[Array[Long]](qRows.length)
    java.util.stream.IntStream.range(0, qRows.length).parallel().forEach {
      i =>
        val top = new LocalTopK(nProbes, metric.ascending)
        val qvec = qRows(i)._2
        cents.foreach { case (cid, cvec) =>
          top.insert(metric.compute(qvec, cvec), cid)
        }
        out(i) = java.util.Arrays.copyOf(top.ids, top.n)
    }
    out
  }

  /** The cache-tiled path (large problems): centroids are first packed
    * into ONE flat primitive array (structure-of-arrays — the layout a
    * BLAS call would demand, and what removes the per-row pointer chase
    * that keeps the tuple-array sweep compute-bound), then query tiles ×
    * centroid tiles stream with the tile cache-hot. `Metric.computeAt`
    * runs the identical fold at an offset, so results stay bit-identical
    * to the sweep. */
  private[graft] def probeTopKTiled(qRows: Array[(Long, Array[Double])],
      cents: IndexedSeq[(Long, Array[Double])], nProbes: Int,
      metric: Metric): Array[Array[Long]] = {
    val out = new Array[Array[Long]](qRows.length)
    if (cents.isEmpty || qRows.isEmpty) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], 0, out.length,
        Array.empty[Long])
      return out
    }
    val d = cents.head._2.length
    val nC = cents.length
    val cIds = new Array[Long](nC)
    val flat = new Array[Double](nC * d)
    var j = 0
    while (j < nC) {
      val (cid, cvec) = cents(j)
      cIds(j) = cid
      System.arraycopy(cvec, 0, flat, j * d, d)
      j += 1
    }
    val nQB = (qRows.length + QBlock - 1) / QBlock
    // parallel over query tiles; within a tile, centroid tiles stream
    // sequentially and every centroid row is reused across the whole
    // tile while cache-hot. Per-query insert order over centroids is
    // unchanged (c-tiles ascend in the same global order), so the heap
    // state — and thus tie behavior — matches the per-query sweep.
    java.util.stream.IntStream.range(0, nQB).parallel().forEach { qb =>
      val q0 = qb * QBlock
      val q1 = math.min(q0 + QBlock, qRows.length)
      val tops = Array.fill(q1 - q0)(
        new LocalTopK(nProbes, metric.ascending))
      var c0 = 0
      while (c0 < nC) {
        val c1 = math.min(c0 + CBlock, nC)
        var i = q0
        while (i < q1) {
          val qvec = qRows(i)._2
          val top = tops(i - q0)
          var cj = c0
          while (cj < c1) {
            top.insert(metric.computeAt(qvec, flat, cj * d), cIds(cj))
            cj += 1
          }
          i += 1
        }
        c0 = c1
      }
      var i = q0
      while (i < q1) {
        val top = tops(i - q0)
        out(i) = java.util.Arrays.copyOf(top.ids, top.n)
        i += 1
      }
    }
    out
  }
}
