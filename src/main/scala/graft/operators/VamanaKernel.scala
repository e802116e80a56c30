package graft.operators

import graft.core.Metric
import scala.collection.mutable.ArrayBuffer

/** Executor-local Vamana kernels (SURVEY §2 J2, B1-B4): greedy beam search and
  * α-robust-prune graph construction, faithful to the reference semantics
  * (include/svs/index/vamana/greedy_search.h:124-203, prune.h:31-58,
  * vamana_build.h:164-570) but implemented as pure Scala over a local shard.
  *
  * These run inside `mapGroups`/`mapPartitions` on one shard's vectors — the
  * decision recorded in SURVEY §7 (hard parts): the per-query sequential graph
  * walk is executor-local; Spark distributes across shards and queries, not
  * across hops. All loops are deterministic: slots are ordered by ascending
  * external id and no randomness is used, so rebuilt graphs are bit-identical.
  */
object VamanaKernel {

  /** Fixed-capacity best-first search buffer with per-entry expanded flags —
    * the analog of the reference SearchBuffer (search_buffer.h:104): a sorted
    * array of (dist, slot) where search proceeds until every kept entry has
    * been expanded. Ties break by smaller slot. */
  final class BeamBuffer(capacity: Int, ascending: Boolean) {
    val dists = new Array[Double](capacity)
    val slots = new Array[Int](capacity)
    val expanded = new Array[Boolean](capacity)
    var n: Int = 0

    @inline private def better(d1: Double, s1: Int, d2: Double, s2: Int)
        : Boolean =
      if (d1 != d2) { if (ascending) d1 < d2 else d1 > d2 } else s1 < s2

    def insert(d: Double, slot: Int): Unit = {
      if (n == capacity && !better(d, slot, dists(n - 1), slots(n - 1))) return
      var pos = if (n == capacity) n - 1 else n
      while (pos > 0 && better(d, slot, dists(pos - 1), slots(pos - 1)))
        pos -= 1
      val last = math.min(n, capacity - 1)
      var i = last
      while (i > pos) {
        dists(i) = dists(i - 1); slots(i) = slots(i - 1)
        expanded(i) = expanded(i - 1); i -= 1
      }
      dists(pos) = d; slots(pos) = slot; expanded(pos) = false
      if (n < capacity) n += 1
    }

    /** Index of the best not-yet-expanded entry among the first `limit`
      * kept entries, or -1 when converged. */
    def nextUnexpanded(limit: Int = Int.MaxValue): Int = {
      val m = math.min(n, limit)
      var i = 0
      while (i < m) { if (!expanded(i)) return i; i += 1 }
      -1
    }
  }

  /** Greedy beam search (greedy_search.h:124-203): seed with `entry`, expand
    * the best unexpanded buffer entry's adjacency, score unseen neighbors,
    * insert, until the buffer converges. Returns the buffer (best-first).
    * `scored` bitset prevents re-scoring (the reference's visited filter).
    *
    * `capacity` ≥ window turns on the reference's SPLIT search buffer
    * (search_buffer.h:39-77 roi/capacity split, search_buffer_capacity):
    * the buffer RETAINS the best `capacity` scored candidates while only
    * the best `window` govern expansion/termination — recall of the
    * retained set improves without paying for a wider walk. capacity ≤
    * window (the default 0) reproduces the tied buffer exactly. */
  def greedySearch(adj: Array[Array[Int]], vecs: Array[Array[Double]],
                   entry: Int, q: Array[Double], window: Int, metric: Metric,
                   capacity: Int = 0): BeamBuffer = {
    val cap = math.max(window, capacity)
    val buf = new BeamBuffer(cap, metric.ascending)
    val scored = new java.util.BitSet(vecs.length)
    scored.set(entry)
    buf.insert(metric.compute(q, vecs(entry)), entry)
    var cur = buf.nextUnexpanded(window)
    while (cur >= 0) {
      buf.expanded(cur) = true
      val nbs = adj(buf.slots(cur))
      var i = 0
      while (i < nbs.length) {
        val nb = nbs(i)
        if (!scored.get(nb)) {
          scored.set(nb)
          buf.insert(metric.compute(q, vecs(nb)), nb)
        }
        i += 1
      }
      cur = buf.nextUnexpanded(window)
    }
    buf
  }

  /** Greedy search that also returns every scored (slot, dist) pair — the
    * build-time candidate pool (vamana_build.h:327-479 with full search
    * history, build_params.h:70-74). */
  def greedySearchCollect(adj: Array[Array[Int]], vecs: Array[Array[Double]],
                          entry: Int, q: Array[Double], window: Int,
                          metric: Metric): ArrayBuffer[(Int, Double)] = {
    val pool = new ArrayBuffer[(Int, Double)]
    val buf = new BeamBuffer(window, metric.ascending)
    val scored = new java.util.BitSet(vecs.length)
    scored.set(entry)
    val d0 = metric.compute(q, vecs(entry))
    pool += ((entry, d0))
    buf.insert(d0, entry)
    var cur = buf.nextUnexpanded()
    while (cur >= 0) {
      buf.expanded(cur) = true
      val nbs = adj(buf.slots(cur))
      var i = 0
      while (i < nbs.length) {
        val nb = nbs(i)
        if (!scored.get(nb)) {
          scored.set(nb)
          val d = metric.compute(q, vecs(nb))
          pool += ((nb, d))
          buf.insert(d, nb)
        }
        i += 1
      }
      cur = buf.nextUnexpanded()
    }
    pool
  }

  /** α-robust prune (prune.h:107, DiskANN α-RNG rule): from a best-first
    * candidate pool keep ≤ maxDegree neighbors such that no kept neighbor
    * α-dominates a later candidate. For ascending metrics (L2) candidate c is
    * dominated by kept p when α·d(p,c) ≤ d(node,c); for similarity metrics
    * (IP/cosine, larger=closer) when sim(p,c) ≥ α·sim(node,c) — the mirrored
    * rule of the reference's Iterative strategy (prune.h:183). */
  def robustPrune(node: Int, pool: ArrayBuffer[(Int, Double)], alpha: Double,
                  maxDegree: Int, vecs: Array[Array[Double]], metric: Metric)
      : Array[Int] = {
    val asc = metric.ascending
    // sort best-first, dedup, drop self
    val seen = new java.util.BitSet(vecs.length)
    val cand = pool.filter { case (s, _) =>
      if (s == node || seen.get(s)) false else { seen.set(s); true }
    }.sortBy { case (s, d) => (if (asc) d else -d, s) }
    val kept = new ArrayBuffer[Int](maxDegree)
    val alive = Array.fill(cand.length)(true)
    var i = 0
    while (i < cand.length && kept.length < maxDegree) {
      if (alive(i)) {
        val (p, _) = cand(i)
        kept += p
        var j = i + 1
        while (j < cand.length) {
          if (alive(j)) {
            val (c, dNodeC) = cand(j)
            val dPC = metric.compute(vecs(p), vecs(c))
            val dominated =
              if (asc) alpha * dPC <= dNodeC
              else dPC >= alpha * dNodeC
            if (dominated) alive(j) = false
          }
          j += 1
        }
      }
      i += 1
    }
    kept.toArray
  }

  /** Medioid entry point (core/medioid.h:270-300): per-dimension mean, then
    * the slot nearest (L2) to that mean. */
  def medioid(vecs: Array[Array[Double]]): Int = {
    val n = vecs.length
    val d = vecs(0).length
    val mean = new Array[Double](d)
    var i = 0
    while (i < n) {
      val v = vecs(i); var j = 0
      while (j < d) { mean(j) += v(j); j += 1 }
      i += 1
    }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    var best = 0
    var bestD = Double.MaxValue
    i = 0
    while (i < n) {
      val dist = Metric.L2.compute(mean, vecs(i))
      if (dist < bestD) { bestD = dist; best = i }
      i += 1
    }
    best
  }

  /** pruneTo < maxDegree leaves headroom so reverse edges accumulate before
    * triggering a re-prune (reference prune_to, build_params.h:48-74 —
    * goldens use 28 vs degree 32). pruneTo ≤ 0 means maxDegree.
    * batchSize is the parallel insert-batch width (vamana_build.h:251-281);
    * 1 reproduces the fully sequential insert order. */
  case class BuildParams(maxDegree: Int = 32, buildWindow: Int = 64,
                         alpha: Double = 1.2, maxCandidatePool: Int = 750,
                         pruneTo: Int = 0, batchSize: Int = 64) {
    def pruneTarget: Int = if (pruneTo > 0) pruneTo else maxDegree
  }

  /** Batched Vamana build (vamana_build.h:164-320,251-281): two passes
    * (α=1.0 then final α, index.h:428-430). Nodes are processed in
    * slot-ordered batches — the reference's parallel insert model: every
    * node in a batch greedy-searches the graph **frozen at the batch
    * boundary** (these searches run concurrently; the graph is read-only
    * during the phase), then the batch's adjacencies and reverse edges are
    * applied sequentially in slot order, re-pruning any node that exceeds
    * maxDegree. Deterministic regardless of thread schedule: parallel work
    * writes only its own slot's result, and all mutation happens in the
    * fixed-order apply phase — so rebuilt graphs stay bit-identical.
    * batchSize = 1 degenerates to the classic sequential insert loop. */
  def build(vecs: Array[Array[Double]], params: BuildParams, metric: Metric)
      : (Array[Array[Int]], Int) = {
    val n = vecs.length
    val adj = Array.fill(n)(Array.empty[Int])
    if (n == 1) return (adj, 0)
    val entry = medioid(vecs)
    val passes = if (params.alpha == 1.0) Seq(1.0) else Seq(1.0, params.alpha)
    val batch = math.max(1, params.batchSize)
    for ((alpha, pass) <- passes.zipWithIndex) {
      var start = 0
      while (start < n) {
        // first-pass ramp-up (1, 1, 2, 4, … batch): a full-width batch on a
        // near-empty graph would hand every node the same trivial {entry}
        // pool and starve connectivity; growing the batch with the graph
        // keeps early pools as rich as the sequential insert order's
        val effBatch =
          if (pass == 0) math.min(batch, math.max(1, start)) else batch
        val end = math.min(start + effBatch, n)
        // parallel phase: candidate generation + prune against the frozen
        // graph; each index writes only pruned(i - start)
        val pruned = new Array[Array[Int]](end - start)
        val range = java.util.stream.IntStream.range(start, end)
        // parallel even when many shards build concurrently: the shared
        // pool interleaves batch work across shard tasks (measured 1.4×
        // on 256 × 4k-row shards vs inline; 15× on one big shard)
        (if (end - start > 1) range.parallel() else range).forEach { node =>
          val pool = greedySearchCollect(adj, vecs, entry, vecs(node),
            params.buildWindow, metric)
          // bounded candidate pool (build_params.h max_candidate_pool_size)
          val bounded =
            if (pool.length <= params.maxCandidatePool) pool
            else pool.sortBy { case (s, d) =>
              (if (metric.ascending) d else -d, s)
            }.take(params.maxCandidatePool)
          pruned(node - start) = robustPrune(node, bounded, alpha,
            params.pruneTarget, vecs, metric)
        }
        // apply phase, slot order: all adjacencies first (so a later batch
        // member doesn't clobber reverse edges inserted toward it by an
        // earlier one), then reverse edges appended with overflow deferred —
        // the reference's batched backedge flush (vamana_build.h:483-570):
        // one re-prune per overflowing node per batch, not per edge
        var node = start
        while (node < end) {
          adj(node) = pruned(node - start); node += 1
        }
        val overflowed = new java.util.TreeSet[Integer]()
        node = start
        while (node < end) {
          val nbs = pruned(node - start)
          var i = 0
          while (i < nbs.length) {
            val dst = nbs(i)
            if (!adj(dst).contains(node)) {
              adj(dst) = adj(dst) :+ node
              if (adj(dst).length > params.maxDegree) overflowed.add(dst)
            }
            i += 1
          }
          node += 1
        }
        // parallel re-prune of the overflowing nodes: each thread reads and
        // writes only its own slot (overflow is bounded by maxDegree +
        // batchSize), so this is deterministic too
        val overs = new Array[Int](overflowed.size())
        var oi0 = 0
        val oit = overflowed.iterator()
        while (oit.hasNext) { overs(oi0) = oit.next().intValue(); oi0 += 1 }
        val oRange = java.util.stream.IntStream.range(0, overs.length)
        (if (overs.length > 1) oRange.parallel() else oRange).forEach { oi =>
          val dst = overs(oi)
          val rp = new ArrayBuffer[(Int, Double)](adj(dst).length)
          adj(dst).foreach { s =>
            rp += ((s, metric.compute(vecs(dst), vecs(s))))
          }
          adj(dst) = robustPrune(dst, rp, alpha, params.maxDegree,
            vecs, metric)
        }
        start = end
      }
    }
    (adj, entry)
  }
}
