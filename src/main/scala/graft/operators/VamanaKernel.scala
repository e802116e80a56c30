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

  /** Element-typed resident vector storage for the build kernels — the
    * Spark-side analog of the reference's elementwise-typed data
    * abstraction (core/data/simple.h:102-155, where the same build
    * templates run over float32 or float64 storage). [[DoubleStore]]
    * wraps `Array[Array[Double]]`; [[FloatStore]] keeps rows resident as
    * float32 — HALF the bytes, so twice the rows fit in cache during the
    * (memory-bound, BuildBench-measured) graph build — while every
    * distance widens at the point of use into the identical double fold
    * (`Metric.computeDF/FF`). Graphs built from an f32 source are
    * therefore bit-identical to building on a pre-widened copy. */
  sealed trait VecStore {
    def n: Int
    /** Widened copy of row i (used once per node as its search query). */
    def row(i: Int): Array[Double]
    def dist(metric: Metric, q: Array[Double], i: Int): Double
    def distPair(metric: Metric, i: Int, j: Int): Double
    /** acc(j) += row(i)(j) for the medioid mean. */
    def addInto(acc: Array[Double], i: Int): Unit
    /** A view over `slots` (local index i ↔ `slots(i)`) with per-row
      * residency work PAID ONCE — [[robustPrune]]'s α-domination scan
      * calls [[distPair]] O(kept·|pool|) times on a ≤750-row pool, and a
      * store whose distPair re-decodes its operands per call
      * ([[HalfStore]]: two binary16 decodes per pair) would re-pay that
      * decode ~maxDegree times per candidate. Distances from the view
      * must be BIT-IDENTICAL to the backing store's (the contract every
      * golden relies on). Default: an index-mapping view, no copy, same
      * arithmetic. */
    def gather(slots: Array[Int]): VecStore = {
      val outer = this
      new VecStore {
        def n: Int = slots.length
        def row(i: Int): Array[Double] = outer.row(slots(i))
        def dist(metric: Metric, q: Array[Double], i: Int): Double =
          outer.dist(metric, q, slots(i))
        def distPair(metric: Metric, i: Int, j: Int): Double =
          outer.distPair(metric, slots(i), slots(j))
        def addInto(acc: Array[Double], i: Int): Unit =
          outer.addInto(acc, slots(i))
      }
    }
  }

  final class DoubleStore(vecs: Array[Array[Double]]) extends VecStore {
    def n: Int = vecs.length
    def row(i: Int): Array[Double] = vecs(i)
    override def gather(slots: Array[Int]): VecStore =
      new DoubleStore(slots.map(vecs)) // row refs — no copy, same kernels
    def dist(metric: Metric, q: Array[Double], i: Int): Double =
      metric.compute(q, vecs(i))
    def distPair(metric: Metric, i: Int, j: Int): Double =
      metric.compute(vecs(i), vecs(j))
    def addInto(acc: Array[Double], i: Int): Unit = {
      val v = vecs(i); var j = 0
      while (j < v.length) { acc(j) += v(j); j += 1 }
    }
  }

  final class FloatStore(vecs: Array[Array[Float]]) extends VecStore {
    def n: Int = vecs.length
    def row(i: Int): Array[Double] = {
      val v = vecs(i)
      val out = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { out(j) = v(j).toDouble; j += 1 }
      out
    }
    def dist(metric: Metric, q: Array[Double], i: Int): Double =
      metric.computeDF(q, vecs(i))
    def distPair(metric: Metric, i: Int, j: Int): Double =
      metric.computeFF(vecs(i), vecs(j))
    def addInto(acc: Array[Double], i: Int): Unit = {
      val v = vecs(i); var j = 0
      while (j < v.length) { acc(j) += v(j).toDouble; j += 1 }
    }
    override def gather(slots: Array[Int]): VecStore =
      new FloatStore(slots.map(vecs)) // row refs — no copy, same kernels
  }

  /** Byte-resident store — datatype parity with the reference's uint8/
    * int8 datasets (include/svs/lib/datatype.h:53-66): rows stay as raw
    * bytes (ONE EIGHTH of f64 task memory through the memory-bound
    * build) and every distance widens per element at the point of use —
    * signed `toDouble` or unsigned `& 0xFF` — into the identical double
    * fold (`Metric.computeDB/BB`). i8/u8 values are all exactly
    * representable as doubles, so graphs and searches are bit-identical
    * to a pre-widened `ARRAY<DOUBLE>` copy (ByteKnnSpec asserts this). */
  final class ByteStore(vecs: Array[Array[Byte]], unsigned: Boolean)
      extends VecStore {
    def n: Int = vecs.length
    def row(i: Int): Array[Double] = {
      val v = vecs(i)
      val out = new Array[Double](v.length)
      var j = 0
      while (j < v.length) {
        out(j) = if (unsigned) (v(j) & 0xFF).toDouble else v(j).toDouble
        j += 1
      }
      out
    }
    def dist(metric: Metric, q: Array[Double], i: Int): Double =
      metric.computeDB(q, vecs(i), unsigned)
    def distPair(metric: Metric, i: Int, j: Int): Double =
      metric.computeBB(vecs(i), vecs(j), unsigned)
    def addInto(acc: Array[Double], i: Int): Unit = {
      val v = vecs(i); var j = 0
      while (j < v.length) {
        acc(j) += (if (unsigned) (v(j) & 0xFF).toDouble else v(j).toDouble)
        j += 1
      }
    }
  }

  /** Half-resident store — datatype parity with the reference's float16
    * datasets (lib/float16.h, lib/bfloat16.h; kernels widen to f32
    * before accumulating, include/svs/core/distance/euclidean.h:88-105):
    * rows stay as raw binary16/bfloat16 bit patterns (ONE QUARTER of f64
    * task memory) and each distance decodes the row into a reusable
    * float scratch, then runs the exact mixed-precision kernels
    * (`Metric.computeDF/FF`) — both half formats inject losslessly into
    * f32, so graphs and searches are bit-identical to a pre-decoded
    * `ARRAY<FLOAT>` copy (HalfKnnSpec asserts this). Scratches are
    * THREAD-LOCAL: the batched build runs parallel inserts within one
    * shard (`buildBatched`'s range.parallel()), so a shared buffer would
    * race across inserting threads and silently corrupt distances. */
  final class HalfStore(vecs: Array[Array[Short]], bf16: Boolean)
      extends VecStore {
    private val dims = if (vecs.isEmpty) 0 else vecs(0).length
    private val scratch =
      ThreadLocal.withInitial[(Array[Float], Array[Float])](() =>
        (new Array[Float](dims), new Array[Float](dims)))
    private def scratchA: Array[Float] = scratch.get()._1
    private def scratchB: Array[Float] = scratch.get()._2
    private def decodeInto(i: Int, out: Array[Float]): Array[Float] = {
      val v = vecs(i); var j = 0
      while (j < v.length) {
        out(j) = graft.functions.HalfVecs.decodeOne(v(j), bf16); j += 1
      }
      out
    }
    def n: Int = vecs.length
    def row(i: Int): Array[Double] = {
      val v = vecs(i)
      val out = new Array[Double](v.length)
      var j = 0
      while (j < v.length) {
        out(j) = graft.functions.HalfVecs.decodeOne(v(j), bf16).toDouble
        j += 1
      }
      out
    }
    def dist(metric: Metric, q: Array[Double], i: Int): Double =
      metric.computeDF(q, decodeInto(i, scratchA))
    def distPair(metric: Metric, i: Int, j: Int): Double =
      metric.computeFF(decodeInto(i, scratchA), decodeInto(j, scratchB))
    def addInto(acc: Array[Double], i: Int): Unit = {
      val v = vecs(i); var j = 0
      while (j < v.length) {
        acc(j) += graft.functions.HalfVecs.decodeOne(v(j), bf16).toDouble
        j += 1
      }
    }
    /** Decode each gathered row ONCE into a float store: the prune's
      * pair distances then run the same `computeFF` on the same decoded
      * float values the scratch path feeds it — bit-identical, minus
      * ~2·kept decodes per candidate. */
    override def gather(slots: Array[Int]): VecStore = {
      val out = new Array[Array[Float]](slots.length)
      var i = 0
      while (i < slots.length) {
        out(i) = decodeInto(slots(i), new Array[Float](dims))
        i += 1
      }
      new FloatStore(out)
    }
  }

  /** PQ-codes resident store (Jégou, Douze & Schmid TPAMI'11 §V: ADC) —
    * the DiskANN serving layout (Subramanya et al. NeurIPS'19): the walk
    * holds only m small codes per row (m·log₂k bits instead of d·64) and
    * scores candidates ASYMMETRICALLY — the full-precision query against
    * each row's coded centroids, one per-subspace lookup table built ONCE
    * per query (k·d multiplies) and then m lookups + m−1 adds per
    * candidate. The LUT is keyed by query-array identity: the walk kernel
    * passes the same `q` reference for a whole search, so recomputation
    * happens exactly once per (query, shard).
    *
    * Arithmetic contract (what the DuckDB oracle replays): LUT entry
    * (j, c) is `metric.compute(q_sub_j, books(j)(c))` — the exact
    * i-ascending per-subspace fold — and a distance is the j-ascending
    * left-associated sum of the m looked-up entries. Valid for metrics
    * that decompose over dimension slices (L2, inner product); cosine
    * does not decompose (global norms) and must rerank instead. */
  final class PqStore(codes: Array[Array[Int]],
                      books: Array[Array[Array[Double]]]) extends VecStore {
    private val m = books.length
    private val kk = books(0).length
    private val subDim = books(0)(0).length
    private var lutQ: Array[Double] = null
    private var lutMetric: Metric = null
    private val lut = new Array[Double](m * kk)

    private def lutFor(metric: Metric, q: Array[Double]): Array[Double] = {
      if ((q ne lutQ) || (metric ne lutMetric)) {
        var j = 0
        while (j < m) {
          val sub = java.util.Arrays.copyOfRange(q, j * subDim,
            (j + 1) * subDim)
          var c = 0
          while (c < kk) {
            lut(j * kk + c) = metric.compute(sub, books(j)(c)); c += 1
          }
          j += 1
        }
        lutQ = q; lutMetric = metric
      }
      lut
    }

    def n: Int = codes.length
    def row(i: Int): Array[Double] = {
      val cs = codes(i)
      val out = new Array[Double](m * subDim)
      var j = 0
      while (j < m) {
        System.arraycopy(books(j)(cs(j)), 0, out, j * subDim, subDim)
        j += 1
      }
      out
    }
    def dist(metric: Metric, q: Array[Double], i: Int): Double = {
      val t = lutFor(metric, q)
      val cs = codes(i)
      var s = t(cs(0))
      var j = 1
      while (j < m) { s += t(j * kk + cs(j)); j += 1 }
      s
    }
    /** Symmetric (SDC) pair distance: per-subspace folds of the two
      * rows' coded centroids, summed j-ascending — same grouping as
      * [[dist]] so build and search rank consistently. */
    def distPair(metric: Metric, i: Int, j: Int): Double = {
      val a = codes(i); val b = codes(j)
      var s = 0.0
      var jj = 0
      while (jj < m) {
        s += metric.compute(books(jj)(a(jj)), books(jj)(b(jj))); jj += 1
      }
      s
    }
    def addInto(acc: Array[Double], i: Int): Unit = {
      val v = row(i); var j = 0
      while (j < v.length) { acc(j) += v(j); j += 1 }
    }
  }

  /** FULL-DENSITY binary-codes store (bincodes layout v2): rows stay as
    * raw 64-bit words — 8 B/row of walk state at 64 dims, HALF of the
    * words-as-doubles [[DoubleStore]] the v1 layout rides (a true
    * 1-bit-per-dimension density) — and every
    * distance is the native XOR/popcount fold. Hamming-only by
    * construction (fails loudly on any other metric: bit patterns are
    * not a vector space).
    *
    * The walk passes QUERIES in the v1 32-bit word-double space (the
    * probe-routing representation, exact in a double): the store
    * recombines a query's halves into 64-bit words ONCE per search —
    * keyed by array identity like [[PqStore]]'s LUT; the kernel passes
    * the same `q` reference for a whole walk — and because Hamming sums
    * are invariant to word grouping (BinaryQuant.codeColumns64 identity)
    * every distance is BIT-IDENTICAL to the v1 DoubleStore path
    * (GraphLayoutSpec pins v2 ≡ v1 serving end-to-end). Identity cache,
    * not thread-safe across queries — serve walks are single-threaded
    * per shard task, the PqStore precedent. */
  final class WordStore(rows: Array[Array[Long]]) extends VecStore {
    private var lastQ: Array[Double] = null
    private var qWords: Array[Long] = null
    private val words64 = if (rows.isEmpty) 0 else rows(0).length

    private def wordsOf(q: Array[Double]): Array[Long] = {
      if (q ne lastQ) {
        val n = math.max(words64, (q.length + 1) / 2)
        val out = new Array[Long](n)
        var j = 0
        while (j < n) {
          val lo = if (2 * j < q.length) q(2 * j).toLong else 0L
          val hi = if (2 * j + 1 < q.length) q(2 * j + 1).toLong else 0L
          out(j) = lo | (hi << 32)
          j += 1
        }
        qWords = out; lastQ = q
      }
      qWords
    }

    private def requireHamming(metric: Metric): Unit =
      if (metric ne Metric.Hamming)
        sys.error(s"WordStore is Hamming-only (bit-packed words are " +
          s"not a vector space) — got ${metric.name}")

    def n: Int = rows.length
    /** Row i back in the v1 32-bit word-double space (the query/probe
      * representation) — exact round trip: wordsOf(row(i)) == rows(i). */
    def row(i: Int): Array[Double] = {
      val v = rows(i)
      val out = new Array[Double](v.length * 2)
      var j = 0
      while (j < v.length) {
        out(2 * j) = (v(j) & 0xFFFFFFFFL).toDouble
        out(2 * j + 1) = (v(j) >>> 32).toDouble
        j += 1
      }
      out
    }
    def dist(metric: Metric, q: Array[Double], i: Int): Double = {
      requireHamming(metric)
      val qw = wordsOf(q); val v = rows(i)
      var acc = 0; var j = 0
      while (j < v.length) {
        acc += java.lang.Long.bitCount(qw(j) ^ v(j)); j += 1
      }
      acc.toDouble
    }
    def distPair(metric: Metric, i: Int, j: Int): Double = {
      requireHamming(metric)
      val a = rows(i); val b = rows(j)
      var acc = 0; var w = 0
      while (w < a.length) {
        acc += java.lang.Long.bitCount(a(w) ^ b(w)); w += 1
      }
      acc.toDouble
    }
    def addInto(acc: Array[Double], i: Int): Unit =
      sys.error("WordStore has no value-space mean (bit-packed words)")
    override def gather(slots: Array[Int]): VecStore =
      new WordStore(slots.map(rows)) // row refs — no copy, same kernels
  }

  /** Growable primitive (slot, dist) pair buffer — the allocation-free
    * candidate pool. The tupled version allocated one (Int, Double) per
    * scored candidate (BuildBench: 63M per 20k-shard build, a measurable
    * slice of the 32-thread build's CPU in GC-pressured bookkeeping); this
    * holds one object per SEARCH with two flat arrays, matching the
    * reference's pooled candidate storage (vamana_build.h:327-479 reuses a
    * per-thread buffer). Sort order (dist, then slot; descending dist for
    * similarity metrics) is a strict total order over unique slots, so the
    * in-place quicksort reproduces the stable-sort order bit for bit. */
  final class CandidatePool(initial: Int) {
    var slots = new Array[Int](math.max(4, initial))
    var dists = new Array[Double](math.max(4, initial))
    var n = 0

    def add(s: Int, d: Double): Unit = {
      if (n == slots.length) {
        slots = java.util.Arrays.copyOf(slots, n * 2)
        dists = java.util.Arrays.copyOf(dists, n * 2)
      }
      slots(n) = s; dists(n) = d; n += 1
    }

    @inline private def less(i: Int, j: Int, asc: Boolean): Boolean = {
      val di = dists(i); val dj = dists(j)
      if (di != dj) { if (asc) di < dj else di > dj }
      else slots(i) < slots(j)
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val s = slots(i); slots(i) = slots(j); slots(j) = s
      val d = dists(i); dists(i) = dists(j); dists(j) = d
    }

    /** In-place best-first sort by (dist asc|desc, slot asc). */
    def sortBestFirst(asc: Boolean): Unit = quick(0, n - 1, asc)

    private def quick(lo0: Int, hi0: Int, asc: Boolean): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo > 16) {
        // median-of-three pivot (sorted/reversed inputs stay O(n log n))
        val mid = lo + (hi - lo) / 2
        if (less(mid, lo, asc)) swap(mid, lo)
        if (less(hi, lo, asc)) swap(hi, lo)
        if (less(hi, mid, asc)) swap(hi, mid)
        swap(mid, hi - 1) // pivot parked at hi-1
        val p = hi - 1
        var i = lo; var j = p
        var done = false
        while (!done) {
          i += 1
          while (less(i, p, asc)) i += 1
          j -= 1
          while (j > lo && less(p, j, asc)) j -= 1
          if (i >= j) done = true else swap(i, j)
        }
        swap(i, p) // pivot into place
        // recurse on the smaller side, loop on the larger (bounded stack)
        if (i - lo < hi - i) { quick(lo, i - 1, asc); lo = i + 1 }
        else { quick(i + 1, hi, asc); hi = i - 1 }
      }
      var i = lo + 1 // insertion sort for small ranges
      while (i <= hi) {
        var j = i
        while (j > lo && less(j, j - 1, asc)) { swap(j, j - 1); j -= 1 }
        i += 1
      }
    }
  }

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
                   capacity: Int = 0): BeamBuffer =
    greedySearch(adj, new DoubleStore(vecs), entry, q, window, metric,
      capacity)

  def greedySearch(adj: Array[Array[Int]], store: VecStore,
                   entry: Int, q: Array[Double], window: Int, metric: Metric,
                   capacity: Int): BeamBuffer = {
    val cap = math.max(window, capacity)
    val buf = new BeamBuffer(cap, metric.ascending)
    val scored = new java.util.BitSet(store.n)
    scored.set(entry)
    buf.insert(store.dist(metric, q, entry), entry)
    var cur = buf.nextUnexpanded(window)
    while (cur >= 0) {
      buf.expanded(cur) = true
      val nbs = adj(buf.slots(cur))
      var i = 0
      while (i < nbs.length) {
        val nb = nbs(i)
        if (!scored.get(nb)) {
          scored.set(nb)
          buf.insert(store.dist(metric, q, nb), nb)
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
  def greedySearchCollect(adj: Array[Array[Int]], store: VecStore,
                          entry: Int, q: Array[Double], window: Int,
                          metric: Metric): CandidatePool = {
    val pool = new CandidatePool(4 * window)
    val buf = new BeamBuffer(window, metric.ascending)
    val scored = new java.util.BitSet(store.n)
    scored.set(entry)
    val d0 = store.dist(metric, q, entry)
    pool.add(entry, d0)
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
          val d = store.dist(metric, q, nb)
          pool.add(nb, d)
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
    val cp = new CandidatePool(pool.length)
    pool.foreach { case (s, d) => cp.add(s, d) }
    robustPrune(node, cp, alpha, maxDegree, new DoubleStore(vecs), metric)
  }

  /** A caller-gathered pool view + slot→view-index mapping: lets
    * [[robustPrune]] REUSE the decode the caller already paid (the
    * overflow re-prune gathers (dst :: neighbors) to build its pool,
    * then robustPrune would gather — re-decode — the same rows again;
    * KernelBench's `overflow_regather` leg puts that second decode at
    * 11–38% of the prune call on the f16 store, largest exactly at the
    * small pool widths real builds use). Pool slots stay GLOBAL — the
    * in-place compaction, the best-first sort, and its slot-id
    * distance-TIE break are untouched; only the pair-distance view is
    * swapped, and [[VecStore.gather]]'s bit-identity contract makes the
    * distances equal either way. `slots` is the gathered view's slot
    * order (view index i ↔ `slots(i)`); lookup is a primitive linear
    * scan. View size: the overflow re-prune builds it from `dst ::
    * adj(dst)` AFTER adj(dst) has outgrown maxDegree, so the bound is
    * maxDegree + batch backedge slack + 1 (each batch member adds at
    * most one reverse edge before the per-batch prune fires — see the
    * apply-phase comment), not maxDegree+1; the linear scan still beats
    * a boxed Int→Int map at that width (the KernelBench A/B and the
    * BuildBench −23% overflow-slice win were measured on exactly these
    * overflowed pools, batchSize-slack included — no per-put/get boxing,
    * no allocation). A pool slot missing from the view is a caller bug
    * and fails loudly rather than scoring row 0. */
  final class PreGathered(val view: VecStore, slots: Array[Int]) {
    def localOf(s: Int): Int = {
      var i = 0
      while (i < slots.length) {
        if (slots(i) == s) return i
        i += 1
      }
      throw new IllegalArgumentException(
        s"pool slot $s is not in the pre-gathered view")
    }
  }

  /** Primitive-pool variant (the build's hot path — no per-candidate
    * allocation; mutates `pool` by compacting and sorting it in place).
    * Pool entries from [[greedySearchCollect]] are slot-unique by the
    * visited bitset, so the in-place dedup keeps the same survivors the
    * tupled filter kept. */
  def robustPrune(node: Int, pool: CandidatePool, alpha: Double,
                  maxDegree: Int, store: VecStore, metric: Metric,
                  pre: PreGathered = null)
      : Array[Int] = {
    val asc = metric.ascending
    // compact in place: drop self and duplicate slots, preserving order
    val seen = new java.util.BitSet(store.n)
    var w = 0; var r = 0
    while (r < pool.n) {
      val s = pool.slots(r)
      if (s != node && !seen.get(s)) {
        seen.set(s)
        pool.slots(w) = s; pool.dists(w) = pool.dists(r); w += 1
      }
      r += 1
    }
    pool.n = w
    pool.sortBestFirst(asc)
    // pair distances run on a gathered pool view: per-row residency work
    // (half decode, f32 widen) is paid once per candidate instead of once
    // per (kept, candidate) pair — bit-identical values (gather contract).
    // With a caller-provided PreGathered view, even that once is skipped:
    // gather-of-gathered is a reference select, no decode.
    val local =
      if (pre == null) store.gather(java.util.Arrays.copyOf(pool.slots, w))
      else {
        val ix = new Array[Int](w)
        var t = 0
        while (t < w) { ix(t) = pre.localOf(pool.slots(t)); t += 1 }
        pre.view.gather(ix)
      }
    val kept = new Array[Int](math.min(maxDegree, w))
    var nk = 0
    val alive = new Array[Boolean](w)
    java.util.Arrays.fill(alive, true)
    var i = 0
    while (i < w && nk < maxDegree) {
      if (alive(i)) {
        kept(nk) = pool.slots(i); nk += 1
        var j = i + 1
        while (j < w) {
          if (alive(j)) {
            val dNodeC = pool.dists(j)
            val dPC = local.distPair(metric, i, j)
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
    if (nk == kept.length) kept else java.util.Arrays.copyOf(kept, nk)
  }

  /** Medioid entry point (core/medioid.h:270-300): per-dimension mean, then
    * the slot nearest (L2) to that mean. */
  def medioid(vecs: Array[Array[Double]]): Int = medioid(new DoubleStore(vecs))

  def medioid(store: VecStore): Int = {
    val n = store.n
    val d = store.row(0).length
    val mean = new Array[Double](d)
    var i = 0
    while (i < n) { store.addInto(mean, i); i += 1 }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    var best = 0
    var bestD = Double.MaxValue
    i = 0
    while (i < n) {
      val dist = store.dist(Metric.L2, mean, i)
      if (dist < bestD) { bestD = dist; best = i }
      i += 1
    }
    best
  }

  /** pruneTo < maxDegree leaves headroom so reverse edges accumulate before
    * triggering a re-prune (reference prune_to, build_params.h:48-74 —
    * goldens use 28 vs degree 32). pruneTo ≤ 0 means maxDegree.
    * batchSize is the parallel insert-batch width (vamana_build.h:251-281);
    * 1 reproduces the fully sequential insert order; ≤ 0 (the default)
    * auto-selects from the shard size: 64 below [[BuildParams.AutoWide]]
    * nodes (what every committed golden pins), 256 at or above it — the
    * SCALE.md grid measured −23…−26% wall at 100k–200k × 128–768-d with
    * unchanged mean degree. Set it explicitly to reproduce a specific
    * graph. */
  case class BuildParams(maxDegree: Int = 32, buildWindow: Int = 64,
                         alpha: Double = 1.2, maxCandidatePool: Int = 750,
                         pruneTo: Int = 0, batchSize: Int = 0,
                         patchStranded: Boolean = true) {
    def pruneTarget: Int = if (pruneTo > 0) pruneTo else maxDegree
    /** Effective insert-batch width for an n-node shard. */
    def batchFor(n: Int): Int =
      if (batchSize > 0) batchSize
      else if (n >= BuildParams.AutoWide) 256
      else 64
  }

  object BuildParams {
    /** Shard size at which the auto batch width steps 64 → 256. */
    val AutoWide = 50000
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
  /** Per-phase wall-clock accumulator for [[build]] (nanos, accumulated at
    * batch granularity — a few thousand timer reads per build, so the
    * instrumentation itself is free). `search` covers the parallel
    * candidate-generation + prune phase; `apply` the slot-ordered adjacency
    * writes + reverse-edge appends; `overflow` the parallel re-prune of
    * over-degree nodes. The profiling surface behind
    * `sbt "runMain graft.BuildBench"` (SCALE.md). */
  final class BuildStats {
    val search = new java.util.concurrent.atomic.LongAdder
    val apply = new java.util.concurrent.atomic.LongAdder
    val overflow = new java.util.concurrent.atomic.LongAdder
    val distCalls = new java.util.concurrent.atomic.LongAdder
    /** EFFECTIVE insert-batch width this build ran with (resolved from
      * `BuildParams.batchFor(n)` — records which side of the AutoWide step
      * an auto-width build landed on, so it can be reproduced exactly). */
    val batchWidth = new java.util.concurrent.atomic.AtomicInteger(0)
    /** CPU nanos (summed across worker threads, so ≥ the wall share)
      * inside greedySearchCollect / robustPrune during the search phase —
      * attribution within `search`'s wall time. */
    val greedyCpu = new java.util.concurrent.atomic.LongAdder
    val pruneCpu = new java.util.concurrent.atomic.LongAdder
    /** Edges added/replaced by the post-build connectivity patch (0 on
      * every healthy membership — see `patchStranded`). */
    val strandedPatched = new java.util.concurrent.atomic.LongAdder
    /** Nodes STILL unreachable after the patch's round budget — always 0
      * unless worst-edge replacements oscillate; non-zero means
      * full-window searches on this shard can miss rows. */
    val strandedUnreachable = new java.util.concurrent.atomic.LongAdder
  }

  def build(vecs: Array[Array[Double]], params: BuildParams, metric: Metric)
      : (Array[Array[Int]], Int) = build(new DoubleStore(vecs), params,
    metric, null)

  def build(vecs: Array[Array[Double]], params: BuildParams, metric: Metric,
            stats: BuildStats): (Array[Array[Int]], Int) =
    build(new DoubleStore(vecs), params, metric, stats)

  def build(store: VecStore, params: BuildParams, metric: Metric,
            stats: BuildStats): (Array[Array[Int]], Int) = {
    val n = store.n
    val adj = Array.fill(n)(Array.empty[Int])
    if (n == 1) return (adj, 0)
    val entry = medioid(store)
    val passes = if (params.alpha == 1.0) Seq(1.0) else Seq(1.0, params.alpha)
    val batch = math.max(1, params.batchFor(n))
    if (stats != null) stats.batchWidth.set(batch)
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
        val tSearch0 = System.nanoTime()
        val pruned = new Array[Array[Int]](end - start)
        val range = java.util.stream.IntStream.range(start, end)
        // parallel even when many shards build concurrently: the shared
        // pool interleaves batch work across shard tasks (measured 1.4×
        // on 256 × 4k-row shards vs inline; 15× on one big shard)
        (if (end - start > 1) range.parallel() else range).forEach { node =>
          val tg0 = if (stats != null) System.nanoTime() else 0L
          val pool = greedySearchCollect(adj, store, entry, store.row(node),
            params.buildWindow, metric)
          if (stats != null) stats.distCalls.add(pool.n.toLong)
          // bounded candidate pool (build_params.h max_candidate_pool_size):
          // sort-then-truncate keeps the best maxCandidatePool by (dist, slot)
          if (pool.n > params.maxCandidatePool) {
            pool.sortBestFirst(metric.ascending)
            pool.n = params.maxCandidatePool
          }
          val tp0 = if (stats != null) {
            val t = System.nanoTime(); stats.greedyCpu.add(t - tg0); t
          } else 0L
          pruned(node - start) = robustPrune(node, pool, alpha,
            params.pruneTarget, store, metric)
          if (stats != null) stats.pruneCpu.add(System.nanoTime() - tp0)
        }
        if (stats != null) stats.search.add(System.nanoTime() - tSearch0)
        // apply phase, slot order: all adjacencies first (so a later batch
        // member doesn't clobber reverse edges inserted toward it by an
        // earlier one), then reverse edges appended with overflow deferred —
        // the reference's batched backedge flush (vamana_build.h:483-570):
        // one re-prune per overflowing node per batch, not per edge
        val tApply0 = System.nanoTime()
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
        if (stats != null) stats.apply.add(System.nanoTime() - tApply0)
        // parallel re-prune of the overflowing nodes: each thread reads and
        // writes only its own slot (overflow is bounded by maxDegree +
        // batchSize), so this is deterministic too
        val tOver0 = System.nanoTime()
        val overs = new Array[Int](overflowed.size())
        var oi0 = 0
        val oit = overflowed.iterator()
        while (oit.hasNext) { overs(oi0) = oit.next().intValue(); oi0 += 1 }
        val oRange = java.util.stream.IntStream.range(0, overs.length)
        (if (overs.length > 1) oRange.parallel() else oRange).forEach { oi =>
          val dst = overs(oi)
          // score dst against its neighbors through a gathered view —
          // dst's row is decoded/widened ONCE instead of once per
          // neighbor (the robustPrune decode-once rationale applied to
          // the overflow pool build; bit-identical by gather's contract)
          val nbrs = adj(dst)
          val viewSlots = dst +: nbrs
          val local = store.gather(viewSlots)
          val rp = new CandidatePool(nbrs.length)
          var ni = 0
          while (ni < nbrs.length) {
            rp.add(nbrs(ni), local.distPair(metric, 0, ni + 1))
            ni += 1
          }
          // the view's slot order (dst :: nbrs) doubles as robustPrune's
          // slot → view-index lookup (PreGathered contract) — no boxed
          // map on the hot path, rows never re-decode
          adj(dst) = robustPrune(dst, rp, alpha, params.maxDegree,
            store, metric, new PreGathered(local, viewSlots))
        }
        if (stats != null) stats.overflow.add(System.nanoTime() - tOver0)
        start = end
      }
    }
    // Connectivity patch: the α-prune gives NO directed-reachability
    // guarantee from the entry — rare memberships (near-duplicate islands,
    // tiny re-sharded shards) can leave whole components no greedy walk
    // will ever find (observed: 40/109 nodes stranded on a re-sharded
    // synthetic membership; the reference has the same exposure, its
    // integration tests simply never hit it). Deterministically attach
    // each stranded node to its nearest REACHABLE neighbor (located by a
    // walk toward the stranded vector, which by construction only visits
    // reachable nodes): append when the host has degree slack, else
    // replace the host's worst (last, pools are best-first) edge — the
    // degree cap certified by q48 is never exceeded. Loop until the entry
    // reaches every node; attaching u usually re-attaches its whole
    // island through u's own out-edges. No-op (bit-identical graphs) on
    // every already-connected membership.
    if (params.patchStranded && n > 1) {
      var rounds = 0
      val maxRounds = 2 * n
      var done = false
      while (!done && rounds < maxRounds) {
        val reached = new java.util.BitSet(n)
        val stack = new java.util.ArrayDeque[Integer]()
        reached.set(entry); stack.push(entry)
        while (!stack.isEmpty) {
          val nbs = adj(stack.pop().intValue())
          var i = 0
          while (i < nbs.length) {
            val nb = nbs(i)
            if (!reached.get(nb)) { reached.set(nb); stack.push(nb) }
            i += 1
          }
        }
        var u = 0
        while (u < n && reached.get(u)) u += 1
        if (u == n) done = true
        else {
          val buf = greedySearch(adj, store, entry, store.row(u),
            math.max(2 * params.maxDegree, params.buildWindow), metric, 0)
          var host = -1
          var i = 0
          while (host < 0 && i < buf.n) {
            if (adj(buf.slots(i)).length < params.maxDegree)
              host = buf.slots(i)
            i += 1
          }
          if (host >= 0) adj(host) = adj(host) :+ u
          else {
            val h = buf.slots(0)
            adj(h) = adj(h).updated(adj(h).length - 1, u)
          }
          if (stats != null) stats.strandedPatched.increment()
          rounds += 1
        }
      }
      if (!done) {
        // round budget exhausted (worst-edge replacements oscillated) —
        // surface it: full-window searches on this shard can miss rows
        val reached = new java.util.BitSet(n)
        val stack = new java.util.ArrayDeque[Integer]()
        reached.set(entry); stack.push(entry)
        while (!stack.isEmpty) {
          val nbs = adj(stack.pop().intValue())
          var i = 0
          while (i < nbs.length) {
            val nb = nbs(i)
            if (!reached.get(nb)) { reached.set(nb); stack.push(nb) }
            i += 1
          }
        }
        val left = n - reached.cardinality
        if (left > 0) {
          if (stats != null) stats.strandedUnreachable.add(left.toLong)
          System.err.println(
            s"[vamana] connectivity patch gave up with $left of $n nodes " +
              "still unreachable from the entry after " + maxRounds +
              " rounds; full-window searches on this shard can miss them")
        }
      }
    }
    (adj, entry)
  }
}
