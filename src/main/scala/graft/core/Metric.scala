package graft.core

import org.apache.spark.sql.Column
import graft.functions.VectorFunctions

/** Distance metric + its top-k ordering. IP/cosine are *similarities* (larger
  * = closer; reference: core/distance/inner_product.h:102 std::greater
  * comparator) — threading the ordering through here prevents silent recall
  * inversion (SURVEY §7 hard parts). */
sealed trait Metric {
  def name: String
  /** true = smaller is better. */
  def ascending: Boolean
  def column(a: Column, b: Column): Column
  /** DuckDB SQL fragment computing the same value from two column prefixes
    * expanded as `${p}0..${p}${dims-1}` — used by oracle generators. */
  def sqlExpr(p1: String, p2: String, dims: Int): String
  /** JVM kernel with the exact fold order of the Catalyst expression (so the
    * mapPartitions fast path is bit-identical to the declarative path). */
  def compute(a: Array[Double], b: Array[Double]): Double

  /** Mixed-precision kernels over float32-resident rows: each float widens
    * to double at the point of use, then the arithmetic is the same double
    * fold — bit-identical to `compute` on pre-widened copies, at half the
    * resident bytes (the lever that makes f32 graph builds cache-friendly;
    * see VamanaKernel.VecStore). Default implementations widen per element
    * inline; SimdOf overrides with Vector API mixed kernels. */
  def computeDF(a: Array[Double], b: Array[Float]): Double
  def computeFF(a: Array[Float], b: Array[Float]): Double

  /** Byte-resident kernels (reference datatype parity: uint8/int8
    * datasets, include/svs/lib/datatype.h:53-66). Every i8/u8 value is
    * exactly representable as a double, so widening at the point of use
    * — `b(i).toDouble` signed, `(b(i) & 0xFF).toDouble` unsigned — into
    * the identical double fold makes byte-resident results bit-identical
    * to pre-widened copies, at ONE EIGHTH the resident bytes of f64. */
  def computeDB(a: Array[Double], b: Array[Byte], unsigned: Boolean): Double
  def computeBB(a: Array[Byte], b: Array[Byte], unsigned: Boolean): Double

  /** `compute(a, flat[off, off+a.length))` without materializing the slice
    * — the kernel for FLAT (structure-of-arrays) batch layouts
    * (BatchScore): same per-element fold in the same order, so results are
    * bit-identical to `compute` on a copied row. Scalar metrics override
    * with a direct offset loop; the default copies (correct for any
    * metric, including SIMD twins whose lane kernels are length-anchored). */
  def computeAt(a: Array[Double], flat: Array[Double], off: Int): Double =
    compute(a, java.util.Arrays.copyOfRange(flat, off, off + a.length))

  /** f32 twin of [[computeAt]]: row at `flat[off, off+len)` of a packed
    * float tile (FlatKnn's chunked scan) — same fold as [[computeDF]]. */
  def computeAtF(a: Array[Double], flat: Array[Float], off: Int): Double =
    computeDF(a, java.util.Arrays.copyOfRange(flat, off, off + a.length))

  /** byte twin of [[computeAt]] — same fold as [[computeDB]]. */
  def computeAtB(a: Array[Double], flat: Array[Byte], off: Int,
                 unsigned: Boolean): Double =
    computeDB(a, java.util.Arrays.copyOfRange(flat, off, off + a.length),
      unsigned)

  /** Score a whole SoA tile: `out(r) = kernel(a, flat[r·d, (r+1)·d))` for
    * r < n. The batch form of the offset kernels: each metric overrides
    * with its own loop so the per-pair call site is MONOMORPHIC — one
    * receiver, JIT-inlinable — where a shared per-pair virtual call from
    * the scan loop (serving several Metric impls in one JVM) would stay
    * megamorphic and uninlined. Row order is ascending r, so downstream
    * heap inserts see the exact per-row sequence of a row-at-a-time scan. */
  def scoreTile(a: Array[Double], flat: Array[Double], d: Int, n: Int,
                out: Array[Double]): Unit = {
    var r = 0
    while (r < n) { out(r) = computeAt(a, flat, r * d); r += 1 }
  }
  def scoreTileF(a: Array[Double], flat: Array[Float], d: Int, n: Int,
                 out: Array[Double]): Unit = {
    var r = 0
    while (r < n) { out(r) = computeAtF(a, flat, r * d); r += 1 }
  }
  def scoreTileB(a: Array[Double], flat: Array[Byte], d: Int, n: Int,
                 out: Array[Double], unsigned: Boolean): Unit = {
    var r = 0
    while (r < n) { out(r) = computeAtB(a, flat, r * d, unsigned); r += 1 }
  }
}

object Metric {
  case object L2 extends Metric {
    val name = "l2"
    val ascending = true
    def column(a: Column, b: Column): Column = VectorFunctions.l2Distance(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i => s"($p1$i-$p2$i)*($p1$i-$p2$i)").mkString(" + ")
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def computeDF(a: Array[Double], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    def computeFF(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    override def computeAt(a: Array[Double], flat: Array[Double],
                           off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i) - flat(off + i); acc += d * d; i += 1 }
      acc
    }
    override def computeAtF(a: Array[Double], flat: Array[Float],
                            off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i) - flat(off + i).toDouble; acc += d * d; i += 1 }
      acc
    }
    override def computeAtB(a: Array[Double], flat: Array[Byte], off: Int,
                            unsigned: Boolean): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val b = flat(off + i)
        val y = if (unsigned) (b & 0xFF).toDouble else b.toDouble
        val d = a(i) - y; acc += d * d; i += 1
      }
      acc
    }
    def computeDB(a: Array[Double], b: Array[Byte],
                  unsigned: Boolean): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val y = if (unsigned) (b(i) & 0xFF).toDouble else b(i).toDouble
        val d = a(i) - y; acc += d * d; i += 1
      }
      acc
    }
    def computeBB(a: Array[Byte], b: Array[Byte],
                  unsigned: Boolean): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val x = if (unsigned) (a(i) & 0xFF).toDouble else a(i).toDouble
        val y = if (unsigned) (b(i) & 0xFF).toDouble else b(i).toDouble
        val d = x - y; acc += d * d; i += 1
      }
      acc
    }
    override def scoreTile(a: Array[Double], flat: Array[Double], d: Int,
                           n: Int, out: Array[Double]): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAt(a, flat, r * d); r += 1 }
    }
    override def scoreTileF(a: Array[Double], flat: Array[Float], d: Int,
                            n: Int, out: Array[Double]): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAtF(a, flat, r * d); r += 1 }
    }
    override def scoreTileB(a: Array[Double], flat: Array[Byte], d: Int,
                            n: Int, out: Array[Double],
                            unsigned: Boolean): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAtB(a, flat, r * d, unsigned); r += 1 }
    }
  }

  case object IP extends Metric {
    val name = "ip"
    val ascending = false
    def column(a: Column, b: Column): Column = VectorFunctions.innerProduct(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i => s"$p1$i*$p2$i").mkString(" + ")
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def computeDF(a: Array[Double], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i).toDouble; i += 1 }
      acc
    }
    def computeFF(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    override def computeAt(a: Array[Double], flat: Array[Double],
                           off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * flat(off + i); i += 1 }
      acc
    }
    override def computeAtF(a: Array[Double], flat: Array[Float],
                            off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * flat(off + i).toDouble; i += 1 }
      acc
    }
    override def computeAtB(a: Array[Double], flat: Array[Byte], off: Int,
                            unsigned: Boolean): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val b = flat(off + i)
        val y = if (unsigned) (b & 0xFF).toDouble else b.toDouble
        acc += a(i) * y; i += 1
      }
      acc
    }
    def computeDB(a: Array[Double], b: Array[Byte],
                  unsigned: Boolean): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val y = if (unsigned) (b(i) & 0xFF).toDouble else b(i).toDouble
        acc += a(i) * y; i += 1
      }
      acc
    }
    def computeBB(a: Array[Byte], b: Array[Byte],
                  unsigned: Boolean): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val x = if (unsigned) (a(i) & 0xFF).toDouble else a(i).toDouble
        val y = if (unsigned) (b(i) & 0xFF).toDouble else b(i).toDouble
        acc += x * y; i += 1
      }
      acc
    }
    override def scoreTile(a: Array[Double], flat: Array[Double], d: Int,
                           n: Int, out: Array[Double]): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAt(a, flat, r * d); r += 1 }
    }
    override def scoreTileF(a: Array[Double], flat: Array[Float], d: Int,
                            n: Int, out: Array[Double]): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAtF(a, flat, r * d); r += 1 }
    }
    override def scoreTileB(a: Array[Double], flat: Array[Byte], d: Int,
                            n: Int, out: Array[Double],
                            unsigned: Boolean): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAtB(a, flat, r * d, unsigned); r += 1 }
    }
  }

  case object Cosine extends Metric {
    val name = "cosine"
    val ascending = false
    def column(a: Column, b: Column): Column =
      VectorFunctions.cosineSimilarity(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String = {
      val dot = (0 until dims).map(i => s"$p1$i*$p2$i").mkString(" + ")
      val n1 = (0 until dims).map(i => s"$p1$i*$p1$i").mkString(" + ")
      val n2 = (0 until dims).map(i => s"$p2$i*$p2$i").mkString(" + ")
      s"($dot) / (sqrt($n1) * sqrt($n2))"
    }
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def computeDF(a: Array[Double], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def computeFF(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override def computeAt(a: Array[Double], flat: Array[Double],
                           off: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = flat(off + i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override def computeAtF(a: Array[Double], flat: Array[Float],
                            off: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = flat(off + i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override def computeAtB(a: Array[Double], flat: Array[Byte], off: Int,
                            unsigned: Boolean): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val b = flat(off + i)
        val x = a(i)
        val y = if (unsigned) (b & 0xFF).toDouble else b.toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def computeDB(a: Array[Double], b: Array[Byte],
                  unsigned: Boolean): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i)
        val y = if (unsigned) (b(i) & 0xFF).toDouble else b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def computeBB(a: Array[Byte], b: Array[Byte],
                  unsigned: Boolean): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = if (unsigned) (a(i) & 0xFF).toDouble else a(i).toDouble
        val y = if (unsigned) (b(i) & 0xFF).toDouble else b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override def scoreTile(a: Array[Double], flat: Array[Double], d: Int,
                           n: Int, out: Array[Double]): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAt(a, flat, r * d); r += 1 }
    }
    override def scoreTileF(a: Array[Double], flat: Array[Float], d: Int,
                            n: Int, out: Array[Double]): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAtF(a, flat, r * d); r += 1 }
    }
    override def scoreTileB(a: Array[Double], flat: Array[Byte], d: Int,
                            n: Int, out: Array[Double],
                            unsigned: Boolean): Unit = {
      var r = 0
      while (r < n) { out(r) = computeAtB(a, flat, r * d, unsigned); r += 1 }
    }
  }

  /** Hamming distance over BIT-PACKED WORD arrays: each element is an
    * integral word value stored as a double (BinaryQuant packs 32 bits
    * per word, < 2³² — exactly representable), and the distance is
    * Σ popcount(xor(aᵢ, bᵢ)). Representing words as doubles is what lets
    * binary codes ride every existing Array[Double] kernel surface —
    * FlatKnn's broadcast + partition-local heaps, the VecStore walks —
    * unchanged. Integral outputs, ties by id: fully hash-certifiable.
    * Not a vector-space metric: excluded from `all` and from SIMD
    * wrapping; float32 storage is rejected (32-bit words don't fit a
    * float's 24-bit mantissa). */
  case object Hamming extends Metric {
    val name = "hamming"
    val ascending = true
    def column(a: Column, b: Column): Column = {
      import org.apache.spark.sql.functions._
      aggregate(zip_with(a, b, (x, y) =>
        bit_count(x.cast("long").bitwiseXOR(y.cast("long"))).cast("long")),
        lit(0L), (acc, v) => acc + v).cast("double")
    }
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i =>
        s"bit_count(xor(CAST($p1$i AS BIGINT), CAST($p2$i AS BIGINT)))")
        .mkString(" + ")
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0; var i = 0
      while (i < a.length) {
        acc += java.lang.Long.bitCount(a(i).toLong ^ b(i).toLong); i += 1
      }
      acc.toDouble
    }
    def computeDF(a: Array[Double], b: Array[Float]): Double =
      sys.error("Hamming codes must be stored as ARRAY<DOUBLE> " +
        "(32-bit words do not fit a float32 mantissa)")
    def computeFF(a: Array[Float], b: Array[Float]): Double =
      sys.error("Hamming codes must be stored as ARRAY<DOUBLE> " +
        "(32-bit words do not fit a float32 mantissa)")
    def computeDB(a: Array[Double], b: Array[Byte],
                  unsigned: Boolean): Double =
      sys.error("Hamming codes must be stored as ARRAY<DOUBLE> " +
        "(32-bit packed words, not bytes)")
    def computeBB(a: Array[Byte], b: Array[Byte],
                  unsigned: Boolean): Double =
      sys.error("Hamming codes must be stored as ARRAY<DOUBLE> " +
        "(32-bit packed words, not bytes)")
    override def computeAt(a: Array[Double], flat: Array[Double],
                           off: Int): Double = {
      var acc = 0; var i = 0
      while (i < a.length) {
        acc += java.lang.Long.bitCount(a(i).toLong ^ flat(off + i).toLong)
        i += 1
      }
      acc.toDouble
    }
  }

  /** SIMD twin of a scalar metric (JDK Vector API kernels,
    * graft.simd.SimdKernels): same ordering, same Column/SQL forms, but
    * `compute` runs the lane-accumulated kernel — the analog of the
    * reference's AVX-512 distance dispatch
    * (core/distance/euclidean.h:216-328). Fold order differs from the
    * scalar kernel, so values can differ in the last ulp; the
    * oracle-certified paths therefore stay scalar and this is the opt-in
    * production kernel (SimdSpec pins SIMD-vs-scalar agreement).
    *
    * Constructed via `Metric.simd`, which falls back to the scalar metric
    * when the JVM lacks `--add-modules jdk.incubator.vector`. */
  final case class SimdOf(base: Metric) extends Metric {
    val name: String = base.name + "_simd"
    val ascending: Boolean = base.ascending
    def column(a: Column, b: Column): Column = base.column(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      base.sqlExpr(p1, p2, dims)
    def compute(a: Array[Double], b: Array[Double]): Double = base match {
      case L2         => graft.simd.SimdKernels.l2(a, b)
      case IP         => graft.simd.SimdKernels.ip(a, b)
      case Cosine     => graft.simd.SimdKernels.cosine(a, b)
      case Hamming    => Hamming.compute(a, b) // no lane kernel
      case s: SimdOf  => s.compute(a, b)
    }
    def computeDF(a: Array[Double], b: Array[Float]): Double = base match {
      case L2         => graft.simd.SimdKernels.l2DF(a, b)
      case IP         => graft.simd.SimdKernels.ipDF(a, b)
      case Cosine     => graft.simd.SimdKernels.cosineDF(a, b)
      case Hamming    => Hamming.computeDF(a, b)
      case s: SimdOf  => s.computeDF(a, b)
    }
    def computeFF(a: Array[Float], b: Array[Float]): Double = base match {
      case L2         => graft.simd.SimdKernels.l2FF(a, b)
      case IP         => graft.simd.SimdKernels.ipFF(a, b)
      case Cosine     => graft.simd.SimdKernels.cosineFF(a, b)
      case Hamming    => Hamming.computeFF(a, b)
      case s: SimdOf  => s.computeFF(a, b)
    }
    def computeDB(a: Array[Double], b: Array[Byte],
                  unsigned: Boolean): Double = base match {
      case L2        => graft.simd.SimdKernels.l2DB(a, b, unsigned)
      case IP        => graft.simd.SimdKernels.ipDB(a, b, unsigned)
      case Cosine    => graft.simd.SimdKernels.cosineDB(a, b, unsigned)
      case Hamming   => Hamming.computeDB(a, b, unsigned)
      case s: SimdOf => s.computeDB(a, b, unsigned)
    }
    def computeBB(a: Array[Byte], b: Array[Byte],
                  unsigned: Boolean): Double = base match {
      case L2        => graft.simd.SimdKernels.l2BB(a, b, unsigned)
      case IP        => graft.simd.SimdKernels.ipBB(a, b, unsigned)
      case Cosine    => graft.simd.SimdKernels.cosineBB(a, b, unsigned)
      case Hamming   => Hamming.computeBB(a, b, unsigned)
      case s: SimdOf => s.computeBB(a, b, unsigned)
    }
    // offset (flat-tile) kernels: without these the trait default would
    // copy a slice per PAIR, undoing the tiled scan's entire point
    override def computeAt(a: Array[Double], flat: Array[Double],
                           off: Int): Double = base match {
      case L2        => graft.simd.SimdKernels.l2At(a, flat, off)
      case IP        => graft.simd.SimdKernels.ipAt(a, flat, off)
      case Cosine    => graft.simd.SimdKernels.cosineAt(a, flat, off)
      case Hamming   => Hamming.computeAt(a, flat, off)
      case s: SimdOf => s.computeAt(a, flat, off)
    }
    override def computeAtF(a: Array[Double], flat: Array[Float],
                            off: Int): Double = base match {
      case L2        => graft.simd.SimdKernels.l2DFAt(a, flat, off)
      case IP        => graft.simd.SimdKernels.ipDFAt(a, flat, off)
      case Cosine    => graft.simd.SimdKernels.cosineDFAt(a, flat, off)
      case Hamming   => Hamming.computeAtF(a, flat, off)
      case s: SimdOf => s.computeAtF(a, flat, off)
    }
    override def computeAtB(a: Array[Double], flat: Array[Byte], off: Int,
                            unsigned: Boolean): Double = base match {
      case L2        => graft.simd.SimdKernels.l2DBAt(a, flat, off, unsigned)
      case IP        => graft.simd.SimdKernels.ipDBAt(a, flat, off, unsigned)
      case Cosine    =>
        graft.simd.SimdKernels.cosineDBAt(a, flat, off, unsigned)
      case Hamming   => Hamming.computeAtB(a, flat, off, unsigned)
      case s: SimdOf => s.computeAtB(a, flat, off, unsigned)
    }
    // tile sweeps: the per-pair call inside each loop is a STATIC kernel
    // call resolved by the one-time base match — inlinable, unlike a
    // per-pair virtual computeAt* from the scan loop
    override def scoreTile(a: Array[Double], flat: Array[Double], d: Int,
                           n: Int, out: Array[Double]): Unit = base match {
      case L2 =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.l2At(a, flat, r * d); r += 1 }
      case IP =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.ipAt(a, flat, r * d); r += 1 }
      case Cosine =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.cosineAt(a, flat, r * d); r += 1 }
      case Hamming   => Hamming.scoreTile(a, flat, d, n, out)
      case s: SimdOf => s.scoreTile(a, flat, d, n, out)
    }
    override def scoreTileF(a: Array[Double], flat: Array[Float], d: Int,
                            n: Int, out: Array[Double]): Unit = base match {
      case L2 =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.l2DFAt(a, flat, r * d); r += 1 }
      case IP =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.ipDFAt(a, flat, r * d); r += 1 }
      case Cosine =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.cosineDFAt(a, flat, r * d)
          r += 1 }
      case Hamming   => Hamming.scoreTileF(a, flat, d, n, out)
      case s: SimdOf => s.scoreTileF(a, flat, d, n, out)
    }
    override def scoreTileB(a: Array[Double], flat: Array[Byte], d: Int,
                            n: Int, out: Array[Double],
                            unsigned: Boolean): Unit = base match {
      case L2 =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.l2DBAt(a, flat, r * d, unsigned)
          r += 1 }
      case IP =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.ipDBAt(a, flat, r * d, unsigned)
          r += 1 }
      case Cosine =>
        var r = 0
        while (r < n) {
          out(r) = graft.simd.SimdKernels.cosineDBAt(a, flat, r * d,
            unsigned)
          r += 1 }
      case Hamming   => Hamming.scoreTileB(a, flat, d, n, out, unsigned)
      case s: SimdOf => s.scoreTileB(a, flat, d, n, out, unsigned)
    }
  }

  /** The SIMD variant of `m` when the Vector API is available in this JVM,
    * otherwise `m` itself (graceful scalar fallback). */
  def simd(m: Metric): Metric =
    if (SimdSupport.available) m match {
      case s: SimdOf => s
      case Hamming   => Hamming // no lane kernel; scalar popcount is fine
      case base      => SimdOf(base)
    } else m

  val all: Seq[Metric] = Seq(L2, IP, Cosine)

  /** Resolve a metric by name, including the `_simd` twins ("l2_simd" etc.).
    * A `_simd` name on a JVM without the Vector API resolves to the scalar
    * base — the same graceful fallback as `simd(m)`. */
  def byName(n: String): Option[Metric] =
    all.find(_.name == n).orElse(
      all.find(_.name + "_simd" == n).map(simd))
}
