package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric

/** LeanVec-style learned dimensionality reduction + two-pass search.
  *
  * The reference ships LeanVec as a first-class compressed-storage family:
  * a learned linear projection to `leanvec_dims` dimensions drives the
  * primary (coarse) search, and a secondary full-dimensional dataset
  * re-ranks the shortlist (reference:
  * bindings/cpp/src/dynamic_vamana_index_leanvec_impl.h:34-138 — LeanVec4x4/
  * 4x8/8x8 storage kinds carrying `leanvec_dims_` + `leanvec_matrices_`;
  * include/svs/index/ivf/data_traits.h:51-54 — `leanvec_dims` config;
  * examples/cpp/shared/example_ivf_with_compression_leanvec.cpp:38-49 —
  * `LeanDataset::reduce`). The projection itself is closed-source in the
  * reference; this is a from-the-paper implementation (Tepper et al.,
  * "LeanVec: Searching vectors faster by making them fit", arXiv:2312.16335)
  * using the paper's self-query special case: principal directions of the
  * centered data (PCA), the optimal linear map when queries share the data
  * distribution.
  *
  * Spark shape: training is ONE distributed pass — per-partition
  * (count, Σv, Σvvᵀ) partials folded on the driver in partition order
  * (deterministic doubles), then a d×d Jacobi eigensolve on the driver
  * (d is small and bounded: 64 here, ≤ a few thousand in practice — the
  * classic "small model, big data" split). Search composes the existing
  * certified kernels: FlatKnn over the r-dim table for the coarse pass,
  * exact reorder over only the shortlist — full-precision vectors are
  * read for O(|Q|·kReorder·k) rows, never scanned.
  *
  * With `kReorder·k ≥ |data|` the shortlist is exhaustive and the output
  * provably equals exact kNN for ANY projection — the hash-certification
  * path (q86), same argument as q24's exhaustive window. Quality at a
  * realistic window is certified separately via invariant flags (q87).
  */
object LeanVec {

  /** Trained reduction model. `proj` is r×d, rows are orthonormal principal
    * directions, descending eigenvalue order; `eigvals` keeps ALL d values
    * (descending) so variance capture is inspectable at any r. */
  case class Model(mean: Array[Double], proj: Array[Array[Double]],
                   eigvals: Array[Double]) {
    def dims: Int = mean.length
    def rDims: Int = proj.length
    /** Fraction of total variance captured by the r kept directions. */
    def varianceFraction: Double = {
      val tot = eigvals.map(math.max(_, 0.0)).sum
      if (tot <= 0.0) 1.0
      else eigvals.take(rDims).map(math.max(_, 0.0)).sum / tot
    }
    /** Max |PPᵀ − I| entry — orthonormality defect of the kept rows. */
    def orthoDefect: Double = {
      val r = rDims; val d = dims
      var worst = 0.0
      var a = 0
      while (a < r) {
        var b = a
        while (b < r) {
          var s = 0.0; var i = 0
          while (i < d) { s += proj(a)(i) * proj(b)(i); i += 1 }
          val want = if (a == b) 1.0 else 0.0
          val defect = math.abs(s - want)
          if (defect > worst) worst = defect
          b += 1
        }
        a += 1
      }
      worst
    }
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix. Returns
    * (eigenvalues, eigenvectors-as-columns), unsorted. Deterministic:
    * fixed sweep order, convergence on off-diagonal Frobenius norm. O(d³)
    * per sweep on the driver — d is the vector dimensionality (small). */
  private[graft] def jacobiEigen(sym: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val a = Array.tabulate(n, n)((i, j) => sym(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    val scale = {
      var m = 0.0; var i = 0
      while (i < n) { m = math.max(m, math.abs(a(i)(i))); i += 1 }
      math.max(m, 1e-300)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > 1e-12 * scale * n) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15 * scale) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sign = if (theta >= 0.0) 1.0 else -1.0
            val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** One distributed pass over `data(vecCol)` → (n, Σv, Σvvᵀ) partials per
    * partition, folded on the driver in partition-id order so the double
    * sums are run-order-independent. Upper triangle only: d(d+1)/2 doubles
    * per partition cross the wire, not d². */
  private def moments(data: DataFrame, vecCol: String)
      : (Long, Array[Double], Array[Double]) = {
    val spark = data.sparkSession
    import spark.implicits._
    val partials = data.select(col(vecCol).cast("array<double>"))
      .as[Array[Double]]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val d = first.length
          val sum = new Array[Double](d)
          val m = new Array[Double](d * (d + 1) / 2)
          var n = 0L
          def add(v: Array[Double]): Unit = {
            var i = 0; var k = 0
            while (i < d) {
              sum(i) += v(i)
              var j = i
              while (j < d) { m(k) += v(i) * v(j); k += 1; j += 1 }
              i += 1
            }
            n += 1
          }
          add(first)
          while (it.hasNext) add(it.next())
          Iterator.single((TaskContext.getPartitionId(), n, sum, m))
        }
      }
      .collect()
      .sortBy(_._1)
    require(partials.nonEmpty, "LeanVec.train: empty input")
    val d = partials.head._3.length
    val sum = new Array[Double](d)
    val m = new Array[Double](d * (d + 1) / 2)
    var n = 0L
    partials.foreach { case (_, pn, ps, pm) =>
      n += pn
      var i = 0
      while (i < d) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < m.length) { m(i) += pm(i); i += 1 }
    }
    (n, sum, m)
  }

  /** Train the reduction: covariance of the (mean-centered) data, Jacobi
    * eigensolve, keep the top `rDims` directions (descending eigenvalue,
    * index ascending on ties), each sign-canonicalized so the component of
    * largest magnitude is positive — the whole model is a deterministic
    * function of the data. */
  def train(data: DataFrame, rDims: Int, vecCol: String = "vec"): Model = {
    val (n, sum, m) = moments(data, vecCol)
    val d = sum.length
    require(rDims >= 1 && rDims <= d,
      s"LeanVec.train: rDims $rDims out of range 1..$d")
    val mu = sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m(k) / n - mu(i) * mu(j)
        cov(i)(j) = c; cov(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(idx => (-vals(idx), idx))
    val proj = order.take(rDims).map { idx =>
      val row = Array.tabulate(d)(r => vecs(r)(idx))
      var best = 0
      var j = 1
      while (j < d) {
        if (math.abs(row(j)) > math.abs(row(best))) best = j
        j += 1
      }
      if (row(best) < 0.0) { var t = 0; while (t < d) { row(t) = -row(t); t += 1 } }
      row
    }.toArray
    Model(mu, proj, order.map(vals).toArray)
  }

  /** Project `(idCol, vecCol)` rows to the reduced space:
    * out = P·(v − mean). mapPartitions kernel with a broadcast model —
    * r·d multiply-adds per row, no shuffle. Output `(idCol, outCol)`. */
  def transform(data: DataFrame, model: Model, idCol: String = "id",
                vecCol: String = "vec", outCol: String = "vec"): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model.mean, model.proj))
    data.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (mu, p) = bc.value
        val r = p.length
        val d = mu.length
        it.map { case (id, v) =>
          val out = new Array[Double](r)
          var a = 0
          while (a < r) {
            val row = p(a)
            var s = 0.0; var i = 0
            while (i < d) { s += row(i) * (v(i) - mu(i)); i += 1 }
            out(a) = s; a += 1
          }
          (id, out)
        }
      }
      .toDF(idCol, outCol)
  }

  /** Full-precision re-rank of a coarse shortlist: exact `metric` distances
    * on true vectors for ONLY the `(query_id, id)` shortlist rows (a k-row
    * equi-join per query, not a scan), bounded top-k per query. The second
    * pass every LeanVec composition (flat / Vamana / LVQ / OOD coarse)
    * funnels through. Output: (query_id, rnk, neighbor_id, dist). */
  def rerank(shortlist: DataFrame, queries: DataFrame, fullData: DataFrame,
             k: Int, metric: Metric = Metric.L2): DataFrame = {
    val fine = shortlist.select("query_id", "id")
      .join(fullData.select("id", "vec"), Seq("id"))
      .join(queries.select("query_id", "qvec"), Seq("query_id"))
      .select(col("query_id"), col("id"),
        metric.column(col("qvec"), col("vec")).as("dist"))
    TopK.perKeyViaWindow(fine, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** Two-pass LeanVec search over pre-transformed tables: coarse L2 scan of
    * the r-dim `reducedData` keeps `kReorder·k` candidates per query, then
    * exact `metric` distances on full-precision vectors re-rank ONLY the
    * shortlist. Orthonormal-row projections contract L2
    * (‖P(a−b)‖ ≤ ‖a−b‖), so the coarse ranking is the paper's bound-based
    * candidate filter. Output: (query_id, rnk, neighbor_id, dist). */
  def searchPrepared(reducedQueries: DataFrame, reducedData: DataFrame,
                     queries: DataFrame, fullData: DataFrame, k: Int,
                     kReorder: Int, metric: Metric = Metric.L2): DataFrame = {
    val shortlist = FlatKnn.search(reducedQueries, reducedData,
        kReorder * k, Metric.L2)
      .select(col("query_id"), col("neighbor_id").as("id"))
    rerank(shortlist, queries, fullData, k, metric)
  }

  /** Matryoshka (MRL) truncated search (Kusupati et al. NeurIPS'22:
    * embeddings trained so PREFIXES are themselves valid embeddings —
    * the training-free cousin of LeanVec's learned projection): the
    * coarse pass scans only the first `rDims` of each vector
    * (`slice` — column pruning can't drop the tail of an array, but the
    * per-pair fold cost drops d/r×, and an ingest-time materialized
    * prefix column turns it into a genuine bandwidth cut), keeps
    * kReorder·k, then exact `metric` on full vectors re-ranks the
    * shortlist. Same two-pass contract as [[searchPrepared]] with
    * truncation instead of projection. */
  def searchTruncated(queries: DataFrame, data: DataFrame, k: Int,
                      rDims: Int, kReorder: Int,
                      metric: Metric = Metric.L2): DataFrame = {
    val rq = queries.select(col("query_id"),
      slice(col("qvec"), 1, rDims).as("qvec"))
    val rd = data.select(col("id"), slice(col("vec"), 1, rDims).as("vec"))
    val shortlist = FlatKnn.search(rq, rd, kReorder * k, Metric.L2)
      .select(col("query_id"), col("neighbor_id").as("id"))
    rerank(shortlist, queries, data, k, metric)
  }

  /** Convenience end-to-end search: trains nothing — transforms both sides
    * with `model` and runs [[searchPrepared]]. For repeated searches,
    * transform + cache the data side once and call [[searchPrepared]]. */
  def search(queries: DataFrame, data: DataFrame, model: Model, k: Int,
             kReorder: Int, metric: Metric = Metric.L2): DataFrame = {
    val rq = transform(queries, model, idCol = "query_id", vecCol = "qvec",
      outCol = "qvec")
    val rd = transform(data, model)
    searchPrepared(rq, rd, queries, data, k, kReorder, metric)
  }

  // ---- Query-aware (out-of-distribution) training -------------------------

  /** OOD-trained reduction: SEPARATE data/query projections, the reference's
    * `compute_leanvec_matrices_ood(data, queries, leanvec_dims)`
    * (bindings/cpp/src/training_impl.h:104-115; `LeanVecMatrices` carries a
    * distinct data matrix and query matrix, training_impl.h:97-101 — the
    * self-query case just duplicates one matrix). `projData` (A) reduces
    * data vectors, `projQuery` (B) reduces queries, both about the DATA
    * mean; the coarse score (Bq̃)ᵀ(Ax̃) approximates q̃ᵀx̃.
    * `lossHistory` records tr[(BᵀA−I)·Mx·(AᵀB−I)·Mq] after init and after
    * every half-step — each half-step is an exact minimizer given the other
    * matrix, so the sequence is provably non-increasing (spec-asserted). */
  case class OodModel(mean: Array[Double], projData: Array[Array[Double]],
                      projQuery: Array[Array[Double]],
                      lossHistory: Array[Double]) {
    def dims: Int = mean.length
    def rDims: Int = projData.length
  }

  /** d×d second-moment matrix of `vecCol` about the fixed point `mu`:
    * E[(v−μ)(v−μ)ᵀ] = Σvvᵀ/n − m̄μᵀ − μm̄ᵀ + μμᵀ with m̄ the column mean.
    * One distributed pass (the same [[moments]] kernel). */
  private def secondMomentAbout(df: DataFrame, vecCol: String,
                                mu: Array[Double]): Array[Array[Double]] =
    momentMatrix(moments(df, vecCol), mu)

  private def momentMatrix(raw: (Long, Array[Double], Array[Double]),
                           mu: Array[Double]): Array[Array[Double]] = {
    val (n, sum, m) = raw
    val d = mu.length
    require(sum.length == d,
      s"dimension mismatch: data is ${sum.length}-d, mean is $d-d")
    val mean = sum.map(_ / n)
    val out = Array.ofDim[Double](d, d)
    var i = 0; var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m(k) / n - mean(i) * mu(j) - mu(i) * mean(j) + mu(i) * mu(j)
        out(i)(j) = c; out(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }
    out
  }

  /** a(r×d) · sym(d×d) → r×d. */
  private def mulRd(a: Array[Array[Double]], sym: Array[Array[Double]])
      : Array[Array[Double]] = {
    val r = a.length; val d = sym.length
    Array.tabulate(r, d) { (i, j) =>
      var s = 0.0; var t = 0
      while (t < d) { s += a(i)(t) * sym(t)(j); t += 1 }
      s
    }
  }

  /** a(r×d) · b(r×d)ᵀ → r×r. */
  private def gram(a: Array[Array[Double]], b: Array[Array[Double]])
      : Array[Array[Double]] = {
    val r = a.length; val d = a(0).length
    Array.tabulate(r, b.length) { (i, j) =>
      var s = 0.0; var t = 0
      while (t < d) { s += a(i)(t) * b(j)(t); t += 1 }
      s
    }
  }

  /** Solve sym(r×r) · X = rhs(r×d) for PSD `sym` via the eigen
    * pseudo-inverse (Jacobi eigensolve, then 1/λ on components with
    * λ > 1e-12·λmax). Rank-deficient normal matrices arise legitimately —
    * a query set smaller than rDims gives rank(Mq) = |Q| — and the
    * half-step normal equations are always CONSISTENT there (the rhs
    * columns lie in range(A·Mx) = range(A·Mx·Aᵀ)), so the pinv solution is
    * still an exact minimizer and the alternating loss stays monotone.
    * Deterministic. */
  private[graft] def solve(sym: Array[Array[Double]],
      rhs: Array[Array[Double]]): Array[Array[Double]] = {
    val r = sym.length; val d = rhs(0).length
    val (vals, vecs) = jacobiEigen(sym)
    val lmax = vals.map(math.abs).max
    val inv = vals.map(l => if (math.abs(l) > 1e-12 * math.max(lmax, 1e-300))
      1.0 / l else 0.0)
    // X = V · diag(inv) · Vᵀ · rhs
    val vtr = Array.tabulate(r, d) { (e, j) =>
      var s = 0.0; var t = 0
      while (t < r) { s += vecs(t)(e) * rhs(t)(j); t += 1 }
      s * inv(e)
    }
    Array.tabulate(r, d) { (i, j) =>
      var s = 0.0; var e = 0
      while (e < r) { s += vecs(i)(e) * vtr(e)(j); e += 1 }
      s
    }
  }

  /** tr[(BᵀA−I)·Mx·(AᵀB−I)·Mq] — the paper's expected squared inner-product
    * error E[((Bq̃)ᵀ(Ax̃) − q̃ᵀx̃)²] under independent draws. O(d²r + d³). */
  private[graft] def oodLoss(mx: Array[Array[Double]],
      mq: Array[Array[Double]], a: Array[Array[Double]],
      b: Array[Array[Double]]): Double = {
    val d = mx.length
    // E = BᵀA − I (d×d), then tr(E·Mx·Eᵀ·Mq) = Σ_{ij} (E·Mx·Eᵀ)ij·Mq(j,i)
    val e = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var t = 0
      while (t < a.length) { s += b(t)(i) * a(t)(j); t += 1 }
      if (i == j) s - 1.0 else s
    }
    val emx = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var t = 0
      while (t < d) { s += e(i)(t) * mx(t)(j); t += 1 }
      s
    }
    var tr = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var s = 0.0; var t = 0
        while (t < d) { s += emx(i)(t) * e(j)(t); t += 1 } // (E·Mx·Eᵀ)ij
        tr += s * mq(j)(i)
        j += 1
      }
      i += 1
    }
    tr
  }

  /** Top-`r` eigenvectors of a symmetric matrix as r×d rows, descending
    * eigenvalue (index-ascending ties), sign-canonicalized. */
  private def topEigRows(sym: Array[Array[Double]], r: Int)
      : Array[Array[Double]] = {
    val d = sym.length
    val (vals, vecs) = jacobiEigen(sym)
    (0 until d).sortBy(idx => (-vals(idx), idx)).take(r).map { idx =>
      val row = Array.tabulate(d)(t => vecs(t)(idx))
      var best = 0
      var j = 1
      while (j < d) {
        if (math.abs(row(j)) > math.abs(row(best))) best = j
        j += 1
      }
      if (row(best) < 0.0) { var t = 0; while (t < d) { row(t) = -row(t); t += 1 } }
      row
    }.toArray
  }

  /** Train the query-aware reduction (paper §4, LeanVec-OOD): minimize
    * E[((Bq̃)ᵀ(Ax̃) − q̃ᵀx̃)²] = tr[(BᵀA−I)·Mx·(AᵀB−I)·Mq] by alternating
    * EXACT closed-form least squares — for fixed A the optimum is
    * B = (A·Mx·Aᵀ)⁻¹·A·Mx and symmetrically A = (B·Mq·Bᵀ)⁻¹·B·Mq (set the
    * matrix gradient to zero; the r×r normal matrix is PD for full-rank
    * moments). Initialized from joint PCA of (Mx+Mq)/2. Everything after
    * the two distributed moments passes is driver-side d×d algebra — the
    * same small-model/big-data split as [[train]]. Deterministic. */
  def trainOod(data: DataFrame, queries: DataFrame, rDims: Int,
               iters: Int = 4, vecCol: String = "vec",
               queryVecCol: String = "qvec"): OodModel = {
    val rawX = moments(data, vecCol)
    val mu = rawX._2.map(_ / rawX._1)
    val d = mu.length
    require(rDims >= 1 && rDims <= d,
      s"LeanVec.trainOod: rDims $rDims out of range 1..$d")
    val mx = momentMatrix(rawX, mu)
    val mq = secondMomentAbout(queries, queryVecCol, mu)
    val joint = Array.tabulate(d, d)((i, j) => 0.5 * (mx(i)(j) + mq(i)(j)))
    var a = topEigRows(joint, rDims)
    var b = a
    val hist = scala.collection.mutable.ArrayBuffer(oodLoss(mx, mq, a, b))
    var it = 0
    while (it < iters) {
      val amx = mulRd(a, mx)
      b = solve(gram(amx, a), amx) // argmin_B given A
      hist += oodLoss(mx, mq, a, b)
      val bmq = mulRd(b, mq)
      a = solve(gram(bmq, b), bmq) // argmin_A given B
      hist += oodLoss(mx, mq, a, b)
      it += 1
    }
    OodModel(mu, a, b, hist.toArray)
  }

  /** MIPS-style augmentation making the OOD coarse score a plain inner
    * product so the certified [[FlatKnn]] heap scan runs it unchanged:
    * L2 rank = argmin ‖x̃‖² − 2·(Bq̃)ᵀ(Ax̃) (per-query ‖q̃‖² dropped), so
    * data rows become [‖x̃‖², Ax̃…] and queries [−1, 2·Bq̃…] — then
    * IP(aug_q, aug_x) = −score and DESCENDING IP is the coarse order.
    * Output (idCol, "vec"): r+1 doubles per row, one no-shuffle pass. */
  def augmentOodData(data: DataFrame, model: OodModel, idCol: String = "id",
                     vecCol: String = "vec"): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model.mean, model.projData))
    data.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (mu, p) = bc.value
        val r = p.length; val d = mu.length
        it.map { case (id, v) =>
          val out = new Array[Double](r + 1)
          var n2 = 0.0
          var i = 0
          while (i < d) { val c = v(i) - mu(i); n2 += c * c; i += 1 }
          out(0) = n2
          var aRow = 0
          while (aRow < r) {
            val row = p(aRow)
            var s = 0.0; i = 0
            while (i < d) { s += row(i) * (v(i) - mu(i)); i += 1 }
            out(aRow + 1) = s; aRow += 1
          }
          (id, out)
        }
      }
      .toDF(idCol, "vec")
  }

  /** Query-side OOD augmentation: [−1, 2·B(q−μ)…] (see [[augmentOodData]]).
    * Output (idCol, "qvec"). */
  def augmentOodQueries(queries: DataFrame, model: OodModel,
                        idCol: String = "query_id",
                        vecCol: String = "qvec"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model.mean, model.projQuery))
    queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (mu, p) = bc.value
        val r = p.length; val d = mu.length
        it.map { case (id, v) =>
          val out = new Array[Double](r + 1)
          out(0) = -1.0
          var aRow = 0
          while (aRow < r) {
            val row = p(aRow)
            var s = 0.0; var i = 0
            while (i < d) { s += row(i) * (v(i) - mu(i)); i += 1 }
            out(aRow + 1) = 2.0 * s; aRow += 1
          }
          (id, out)
        }
      }
      .toDF(idCol, "qvec")
  }

  /** Two-pass OOD search (L2): coarse scan of the augmented tables under
    * DESC inner product (= ascending L2 surrogate, [[augmentOodData]]),
    * exact re-rank of the shortlist. */
  def searchOodPrepared(augQueries: DataFrame, augData: DataFrame,
                        queries: DataFrame, fullData: DataFrame, k: Int,
                        kReorder: Int): DataFrame = {
    val shortlist = FlatKnn.search(augQueries, augData, kReorder * k,
        Metric.IP)
      .select(col("query_id"), col("neighbor_id").as("id"))
    rerank(shortlist, queries, fullData, k, Metric.L2)
  }

  /** Convenience end-to-end OOD search; for repeated searches augment +
    * cache the data side once and call [[searchOodPrepared]]. */
  def searchOod(queries: DataFrame, data: DataFrame, model: OodModel,
                k: Int, kReorder: Int): DataFrame =
    searchOodPrepared(augmentOodQueries(queries, model),
      augmentOodData(data, model), queries, data, k, kReorder)

  /** LeanVec∘LVQ composition (the reference's LeanVec4x8-style storage:
    * reduced-dimension PRIMARY codes drive the coarse scan, full precision
    * only re-ranks): `encoded` are Lvq codes of the REDUCED table; the
    * coarse pass scans the level-1 reconstruction (r-dim smallint codes —
    * never the full vectors), the reorder pass reads true vectors for the
    * shortlist only. */
  def searchLvq(queries: DataFrame, encodedReduced: DataFrame,
                lvqParams: Lvq.Params, model: Model, fullData: DataFrame,
                k: Int, kReorder: Int, metric: Metric = Metric.L2)
      : DataFrame = {
    val rq = transform(queries, model, idCol = "query_id", vecCol = "qvec",
      outCol = "qvec")
    val coarse = Lvq.decode(encodedReduced, lvqParams, twoLevel = false)
    searchPrepared(rq, coarse, queries, fullData, k, kReorder, metric)
  }
}
