package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Exhaustive k-NN join (SURVEY §2 J1) — the reference's flat index
  * (include/svs/index/flat/flat.h:321-464) re-expressed for Spark.
  *
  * Fast path (`search`): the query batch (contract: broadcast-small, exactly
  * like the reference's in-memory query matrix) is broadcast to executors;
  * each data partition is scanned once with per-query bounded heaps — the
  * analog of the reference's per-tile inserts (flat.h:338-375). Only
  * |partitions|·|Q|·k partial rows shuffle to the final merge. The big side
  * streams; nothing large shuffles or collects, so the plan survives 100 TB:
  * scan → map → tiny exchange.
  *
  * The declarative variant (`searchViaAggregate`) and the window variant
  * (`searchViaWindow`) keep the same semantics for cross-checks; all three
  * produce bit-identical output (same double fold order, ties by id).
  *
  * Input: queries(query_id, qvec), data(id, vec). Output best-first:
  * (query_id, rnk, neighbor_id, dist).
  */
object FlatKnn {

  /** Per-partition tiled scan state — the reference's flat-index tile
    * posture (include/svs/index/flat/flat.h:175,329-358) and the same
    * trick as BatchScore.probeTopKTiled: rows pack ONCE into a flat
    * structure-of-arrays tile (float32 at half, i8/u8 at an eighth of
    * the f64 bytes — widening happens per element inside the fold,
    * bit-identical to pre-widened copies; ByteKnnSpec/F32BuildSpec),
    * then each query sweeps the cache-hot tile with the metric's
    * MONOMORPHIC tile kernel ([[Metric.scoreTile]]) and a tight insert
    * pass. Rows are added in partition order and distances land in row
    * order, so heap state — and every tie-break — evolves exactly as in
    * a row-at-a-time scan: results are bit-identical to the per-row
    * sweep this replaces. `arr` accepts both UnsafeRow-backed arrays
    * (row scan) and ColumnarArray (columnar scan). */
  private final class TileScan(qIds: Array[Long],
      qVecs: Array[Array[Double]], k: Int, asc: Boolean, m: Metric,
      elKind: Char, unsigned: Boolean, bf16: Boolean = false) {
    private val isByte = elKind == 'b'
    // half rows ('h') decode into the FLOAT tile at pack time: the f16→f32
    // conversion runs once per row per scan instead of once per
    // (query, row) pair, the tile stays at half the f64 bytes, and the
    // sweep reuses the f32 kernels (incl. SIMD) unchanged. Both half
    // formats inject losslessly into f32, so results are bit-identical
    // to scanning the decoded ARRAY<FLOAT> copy (HalfKnnSpec).
    private val isHalf = elKind == 'h'
    private val isFloat = elKind == 'f' || isHalf
    private val nq = qIds.length
    private val heaps = Array.fill(nq)(new LocalTopK(k, asc))
    private val TileBytes = 1 << 18 // ≲ L2-resident per scan task
    private val elemSize = if (isByte) 1 else if (isFloat) 4 else 8
    private var d = -1
    private var cap = 0
    private var n = 0
    private var tIds: Array[Long] = null
    private var out: Array[Double] = null
    private var flat: Array[Double] = null
    private var fflat: Array[Float] = null
    private var bflat: Array[Byte] = null

    private def flush(): Unit = {
      var q = 0
      while (q < nq) {
        val qv = qVecs(q)
        // loud dims contract: the offset kernels read qv.length elements
        // at r*d — a longer query would silently read into the NEXT row
        // (the old per-row buffer crashed instead), a shorter one would
        // silently score a prefix
        require(qv.length == d,
          s"query dims ${qv.length} != data dims $d")
        val h = heaps(q)
        if (isByte) m.scoreTileB(qv, bflat, d, n, out, unsigned)
        else if (isFloat) m.scoreTileF(qv, fflat, d, n, out)
        else m.scoreTile(qv, flat, d, n, out)
        var r = 0
        while (r < n) { h.insert(out(r), tIds(r)); r += 1 }
        q += 1
      }
      n = 0
    }

    private def reinit(d0: Int): Unit = {
      d = d0
      cap = math.max(1, TileBytes / math.max(1, d * elemSize))
      tIds = new Array[Long](cap)
      out = new Array[Double](cap)
      if (isByte) bflat = new Array[Byte](cap * d)
      else if (isFloat) fflat = new Array[Float](cap * d)
      else flat = new Array[Double](cap * d)
    }

    def addRow(id: Long,
               arr: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
      val d0 = arr.numElements()
      if (d0 != d) { if (d >= 0) flush(); reinit(d0) }
      val off = n * d
      // bulk extraction: UnsafeArrayData and ColumnarArray both implement
      // toXArray as ONE memory copy, vs d virtual getX calls per row
      if (isByte) System.arraycopy(arr.toByteArray(), 0, bflat, off, d)
      else if (isHalf) {
        val bits = arr.toShortArray()
        var i = 0
        while (i < d) {
          fflat(off + i) = graft.functions.HalfVecs.decodeOne(bits(i), bf16)
          i += 1
        }
      }
      else if (isFloat) System.arraycopy(arr.toFloatArray(), 0, fflat, off, d)
      else System.arraycopy(arr.toDoubleArray(), 0, flat, off, d)
      tIds(n) = id
      n += 1
      if (n == cap) flush()
    }

    def emit(): Iterator[(Long, Long, Double)] = {
      if (n > 0) flush()
      (0 until nq).iterator.flatMap { q =>
        val h = heaps(q)
        (0 until h.n).iterator.map(i => (qIds(q), h.ids(i), h.dists(i)))
      }
    }
  }

  def search(queries: DataFrame, data: DataFrame, k: Int, metric: Metric)
      : DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    // queries from a float32 source are accepted as-is (no cast projection
    // in the plan) and widened ONCE here at collect: the query batch is
    // broadcast-small and cache-resident during the scan, so the mixed DF
    // kernel — double query loads from L1, float row loads from the scan —
    // beats the all-float FF kernel, which pays an extra per-element widen
    // per pair (measured at 1M×64-d: FF 1.81 s vs DF 1.25 s; SCALE.md).
    // computeFF stays the right kernel where BOTH sides are resident rows
    // (the f32 graph builds). Results are bit-identical either way
    // (F32BuildSpec).
    val qIsFloat = queries.schema("qvec").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val qRows =
      if (qIsFloat)
        queries.select(col("query_id").cast("long"), col("qvec")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      else
        queries.select(col("query_id").cast("long"),
            col("qvec").cast("array<double>")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qIds = qRows.map(_._1)
    val qVecs = qRows.map(_._2)
    val bc = spark.sparkContext.broadcast((qIds, qVecs))
    val asc = metric.ascending
    val m = metric

    // scan the source element type as-is: float32 vectors read half the
    // bytes (i8/u8 an eighth); widening to double happens per-register in
    // the copy loop (free) rather than in a cast projection (memory
    // traffic). u8 is ARRAY<TINYINT> carrying the ByteVecs schema mark.
    val projected =
      if (data.schema("id").dataType ==
        org.apache.spark.sql.types.LongType)
        data.select(col("id"), col("vec")) // no-op cast would block the
      else                                 // columnar scan below
        data.select(col("id").cast("long"), col("vec"))
    val elKind = projected.schema("vec").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => 'f'
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => 'd'
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, _) => 'b'
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ShortType, _) => 'h'
      case t => sys.error(
        s"vec must be ARRAY<FLOAT|DOUBLE|TINYINT|SMALLINT>, got $t")
    }
    val isByte = elKind == 'b'
    // byte rows dispatch on DECLARED signedness only — a bare byte table
    // is ambiguous (mark-stripped u8 ≡ i8 by values) and fails loudly
    val unsigned =
      if (isByte) graft.functions.ByteVecs.requireSignedness(
        data.schema, "vec")
      else false
    // half rows ('h') likewise dispatch on the DECLARED format only —
    // f16 and bf16 bit patterns decode to different values, so a bare
    // ARRAY<SMALLINT> fails loudly (HalfVecs mark contract)
    val bf16 =
      elKind == 'h' && graft.functions.HalfVecs.requireFormat(
        data.schema, "vec") == graft.functions.HalfVecs.BF16

    // Pre-scan width (guide §2 map-side parallelism; the r16-verdict
    // prescription applied to the distance scan): the tile sweep is the
    // query's CPU, and its parallelism is bounded by the INPUT's
    // partition count — a single-row-group corpus (or its cached memo,
    // which keeps the scan partitioning) runs the whole sweep on 1-3 of
    // the session's cores. When the input is narrower than the session
    // parallelism, hash-repartition on `id` BEFORE the sweep: ids are
    // unique (the table contract), so the spread is even, hash
    // partitioning needs no sort-before-repartition pass, and per-query
    // results are partition-invariant (per-partition heaps + the exact
    // id-tiebroken window merge). At real scale the scan already carries
    // ≥ parallelism splits and this is a no-op — the columnar fast path
    // below is then untouched. Uncached and operator-local (no
    // cross-query cached state — the r16 regression mechanism).
    // Size-gated (the r16 lesson: widening frames whose serial sweep is
    // already trivial only adds an exchange + AQE materialization per
    // call — e.g. a 2 000-row code table probed once per calibration
    // dial). The optimizer's size estimate is exact for materialized
    // cached relations and the column-pruned file-size estimate for cold
    // scans — the latter UNDERESTIMATES decoded width, so the threshold
    // is deliberately low: 1 MB keeps sub-second probe frames serial
    // while every corpus-sized sweep (cold or cached) widens.
    val want = spark.sparkContext.defaultParallelism
    val WidenMinBytes = 1L << 20
    def estBytes: BigInt =
      projected.queryExecution.optimizedPlan.stats.sizeInBytes
    val widened =
      if (projected.rdd.getNumPartitions >= want ||
          estBytes < WidenMinBytes) projected
      else projected.repartition(want, col("id"))

    // Two physical scan shapes over the same tile logic ([[TileScan]]):
    //  - columnar: when the executed plan emits ColumnarBatches (parquet
    //    vectorized reader, id already BIGINT), rows are read straight off
    //    the column vectors — no ColumnarToRow conversion, no per-row
    //    UnsafeRow materialization, the scan's largest fixed cost.
    //  - row: anything else (in-memory frames, casts, filters) through the
    //    usual InternalRow iterator.
    // Both feed rows in partition order into identical tiles, so results
    // are bit-identical.
    // unwrap the row-conversion shell: a pruned parquet scan executes
    // columnar (`Batched: true`) but arrives as
    // WholeStageCodegen(ColumnarToRow(InputAdapter(Scan))) — peel the
    // pass-through wrappers (they add no compute) down to the columnar
    // node, and use it only when its output is exactly our (id, vec)
    import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter,
      WholeStageCodegenExec}
    @scala.annotation.tailrec
    def columnarSource(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.SparkPlan] = p match {
      case WholeStageCodegenExec(child)    => columnarSource(child)
      case ColumnarToRowExec(child)        => columnarSource(child)
      case InputAdapter(child)             => columnarSource(child)
      case s if s.supportsColumnar         => Some(s)
      case _                               => None
    }
    val exec = widened.queryExecution.executedPlan
    val colSrc = columnarSource(exec).filter { s =>
      s.output.length == 2 &&
        s.output(0).dataType == org.apache.spark.sql.types.LongType &&
        s.output(1).dataType == widened.schema("vec").dataType
    }
    val partials = (
      if (colSrc.isDefined)
        colSrc.get.executeColumnar().mapPartitions { batches =>
          val (ids, vecs) = bc.value
          val ts = new TileScan(ids, vecs, k, asc, m, elKind, unsigned, bf16)
          while (batches.hasNext) {
            val batch = batches.next()
            val idCol = batch.column(0)
            val vecCol = batch.column(1)
            val nR = batch.numRows()
            var r = 0
            while (r < nR) {
              if (!idCol.isNullAt(r) && !vecCol.isNullAt(r))
                ts.addRow(idCol.getLong(r), vecCol.getArray(r))
              r += 1
            }
          }
          ts.emit()
        }
      else
        widened.queryExecution.toRdd.mapPartitions { iter =>
          val (ids, vecs) = bc.value
          val ts = new TileScan(ids, vecs, k, asc, m, elKind, unsigned, bf16)
          while (iter.hasNext) {
            val row = iter.next()
            if (!row.isNullAt(0) && !row.isNullAt(1))
              ts.addRow(row.getLong(0), row.getArray(1))
          }
          ts.emit()
        }
      ).toDF("query_id", "id", "dist")
    // final merge: |partitions|·|Q|·k rows — window rank is exact and cheap
    TopK.perKeyViaWindow(partials, Seq("query_id"), col("id"), col("dist"), k,
      asc)
  }

  /** Declarative reference: broadcast NL join + bounded top-k aggregate. */
  def searchViaAggregate(queries: DataFrame, data: DataFrame, k: Int,
                         metric: Metric): DataFrame = {
    val pairs = broadcast(queries).crossJoin(data)
      .select(col("query_id"), col("id"),
        metric.column(col("qvec"), col("vec")).as("dist"))
    TopK.perKey(pairs, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** Window-rank reference semantics (shuffles all pairs) — oracle shape. */
  def searchViaWindow(queries: DataFrame, data: DataFrame, k: Int,
                      metric: Metric): DataFrame = {
    val pairs = broadcast(queries).crossJoin(data)
      .select(col("query_id"), col("id"),
        metric.column(col("qvec"), col("vec")).as("dist"))
    TopK.perKeyViaWindow(pairs, Seq("query_id"), col("id"), col("dist"), k,
      metric.ascending)
  }

  /** Unit-normalize the data side at ingest (zero vectors pass through).
    * At scale this runs once and persists — every subsequent cosine search
    * then pays one fused multiply-add chain per pair instead of three
    * accumulators + two sqrts. */
  def normalizeData(data: DataFrame): DataFrame =
    data.withColumn("vec",
      graft.functions.VectorFunctions.normalize(col("vec")))

  /** Cosine top-k via the reference's fixed-argument optimization
    * (core/distance/cosine.h:102,204 `maybe_fix_argument`): with the data
    * side unit-normalized, per-query cosine ordering equals inner-product
    * ordering (cos(q,d) = ip(q, d/|d|)/|q| and |q| is constant within a
    * query), so the top-k ids and ranks match the direct cosine scan while
    * the hot loop drops the norms and sqrts. The returned `dist` is the
    * inner product against the normalized row — cosine scaled by |q|;
    * divide by `l2Norm(qvec)` once per query if the true value is needed.
    * REQUIRES unique query_ids: with duplicate ids the per-row |q| scale
    * factors differ, so merged candidates stop being cosine-comparable
    * (DistanceSpec exercises exactly this). Production pipelines persist
    * [[normalizeData]]'s output and call `search(..., Metric.IP)`
    * directly. */
  def searchCosineNormalized(queries: DataFrame, data: DataFrame, k: Int)
      : DataFrame =
    search(queries, normalizeData(data), k, Metric.IP)

  /** Search excluding a tombstone set (SURVEY §2 P8 soft-delete filter):
    * anti-join data against `tombstones(id)` before the scan — predicate
    * pushdown into kNN, free in Spark. */
  def searchWithTombstones(queries: DataFrame, data: DataFrame,
                           tombstones: DataFrame, k: Int, metric: Metric)
      : DataFrame =
    search(queries, data.join(tombstones, Seq("id"), "left_anti"), k, metric)
}
