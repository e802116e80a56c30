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
    val projected = data.select(col("id").cast("long"), col("vec"))
    val elKind = projected.schema("vec").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => 'f'
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => 'd'
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, _) => 'b'
      case t => sys.error(s"vec must be ARRAY<FLOAT|DOUBLE|TINYINT>, got $t")
    }
    val isFloat = elKind == 'f'
    val isByte = elKind == 'b'
    // byte rows dispatch on DECLARED signedness only — a bare byte table
    // is ambiguous (mark-stripped u8 ≡ i8 by values) and fails loudly
    val unsigned =
      if (isByte) graft.functions.ByteVecs.requireSignedness(
        data.schema, "vec")
      else false

    val partials = projected
      .queryExecution.toRdd
      .mapPartitions { iter =>
        val (ids, vecs) = bc.value
        val nq = ids.length
        val heaps = Array.fill(nq)(new LocalTopK(k, asc))
        // float32 rows stay float through the kernel: computeDF widens per
        // element inside the fold, bit-identical to widening the buffer
        // first (F32BuildSpec), with half the buffer bytes — and the SIMD
        // mixed kernel runs ~2x the f64 SIMD rate (KernelBench)
        var buf: Array[Double] = null
        var fbuf: Array[Float] = null
        var bbuf: Array[Byte] = null
        while (iter.hasNext) {
          val row = iter.next()
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val id = row.getLong(0)
            val arr = row.getArray(1)
            val d = arr.numElements()
            var q = 0
            if (isByte) {
              // i8/u8 rows stay bytes through the kernel: computeDB widens
              // per element (sign-extend or & 0xFF) inside the fold —
              // bit-identical to widening first (ByteKnnSpec), 1/8 the bytes
              if (bbuf == null || bbuf.length != d) bbuf = new Array[Byte](d)
              var i = 0
              while (i < d) { bbuf(i) = arr.getByte(i); i += 1 }
              while (q < nq) {
                heaps(q).insert(m.computeDB(vecs(q), bbuf, unsigned), id)
                q += 1
              }
            } else if (isFloat) {
              if (fbuf == null || fbuf.length != d) fbuf = new Array[Float](d)
              var i = 0
              while (i < d) { fbuf(i) = arr.getFloat(i); i += 1 }
              while (q < nq) {
                heaps(q).insert(m.computeDF(vecs(q), fbuf), id)
                q += 1
              }
            } else {
              if (buf == null || buf.length != d) buf = new Array[Double](d)
              var i = 0
              while (i < d) { buf(i) = arr.getDouble(i); i += 1 }
              while (q < nq) {
                heaps(q).insert(m.compute(vecs(q), buf), id)
                q += 1
              }
            }
          }
        }
        (0 until nq).iterator.flatMap { q =>
          val h = heaps(q)
          (0 until h.n).iterator.map(i => (ids(q), h.ids(i), h.dists(i)))
        }
      }
      .toDF("query_id", "id", "dist")
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
