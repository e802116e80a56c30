package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Elementwise vector mean with map-side partial merge — the shuffle moves
  * one (sum, count) pair per group instead of N·D exploded rows. Used by
  * Lloyd's recompute step and the medioid mean (SURVEY §2 A2/A5). */
case class VecAvgBuf(var sum: Array[Double], var n: Long)

class VectorAvgAggregator(dims: Int)
    extends Aggregator[Seq[Double], VecAvgBuf, Seq[Double]] {
  override def zero: VecAvgBuf = VecAvgBuf(new Array[Double](dims), 0L)
  override def reduce(b: VecAvgBuf, v: Seq[Double]): VecAvgBuf = {
    var i = 0; while (i < dims) { b.sum(i) += v(i); i += 1 }
    b.n += 1; b
  }
  override def merge(a: VecAvgBuf, c: VecAvgBuf): VecAvgBuf = {
    var i = 0; while (i < dims) { a.sum(i) += c.sum(i); i += 1 }
    a.n += c.n; a
  }
  override def finish(b: VecAvgBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sum.toSeq.map(_ / b.n)
  override def bufferEncoder: Encoder[VecAvgBuf] = Encoders.product[VecAvgBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** K-means operators (SURVEY §2 A2-A4): map-only assignment against a small
  * broadcast centroid set + Lloyd's training loop. Mirrors the reference's
  * minibatch k-means (include/svs/index/ivf/kmeans.h:29-130) where batch
  * assignment distances are one GEMM — here the per-row fold over a literal
  * centroid array stays inside whole-stage codegen, no shuffle at all. */
object KMeans {

  /** Per-cluster 6-decimal-rounded elementwise means via the EXACT
    * posexplode / round(avg, 6) fold the DuckDB oracles replay
    * (`round(avg(v_i), 6)` per dimension) — ONE definition shared by the
    * label-centroid builders and both store upserts' centroid refresh
    * (GraphLayout.upsert, IndexLayout.upsert/repair), so the
    * upsert ≡ from-scratch and Spark ≡ oracle equalities cannot drift on
    * a rounding or fold change. Input must be VALUE-space (`vec`
    * ARRAY<numeric>; byte/half-resident frames widen first). */
  def roundedMeans(clustered: DataFrame): Seq[(Long, Seq[Double])] =
    clustered
      .select(col("cluster_id").cast("long").as("cluster_id"),
        posexplode(col("vec")))
      .groupBy("cluster_id", "pos").agg(round(avg("col"), 6).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (cid, xs) =>
        cid -> (xs.sortBy(_._2).map(_._3).toIndexedSeq: Seq[Double]) }
      .toIndexedSeq.sortBy(_._1)

  /** Argmin-centroid as a pure projection (codegen'd NearestCentroid
    * expression; strict `<` so ties break to the lowest cid). Scales to any
    * data size: the only data movement is the scan itself. */
  def assignColumn(vec: Column, centroids: Seq[(Long, Seq[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.NearestCentroid(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec),
        sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray))
  }

  /** data(id, vec) → data + cluster_id. Byte-resident tables
    * (`ARRAY<TINYINT>`, i8 or the ByteVecs u8 mark) assign through a
    * declarative exact widen feeding the same codegen'd expression — the
    * original byte column is untouched in the output, so downstream
    * storage (GraphLayout.write) stays byte-resident; the widen cost is
    * confined to this one build-time scan. */
  def assign(data: DataFrame, centroids: Seq[(Long, Seq[Double])],
             vecCol: String = "vec"): DataFrame = {
    val scoreVec =
      if (graft.functions.ByteVecs.isByteVec(data.schema(vecCol).dataType))
        graft.functions.ByteVecs.widen(col(vecCol),
          graft.functions.ByteVecs.requireSignedness(data.schema, vecCol))
      else if (graft.functions.HalfVecs.isShortVec(
          data.schema(vecCol).dataType))
        // half-resident tables decode through the certified codec — the
        // original short column stays untouched in the output
        graft.functions.HalfVecs.widen(col(vecCol),
          graft.functions.HalfVecs.requireFormat(data.schema, vecCol))
          .cast("array<double>")
      else col(vecCol)
    data.withColumn("cluster_id", assignColumn(scoreVec, centroids))
  }

  /** Byte inputs widened for VALUE arithmetic (means, raw distances) —
    * delegates to the shared mark-aware helper. */
  private def widenedForMath(df: DataFrame, vecCol: String): DataFrame =
    graft.functions.HalfVecs.widenedForMath(
      graft.functions.ByteVecs.widenedForMath(df, vecCol), vecCol)

  /** Lloyd's iterations: assign (map-only) then per-cluster mean (one
    * partial-merged aggregate). Empty clusters keep their previous centroid.
    * Returns final centroids; `data` is scanned `iters` times — at 100 TB
    * callers should pass a sampled training fraction, as the reference does
    * (training_fraction, ivf/common.h:30-36). */
  def lloyd(data0: DataFrame, init: Seq[(Long, Seq[Double])], iters: Int,
            dims: Int, vecCol: String = "vec",
            roundTo: Int = -1): Seq[(Long, Seq[Double])] = {
    val data = widenedForMath(data0, vecCol)
    val avgAgg = udaf(new VectorAvgAggregator(dims))
    // `roundTo >= 0` rounds each mean element (HALF_UP, the same semantics
    // as Spark SQL / DuckDB round) so another engine summing the same values
    // in a different order lands on identical centroids — the cross-engine
    // determinism trick used for label centroids/medioid (round(avg, 6))
    def r(x: Double): Double =
      if (roundTo < 0) x
      else BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    var cents = init
    for (_ <- 0 until iters) {
      val assigned = assign(data, cents, vecCol)
      val means = assigned.groupBy("cluster_id")
        .agg(avgAgg(col(vecCol)).as("mean"))
        .collect()
        .map(row => row.getLong(0) -> row.getSeq[Double](1).map(r))
        .toMap
      cents = cents.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    cents
  }

  /** Hierarchical (two-level) assignment (SURVEY §2 A3 — reference
    * index/ivf/hierarchical_kmeans.h): rows go to a level-1 centroid, then to
    * the nearest level-2 seed *within that group*. Seeds are themselves rows
    * (id, vec); a group with no seed yields l2_cluster = -1. Scale shape: the
    * per-group argmin is a broadcast join on l1_cluster followed by a
    * map-side-combined min aggregate — data is scanned once, and the shuffle
    * carries one row per (id). */
  def hierarchicalAssign(data0: DataFrame, l1: Seq[(Long, Seq[Double])],
                         l2Seeds0: DataFrame): DataFrame = {
    val data = widenedForMath(data0, "vec")
    val l2Seeds = widenedForMath(l2Seeds0, "vec")
    val l1Assigned = assign(data, l1)
      .withColumnRenamed("cluster_id", "l1_cluster")
    val seedsAssigned = assign(
        l2Seeds.select(col("id").as("seed_id"), col("vec").as("seed_vec")),
        l1, vecCol = "seed_vec")
      .withColumnRenamed("cluster_id", "l1_cluster")
    val pairs = l1Assigned.join(broadcast(seedsAssigned), Seq("l1_cluster"),
        "left")
      .select(col("id"), col("l1_cluster"),
        when(col("seed_id").isNull, lit(-1L)).otherwise(col("seed_id"))
          .as("seed_id"),
        when(col("seed_id").isNull, lit(0.0))
          .otherwise(graft.functions.VectorFunctions
            .l2Distance(col("vec"), col("seed_vec"))).as("sdist"))
    pairs.groupBy("id", "l1_cluster")
      .agg(min(struct(col("sdist"), col("seed_id"))).as("best"))
      .select(col("id"), col("l1_cluster"),
        col("best.seed_id").as("l2_cluster"))
  }

  /** Sum of squared distances to the assigned centroid (training metric). */
  def inertia(data0: DataFrame, cents: Seq[(Long, Seq[Double])],
              vecCol: String = "vec"): Double = {
    val data = widenedForMath(data0, vecCol)
    val centArr = array(cents.sortBy(_._1).map { case (cid, cvec) =>
      struct(lit(cid).as("cid"), typedlit(cvec).as("cvec"))
    }: _*)
    val init = lit(Double.PositiveInfinity)
    val best = aggregate(centArr, init, (acc, c) =>
      least(acc, VectorFunctions.l2Distance(col(vecCol), c.getField("cvec"))))
    data.select(sum(best).as("i")).head.getDouble(0)
  }
}
