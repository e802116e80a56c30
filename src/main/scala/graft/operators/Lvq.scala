package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-level residual scalar quantization — "LVQ-style", implemented from
  * the public-paper semantics (locally-adaptive vector quantization,
  * Aguerrebere et al., PVLDB 16(11), 2023): center on the dataset mean,
  * scalar-quantize each vector with its OWN per-vector affine codec
  * (level 1), then quantize the per-vector residual the same way (level 2).
  * The reference ships this closed-source (README.md:36 — only the API is
  * public), so this is a from-the-paper implementation, not a port.
  *
  * Layout: `(id, c1 ARRAY<SMALLINT>, lo1, s1, c2 ARRAY<SMALLINT>, lo2, s2)`
  * — per-vector scales ride along as two doubles per level, the paper's
  * footer. Level-1 alone is the fast-scan dataset (bits1 bytes-ish per dim);
  * level-2 refines re-ranking without ever touching full precision.
  *
  * All arithmetic is deterministic and engine-portable: the mean is
  * 6-decimal-rounded (summation-order-proof), per-vector min/max are exact,
  * and encode/decode are pure per-element affine maps — so a DuckDB oracle
  * reproduces the codes bit-for-bit (q52).
  */
object Lvq {

  case class Params(mean: Seq[Double], bits1: Int = 8, bits2: Int = 8)

  /** Dataset mean, rounded to 6 decimals for cross-engine determinism. */
  def trainMean(data: DataFrame, vecCol: String = "vec"): Seq[Double] =
    data.select(posexplode(col(vecCol)))
      .groupBy("pos").agg(round(avg("col"), 6).as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2).toIndexedSeq

  private def levels(bits: Int): Double = ((1 << bits) - 1).toDouble

  /** data(id, vec) → the two-level code table. Constant (zero-range) inputs
    * fall back to scale 1 (codes 0), like ScalarQuant.train. A typed JVM
    * kernel, not nested higher-order functions: the per-vector two-level
    * chain re-inlines exponentially as Catalyst expressions (minutes of
    * planning for 64 dims), while one tight loop is both exact and fast. */
  def encode(data: DataFrame, p: Params): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val mu = p.mean.toArray
    val l1 = levels(p.bits1)
    val l2 = levels(p.bits2)
    data.select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val d = v.length
        val u = new Array[Double](d)
        var i = 0
        while (i < d) { u(i) = v(i) - mu(i); i += 1 }
        var lo1 = u(0); var hi1 = u(0)
        i = 1
        while (i < d) {
          if (u(i) < lo1) lo1 = u(i); if (u(i) > hi1) hi1 = u(i); i += 1 }
        val s1 = if (hi1 > lo1) (hi1 - lo1) / l1 else 1.0
        val c1 = new Array[Short](d)
        val r = new Array[Double](d)
        i = 0
        while (i < d) {
          val c = math.floor((u(i) - lo1) / s1 + 0.5)
          c1(i) = c.toShort
          r(i) = u(i) - (lo1 + s1 * c)
          i += 1
        }
        var lo2 = r(0); var hi2 = r(0)
        i = 1
        while (i < d) {
          if (r(i) < lo2) lo2 = r(i); if (r(i) > hi2) hi2 = r(i); i += 1 }
        val s2 = if (hi2 > lo2) (hi2 - lo2) / l2 else 1.0
        val c2 = new Array[Short](d)
        i = 0
        while (i < d) {
          c2(i) = math.floor((r(i) - lo2) / s2 + 0.5).toShort; i += 1 }
        (id, c1, lo1, s1, c2, lo2, s2)
      }
      .toDF("id", "c1", "lo1", "s1", "c2", "lo2", "s2")
  }

  /** Reconstruction from codes: level-1 only (`twoLevel = false`, the fast
    * scan dataset) or level-1 + residual (re-ranking precision). The op
    * order (m + (lo1 + s1·c1), then + (lo2 + s2·c2)) matches the oracle's
    * SQL exactly for bit-identical doubles. */
  def decode(encoded: DataFrame, p: Params, twoLevel: Boolean): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val mu = p.mean.toArray
    val two = twoLevel
    encoded.select(col("id").cast("long"), col("c1"), col("lo1"), col("s1"),
        col("c2"), col("lo2"), col("s2"))
      .as[(Long, Array[Short], Double, Double, Array[Short], Double, Double)]
      .map { case (id, c1, lo1, s1, c2, lo2, s2) =>
        val d = c1.length
        val out = new Array[Double](d)
        var i = 0
        while (i < d) {
          val d1 = mu(i) + (lo1 + s1 * c1(i))
          out(i) = if (two) d1 + (lo2 + s2 * c2(i)) else d1
          i += 1
        }
        (id, out)
      }
      .toDF("id", "vec")
  }

  /** Exploded integer codes for oracle hashing: (id, pos, code1, code2). */
  def encodeExploded(data: DataFrame, p: Params): DataFrame =
    encode(data, p)
      .select(col("id"), posexplode(arrays_zip(col("c1"), col("c2"))))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col.c1").cast("long").as("code1"),
        col("col.c2").cast("long").as("code2"))

  /** Compressed kNN (the paper's two-pass search): coarse exhaustive rank on
    * the level-1 reconstruction keeps `kReorder·k` candidates, then the
    * two-level reconstruction re-ranks exactly those — full precision is
    * never read. L2. Output: (query_id, rnk, neighbor_id, dist). */
  def search(queries: DataFrame, encoded: DataFrame, p: Params, k: Int,
             kReorder: Int): DataFrame = {
    val d1 = decode(encoded, p, twoLevel = false)
    val shortlist = FlatKnn.search(queries, d1, kReorder * k, graft.core
        .Metric.L2)
      .select(col("query_id"), col("neighbor_id").as("id"))
    val d2 = decode(encoded, p, twoLevel = true)
    val fine = shortlist
      .join(d2, Seq("id"))
      .join(queries.select("query_id", "qvec"), Seq("query_id"))
      .select(col("query_id"), col("id"),
        graft.core.Metric.L2.column(col("qvec"), col("vec")).as("dist"))
    TopK.perKeyViaWindow(fine, Seq("query_id"), col("id"), col("dist"), k,
      ascending = true)
  }
}
