package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SURVEY §2 P6/A6): affine codec
  * `code = round((v - bias)/scale)`, `decode = scale*code + bias`, with
  * (scale, bias) derived from a global min/max scan — mirrors the reference's
  * SQDataset (include/svs/quantization/scalar/scalar.h:38-44,454-455).
  * `floor(x + 0.5)` is used instead of round() so the half-up behavior is
  * identical across engines for the non-negative normalized domain. */
object ScalarQuant {

  case class Params(scale: Double, bias: Double, bits: Int)

  /** One full scan; min/max are exact (order-insensitive), so the derived
    * codec is deterministic. */
  def train(data: DataFrame, vecCol: String = "vec", bits: Int = 8): Params = {
    val row = data.agg(
      min(array_min(col(vecCol))).as("lo"),
      max(array_max(col(vecCol))).as("hi")).head
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    val levels = (1 << bits) - 1
    // constant data (hi == lo) would give scale = 0 and NaN codes from the
    // 0/0 in encodeColumn; scale 1 encodes every value to code 0 instead
    val scale = if (hi > lo) (hi - lo) / levels else 1.0
    Params(scale = scale, bias = lo, bits = bits)
  }

  def encodeColumn(vec: Column, p: Params): Column =
    transform(vec, v =>
      floor((v - lit(p.bias)) / lit(p.scale) + lit(0.5)).cast("long"))

  def decodeColumn(codes: Column, p: Params): Column =
    transform(codes, c => lit(p.scale) * c + lit(p.bias))

  /** data(id, vec) → (id, codes ARRAY<BIGINT>). */
  def encode(data: DataFrame, p: Params): DataFrame =
    data.select(col("id"), encodeColumn(col("vec"), p).as("codes"))

  /** Exploded integer form for oracle hashing: (id, pos BIGINT, code). */
  def encodeExploded(data: DataFrame, p: Params): DataFrame =
    encode(data, p).select(col("id"), posexplode(col("codes")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col").as("code"))

  /** Distance-on-compressed kNN (the reference's decode-free shortcut,
    * quantization/scalar/scalar.h:58-130): under the shared affine codec,
    * L2(decode(a), decode(b)) = scale² · Σ(codeA−codeB)², so ranking on raw
    * code distances is exact — queries are encoded with the same codec and
    * searched directly against the code table; reported `dist` is rescaled
    * to the decoded metric. L2 only (IP/cosine need the bias cross-terms —
    * decode first for those). */
  def searchQuantized(queries: DataFrame, encoded: DataFrame, p: Params,
                      k: Int): DataFrame = {
    val encQ = queries.select(col("query_id"),
      encodeColumn(col("qvec"), p).cast("array<double>").as("qvec"))
    val encD = encoded.select(col("id"),
      col("codes").cast("array<double>").as("vec"))
    FlatKnn.search(encQ, encD, k, graft.core.Metric.L2)
      .withColumn("dist", col("dist") * lit(p.scale * p.scale))
  }
}
