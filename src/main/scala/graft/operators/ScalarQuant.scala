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
    * to the decoded metric. L2 path; IP/cosine use [[searchOnCodes]]. */
  def searchQuantized(queries: DataFrame, encoded: DataFrame, p: Params,
                      k: Int): DataFrame = {
    val encQ = queries.select(col("query_id"),
      encodeColumn(col("qvec"), p).cast("array<double>").as("qvec"))
    val encD = encoded.select(col("id"),
      col("codes").cast("array<double>").as("vec"))
    FlatKnn.search(encQ, encD, k, graft.core.Metric.L2)
      .withColumn("dist", col("dist") * lit(p.scale * p.scale))
  }

  /** Code table with per-row code sums — the sidecar scalars that make the
    * IP/cosine bias cross-terms computable without decoding:
    * (id, codes, csum = Σc, csumsq = Σc²). */
  def encodeWithSums(data: DataFrame, p: Params): DataFrame =
    encode(data, p).select(col("id"), col("codes"),
      aggregate(col("codes"), lit(0L), (a, c) => a + c).as("csum"),
      aggregate(col("codes"), lit(0L), (a, c) => a + c * c).as("csumsq"))

  /** Decode-free inner-product / cosine on codes (the reference's SQDataset
    * supports every metric over codes, scalar.h:58-130): with
    * dec(x) = s·x + b,
    *
    *   IP(dec a, dec b)  = s²·dot(a,b) + s·b·(Σa + Σb) + d·b²
    *   ‖dec v‖²          = s²·Σv² + 2·s·b·Σv + d·b²
    *
    * so both metrics need only the integer code dot product plus the
    * precomputed per-row sums from [[encodeWithSums]] — full precision is
    * never read. The dot runs through the codegen'd InnerProduct kernel;
    * ranking is exact under the shared codec (identical algebra on both
    * sides of the oracle). Output: (query_id, rnk, neighbor_id, dist) with
    * dist the decoded-space similarity, best (largest) first. */
  def searchOnCodes(queries: DataFrame, encodedS: DataFrame, p: Params,
                    k: Int, metric: graft.core.Metric): DataFrame = {
    import graft.core.Metric
    require(metric == Metric.IP || metric == Metric.Cosine,
      s"searchOnCodes handles IP/cosine; use searchQuantized for L2")
    val s = p.scale
    val b = p.bias
    val qdf = queries.select(col("query_id"),
        encodeColumn(col("qvec"), p).as("qcodes"))
      .withColumn("qsum", aggregate(col("qcodes"), lit(0L), (a, c) => a + c))
      .withColumn("qsumsq",
        aggregate(col("qcodes"), lit(0L), (a, c) => a + c * c))
    val pairs = broadcast(qdf).crossJoin(
      encodedS.select(col("id"), col("codes"), col("csum"), col("csumsq")))
    val d = size(col("codes")).cast("double")
    val dot = Metric.IP.column(col("qcodes").cast("array<double>"),
      col("codes").cast("array<double>"))
    val ip = lit(s * s) * dot +
      lit(s * b) * (col("qsum") + col("csum")) + d * lit(b * b)
    val dist = metric match {
      case Metric.IP => ip
      case _ =>
        val qn = sqrt(lit(s * s) * col("qsumsq") +
          lit(2 * s * b) * col("qsum") + d * lit(b * b))
        val vn = sqrt(lit(s * s) * col("csumsq") +
          lit(2 * s * b) * col("csum") + d * lit(b * b))
        ip / (qn * vn)
    }
    TopK.perKeyViaWindow(
      pairs.select(col("query_id"), col("id"), dist.as("dist")),
      Seq("query_id"), col("id"), col("dist"), k, ascending = false)
  }
}
