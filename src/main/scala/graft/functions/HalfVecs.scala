package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, Metadata,
  MetadataBuilder, ShortType, StructType}

/** f16/bf16-RESIDENT vector columns — the last element-type residency
  * rung after f32 (ARRAY<FLOAT>) and i8/u8 (ARRAY<TINYINT>). The
  * reference serves float16 datasets natively in its kernels
  * (include/svs/core/distance/euclidean.h:88-105 widens each half to
  * f32 at the point of use and accumulates in f32; lib/float16.h,
  * lib/bfloat16.h), and f16 embedding dumps are the common 100 TB case:
  * residency halves the scan bytes of f32 and quarters f64.
  *
  * Representation: `ARRAY<SMALLINT>` holding the RAW BIT PATTERNS, with
  * a schema-level metadata mark ([[FormatKey]] = `"f16"` | `"bf16"`)
  * that kernels read to pick the decode — the exact posture of
  * [[ByteVecs]]' u8 mark. A bare SMALLINT array is ambiguous (it could
  * be integer i16 data, or either half format), so kernel dispatch
  * REQUIRES the mark and fails loudly without it; every half table
  * states its format once at creation (codec encode, hvecs/npy-f2
  * ingest) and the declaration travels the schema from there.
  *
  * Serving decodes each half to float32 exactly (both formats inject
  * losslessly into f32), so half-resident results are bit-identical to
  * serving the decoded ARRAY<FLOAT> copy — HalfKnnSpec pins this. */
object HalfVecs {

  /** Schema-metadata key marking an ARRAY<SMALLINT> column as half-float
    * raw bits; value is the format name, `"f16"` or `"bf16"`. */
  val FormatKey = "graft_half"

  val F16 = "f16"
  val BF16 = "bf16"

  def isShortVec(dt: DataType): Boolean = dt match {
    case ArrayType(ShortType, _) => true
    case _                       => false
  }

  /** The column's declared half format: Some("f16"|"bf16") when marked,
    * None for a bare short column (or a non-short column). */
  def formatOf(schema: StructType, colName: String): Option[String] = {
    val f = schema(colName)
    if (isShortVec(f.dataType) && f.metadata.contains(FormatKey))
      Some(f.metadata.getString(FormatKey))
    else None
  }

  def isHalf(schema: StructType, colName: String): Boolean =
    formatOf(schema, colName).isDefined

  /** Attach the half-format mark to `colName` (call after any transform
    * that rebuilt the column — metadata survives most plan nodes but not
    * arbitrary rewrites). */
  def markHalf(df: DataFrame, format: String,
               colName: String = "vec"): DataFrame = {
    require(format == F16 || format == BF16,
      s"half format must be '$F16' or '$BF16', got '$format'")
    val md: Metadata = new MetadataBuilder()
      .withMetadata(df.schema(colName).metadata)
      .putString(FormatKey, format).build()
    df.withColumn(colName, col(colName).as(colName, md))
  }

  /** Kernel-dispatch resolution for a half vec column — the loud half of
    * the contract: a half table whose mark was stripped is
    * indistinguishable from i16 data (or the other half format) by
    * values alone, so ambiguity is an error, not a default. */
  def requireFormat(schema: StructType, colName: String): String =
    formatOf(schema, colName).getOrElse(sys.error(
      s"short vec column '$colName' carries no half-format mark — an " +
        "unmarked ARRAY<SMALLINT> is ambiguous (f16 and bf16 bit " +
        "patterns decode to different values). Declare it with " +
        "HalfVecs.markHalf(df, \"f16\"|\"bf16\"), or reopen the stored " +
        "layout, which restores the mark from its sidecar."))

  /** Encode an ARRAY<FLOAT|DOUBLE> frame to half residency through the
    * certified codec expressions (q45) and mark it. */
  def toHalf(df: DataFrame, format: String,
             colName: String = "vec"): DataFrame = {
    val enc = format match {
      case F16  => HalfFloat.float16Encode(col(colName))
      case BF16 => HalfFloat.bfloat16Encode(col(colName))
      case f    => sys.error(s"half format must be '$F16' or '$BF16', got '$f'")
    }
    markHalf(df.withColumn(colName, enc), format, colName)
  }

  /** Decode raw bits back to ARRAY<FLOAT> with the format's certified
    * decode expression — the declarative twin of the kernels' per-element
    * widen. */
  def widen(v: Column, format: String): Column = format match {
    case F16  => HalfFloat.float16Decode(v)
    case BF16 => HalfFloat.bfloat16Decode(v)
    case f    => sys.error(s"half format must be '$F16' or '$BF16', got '$f'")
  }

  /** `df` with `vecCol` decoded to ARRAY<DOUBLE> iff it is half-resident
    * — the mark-aware entry point for VALUE arithmetic (means, codec
    * attachment), mirroring [[ByteVecs.widenedForMath]]. Non-short frames
    * pass through untouched. */
  def widenedForMath(df: DataFrame, vecCol: String = "vec"): DataFrame =
    formatOf(df.schema, vecCol) match {
      case Some(fmt) => df.withColumn(vecCol,
        widen(col(vecCol), fmt).cast("array<double>"))
      case None =>
        require(!isShortVec(df.schema(vecCol).dataType),
          s"short vec column '$vecCol' carries no half-format mark")
        df
    }

  /** JVM decode of one half element — the kernels' widen-at-use. Exact:
    * every f16 and bf16 value injects losslessly into float32. */
  def decodeOne(bits: Short, bf16: Boolean): Float =
    if (bf16) java.lang.Float.intBitsToFloat((bits & 0xffff) << 16)
    else Binary16.halfToFloat(bits)
}
