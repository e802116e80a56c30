package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, Metadata,
  MetadataBuilder, StructType}

/** i8/u8 vector columns — datatype parity with the reference's int8 and
  * uint8 datasets (include/svs/lib/datatype.h:53-66, flat/flat.h:41-71
  * runs the same search templates over them).
  *
  * Representation: `ARRAY<TINYINT>` in both cases. Spark has no unsigned
  * type, so u8 stores the RAW BIT PATTERN (200 → byte −56) and the
  * column carries a schema-level metadata mark ([[UnsignedKey]]) that
  * the kernels read to widen with `& 0xFF` instead of sign extension —
  * the Spark analog of the reference's DataType enum traveling with the
  * dataset. The mark rides the schema through select/join/parquet
  * round-trips, so dispatch sites never need an extra parameter.
  *
  * Quantization helpers are plain codegen'd column expressions
  * (`floor` + clamp), chosen because DuckDB replays them verbatim — the
  * oracle twin of the f32 `CAST(... AS REAL)` trick. */
object ByteVecs {

  /** Schema-metadata key marking an ARRAY<TINYINT> column as u8. */
  val UnsignedKey = "graft_unsigned"

  def isByteVec(dt: DataType): Boolean = dt match {
    case ArrayType(ByteType, _) => true
    case _                      => false
  }

  def isUnsigned(schema: StructType, colName: String): Boolean = {
    val f = schema(colName)
    isByteVec(f.dataType) && f.metadata.contains(UnsignedKey) &&
      f.metadata.getBoolean(UnsignedKey)
  }

  /** Re-attach the u8 mark to `colName` (metadata survives most plan
    * nodes but not arbitrary rewrites — call after a transform that
    * rebuilt the column). */
  def markUnsigned(df: DataFrame, colName: String = "vec"): DataFrame =
    markSignedness(df, colName, unsigned = true)

  /** The i8 twin of [[markUnsigned]]: explicitly declare a byte vec
    * column SIGNED. Kernel dispatch refuses bare byte columns
    * ([[requireSignedness]]), so every byte table states its value space
    * exactly once at creation — quantizeSigned output, vecs-file ingest —
    * and the declaration travels the schema from there. */
  def markSigned(df: DataFrame, colName: String = "vec"): DataFrame =
    markSignedness(df, colName, unsigned = false)

  def markSignedness(df: DataFrame, colName: String,
                     unsigned: Boolean): DataFrame = {
    val md: Metadata = new MetadataBuilder()
      .withMetadata(df.schema(colName).metadata)
      .putBoolean(UnsignedKey, unsigned).build()
    df.withColumn(colName, col(colName).as(colName, md))
  }

  /** The column's declared signedness: Some(unsigned) when the mark is
    * present, None for a BARE byte column (or a non-byte column). */
  def signednessOf(schema: StructType, colName: String): Option[Boolean] = {
    val f = schema(colName)
    if (isByteVec(f.dataType) && f.metadata.contains(UnsignedKey))
      Some(f.metadata.getBoolean(UnsignedKey))
    else None
  }

  /** Kernel-dispatch resolution for a byte vec column — the loud half of
    * the u8 contract: a u8 table whose mark was stripped is
    * INDISTINGUISHABLE from i8 by values alone and would silently serve
    * sign-extended answers, so ambiguity is an error, not a default.
    * Callers with out-of-band knowledge declare it explicitly via
    * [[markSigned]]/[[markUnsigned]]; stored layouts restore the mark
    * from their sidecar at open(). */
  def requireSignedness(schema: StructType, colName: String): Boolean =
    signednessOf(schema, colName).getOrElse(sys.error(
      s"byte vec column '$colName' carries no signedness mark — an " +
        "unmarked ARRAY<TINYINT> is ambiguous (a u8 table whose " +
        "graft_unsigned mark was stripped would silently serve i8 " +
        "answers). Declare it with ByteVecs.markSigned / markUnsigned, " +
        "or reopen the stored layout, which restores the mark from its " +
        "sidecar."))

  /** x → clamp(floor(x·scale), −128, 127) as TINYINT — the i8 ingest
    * quantizer. `floor` then clamp in BIGINT keeps every step exactly
    * replayable in DuckDB (FLOOR/LEAST/GREATEST/CAST semantics match). */
  def quantizeSigned(v: Column, scale: Double): Column =
    transform(v, x =>
      least(lit(127L), greatest(lit(-128L), floor(x * scale)))
        .cast("byte"))

  /** x → clamp(floor(x·scale + 128), 0, 255) stored as the raw byte
    * pattern (values > 127 wrap to negatives via an explicit −256, never
    * an overflowing cast — ANSI-safe). Pair with [[markUnsigned]]. */
  def quantizeUnsigned(v: Column, scale: Double): Column =
    transform(v, { x =>
      val u = least(lit(255L), greatest(lit(0L), floor(x * scale + 128)))
      when(u > 127L, u - 256L).otherwise(u).cast("byte")
    })

  /** `df` with `vecCol` widened to ARRAY<DOUBLE> iff it is byte-resident
    * — the single mark-aware entry point for VALUE arithmetic (means, PQ /
    * sign-bit encodes, raw-distance folds). A bare TINYINT upcast would
    * sign-extend u8 raw bytes (200 → −56) into the wrong value space, so
    * every arithmetic call site widens through here; non-byte frames pass
    * through untouched. Shared by KMeans, GraphLayout, Vamana
    * (splitOversized sub-centroids) and IndexLayout (codec attachment). */
  def widenedForMath(df: DataFrame, vecCol: String = "vec"): DataFrame =
    if (isByteVec(df.schema(vecCol).dataType))
      df.withColumn(vecCol,
        widen(col(vecCol), requireSignedness(df.schema, vecCol)))
    else df

  /** Widen back to DOUBLE with the same interpretation the kernels use —
    * the declarative twin of `Metric.computeDB`'s per-element widen. */
  def widen(v: Column, unsigned: Boolean): Column =
    if (unsigned)
      transform(v, x => {
        val i = x.cast("int")
        when(i < 0, i + 256).otherwise(i).cast("double")
      })
    else transform(v, _.cast("double"))
}
