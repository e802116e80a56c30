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
  def markUnsigned(df: DataFrame, colName: String = "vec"): DataFrame = {
    val md: Metadata = new MetadataBuilder()
      .withMetadata(df.schema(colName).metadata)
      .putBoolean(UnsignedKey, true).build()
    df.withColumn(colName, col(colName).as(colName, md))
  }

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
      df.withColumn(vecCol, widen(col(vecCol), isUnsigned(df.schema, vecCol)))
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
