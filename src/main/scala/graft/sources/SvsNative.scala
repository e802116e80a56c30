package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Native `.svs` (V1) binary compatibility reader/writer (SURVEY §2 S3 —
  * reference include/svs/core/io/native.h, v1 namespace): a 1024-byte header
  * — little-endian `u64 magic (0xcad4a6b2579980fe)`, 16-byte UUID,
  * `u64 num_vectors`, `u64 dims`, zero padding — followed by the dense
  * row-major payload. The element type is not in the header (the reference
  * carries it in the TOML config; here the caller passes it). Parquet remains
  * the engine's canonical format; this exists to import/export the
  * reference's fixtures. */
object SvsNative {

  val HeaderSize = 1024
  val Magic: Long = 0xcad4a6b2579980feL

  case class SvsHeader(uuid: Array[Byte], numVectors: Long, dims: Long)

  def readHeader(bytes: Array[Byte]): SvsHeader = {
    require(bytes.length >= HeaderSize, s"file shorter than $HeaderSize-byte header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getLong
    require(magic == Magic,
      f"bad magic 0x$magic%016x (expected 0x$Magic%016x) — not a v1 .svs file")
    val uuid = new Array[Byte](16)
    bb.get(uuid)
    SvsHeader(uuid, bb.getLong, bb.getLong)
  }

  /** Read one `.svs` file into `(id BIGINT, vec ARRAY<DOUBLE>)`. */
  def read(spark: SparkSession, path: String,
           el: VecsIO.ElType = VecsIO.F32): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val h = readHeader(bytes)
        val n = h.numVectors.toInt
        val d = h.dims.toInt
        require(bytes.length >= HeaderSize + n.toLong * d * el.bytes,
          s"payload truncated: ${bytes.length} bytes for $n x $d")
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(HeaderSize)
        (0 until n).iterator.map { r =>
          val out = new Array[Double](d)
          var i = 0
          el match {
            case VecsIO.F32 =>
              while (i < d) { out(i) = bb.getFloat.toDouble; i += 1 }
            case VecsIO.I32 =>
              while (i < d) { out(i) = bb.getInt.toDouble; i += 1 }
            case VecsIO.U8 =>
              while (i < d) { out(i) = (bb.get & 0xff).toDouble; i += 1 }
            case VecsIO.F16 =>
              while (i < d) {
                out(i) = graft.functions.Binary16.halfToFloat(bb.getShort)
                  .toDouble
                i += 1
              }
          }
          (r.toLong, out)
        }
      }
      .toDF("id", "vec")
  }

  /** Write `(id, vec)` rows (collected in id order — V1 is a single dense
    * file, a fixture/export format, not bulk storage) to one `.svs` file.
    * The UUID slot derives deterministically from (count, dims).
    * Delegates to [[writeEltype]] so header layout and encoding live in
    * exactly one place. */
  def write(df: DataFrame, path: String,
            el: VecsIO.ElType = VecsIO.F32): Unit =
    writeEltype(df, path, el match {
      case VecsIO.F32 => "float32"
      case VecsIO.I32 => "int32"
      case VecsIO.U8  => "uint8"
      case VecsIO.F16 => "float16"
    })

  /** Bytes per element for a reference `eltype` string
    * (svs_config.toml vocabulary, include/svs/lib/datatype.h). */
  def eltypeBytes(eltype: String): Int = eltype match {
    case "float64"             => 8
    case "float32"             => 4
    case "int32"               => 4
    case "float16" | "bfloat16" => 2
    case "int8" | "uint8"      => 1
    case other => sys.error(s"unsupported eltype '$other'")
  }

  /** [[write]] keyed by the reference's `eltype` vocabulary — the export
    * side of [[SvsIndexDir.save]]'s element-typed directory layout, so a
    * byte or half dataset persists at its native width instead of
    * silently widening to float32. Values must already be representable
    * in the target type (int8 in [-128,127], uint8 in [0,255], halves
    * round to nearest even) — the round trip through
    * `SvsIndexDir.loadData` is then exact. */
  def writeEltype(df: DataFrame, path: String, eltype: String): Unit = {
    val spark = df.sparkSession
    val rows = df.select(col("id").cast("long"),
        col("vec").cast("array<double>"))
      .orderBy("id").collect()
    require(rows.nonEmpty, "refusing to write an empty .svs file")
    val d = rows(0).getSeq[Double](1).length
    val bb = ByteBuffer.allocate(
        HeaderSize + rows.length * d * eltypeBytes(eltype))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(Magic)
    val uuid = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(rows.length.toLong).putLong(d.toLong).array()
    bb.put(uuid)
    bb.putLong(rows.length.toLong)
    bb.putLong(d.toLong)
    bb.position(HeaderSize)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      require(v.length == d, s"ragged row ${r.getLong(0)}")
      eltype match {
        case "float64" => v.foreach(bb.putDouble)
        case "float32" => v.foreach(x => bb.putFloat(x.toFloat))
        case "int32"   => v.foreach(x => bb.putInt(x.toInt))
        case "float16" => v.foreach(x => bb.putShort(
          graft.functions.Binary16.floatToHalf(x.toFloat)))
        case "bfloat16" => v.foreach { x =>
          // round-to-nearest-even truncation of the f32 bit pattern —
          // exact for values already bf16-representable
          val bits = java.lang.Float.floatToIntBits(x.toFloat)
          bb.putShort(((bits + 0x7fff + ((bits >>> 16) & 1)) >>> 16).toShort)
        }
        case "int8" => v.foreach { x =>
          require(x >= -128 && x <= 127 && x == math.rint(x),
            s"value $x not an int8")
          bb.put(x.toInt.toByte)
        }
        case "uint8" => v.foreach { x =>
          require(x >= 0 && x <= 255 && x == math.rint(x),
            s"value $x not a uint8")
          bb.put((x.toInt & 0xff).toByte)
        }
        case other => sys.error(s"unsupported eltype '$other'")
      }
    }
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    os.write(bb.array())
    os.close()
  }
}
