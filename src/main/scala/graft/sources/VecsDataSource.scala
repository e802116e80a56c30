package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for the `*vecs` family — `spark.read.format("graftvecs")
  * .load(path)` → `(id BIGINT, vec ARRAY<DOUBLE>)`.
  *
  * What this adds over [[VecsIO.read]] (which stays the simple
  * one-file-per-task ingest): **intra-file record-aligned splitting**. A
  * vecs file is a flat run of fixed-stride records (`int32 dim` + `dim`
  * payload elements — reference core/io/vecs.h:137-253), so a single
  * 100 GB file cleanly shards into `maxPartitionBytes` ranges at record
  * boundaries — no whole-file materialization, no task-size hazard, and
  * dense ids stay exact because `row = offset / stride` is arithmetic.
  * Column pruning is pushed into the reader: an `id`-only scan (count,
  * id joins) never decodes payload bytes, a `vec`-only scan never
  * allocates ids.
  *
  * The per-file dim is probed driver-side from the first record header
  * (one 4-byte read per file), stride uniformity is validated by
  * `length % stride == 0`, and per-file id bases are the running row
  * total in sorted-path order — the same dense (path, row) assignment as
  * [[VecsIO.read]], so both paths produce identical frames.
  *
  * `.option("bytes", "true")` over `.bvecs` reads BYTE-RESIDENT:
  * `ARRAY<TINYINT>` raw bit patterns with the u8 mark in the schema
  * (bvecs IS the u8 container — the Deep1B shape) —
  * [[VecsIO.readBytesU8]] minus binaryFile's 2 GB whole-file cap, so the
  * canonical 128 GB single-file bvecs dump is both readable and splits.
  * u8-marked byte frames also WRITE raw bits back as bvecs; i8-marked
  * frames are refused (re-reading the container would flip their value
  * space). */
class VecsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftvecs"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("half", false)) {
      require(!options.getBoolean("bytes", false),
        "graftvecs: options bytes and half are mutually exclusive")
      NpyDataSource.halfSchema // hvecs IS IEEE binary16
    }
    else if (!options.getBoolean("bytes", false)) VecsDataSource.Schema
    else NpyDataSource.byteSchema(unsigned = true) // bvecs IS u8 (Deep1B)
  // bytesMode/halfMode derive from the SCHEMA (see NpyDataSource): the
  // reader's decode branch can never disagree with the plan's column type
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VecsTable(VecsDataSource.pathsOf(properties), schema,
      NpyDataSource.isByteSchema(schema),
      NpyDataSource.isHalfSchema(schema))
}

object VecsDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  private[sources] def pathsOf(props: util.Map[String, String])
      : Seq[String] = {
    val single = Option(props.get("path")).toSeq
    val multi = Option(props.get("paths")).toSeq.flatMap { js =>
      // Spark encodes .load(paths: _*) as a JSON array of strings —
      // parse it as JSON (quotes/commas/escapes in paths survive)
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(js) match {
        case JArray(xs) => xs.collect { case JString(p) => p }
        case other => sys.error(
          s"graftvecs: malformed paths option (expected JSON array): $other")
      }
    }
    val all = single ++ multi
    require(all.nonEmpty, "graftvecs: no path given")
    all
  }

  /** One record-aligned byte-range of one file. */
  case class VecsSplit(path: String, elName: String, dim: Int,
      startRow: Long, numRows: Long, baseId: Long)
    extends InputPartition

  /** One task's committed shard file. */
  case class Committed(path: String) extends WriterCommitMessage

  private[sources] def elOf(name: String): VecsIO.ElType = name match {
    case "F32" => VecsIO.F32
    case "I32" => VecsIO.I32
    case "U8" => VecsIO.U8
    case "F16" => VecsIO.F16
  }
}

class VecsTable(paths: Seq[String],
    tableSchema: StructType = VecsDataSource.Schema,
    bytesMode: Boolean = false, halfMode: Boolean = false) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graftvecs(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new VecsScanBuilder(paths, tableSchema, bytesMode, halfMode)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1, "graftvecs write: exactly one target path")
    new VecsWriteBuilder(paths.head, info)
  }
}

/** Write side of the V2 source: each input partition streams one
  * `part-<pid>-<task>.{f,i,b}vecs` shard (the element type from
  * `.option("eltype", "fvecs"|"ivecs"|"bvecs")`, default fvecs); commit
  * sweeps the directory of any file a speculative or failed attempt left
  * that is NOT in the committed set, so duplicates cannot survive. The
  * format stores no ids (reference core/io/vecs.h) — ids on re-read are
  * dense (path, row) order, so callers wanting a stable order
  * `repartitionByRange(col("id")).sortWithinPartitions("id")` first,
  * exactly [[VecsIO.write]]'s contract. */
class VecsWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new VecsWrite(path, info.schema(),
    Option(info.options.get("eltype")), doTruncate, info.queryId())
}

class VecsWrite(path: String, schema: StructType,
    eltypeOpt: Option[String], truncate: Boolean, queryId: String)
    extends Write with BatchWrite {
  private val eltypeExt: String = eltypeOpt.getOrElse("fvecs")
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val vecOrdinal = schema.fieldIndex("vec")
    // element mode: 0 = double, 1 = float, 2 = byte-resident (raw bits
    // into bvecs; the u8 container — a SIGNED byte frame is refused
    // rather than silently reinterpreted as u8 on re-read)
    val (elemMode, el) = schema(vecOrdinal).dataType match {
      case ArrayType(FloatType, _)  => (1, VecsIO.elTypeFor(s"x.$eltypeExt"))
      case ArrayType(DoubleType, _) => (0, VecsIO.elTypeFor(s"x.$eltypeExt"))
      case ArrayType(ByteType, _) =>
        val unsigned =
          graft.functions.ByteVecs.requireSignedness(schema, "vec")
        require(unsigned,
          "graftvecs write: bvecs is the u8 container — an i8-marked " +
            "frame would silently flip value space on re-read; widen or " +
            "use graftnpy (i1) instead")
        // only an ABSENT eltype (default) or an explicit "bvecs" is
        // honest for a byte frame — an explicit "fvecs" (previously
        // indistinguishable from the default) would silently write
        // .bvecs shards against the caller's stated intent
        require(eltypeOpt.forall(_ == "bvecs"),
          s"graftvecs write: eltype '$eltypeExt' contradicts the byte " +
            "column (bvecs is the only byte container; omit eltype or " +
            "pass 'bvecs')")
        (2, VecsIO.U8)
      case ArrayType(ShortType, _) =>
        // half-resident egress: raw bits out as hvecs (the IEEE binary16
        // container) — a bf16-marked frame is refused, its bits would
        // silently decode as f16 on re-read
        val fmt = graft.functions.HalfVecs.requireFormat(schema, "vec")
        require(fmt == graft.functions.HalfVecs.F16,
          "graftvecs write: hvecs is the IEEE binary16 container — a " +
            "bf16-marked frame would silently decode as f16 on re-read; " +
            "widen or re-encode to f16 first")
        require(eltypeOpt.forall(_ == "hvecs"),
          s"graftvecs write: eltype '$eltypeExt' contradicts the " +
            "f16-resident column (omit eltype or pass 'hvecs')")
        (3, VecsIO.F16)
      case t => sys.error(s"graftvecs write: vec must be an array " +
        s"of float/double/byte/short, got $t")
    }
    val conf = new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate) fs.delete(dir, true)
    fs.mkdirs(dir)
    new VecsWriterFactory(path, el.toString, vecOrdinal, elemMode,
      queryId, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // sweep ONLY this write's files (every shard name carries queryId):
    // an orphan from a failed/speculative attempt of THIS write dies, a
    // file from a previous write (append mode) is untouched. Compare by
    // FILE NAME — executors may report scheme-less paths while
    // listStatus returns fully-qualified ones.
    val keep = messages.collect {
      case VecsDataSource.Committed(p) => new Path(p).getName }.toSet
    val dir = new Path(path)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      // this write's orphans: uncommitted shards AND .tmp leftovers a
      // crashed attempt never renamed
      if ((n.endsWith("vecs") || n.endsWith(".tmp")) &&
          n.contains(queryId) && !keep.contains(n))
        fs.delete(st.getPath, false)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    messages.collect { case VecsDataSource.Committed(p) =>
      val hp = new Path(p)
      hp.getFileSystem(conf).delete(hp, false)
    }
  }
}

class VecsWriterFactory(dir: String, elName: String, vecOrdinal: Int,
    elemMode: Int, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new VecsDataWriter(dir, VecsDataSource.elOf(elName), vecOrdinal,
      elemMode, partitionId, taskId, queryId, conf)
}

class VecsDataWriter(dir: String, el: VecsIO.ElType, vecOrdinal: Int,
    elemMode: Int, partitionId: Int, taskId: Long, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriter[InternalRow] {
  // stream into a .tmp name, rename at commit: a concurrent
  // StreamingShards file stream must never list a half-written shard
  private val out =
    new Path(dir, f"part-$partitionId%05d-$taskId-$queryId.${el.ext}")
  private val tmp = new Path(dir, out.getName + ".tmp")
  private val os = out.getFileSystem(conf.value).create(tmp, true)

  override def write(row: InternalRow): Unit = {
    val arr = row.getArray(vecOrdinal)
    val d = arr.numElements()
    val bb = ByteBuffer.allocate(4 + d * el.bytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(d)
    if (elemMode == 2) bb.put(arr.toByteArray()) // raw bit patterns out
    else if (elemMode == 3) { // half-resident: raw binary16 bits out
      val bits = arr.toShortArray()
      var i = 0
      while (i < d) { bb.putShort(bits(i)); i += 1 }
    }
    else {
      var i = 0
      while (i < d) {
        val x =
          if (elemMode == 1) arr.getFloat(i).toDouble else arr.getDouble(i)
        el match {
          case VecsIO.F32 => bb.putFloat(x.toFloat)
          case VecsIO.I32 => bb.putInt(x.toInt)
          case VecsIO.U8 => bb.put(x.toInt.toByte)
          case VecsIO.F16 => bb.putShort(
            graft.functions.Binary16.floatToHalf(x.toFloat))
        }
        i += 1
      }
    }
    os.write(bb.array())
  }

  override def commit(): WriterCommitMessage = {
    os.close()
    val fs = out.getFileSystem(conf.value)
    fs.delete(out, false) // replace semantics (rename fails onto existing)
    require(fs.rename(tmp, out), s"rename $tmp -> $out failed")
    VecsDataSource.Committed(out.toString)
  }

  override def abort(): Unit = {
    os.close()
    val fs = out.getFileSystem(conf.value)
    fs.delete(tmp, false)
    fs.delete(out, false)
  }

  override def close(): Unit = ()
}

class VecsScanBuilder(paths: Seq[String],
    tableSchema: StructType = VecsDataSource.Schema,
    bytesMode: Boolean = false, halfMode: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = tableSchema
  private var limit: Long = Long.MaxValue
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // rows are fixed-stride, so a LIMIT caps planning at the first
  // ceil(limit/rowsPerSplit) splits — a head() of a 100 GB file reads
  // one record-aligned range, not the file
  override def pushLimit(n: Int): Boolean = { limit = n.toLong; true }
  override def build(): Scan =
    new VecsScan(paths, required, limit, bytesMode, halfMode)
}

class VecsScan(paths: Seq[String], required: StructType,
    limit: Long = Long.MaxValue, bytesMode: Boolean = false,
    halfMode: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftvecs ${paths.mkString(",")} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val files = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matches =
        Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(s => s.isFile && VecsIO.isVecsFile(s.getPath.getName))
        else Seq(st)
      }
    }.sortBy(_.getPath.toString)
    require(files.nonEmpty, s"graftvecs: no files at ${paths.mkString(",")}")
    var baseId = 0L
    val out = Seq.newBuilder[InputPartition]
    files.filter(_.getLen > 0).foreach { st => // empty shard = zero rows
      val path = st.getPath
      val el = VecsIO.elTypeFor(path.toString)
      require(!bytesMode || el == VecsIO.U8,
        s"graftvecs bytes=true needs .bvecs shards (u8 is the byte vecs " +
          s"container), got $path")
      require(!halfMode || el == VecsIO.F16,
        s"graftvecs half=true needs .hvecs shards (IEEE binary16), " +
          s"got $path")
      val fs = path.getFileSystem(conf)
      val in = fs.open(path)
      val dim = try {
        val head = new Array[Byte](4)
        in.readFully(0L, head)
        ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
      } finally in.close()
      require(dim > 0, s"graftvecs: bad dim $dim in $path")
      val stride = 4L + dim.toLong * el.bytes
      // reader buffers size from the stride as Int — refuse a >2 GiB
      // single record loudly at planning (same guard as graftnpy)
      require(stride <= Int.MaxValue,
        s"graftvecs: record stride $stride B (dim=$dim × ${el.bytes} B) " +
          s"exceeds 2 GiB in $path")
      require(st.getLen % stride == 0,
        s"graftvecs: ${st.getLen} not a multiple of stride $stride in $path")
      val rows = st.getLen / stride
      val rowsPerSplit = math.max(1L, splitBytes / stride)
      var start = 0L
      while (start < rows && baseId + start < limit) {
        val n = math.min(math.min(rowsPerSplit, rows - start),
          limit - (baseId + start))
        out += VecsDataSource.VecsSplit(path.toString, el.toString, dim,
          start, n, baseId + start)
        start += n
      }
      baseId += rows
    }
    out.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VecsReaderFactory(required, bytesMode, halfMode,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

class VecsReaderFactory(required: StructType, bytesMode: Boolean,
    halfMode: Boolean,
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[VecsDataSource.VecsSplit]
    new VecsPartitionReader(s, required, bytesMode, halfMode, hadoopConf)
  }
}

/** Streams one record-aligned range: a bounded read buffer (whole split
  * only when small), ids from arithmetic, payload decoded only when the
  * pruned schema asks for `vec`. */
class VecsPartitionReader(split: VecsDataSource.VecsSplit,
    required: StructType, bytesMode: Boolean, halfMode: Boolean,
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val el = VecsDataSource.elOf(split.elName)
  private val stride = 4L + split.dim.toLong * el.bytes
  private val wantVec = required.fieldNames.contains("vec")

  private val in = {
    val p = new Path(split.path)
    p.getFileSystem(hadoopConf.value).open(p)
  }
  in.seek(split.startRow * stride)
  // 8 MiB record-aligned read buffer: bounded memory however big the split
  private val bufRows = math.max(1, ((8L << 20) / stride).toInt)
  private val buf = new Array[Byte]((bufRows * stride).toInt)
  private var bb: ByteBuffer = ByteBuffer.allocate(0)
  private var rowsDone = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rowsDone >= split.numRows) return false
    if (bb.remaining() < stride) {
      val n = math.min(bufRows.toLong, split.numRows - rowsDone).toInt
      val want = n * stride.toInt
      in.readFully(buf, 0, want)
      bb = ByteBuffer.wrap(buf, 0, want).order(ByteOrder.LITTLE_ENDIAN)
    }
    val d = bb.getInt
    require(d == split.dim,
      s"graftvecs: dim drift $d vs ${split.dim} in ${split.path}")
    val vec: Any = if (wantVec && halfMode) {
      // half-resident hvecs: raw binary16 bit patterns, never widened
      // (the schema's HalfVecs f16 mark declares the decode)
      val out = new Array[Short](d)
      var i = 0
      while (i < d) { out(i) = bb.getShort; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else if (wantVec && bytesMode) {
      // byte-resident bvecs (the Deep1B shape): raw bit patterns, never
      // widened — readBytesU8 minus binaryFile's 2 GB whole-file cap
      val out = new Array[Byte](d)
      bb.get(out)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else if (wantVec) {
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
      new GenericArrayData(out)
    } else {
      bb.position(bb.position() + d * el.bytes)
      null
    }
    val values = required.fieldNames.map {
      case "id" => java.lang.Long.valueOf(split.baseId + rowsDone)
      case "vec" => vec
    }
    current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    rowsDone += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
