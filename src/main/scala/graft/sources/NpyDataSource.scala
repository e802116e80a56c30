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

/** DataSource V2 for NumPy `.npy` — `spark.read.format("graftnpy")
  * .load(path)` → `(id BIGINT, vec ARRAY<DOUBLE>)`.
  *
  * What this adds over [[NpyIO.read]] (which stays the simple
  * one-file-per-task ingest): **intra-file record-aligned splitting**. A
  * C-order npy payload is a flat run of fixed-stride rows
  * (`cols × elBytes` after the header — public NEP-1 layout, the format
  * the reference's Python surface ingests via
  * `bindings/python/src/svs/common.py:62` read_npy → np.load), so a
  * single 100 GB array shards into `maxPartitionBytes` ranges at row
  * boundaries — no whole-file materialization, and dense ids stay exact
  * because `row = offset / stride` is arithmetic. Column pruning is
  * pushed into the reader (an `id`-only scan never decodes payload
  * bytes) and LIMIT caps split planning, both matching
  * [[VecsDataSource]]'s posture.
  *
  * Fortran-order shards are rejected loudly here — a column-major row is
  * a strided gather across the whole payload, which defeats range
  * splitting; [[NpyIO.read]] (whole-file decode) handles those. np.save
  * emits C order unless the array was explicitly transposed.
  *
  * `.option("bytes", "true")` over i1/u1 shards reads BYTE-RESIDENT:
  * `ARRAY<TINYINT>` raw bit patterns with the
  * [[graft.functions.ByteVecs]] signedness mark in the schema (probed
  * from the first shard's descr) — [[NpyIO.readBytes]] minus binaryFile's
  * 2 GB whole-file cap, so a Deep1B-sized single u1 dump is both
  * readable AND splits. Byte-resident frames also WRITE through this
  * source: an `ARRAY<TINYINT>` vec column persists raw bits as i1/u1
  * per its required mark.
  *
  * The write side emits one standalone v1.0 C-order `.npy` per input
  * partition (`np.load` opens each shard directly) with
  * `.option("descr", "f4"|"f8"|"f2"|"i1"|"u1"|"i2"|"i4"|"i8")`, default
  * f4. The format stores no ids, so re-read ids are dense (path, row)
  * order — callers wanting stable ids range-partition by id first,
  * exactly [[NpyIO.write]]'s contract. Commit sweeps files left by
  * failed/speculative attempts of THIS write (shard names carry the
  * queryId), leaving prior writes' shards untouched in append mode.
  */
class NpyDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftnpy"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (NpyDataSource.halfMode(options)) {
      require(!NpyDataSource.bytesMode(options),
        "graftnpy: options bytes and half are mutually exclusive")
      // f2 is always IEEE binary16 (numpy has no bfloat16 descr), so the
      // half-resident schema needs no file probe: ARRAY<SMALLINT> raw
      // bits + the HalfVecs f16 mark. Scan validates descr==f2 loudly
      // at planning.
      NpyDataSource.halfSchema
    }
    else if (!NpyDataSource.bytesMode(options)) VecsDataSource.Schema
    else {
      // byte-resident ingest: the signedness mark comes from the FILE
      // (i1 vs u1 descr), probed from the first shard — one bounded
      // header read, the same contract as NpyIO.readBytes. The probe is
      // LENIENT here because Spark also calls inferSchema on the WRITE
      // path (target empty or holding shards a truncate will replace);
      // the scan re-validates i1/u1 per file loudly at planning.
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val unsigned = NpyDataSource.resolveFirst(options, conf).map { f =>
        NpyIO.readHeaderAt(conf, f).descr
      } match {
        case Some("i1") => false
        case _          => true // u1, absent, or non-byte (scan rejects)
      }
      NpyDataSource.byteSchema(unsigned)
    }
  // bytesMode derives from the SCHEMA, never from a second reading of the
  // option: a user-supplied schema (supportsExternalMetadata) and the
  // reader's decode branch can then never disagree about the column type
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NpyTable(VecsDataSource.pathsOf(properties), schema,
      NpyDataSource.isByteSchema(schema),
      NpyDataSource.isHalfSchema(schema))
}

object NpyDataSource {
  /** One row-aligned byte-range of one C-order file. */
  case class NpySplit(path: String, descr: String, cols: Int,
      dataOffset: Long, startRow: Long, numRows: Long, baseId: Long)
    extends InputPartition

  private[sources] def bytesMode(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("bytes", false)

  private[sources] def halfMode(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("half", false)

  /** Half-resident table schema? Derives (like [[isByteSchema]]) from the
    * COLUMN TYPE, the single source of truth for the reader's decode
    * branch; the f16/bf16 interpretation itself travels as the
    * [[graft.functions.HalfVecs]] mark. */
  private[sources] def isHalfSchema(schema: StructType): Boolean =
    schema.fieldNames.contains("vec") &&
      graft.functions.HalfVecs.isShortVec(schema("vec").dataType)

  /** `(id, vec ARRAY<SMALLINT>)` carrying the f16 [[graft.functions.HalfVecs]]
    * mark — half-resident DSv2 reads surface raw binary16 bit patterns at
    * HALF the scan bytes of f4 (and a quarter of f8), served directly by
    * the FlatKnn half branch. */
  def halfSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(ShortType, containsNull = false),
      nullable = false,
      new MetadataBuilder()
        .putString(graft.functions.HalfVecs.FormatKey,
          graft.functions.HalfVecs.F16)
        .build())))

  /** Byte-resident table schema? The single source of truth for the
    * reader's decode branch. */
  private[sources] def isByteSchema(schema: StructType): Boolean =
    schema.fieldNames.contains("vec") &&
      graft.functions.ByteVecs.isByteVec(schema("vec").dataType)

  /** `(id, vec ARRAY<TINYINT>)` carrying the [[graft.functions.ByteVecs]]
    * signedness mark in the vec field's metadata — byte-resident DSv2
    * reads surface EXACTLY what [[NpyIO.readBytes]] does, minus the 2 GB
    * whole-file cap. */
  def byteSchema(unsigned: Boolean): StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(ByteType, containsNull = false),
      nullable = false,
      new MetadataBuilder()
        .putBoolean(graft.functions.ByteVecs.UnsignedKey, unsigned)
        .build())))

  /** First existing file (path-sorted) of the option paths — the schema
    * probe target; None when the target doesn't exist yet (write path). */
  private def resolveFirst(options: CaseInsensitiveStringMap,
      conf: org.apache.hadoop.conf.Configuration): Option[String] = {
    val props = new util.HashMap[String, String]()
    Option(options.get("path")).foreach(props.put("path", _))
    Option(options.get("paths")).foreach(props.put("paths", _))
    NpyIO.listNpy(conf, VecsDataSource.pathsOf(props)).headOption
  }
}

class NpyTable(paths: Seq[String], tableSchema: StructType,
    bytesMode: Boolean, halfMode: Boolean = false) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graftnpy(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new NpyScanBuilder(paths, tableSchema, bytesMode, halfMode)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1, "graftnpy write: exactly one target path")
    new NpyWriteBuilder(paths.head, info)
  }
}

class NpyScanBuilder(paths: Seq[String], tableSchema: StructType,
    bytesMode: Boolean, halfMode: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = tableSchema
  private var limit: Long = Long.MaxValue
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushLimit(n: Int): Boolean = { limit = n.toLong; true }
  override def build(): Scan =
    new NpyScan(paths, required, limit, bytesMode, halfMode)
}

class NpyScan(paths: Seq[String], required: StructType,
    limit: Long = Long.MaxValue, bytesMode: Boolean = false,
    halfMode: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftnpy ${paths.mkString(",")} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val files = NpyIO.listNpyStatus(conf, paths)
    require(files.nonEmpty, s"graftnpy: no files at ${paths.mkString(",")}")
    var baseId = 0L
    var descr0: String = null
    var cols0 = -1
    val out = Seq.newBuilder[InputPartition]
    files.foreach { st =>
      val path = st.getPath.toString
      val h = NpyIO.readHeaderAt(conf, path)
      require(!h.fortran,
        s"graftnpy: $path is fortran_order — column-major rows defeat " +
          "range splitting; use NpyIO.read for such files")
      require(!bytesMode || h.descr == "i1" || h.descr == "u1",
        s"graftnpy bytes=true needs i1/u1 shards, got ${h.descr} in $path")
      require(!halfMode || h.descr == "f2",
        s"graftnpy half=true needs f2 shards, got ${h.descr} in $path")
      if (descr0 == null) { descr0 = h.descr; cols0 = h.cols }
      require(h.descr == descr0,
        s"graftnpy: dtype drift — $path is ${h.descr}, expected $descr0")
      require(h.cols == cols0,
        s"graftnpy: dims drift — $path is ${h.cols}-d, expected $cols0")
      val stride = h.cols.toLong * h.elBytes
      // reader buffers size from the stride as Int — a >2 GiB single ROW
      // (cols × elBytes) would wrap to a negative allocation downstream;
      // refuse loudly at planning instead
      require(stride <= Int.MaxValue,
        s"graftnpy: row stride $stride B (cols=${h.cols} × " +
          s"${h.elBytes} B) exceeds 2 GiB in $path")
      require(st.getLen == h.dataOffset + h.payloadBytes,
        s"graftnpy: $path payload ${st.getLen - h.dataOffset} B != shape " +
          s"(${h.rows}, ${h.cols}) × ${h.elBytes} B")
      val rowsPerSplit = math.max(1L, splitBytes / stride)
      var start = 0L
      while (start < h.rows && baseId + start < limit) {
        val n = math.min(math.min(rowsPerSplit, h.rows - start),
          limit - (baseId + start))
        out += NpyDataSource.NpySplit(path, h.descr, h.cols, h.dataOffset,
          start, n, baseId + start)
        start += n
      }
      baseId += h.rows
    }
    out.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NpyReaderFactory(required, bytesMode, halfMode,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

class NpyReaderFactory(required: StructType, bytesMode: Boolean,
    halfMode: Boolean,
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new NpyPartitionReader(
      partition.asInstanceOf[NpyDataSource.NpySplit], required, bytesMode,
      halfMode, hadoopConf)
}

/** Streams one row-aligned range with a bounded read buffer; ids from
  * arithmetic, and a scan whose pruned schema has no `vec` performs
  * ZERO file I/O — npy rows are fixed-stride, so unlike the per-record
  * dim headers of vecs there is nothing to even skip past. */
class NpyPartitionReader(split: NpyDataSource.NpySplit,
    required: StructType, bytesMode: Boolean, halfMode: Boolean,
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val elBytes = NpyIO.elBytes(split.descr)
  private val stride = split.cols.toLong * elBytes
  private val wantVec = required.fieldNames.contains("vec")

  private val in = if (!wantVec) null else {
    val p = new Path(split.path)
    val s = p.getFileSystem(hadoopConf.value).open(p)
    s.seek(split.dataOffset + split.startRow * stride)
    s
  }
  private val bufRows = math.max(1, ((8L << 20) / stride).toInt)
  private val buf =
    if (!wantVec) null else new Array[Byte]((bufRows * stride).toInt)
  private var bb: ByteBuffer = ByteBuffer.allocate(0)
  private var rowsDone = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rowsDone >= split.numRows) return false
    if (wantVec && bb.remaining() < stride) {
      val n = math.min(bufRows.toLong, split.numRows - rowsDone).toInt
      val want = n * stride.toInt
      in.readFully(buf, 0, want)
      bb = ByteBuffer.wrap(buf, 0, want).order(ByteOrder.LITTLE_ENDIAN)
    }
    val vec: Any = if (wantVec && halfMode) {
      // half-resident: raw binary16 bit patterns, never widened (the
      // schema's HalfVecs f16 mark declares the decode) — half the scan
      // bytes of f4
      val out = new Array[Short](split.cols)
      var i = 0
      while (i < split.cols) { out(i) = bb.getShort; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else if (wantVec && bytesMode) {
      // byte-resident: raw bit patterns, never widened (the schema's
      // ByteVecs mark declares the value space) — the >2 GB-capable
      // twin of NpyIO.readBytes
      val out = new Array[Byte](stride.toInt)
      bb.get(out)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else if (wantVec) {
      val out = new Array[Double](split.cols)
      var i = 0
      split.descr match {
        case "f8" => while (i < split.cols) { out(i) = bb.getDouble; i += 1 }
        case "f4" =>
          while (i < split.cols) { out(i) = bb.getFloat.toDouble; i += 1 }
        case "f2" => while (i < split.cols) {
          out(i) =
            graft.functions.Binary16.halfToFloat(bb.getShort).toDouble
          i += 1
        }
        case "i1" => while (i < split.cols) { out(i) = bb.get.toDouble; i += 1 }
        case "u1" =>
          while (i < split.cols) { out(i) = (bb.get & 0xff).toDouble; i += 1 }
        case "i2" =>
          while (i < split.cols) { out(i) = bb.getShort.toDouble; i += 1 }
        case "u2" => while (i < split.cols) {
          out(i) = (bb.getShort & 0xffff).toDouble; i += 1
        }
        case "i4" =>
          while (i < split.cols) { out(i) = bb.getInt.toDouble; i += 1 }
        case "u4" => while (i < split.cols) {
          out(i) = (bb.getInt & 0xffffffffL).toDouble; i += 1
        }
        case "i8" =>
          while (i < split.cols) { out(i) = bb.getLong.toDouble; i += 1 }
      }
      new GenericArrayData(out)
    } else null // no payload wanted: ids are arithmetic, nothing to skip
    val values = required.fieldNames.map {
      case "id" => java.lang.Long.valueOf(split.baseId + rowsDone)
      case "vec" => vec
    }
    current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    rowsDone += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (in != null) in.close()
}

class NpyWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new NpyWrite(path, info.schema(),
    Option(info.options.get("descr")).map(NpyIO.normalizeDescr),
    doTruncate, info.queryId())
}

class NpyWrite(path: String, schema: StructType, descrOpt: Option[String],
    truncate: Boolean, queryId: String) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val vecOrdinal = schema.fieldIndex("vec")
    // element mode: 0 = double, 1 = float, 2 = byte-resident (raw bit
    // patterns out; the descr comes from the column's required ByteVecs
    // signedness mark, so the file can't contradict the value space).
    // An ABSENT descr option defaults to f4 for float/double frames;
    // resident frames carry their own descr, and an EXPLICIT option
    // contradicting it is refused — the vecs-eltype lesson: accepting
    // the default-looking value would silently write f2/u1 shards to a
    // caller who explicitly asked for f4.
    val descr = descrOpt.getOrElse("f4")
    val (elemMode, effDescr) = schema(vecOrdinal).dataType match {
      case ArrayType(FloatType, _)  => (1, descr)
      case ArrayType(DoubleType, _) => (0, descr)
      case ArrayType(ByteType, _) =>
        val unsigned =
          graft.functions.ByteVecs.requireSignedness(schema, "vec")
        val d = if (unsigned) "u1" else "i1"
        require(descrOpt.forall(_ == d),
          s"graftnpy write: descr option '${descrOpt.get}' contradicts " +
            s"the byte column's ${if (unsigned) "u8" else "i8"} mark " +
            s"(use '$d' or drop the option)")
        (2, d)
      case ArrayType(ShortType, _) =>
        // half-resident egress: raw bit patterns out as f2. npy has no
        // bfloat16 descr, so only f16-marked frames may pass — writing
        // bf16 bits as f2 would silently change every value on re-read.
        val fmt = graft.functions.HalfVecs.requireFormat(schema, "vec")
        require(fmt == graft.functions.HalfVecs.F16,
          "graftnpy write: npy has no bfloat16 descr — a bf16-marked " +
            "frame would silently decode as IEEE f16 on re-read; widen " +
            "or re-encode to f16 first")
        require(descrOpt.forall(_ == "f2"),
          s"graftnpy write: descr option '${descrOpt.get}' contradicts " +
            "the f16-resident column (use 'f2' or drop the option)")
        (3, "f2")
      case t => sys.error(s"graftnpy write: vec must be an array of " +
        s"float/double/byte/short, got $t")
    }
    val conf = new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate) fs.delete(dir, true)
    fs.mkdirs(dir)
    new NpyWriterFactory(path, effDescr, vecOrdinal, elemMode, queryId, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val keep = messages.collect {
      case VecsDataSource.Committed(p) => new Path(p).getName }.toSet
    val dir = new Path(path)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      // sweep this write's orphans: uncommitted shards AND .tmp leftovers
      // a crashed attempt's writeAtomic never renamed
      if ((n.endsWith(".npy") || n.endsWith(".npy.tmp")) &&
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

class NpyWriterFactory(dir: String, descr: String, vecOrdinal: Int,
    elemMode: Int, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new NpyDataWriter(dir, descr, vecOrdinal, elemMode, partitionId,
      taskId, queryId, conf)
}

/** The npy header carries the row count up front, so each task buffers
  * its encoded rows and writes the file at commit — the buffer holds
  * exactly the payload bytes the shard will, and partitions are already
  * sized to fit executor memory. An empty partition commits no file
  * (np.load has no zero-row convention worth emitting). */
class NpyDataWriter(dir: String, descr: String, vecOrdinal: Int,
    elemMode: Int, partitionId: Int, taskId: Long, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val elBytes = NpyIO.elBytes(descr)
  private val rows = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  private var cols = -1
  private var written: Option[Path] = None

  override def write(row: InternalRow): Unit = {
    val arr = row.getArray(vecOrdinal)
    val d = arr.numElements()
    if (cols < 0) cols = d
    require(d == cols, s"graftnpy write: $d dims, expected $cols")
    if (elemMode == 2) { // byte-resident: raw bit patterns straight out
      rows += arr.toByteArray()
      return
    }
    if (elemMode == 3) { // half-resident: raw binary16 bits out as f2
      val bits = arr.toShortArray()
      val hb = ByteBuffer.allocate(d * 2).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < d) { hb.putShort(bits(i)); i += 1 }
      rows += hb.array()
      return
    }
    val bb = ByteBuffer.allocate(d * elBytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < d) {
      val x =
        if (elemMode == 1) arr.getFloat(i).toDouble else arr.getDouble(i)
      NpyIO.encodeElement(bb, x, descr)
      i += 1
    }
    rows += bb.array()
  }

  override def commit(): WriterCommitMessage = {
    if (rows.isEmpty)
      return VecsDataSource.Committed(
        new Path(dir, s"empty-$partitionId-$taskId-$queryId.none").toString)
    val out = new Path(dir, f"part-$partitionId%05d-$taskId-$queryId.npy")
    NpyIO.writeAtomic(out, conf.value) { os =>
      os.write(NpyIO.headerBytes(descr, rows.length.toLong, cols))
      rows.foreach(os.write)
    }
    written = Some(out)
    VecsDataSource.Committed(out.toString)
  }

  override def abort(): Unit =
    written.foreach(p => p.getFileSystem(conf.value).delete(p, false))

  override def close(): Unit = rows.clear()
}
