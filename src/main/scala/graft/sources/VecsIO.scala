package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `*vecs` family readers/writers (SURVEY §2 S1/S2 — reference
  * core/io/vecs.h:137-253): per-row layout is a little-endian `int32 dim`
  * header followed by `dim` payload elements (float32 for `.fvecs`, int32 for
  * `.ivecs`, uint8 for `.bvecs`). Files parallelize naturally one-per-task
  * via `binaryFile` (a vecs *dataset* at scale is a directory of shards, each
  * well under `maxPartitionBytes`); canonical storage stays Parquet — vecs is
  * the ingest/egress compatibility format, exactly the reference's posture
  * (convert_vecs_to_svs, bindings/python/src/python_bindings.cpp:196-212).
  *
  * Row ids are assigned densely in (file path, row-in-file) order, matching
  * the reference's implicit dense indexing; per-file bases come from the
  * fixed row stride, so id assignment needs no extra pass.
  */
object VecsIO {

  sealed trait ElType { def bytes: Int; def ext: String }
  case object F32 extends ElType { val bytes = 4; val ext = "fvecs" }
  case object I32 extends ElType { val bytes = 4; val ext = "ivecs" }
  case object U8 extends ElType { val bytes = 1; val ext = "bvecs" }
  /** IEEE binary16 (`.hvecs`, reference core/io/vecs.h:137): payload is
    * 2-byte half floats; decode/encode reuse the certified f16 codec
    * ([[graft.functions.Binary16]]) so round trips match the S7
    * converting-ingest path bit-for-bit. */
  case object F16 extends ElType { val bytes = 2; val ext = "hvecs" }

  def elTypeFor(path: String): ElType =
    if (path.endsWith(".fvecs")) F32
    else if (path.endsWith(".ivecs")) I32
    else if (path.endsWith(".bvecs")) U8
    else if (path.endsWith(".hvecs")) F16
    else sys.error(s"not a vecs path: $path")

  /** Is `name` a vecs shard? Directory listings must skip everything
    * else — in particular the `.tmp` names the atomic writers hold open
    * mid-write (a crashed attempt can also orphan one): a dir read that
    * tripped over them would defeat the atomicity the tmp scheme buys. */
  private[sources] def isVecsFile(name: String): Boolean =
    name.endsWith(".fvecs") || name.endsWith(".ivecs") ||
      name.endsWith(".bvecs") || name.endsWith(".hvecs")

  /** Expand a glob/dir into concrete file paths driver-side. Passing
    * concrete files (not a glob) to the binaryFile source avoids Spark's
    * `FileStreamSink: Assume no metadata directory` WARN-with-stack, which
    * sbt surfaces as `[error]` lines in bench/verify output. */
  private def resolve(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    val files = matches.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && isVecsFile(s.getPath.getName))
      else Seq(st)
    }.map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no files at $path")
    files
  }

  private[graft] def decode(bytes: Array[Byte], el: ElType): Iterator[Array[Double]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[Array[Double]] {
      def hasNext: Boolean = bb.remaining() >= 4
      def next(): Array[Double] = {
        val d = bb.getInt
        require(d > 0 && bb.remaining() >= d * el.bytes,
          s"corrupt vecs row: dim=$d remaining=${bb.remaining()}")
        val out = new Array[Double](d)
        var i = 0
        el match {
          case F32 => while (i < d) { out(i) = bb.getFloat.toDouble; i += 1 }
          case I32 => while (i < d) { out(i) = bb.getInt.toDouble; i += 1 }
          case U8 => while (i < d) { out(i) = (bb.get & 0xff).toDouble; i += 1 }
          case F16 => while (i < d) {
            out(i) = graft.functions.Binary16.halfToFloat(bb.getShort).toDouble
            i += 1 }
        }
        out
      }
    }
  }

  /** Read a vecs file/glob into `(id BIGINT, vec ARRAY<DOUBLE>)`. `dims` must
    * be uniform (checked); ids are dense in (path, row) order. */
  def read(spark: SparkSession, path: String,
           elType: Option[ElType] = None): DataFrame = {
    import spark.implicits._
    val el = elType.getOrElse(elTypeFor(path))
    val files = spark.read.format("binaryFile").load(resolve(spark, path): _*)
      .select(col("path"), col("length"), col("content"))
    // row stride is fixed per dataset: probe dim from the first 4 bytes
    val heads = files.select(col("path"), col("length"),
        substring(col("content"), 1, 4).as("head"))
      .collect()
      .map { r =>
        val dim = ByteBuffer.wrap(r.getAs[Array[Byte]]("head"))
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        (r.getString(0), r.getLong(1), dim)
      }
      .sortBy(_._1)
    val stride = heads.headOption.map { case (_, _, d) => 4L + d.toLong * el.bytes }
      .getOrElse(sys.error(s"no vecs files at $path"))
    heads.foreach { case (p, len, _) =>
      require(len % stride == 0, s"$p length $len not a multiple of $stride") }
    val bases = heads.scanLeft(0L) { case (acc, (_, len, _)) =>
      acc + len / stride }
    val baseByPath = heads.map(_._1).zip(bases).toMap
    val bc = spark.sparkContext.broadcast(baseByPath)
    files.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val base = bc.value(p)
        decode(bytes, el).zipWithIndex.map { case (v, i) => (base + i, v) }
      }
      .toDF("id", "vec")
  }

  /** BYTE-RESIDENT `.bvecs` ingest — the Deep1B-shape path: u8 payloads
    * land as `ARRAY<TINYINT>` raw bit patterns carrying the
    * [[graft.functions.ByteVecs]] unsigned mark, never widening to
    * double (8× fewer resident bytes than [[read]]; every byte-branch
    * kernel then widens at use with `& 0xFF`, bit-identical to reading
    * wide — ByteKnnSpec/SourcesSpec). Ids are dense (path, row) order
    * exactly like [[read]]. */
  def readBytesU8(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = resolve(spark, path)
    val files = spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("length"), col("content"))
    val sizes = files.select("path", "length").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // fixed stride probed from the first file's 4-byte header, read
    // driver-side (loading content through a Spark plan here would pull
    // every file's full bytes once just for this probe — at Deep1B sizes
    // that doubles ingest I/O)
    val firstP = new Path(paths.head)
    val ffs = firstP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = ffs.open(firstP)
    val head = new Array[Byte](4)
    try in.readFully(0L, head) finally in.close()
    val dim = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(dim > 0, s"bad dim $dim in ${paths.head}")
    val stride = 4L + dim.toLong
    sizes.foreach { case (p, len) =>
      require(len % stride == 0, s"$p length $len not a multiple of $stride") }
    val bases = sizes.scanLeft(0L) { case (acc, (_, len)) =>
      acc + len / stride }
    val baseByPath = sizes.map(_._1).zip(bases).toMap
    val bc = spark.sparkContext.broadcast(baseByPath)
    // Seq[Byte] (not Array[Byte] = BINARY) so the column lands as
    // ARRAY<TINYINT> and the byte-branch kernels dispatch on it
    val df = files.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val base = bc.value(p)
        new Iterator[(Long, Seq[Byte])] {
          private var r = 0L
          def hasNext: Boolean = bb.remaining() >= 4
          def next(): (Long, Seq[Byte]) = {
            val d = bb.getInt
            require(d == dim, s"dim drift $d vs $dim in $p")
            val out = new Array[Byte](d)
            bb.get(out)
            val row = (base + r, out.toSeq)
            r += 1
            row
          }
        }
      }
      .toDF("id", "vec")
    graft.functions.ByteVecs.markUnsigned(df)
  }

  /** HALF-RESIDENT `.hvecs` ingest: binary16 payloads land as
    * `ARRAY<SMALLINT>` raw bit patterns carrying the f16
    * [[graft.functions.HalfVecs]] mark, never widening to double (4×
    * fewer resident bytes than [[read]]; the FlatKnn half branch decodes
    * each value at use, bit-identical to reading wide — HalfKnnSpec /
    * SourcesSpec). Ids are dense (path, row) order exactly like [[read]]. */
  def readHalfF16(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = resolve(spark, path)
    val files = spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("length"), col("content"))
    val sizes = files.select("path", "length").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val firstP = new Path(paths.head)
    val ffs = firstP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = ffs.open(firstP)
    val head = new Array[Byte](4)
    try in.readFully(0L, head) finally in.close()
    val dim = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(dim > 0, s"bad dim $dim in ${paths.head}")
    val stride = 4L + dim.toLong * 2
    sizes.foreach { case (p, len) =>
      require(len % stride == 0, s"$p length $len not a multiple of $stride") }
    val bases = sizes.scanLeft(0L) { case (acc, (_, len)) =>
      acc + len / stride }
    val baseByPath = sizes.map(_._1).zip(bases).toMap
    val bc = spark.sparkContext.broadcast(baseByPath)
    // Seq[Short] (not BINARY) so the column lands as ARRAY<SMALLINT> and
    // the half-branch kernels dispatch on it
    val df = files.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val base = bc.value(p)
        new Iterator[(Long, Seq[Short])] {
          private var r = 0L
          def hasNext: Boolean = bb.remaining() >= 4
          def next(): (Long, Seq[Short]) = {
            val d = bb.getInt
            require(d == dim, s"dim drift $d vs $dim in $p")
            val out = new Array[Short](d)
            var i = 0
            while (i < d) { out(i) = bb.getShort; i += 1 }
            val row = (base + r, out.toSeq)
            r += 1
            row
          }
        }
      }
      .toDF("id", "vec")
    graft.functions.HalfVecs.markHalf(df, graft.functions.HalfVecs.F16)
  }

  /** Half-resident writer: `ARRAY<SMALLINT>` rows persist raw binary16
    * bits as `.hvecs` shards — [[readHalfF16]] restores residency and
    * mark exactly. bf16-marked frames are refused (hvecs is the IEEE
    * binary16 container). */
  def writeHalf(df: DataFrame, dir: String): Unit = {
    import graft.functions.HalfVecs
    require(HalfVecs.requireFormat(df.schema, "vec") == HalfVecs.F16,
      "writeHalf: hvecs is the IEEE binary16 container — re-encode " +
        "bf16 frames to f16 first")
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    NpyIO.sweepStaleTmp(fs, dirPath)
    df.select(col("id").cast("long"), col("vec"))
      .sortWithinPartitions("id")
      .rdd
      .mapPartitionsWithIndex { case (pi, iter) =>
        if (iter.isEmpty) Iterator.empty
        else {
          // positional name known upfront (unlike write's id-named
          // shards), so the shared atomic tmp+rename applies directly
          val out = new Path(dir, f"part-$pi%05d.hvecs")
          NpyIO.writeAtomic(out, conf.value) { os =>
            iter.foreach { row =>
              val v = row.getSeq[Short](1)
              val bb = ByteBuffer.allocate(4 + v.length * 2)
                .order(ByteOrder.LITTLE_ENDIAN)
              bb.putInt(v.length)
              v.foreach(bb.putShort)
              os.write(bb.array())
            }
          }
          Iterator.single(pi)
        }
      }
      .count()
  }

  /** Write `(id, vec)` rows as vecs shards `part-NNNNN.<ext>` under `dir`,
    * one per partition (ordered by id within each). Use
    * `df.repartitionByRange(n, col("id"))` upstream for globally ordered
    * shards. */
  def write(df: DataFrame, dir: String, el: ElType,
            idShardNames: Boolean = false, append: Boolean = false): Unit = {
    require(!append || idShardNames,
      "vecs append needs idShardNames=true (positional part names collide)")
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    if (!append) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    NpyIO.sweepStaleTmp(fs, dirPath)
    df.select(col("id").cast("long"), col("vec").cast("array<double>"))
      .sortWithinPartitions("id")
      .rdd
      .mapPartitionsWithIndex { case (pi, iter) =>
        if (iter.isEmpty) Iterator.empty
        else {
          // id-named shards open lazily on the first row (the name needs
          // the partition's first id). Rows stream into a `.tmp` name and
          // rename into place on success — a concurrent StreamingShards
          // file stream must never list a half-written shard — and exact
          // per-row contiguity (not span==count, which duplicates + gaps
          // can fake) keeps the base name authoritative for id
          // restoration.
          var os: org.apache.hadoop.fs.FSDataOutputStream = null
          var outPath: Path = null
          var prevId = Long.MinValue
          iter.foreach { row =>
            val id = row.getLong(0)
            if (os == null) {
              outPath = if (idShardNames)
                new Path(dir, f"base-$id%012d.${el.ext}")
              else new Path(dir, f"part-$pi%05d.${el.ext}")
              os = outPath.getFileSystem(conf.value)
                .create(new Path(dir, outPath.getName + ".tmp"), true)
              prevId = id - 1
            }
            if (idShardNames && id != prevId + 1) {
              os.close()
              outPath.getFileSystem(conf.value)
                .delete(new Path(dir, outPath.getName + ".tmp"), false)
              sys.error(
                s"idShardNames needs contiguous ids per partition: id $id " +
                  s"follows $prevId — repartitionByRange dense ids first")
            }
            prevId = id
            val v = row.getSeq[Double](1)
            val bb = ByteBuffer.allocate(4 + v.length * el.bytes)
              .order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(v.length)
            el match {
              case F32 => v.foreach(x => bb.putFloat(x.toFloat))
              case I32 => v.foreach(x => bb.putInt(x.toInt))
              case U8 => v.foreach(x => bb.put(x.toInt.toByte))
              case F16 => v.foreach(x => bb.putShort(
                graft.functions.Binary16.floatToHalf(x.toFloat)))
            }
            os.write(bb.array())
          }
          os.close()
          val fsOut = outPath.getFileSystem(conf.value)
          fsOut.delete(outPath, false) // replace semantics
          require(fsOut.rename(new Path(dir, outPath.getName + ".tmp"),
            outPath), s"rename to $outPath failed")
          Iterator.single(pi)
        }
      }
      .count()
  }

  /** Headerless dense binary writer (S4 egress, core/io/binary.h): one
    * `part-NNNNN.bin` shard per partition, fixed-stride rows, no per-row
    * header. Rows must all have `dims` elements. */
  def writeRawBinary(df: DataFrame, dir: String, dims: Int, el: ElType): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    df.select(col("id").cast("long"), col("vec").cast("array<double>"))
      .sortWithinPartitions("id")
      .rdd
      .mapPartitionsWithIndex { case (pi, iter) =>
        if (iter.isEmpty) Iterator.empty
        else {
          val out = new Path(dir, f"part-$pi%05d.bin")
          val os = out.getFileSystem(conf.value).create(out, true)
          iter.foreach { row =>
            val v = row.getSeq[Double](1)
            require(v.length == dims,
              s"row ${row.getLong(0)}: ${v.length} dims, expected $dims")
            val bb = ByteBuffer.allocate(dims * el.bytes)
              .order(ByteOrder.LITTLE_ENDIAN)
            el match {
              case F32 => v.foreach(x => bb.putFloat(x.toFloat))
              case I32 => v.foreach(x => bb.putInt(x.toInt))
              case U8 => v.foreach(x => bb.put(x.toInt.toByte))
              case F16 => v.foreach(x => bb.putShort(
                graft.functions.Binary16.floatToHalf(x.toFloat)))
            }
            os.write(bb.array())
          }
          os.close()
          Iterator.single(pi)
        }
      }
      .count()
  }

  /** Headerless dense binary (SURVEY §2 S4 — core/io/binary.h): fixed-stride
    * rows of `dims` elements, no per-row header. */
  def readRawBinary(spark: SparkSession, path: String, dims: Int, el: ElType)
      : DataFrame = {
    import spark.implicits._
    val stride = dims.toLong * el.bytes
    val files = spark.read.format("binaryFile").load(resolve(spark, path): _*)
      .select(col("path"), col("length"), col("content"))
    val sizes = files.select("path", "length").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    sizes.foreach { case (p, len) =>
      require(len % stride == 0, s"$p length $len not a multiple of $stride") }
    val bases = sizes.scanLeft(0L) { case (acc, (_, len)) => acc + len / stride }
    val baseByPath = sizes.map(_._1).zip(bases).toMap
    val bc = spark.sparkContext.broadcast(baseByPath)
    files.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / stride
        val base = bc.value(p)
        (0L until n).iterator.map { r =>
          val out = new Array[Double](dims)
          var i = 0
          el match {
            case F32 => while (i < dims) { out(i) = bb.getFloat.toDouble; i += 1 }
            case I32 => while (i < dims) { out(i) = bb.getInt.toDouble; i += 1 }
            case U8 => while (i < dims) { out(i) = (bb.get & 0xff).toDouble; i += 1 }
            case F16 => while (i < dims) {
              out(i) = graft.functions.Binary16.halfToFloat(bb.getShort).toDouble
              i += 1 }
          }
          (base + r, out)
        }
      }
      .toDF("id", "vec")
  }
}
