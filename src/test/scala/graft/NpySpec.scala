package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.ByteVecs
import graft.sources.{NpyIO, VectorTable}

/** `.npy` source/sink (reference `bindings/python/src/svs/common.py:62`
  * read_npy). Round trips go through our writer; cross-compat with real
  * numpy output is pinned by hand-built byte streams following the NEP-1
  * layout (v1/v2 headers, C and Fortran order) — the same bytes `np.save`
  * / `tofile` produce. */
class NpySpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val root = s"/tmp/graft_test_npy_$name"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  private def writeFile(dir: String, name: String, bytes: Array[Byte])
      : String = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    os.write(bytes)
    os.close()
    p.toString
  }

  test("f8 round trip is bit-exact; f4 equals the float32 narrow") {
    val dir8 = freshDir("f8")
    val dir4 = freshDir("f4")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    NpyIO.write(orig.repartitionByRange(3, col("id")), dir8, "f8")
    val back8 = NpyIO.read(spark, s"$dir8/*.npy")
    assert(back8.count() === orig.count())
    assert(orig.join(back8.withColumnRenamed("vec", "vec2"), Seq("id"))
      .filter(col("vec") =!= col("vec2")).count() === 0)

    // embeddings are float32 at the source, so the f4 trip is lossless too
    NpyIO.write(orig.repartitionByRange(3, col("id")), dir4, "<f4")
    val back4 = NpyIO.read(spark, s"$dir4/*.npy")
    assert(orig.join(back4.withColumnRenamed("vec", "vec2"), Seq("id"))
      .filter(col("vec") =!= col("vec2")).count() === 0)
  }

  test("f2 round trip equals the certified f16 expression codec") {
    val dir = freshDir("f2")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    NpyIO.write(orig.repartitionByRange(2, col("id")), dir, "f2")
    import graft.functions.HalfFloat._
    val expect = orig.select(col("id"),
      float16Decode(float16Encode(col("vec"))).cast("array<double>")
        .as("vec"))
    val back = NpyIO.read(spark, s"$dir/*.npy")
    assert(expect.join(back.withColumnRenamed("vec", "vec2"), Seq("id"))
      .filter(col("vec") =!= col("vec2")).count() === 0)
  }

  test("integer dtypes round trip exact values") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, -5.0, 1000000.0)), (1L, Seq(7.0, 0.0, -1.0)))
      .toDF("id", "vec")
    for (d <- Seq("i2", "i4", "i8")) {
      val dir = freshDir(d)
      NpyIO.write(df.coalesce(1), dir, d)
      val back = NpyIO.read(spark, s"$dir/*.npy").orderBy("id").collect()
      val expect0 =
        if (d == "i2") Seq(1.0, -5.0, 16960.0) // 1000000 wraps in int16
        else Seq(1.0, -5.0, 1000000.0)
      assert(back(0).getSeq[Double](1) === expect0, d)
      assert(back(1).getSeq[Double](1) === Seq(7.0, 0.0, -1.0), d)
    }
  }

  test("u2/u4 round trip exact through the full unsigned value space") {
    import spark.implicits._
    // the u4 extremes are exactly where a saturating Double.toInt encode
    // would corrupt: 2³²−1 clamps to 2³¹−1, 2³¹ clamps too
    val u4Vals = Seq(0.0, 1.0, 65535.0, 2147483648.0, 4294967295.0)
    val u2Vals = Seq(0.0, 1.0, 255.0, 32768.0, 65535.0)
    val df4 = Seq((0L, u4Vals), (1L, u4Vals.reverse)).toDF("id", "vec")
    val df2 = Seq((0L, u2Vals), (1L, u2Vals.reverse)).toDF("id", "vec")
    for ((d, df, vals) <- Seq(("u2", df2, u2Vals), ("u4", df4, u4Vals))) {
      val dir = freshDir(d)
      NpyIO.write(df.coalesce(1), dir, d)
      // multi-byte unsigned widths must declare byte order ('<u2', not
      // '|u2') — numpy would treat '|' as native order and a big-endian
      // consumer would silently byte-swap every value
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val shard = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).find(_.getName.endsWith(".npy")).get
      val head = new Array[Byte](128)
      val in = fs.open(shard)
      try in.readFully(0L, head) finally in.close()
      assert(new String(head, StandardCharsets.ISO_8859_1)
        .contains(s"'<$d'"), d)
      val back = NpyIO.read(spark, s"$dir/*.npy").orderBy("id").collect()
      assert(back(0).getSeq[Double](1) === vals, d)
      assert(back(1).getSeq[Double](1) === vals.reverse, d)
      // the DSv2 source writes the same bytes and reads them back
      // (one ordered shard — npy carries no ids, re-read is positional)
      val dir2 = freshDir(s"${d}_dsv2")
      df.repartitionByRange(1, col("id")).sortWithinPartitions("id")
        .write.format("graftnpy").option("descr", d)
        .mode("overwrite").save(dir2)
      val back2 = spark.read.format("graftnpy").load(dir2)
        .orderBy("id").collect()
      assert(back2(0).getSeq[Double](1) === vals, d)
      assert(back2(1).getSeq[Double](1) === vals.reverse, d)
    }
  }

  test("u1/i1 byte-resident trip preserves raw bits and signedness marks") {
    import spark.implicits._
    val dirU = freshDir("u1")
    val dirI = freshDir("i1")
    // u8 values ≥ 128 store as negative raw bytes under the unsigned mark
    val u8 = ByteVecs.markUnsigned(
      Seq((0L, Seq(0.toByte, (-56).toByte, 127.toByte)),
          (1L, Seq(255.toByte, 1.toByte, (-128).toByte))).toDF("id", "vec"))
    NpyIO.writeBytes(u8.coalesce(1), dirU)
    val backU = NpyIO.readBytes(spark, s"$dirU/*.npy")
    assert(ByteVecs.isUnsigned(backU.schema, "vec"))
    assert(backU.orderBy("id").collect()(0).getSeq[Byte](1)
      === Seq(0.toByte, (-56).toByte, 127.toByte))
    // wide read of the same file widens with & 0xFF (200, 255, 128)
    val wideU = NpyIO.read(spark, s"$dirU/*.npy").orderBy("id").collect()
    assert(wideU(0).getSeq[Double](1) === Seq(0.0, 200.0, 127.0))
    assert(wideU(1).getSeq[Double](1) === Seq(255.0, 1.0, 128.0))

    val i8 = ByteVecs.markSigned(
      Seq((0L, Seq((-128).toByte, 0.toByte, 127.toByte))).toDF("id", "vec"))
    NpyIO.writeBytes(i8.coalesce(1), dirI)
    val backI = NpyIO.readBytes(spark, s"$dirI/*.npy")
    assert(!ByteVecs.isUnsigned(backI.schema, "vec"))
    assert(ByteVecs.signednessOf(backI.schema, "vec") === Some(false))
    val wideI = NpyIO.read(spark, s"$dirI/*.npy").collect()
    assert(wideI(0).getSeq[Double](1) === Seq(-128.0, 0.0, 127.0))
  }

  /** Hand-build the exact bytes `np.save` writes for
    * `np.arange(6, dtype).reshape(2, 3)` (v1.0, C order). */
  private def numpyStyleFile(descr: String, fortran: Boolean,
                             version: Int, payload: Array[Byte],
                             shape: String): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': " +
      s"${if (fortran) "True" else "False"}, 'shape': $shape, }"
    val hoff = if (version == 1) 10 else 12
    val unpadded = hoff + dict.length + 1
    val padded = ((unpadded + 63) / 64) * 64
    val bb = ByteBuffer.allocate(padded + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).put('N'.toByte).put('U'.toByte).put('M'.toByte)
      .put('P'.toByte).put('Y'.toByte)
      .put(version.toByte).put(0.toByte)
    if (version == 1) bb.putShort((padded - 10).toShort)
    else bb.putInt(padded - 12)
    bb.put(dict.getBytes(StandardCharsets.ISO_8859_1))
    while (bb.position() < padded - 1) bb.put(' '.toByte)
    bb.put('\n'.toByte)
    bb.put(payload)
    bb.array()
  }

  test("reads hand-built numpy layouts: v1/v2 headers, C and F order") {
    val dir = freshDir("compat")
    // C-order f4: [[0,1,2],[3,4,5]]
    val cPayload = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 6).foreach(i => cPayload.putFloat(i.toFloat))
    writeFile(dir, "c.npy",
      numpyStyleFile("<f4", fortran = false, 1, cPayload.array(), "(2, 3)"))
    val c = NpyIO.read(spark, s"$dir/c.npy").orderBy("id").collect()
    assert(c(0).getSeq[Double](1) === Seq(0.0, 1.0, 2.0))
    assert(c(1).getSeq[Double](1) === Seq(3.0, 4.0, 5.0))

    // Fortran order stores column-major: same logical array
    val fPayload = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    Seq(0, 3, 1, 4, 2, 5).foreach(i => fPayload.putFloat(i.toFloat))
    writeFile(dir, "f.npy",
      numpyStyleFile("<f4", fortran = true, 1, fPayload.array(), "(2, 3)"))
    val f = NpyIO.read(spark, s"$dir/f.npy").orderBy("id").collect()
    assert(f(0).getSeq[Double](1) === Seq(0.0, 1.0, 2.0))
    assert(f(1).getSeq[Double](1) === Seq(3.0, 4.0, 5.0))

    // v2.0 header (u32 length field)
    writeFile(dir, "v2.npy",
      numpyStyleFile("<f4", fortran = false, 2, cPayload.array(), "(2, 3)"))
    val v2 = NpyIO.read(spark, s"$dir/v2.npy").orderBy("id").collect()
    assert(v2(1).getSeq[Double](1) === Seq(3.0, 4.0, 5.0))

    // 1-D array (n,) reads as dims=1 — np.save writes shape "(4,)"
    val oneD = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(i => oneD.putDouble(i * 1.5))
    writeFile(dir, "one_d.npy",
      numpyStyleFile("<f8", fortran = false, 1, oneD.array(), "(4,)"))
    val od = NpyIO.read(spark, s"$dir/one_d.npy").orderBy("id").collect()
    assert(od.length === 4)
    assert(od(3).getSeq[Double](1) === Seq(4.5))
  }

  test("multi-shard reads keep dense (path, row)-ordered ids; " +
      "auto-detection opens .npy") {
    import spark.implicits._
    val dir = freshDir("shards")
    val df = (0L until 20L).map(i => (i, Seq(i.toDouble, i * 2.0)))
      .toDF("id", "vec")
    NpyIO.write(df.repartitionByRange(4, col("id")), dir, "f8")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".npy")) === 4)
    val back = NpyIO.read(spark, s"$dir/*.npy")
    assert(back.count() === 20)
    assert(back.filter(col("id") =!= element_at(col("vec"), 1)).count()
      === 0)
    // S6 auto-dispatch
    val opened = VectorTable.open(spark, s"$dir/part-00000.npy")
    assert(opened.columns.toSeq === Seq("id", "vec"))
    assert(opened.count() > 0)
  }

  test("graftnpy DSv2: intra-file splits, legacy-reader equality, pruning, " +
      "limit") {
    val dir = freshDir("dsv2")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    NpyIO.write(orig.repartitionByRange(2, col("id")), dir, "f4")
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val ds = spark.read.format("graftnpy").load(s"$dir/*.npy")
      // 2 files × ~130KB at 8KB splits → many row-aligned partitions
      assert(ds.rdd.getNumPartitions > 2, s"${ds.rdd.getNumPartitions}")
      assert(ds.count() === orig.count())
      val legacy = NpyIO.read(spark, s"$dir/*.npy")
        .withColumnRenamed("vec", "vl")
      assert(ds.withColumnRenamed("vec", "v2").join(legacy, Seq("id"))
        .filter(col("v2") =!= col("vl")).count() === 0)
      // pruned scans: id-only never decodes payloads (visible in scan desc)
      val plan = ds.select("id").queryExecution.executedPlan.toString
      assert(plan.contains("cols=id"), plan.take(400))
      assert(ds.select("id").agg(sum("id")).head.getLong(0) ===
        (0L until orig.count()).sum)
      // limit pushdown: head(7) plans only the first row range
      val limited = ds.limit(7)
      assert(limited.rdd.getNumPartitions === 1,
        s"${limited.rdd.getNumPartitions}")
      assert(limited.collect().map(_.getLong(0)).toSeq ===
        (0L until 7L).toSeq)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("graftnpy DSv2 write: roundtrip, overwrite, append, empty partition") {
    val dir = freshDir("dsv2w")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
    orig.write.format("graftnpy").option("descr", "f8")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graftnpy").load(s"$dir/*.npy")
      .withColumnRenamed("vec", "v2")
    assert(back.count() === orig.count())
    // dense (path, row) ids: range-partitioned sorted input reproduces ids
    assert(orig.join(back, Seq("id"))
      .filter(col("vec") =!= col("v2")).count() === 0)
    // overwrite truncates: a second write leaves exactly one copy
    orig.write.format("graftnpy").option("descr", "f8")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graftnpy").load(s"$dir/*.npy")
      .count() === orig.count())
    // append must NOT sweep the previous write's shards
    orig.write.format("graftnpy").option("descr", "f8")
      .mode("append").save(dir)
    assert(spark.read.format("graftnpy").load(s"$dir/*.npy")
      .count() === orig.count() * 2)
    // an empty input partition emits no file and commit survives
    val s = spark
    import s.implicits._
    val dir2 = freshDir("dsv2e")
    val sparse = Seq((0L, Seq(1.0, 2.0))).toDF("id", "vec")
      .repartition(4)
    sparse.write.format("graftnpy").mode("overwrite").save(dir2)
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir2))
      .count(_.getPath.getName.endsWith(".npy")) === 1)
    assert(spark.read.format("graftnpy").load(s"$dir2/*.npy")
      .count() === 1)
  }

  test("graftnpy DSv2 bytes mode: byte-resident splits with the mark, " +
      "both directions") {
    val s = spark
    import s.implicits._
    val dir = freshDir("dsv2b")
    // u8 values ≥ 128 store as negative raw bytes under the unsigned mark
    val u8 = ByteVecs.markUnsigned(
      (0L until 64L).map(i => (i, Seq(i.toByte, (-56).toByte, 255.toByte)))
        .toDF("id", "vec"))
    NpyIO.writeBytes(u8.repartitionByRange(2, col("id"))
      .sortWithinPartitions("id"), dir)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
      val ds = spark.read.format("graftnpy").option("bytes", "true")
        .load(s"$dir/*.npy")
      assert(ds.rdd.getNumPartitions > 2, s"${ds.rdd.getNumPartitions}")
      // schema carries TINYINT + the unsigned mark, like readBytes
      assert(ByteVecs.isUnsigned(ds.schema, "vec"))
      val legacy = NpyIO.readBytes(spark, s"$dir/*.npy")
        .withColumnRenamed("vec", "vl")
      assert(ds.withColumnRenamed("vec", "v2").join(legacy, Seq("id"))
        .filter(col("v2") =!= col("vl")).count() === 0)
      // pruned id-only scan works in bytes mode too
      assert(ds.select("id").agg(sum("id")).head.getLong(0) ===
        (0L until 64L).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
    // write direction: a marked byte frame persists raw bits as u1
    val dir2 = freshDir("dsv2bw")
    u8.repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format("graftnpy").mode("overwrite").save(dir2)
    val back = NpyIO.readBytes(spark, s"$dir2/*.npy")
    assert(ByteVecs.isUnsigned(back.schema, "vec"))
    assert(u8.withColumnRenamed("vec", "vo")
      .join(back, Seq("id"))
      .filter(col("vo") =!= col("vec")).count() === 0)
    // i8 twin keeps the signed mark
    val dir3 = freshDir("dsv2bi")
    val i8 = ByteVecs.markSigned(
      Seq((0L, Seq((-128).toByte, 127.toByte))).toDF("id", "vec"))
    i8.coalesce(1).write.format("graftnpy").mode("overwrite").save(dir3)
    val backI = spark.read.format("graftnpy").option("bytes", "true")
      .load(s"$dir3/*.npy")
    assert(ByteVecs.signednessOf(backI.schema, "vec") === Some(false))
    assert(backI.collect()(0).getSeq[Byte](1) ===
      Seq((-128).toByte, 127.toByte))
    // refusals: bytes=true on a wide file; contradicting descr option;
    // bare (unmarked) byte frame
    val dirW = freshDir("dsv2bwide")
    NpyIO.write(Seq((0L, Seq(1.0))).toDF("id", "vec"), dirW, "f4")
    intercept[Exception] {
      spark.read.format("graftnpy").option("bytes", "true")
        .load(s"$dirW/*.npy").count()
    }
    intercept[Exception] {
      u8.write.format("graftnpy").option("descr", "i1")
        .mode("overwrite").save(freshDir("dsv2bx"))
    }
    intercept[Exception] { // bare byte frame: no mark was ever declared
      Seq((0L, Seq(1.toByte))).toDF("id", "vec")
        .write.format("graftnpy").mode("overwrite")
        .save(freshDir("dsv2by"))
    }
  }

  test("graftnpy DSv2 bytes mode: schema is the single source of truth") {
    val s = spark
    import s.implicits._
    val u8 = ByteVecs.markUnsigned(
      (0L until 8L).map(i => (i, Seq(i.toByte, 200.toByte)))
        .toDF("id", "vec"))
    // write path may carry the read option (fresh target: nothing to
    // probe) — inferSchema must not die or reject
    val dir = freshDir("schemaw")
    u8.coalesce(1).write.format("graftnpy").option("bytes", "true")
      .mode("overwrite").save(dir)
    // option key is case-insensitive end to end
    val up = spark.read.format("graftnpy").option("BYTES", "true")
      .load(s"$dir/*.npy")
    assert(ByteVecs.isUnsigned(up.schema, "vec"))
    assert(up.count() === 8)
    assert(up.orderBy("id").collect()(1).getSeq[Byte](1)
      === Seq(1.toByte, 200.toByte))
    // a user-supplied byte schema selects byte decode without the option
    val explicit = spark.read.format("graftnpy")
      .schema(graft.sources.NpyDataSource.byteSchema(unsigned = true))
      .load(s"$dir/*.npy")
    assert(explicit.orderBy("id").collect()(0).getSeq[Byte](1)
      === Seq(0.toByte, 200.toByte))
    // corrupt v2 header length (u32 with the sign bit set) fails loudly,
    // not with a NegativeArraySizeException
    val dirC = freshDir("schemac")
    val bad = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    bad.put(0x93.toByte).put('N'.toByte).put('U'.toByte).put('M'.toByte)
      .put('P'.toByte).put('Y'.toByte).put(2.toByte).put(0.toByte)
    bad.putInt(0x80000000)
    writeFile(dirC, "bad.npy", bad.array())
    val e = intercept[Exception] {
      spark.read.format("graftnpy").load(s"$dirC/bad.npy").count()
    }
    assert(!e.isInstanceOf[NegativeArraySizeException], e.toString)
  }

  test("graftnpy DSv2 rejects fortran-order shards loudly") {
    val dir = freshDir("dsv2f")
    val p = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    Seq(0, 3, 1, 4, 2, 5).foreach(i => p.putFloat(i.toFloat))
    writeFile(dir, "f.npy",
      numpyStyleFile("<f4", fortran = true, 1, p.array(), "(2, 3)"))
    val e = intercept[Exception] {
      spark.read.format("graftnpy").load(s"$dir/f.npy").count()
    }
    assert(e.getMessage.contains("fortran"))
    // NpyIO.read remains the documented fallback for such files
    assert(NpyIO.read(spark, s"$dir/f.npy").orderBy("id").collect()(1)
      .getSeq[Double](1) === Seq(3.0, 4.0, 5.0))
  }

  test("corrupt inputs fail loudly") {
    val dir = freshDir("bad")
    // wrong magic
    writeFile(dir, "magic.npy", Array.fill[Byte](32)(7))
    intercept[Exception] { NpyIO.read(spark, s"$dir/magic.npy").count() }
    // big-endian descr
    val p = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    p.putFloat(1f); p.putFloat(2f)
    writeFile(dir, "be.npy",
      numpyStyleFile(">f4", fortran = false, 1, p.array(), "(1, 2)"))
    intercept[Exception] { NpyIO.read(spark, s"$dir/be.npy").count() }
    // payload shorter than shape claims
    writeFile(dir, "trunc.npy",
      numpyStyleFile("<f4", fortran = false, 1, p.array(), "(3, 2)"))
    intercept[Exception] { NpyIO.read(spark, s"$dir/trunc.npy").count() }
    // rank-3 tensor is not a vector table
    writeFile(dir, "rank3.npy",
      numpyStyleFile("<f4", fortran = false, 1, p.array(), "(1, 1, 2)"))
    intercept[Exception] { NpyIO.read(spark, s"$dir/rank3.npy").count() }
    // readBytes refuses wide dtypes
    writeFile(dir, "wide.npy",
      numpyStyleFile("<f4", fortran = false, 1, p.array(), "(1, 2)"))
    intercept[Exception] {
      NpyIO.readBytes(spark, s"$dir/wide.npy").count()
    }
  }

  test("v2 header length with the sign bit set fails the bound check " +
      "loudly (masked u32, not signed)") {
    // corrupt u32 header length 0x80000010: a signed getInt reads this
    // negative and would slice the dict string with a negative index;
    // the masked parse must reach the 'header probe too small' require
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).put('N'.toByte).put('U'.toByte).put('M'.toByte)
      .put('P'.toByte).put('Y'.toByte).put(2.toByte).put(0.toByte)
    bb.putInt(0x80000010)
    val e = intercept[IllegalArgumentException] {
      NpyIO.parseHeader(bb.array(), "corrupt")
    }
    assert(e.getMessage.contains("header probe too small"))
  }

  test("a >2 GiB row stride is refused at DSv2 planning") {
    val dir = freshDir("hugestride")
    // header-only file CLAIMING shape (1, 3e8) f8 → 2.4 GB row stride;
    // the stride guard fires before the payload-length check, so no
    // actual giant payload is needed
    writeFile(dir, "huge.npy", NpyIO.headerBytes("f8", 1L, 300000000))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    val e = intercept[Exception] {
      spark.read.format("graftnpy").load(s"$dir/huge.npy").count()
    }
    assert(msgs(e).contains("exceeds 2 GiB"))
  }

  test("writeSingleFile: a multi-partition frame lands as ONE loadable " +
      "file with exact ids, no whole-partition buffering") {
    val s = spark
    import s.implicits._
    val dir = freshDir("single")
    val n = 1000L
    val orig = (0L until n).map(i => (i, Seq(i * 0.5, -i.toDouble, 3.25)))
      .toDF("id", "vec").repartition(7) // deliberately unordered input
    NpyIO.writeSingleFile(orig, s"$dir/all.npy", "f8")
    // ONE file, parsed by the standard header probe
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSeq
    assert(files === Seq("all.npy"), "exactly one output file, no residue")
    val back = NpyIO.read(spark, s"$dir/all.npy")
    assert(back.count() === n)
    assert(orig.join(back.withColumnRenamed("vec", "v2"), Seq("id"))
      .filter(col("vec") =!= col("v2")).count() === 0)
    // the DSv2 source range-splits the single file too
    val dsv2 = spark.read.format("graftnpy").load(s"$dir/all.npy")
    assert(dsv2.agg(sum("id")).head.getLong(0) === (0L until n).sum)
    // non-dense ids are refused loudly (re-read would silently remap),
    // and the failed attempt sweeps BOTH the segments dir and any
    // partial output — a truncated gap.npy would look complete to a
    // later np.load, and orphan segment dirs would accumulate per retry
    intercept[Exception] {
      NpyIO.writeSingleFile(
        orig.filter(col("id") =!= 7), s"$dir/gap.npy", "f8")
    }
    val residue = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("gap.npy"))
    assert(residue.isEmpty, s"failed writeSingleFile left: ${residue.toSeq}")
    // a FAILED RE-RUN over an existing valid output must not destroy it:
    // the attempt writes to all.npy.tmp and only renames on success, so
    // the prior artifact at the final name survives the failure intact
    intercept[Exception] {
      NpyIO.writeSingleFile(
        orig.filter(col("id") =!= 7), s"$dir/all.npy", "f8")
    }
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).map(_.getPath.getName).toSeq.sorted
    assert(after === Seq("all.npy"),
      s"failed re-run must leave only the prior artifact: $after")
    assert(NpyIO.read(spark, s"$dir/all.npy").count() === n,
      "prior output must survive a failed re-run byte-complete")
  }

  test("legacy writer sweeps stale .tmp orphans across append waves") {
    val s = spark
    import s.implicits._
    val dir = freshDir("tmpsweep")
    val wave1 = (0L until 10L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("id", "vec").coalesce(1).sortWithinPartitions("id")
    NpyIO.write(wave1, dir, "f8", idShardNames = true)
    // a crashed attempt's orphan from "wave 1.5"
    writeFile(dir, "base-000000000099.npy.tmp", Array[Byte](1, 2, 3))
    val wave2 = (10L until 20L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("id", "vec").coalesce(1).sortWithinPartitions("id")
    NpyIO.write(wave2, dir, "f8", idShardNames = true, append = true)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.endsWith(".tmp")),
      "stale .tmp must be swept at the start of the next wave")
    assert(NpyIO.read(spark, s"$dir/*.npy").count() === 20)
  }
}
