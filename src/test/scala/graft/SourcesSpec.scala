package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.{SyntheticData, VecsIO, VectorTable}

class SourcesSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val root = s"/tmp/graft_test_src_$name"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  test("fvecs round trip is bit-exact for float32 data") {
    val dir = freshDir("fvecs")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    VecsIO.write(orig.repartitionByRange(3, col("id")), dir, VecsIO.F32)
    val back = VecsIO.read(spark, s"$dir/*.fvecs")
    assert(back.count() === orig.count())
    val joined = orig.join(back.withColumnRenamed("vec", "vec2"), Seq("id"))
    assert(joined.filter(col("vec") =!= col("vec2")).count() === 0)
  }

  test("ivecs and bvecs round trips preserve integral values") {
    val dir1 = freshDir("ivecs")
    val dir2 = freshDir("bvecs")
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, -5.0, 1000000.0)), (1L, Seq(7.0, 0.0, -1.0)))
      .toDF("id", "vec")
    VecsIO.write(df.coalesce(1), dir1, VecsIO.I32)
    val backI = VecsIO.read(spark, s"$dir1/*.ivecs").orderBy("id").collect()
    assert(backI(0).getSeq[Double](1) === Seq(1.0, -5.0, 1000000.0))
    val bdf = Seq((0L, Seq(0.0, 255.0, 17.0))).toDF("id", "vec")
    VecsIO.write(bdf.coalesce(1), dir2, VecsIO.U8)
    val backB = VecsIO.read(spark, s"$dir2/*.bvecs").collect()
    assert(backB(0).getSeq[Double](1) === Seq(0.0, 255.0, 17.0))
  }

  test("hvecs round trip equals the certified f16 expression codec, " +
      "legacy and DSv2 readers agree") {
    val dir = freshDir("hvecs")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    VecsIO.write(orig.repartitionByRange(3, col("id")), dir, VecsIO.F16)
    // expected = encode→decode through the q45-certified f16 codec
    import graft.functions.HalfFloat._
    val expect = orig.select(col("id"),
      float16Decode(float16Encode(col("vec"))).cast("array<double>")
        .as("vec_exp"))
    val back = VecsIO.read(spark, s"$dir/*.hvecs")
    assert(back.count() === orig.count())
    val j = back.withColumnRenamed("vec", "vec2").join(expect, Seq("id"))
    assert(j.filter(col("vec2") =!= col("vec_exp")).count() === 0)
    // the DSv2 reader decodes the same files identically
    val v2 = spark.read.format("graftvecs").load(s"$dir/*.hvecs")
    assert(v2.orderBy("id").collect().map(_.toSeq).toSeq ===
      back.orderBy("id").collect().map(_.toSeq).toSeq)
    // and the DSv2 writer emits hvecs the legacy reader round-trips
    val dir2 = freshDir("hvecs_v2w")
    orig.repartitionByRange(3, col("id")).write.format("graftvecs")
      .mode("overwrite").option("eltype", "hvecs").save(dir2)
    val backW = VecsIO.read(spark, s"$dir2/*.hvecs")
      .withColumnRenamed("vec", "vec2").join(expect, Seq("id"))
    assert(backW.filter(col("vec2") =!= col("vec_exp")).count() === 0)
  }

  test("bvecs byte-resident ingest: ARRAY<TINYINT> + unsigned mark, " +
      "widens to exactly what the wide reader produces") {
    val dir = freshDir("bvecs_resident")
    import spark.implicits._
    val bdf = Seq((0L, Seq(0.0, 255.0, 17.0)), (1L, Seq(128.0, 1.0, 200.0)))
      .toDF("id", "vec")
    VecsIO.write(bdf.coalesce(1), dir, VecsIO.U8)
    val resident = VecsIO.readBytesU8(spark, s"$dir/*.bvecs")
    assert(graft.functions.ByteVecs.isByteVec(
      resident.schema("vec").dataType))
    assert(graft.functions.ByteVecs.isUnsigned(resident.schema, "vec"))
    val widened = resident.select(col("id"),
      graft.functions.ByteVecs.widen(col("vec"), unsigned = true).as("vec"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val wide = VecsIO.read(spark, s"$dir/*.bvecs")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(widened === wide)
    // and the byte-resident table searches identically to the wide table
    val q = Seq((0L, Seq(100.0, 100.0, 100.0))).toDF("query_id", "qvec")
    val a = graft.operators.FlatKnn.search(q, resident, 2,
      graft.core.Metric.L2).collect().map(_.toSeq).toSeq
    val b = graft.operators.FlatKnn.search(q,
      VecsIO.read(spark, s"$dir/*.bvecs"), 2, graft.core.Metric.L2)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("multi-file vecs read assigns dense ids in path order") {
    val dir = freshDir("multifile")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    VecsIO.write(orig.repartitionByRange(5, col("id")), dir, VecsIO.F32)
    val back = VecsIO.read(spark, s"$dir/*.fvecs")
    assert(back.select("id").distinct().count() === 500)
    assert(back.agg(min("id"), max("id")).collect()(0).toSeq ===
      Seq(0L, 499L))
  }

  test("raw binary reader decodes fixed-stride rows") {
    val dir = freshDir("rawbin")
    val p = new org.apache.hadoop.fs.Path(dir, "data.bin")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    val bb = java.nio.ByteBuffer.allocate(2 * 3 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1.5f, 2.5f, 3.5f, -1.0f, 0.0f, 9.0f).foreach(bb.putFloat)
    os.write(bb.array()); os.close()
    val back = VecsIO.readRawBinary(spark, s"$dir/data.bin", 3, VecsIO.F32)
      .orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getSeq[Double](1) === Seq(1.5, 2.5, 3.5))
    assert(back(1).getSeq[Double](1) === Seq(-1.0, 0.0, 9.0))
  }

  test("VectorTable save/load round trip with sidecar checks") {
    val dir = freshDir("vtable")
    val df = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val meta = VectorTable.save(df, dir, eltype = "float32",
      metric = "cosine")
    assert(meta.dims === 64 && meta.count === 500)
    val loaded = VectorTable.load(spark, dir, expectDims = Some(64),
      expectElType = Some("float32"))
    assert(loaded.count() === 500)
    // expectation mismatches fail loudly (Matcher semantics)
    intercept[IllegalArgumentException] {
      VectorTable.load(spark, dir, expectDims = Some(128)) }
    intercept[IllegalArgumentException] {
      VectorTable.load(spark, dir, expectElType = Some("int8")) }
  }

  test("open dispatches by extension (S6)") {
    val dir = freshDir("dispatch")
    val df = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    VectorTable.save(df, dir)
    assert(VectorTable.open(spark, dir).count() === 500)
    val vdir = freshDir("dispatch_vecs")
    VecsIO.write(df.coalesce(1), vdir, VecsIO.F32)
    assert(VectorTable.open(spark, s"$vdir/part-00000.fvecs").count() === 500)
  }

  test("convert narrows element type and records it (S7)") {
    val dir = freshDir("convert")
    import spark.implicits._
    val df = Seq((0L, Seq(1.000000059604644775390625, 2.0)))
      .toDF("id", "vec") // value not representable in float32
    val meta = VectorTable.convert(df, dir, "float")
    assert(meta.eltype === "float")
    val v = VectorTable.load(spark, dir).collect()(0).getSeq[Double](1)
    assert(v(0) === 1.0f.toDouble) // narrowed
  }

  test(".svs v1 round trip preserves vectors and header fields") {
    val dir = freshDir("svs")
    import spark.implicits._
    val df = Seq(
      (0L, Seq(101.0, 102.0, 103.0, 104.0, 105.0)),
      (1L, Seq(106.0, 107.0, 108.0, 109.0, 110.0))).toDF("id", "vec")
    graft.sources.SvsNative.write(df, s"$dir/out.svs")
    val back = graft.sources.SvsNative.read(spark, s"$dir/out.svs")
      .orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getSeq[Double](1) === Seq(101.0, 102.0, 103.0, 104.0, 105.0))
    assert(back(1).getSeq[Double](1) === Seq(106.0, 107.0, 108.0, 109.0, 110.0))
    // a corrupted magic is rejected loudly
    val e = intercept[Exception] {
      graft.sources.SvsNative.readHeader(new Array[Byte](1024)) }
    assert(e.getMessage.contains("magic"))
  }

  test(".svs reader decodes the reference's committed v1 fixture") {
    val fixture = "/root/reference/data/schemas/test_v1.svs"
    assume(new java.io.File(fixture).exists(), "reference fixture not mounted")
    val rows = graft.sources.SvsNative.read(spark, fixture)
      .orderBy("id").collect()
    // header says 2 x 5; payload is 101.0f..110.0f (verified by hex dump)
    assert(rows.length === 2)
    assert(rows(0).getSeq[Double](1) === Seq(101.0, 102.0, 103.0, 104.0, 105.0))
    assert(rows(1).getSeq[Double](1) === Seq(106.0, 107.0, 108.0, 109.0, 110.0))
  }

  test("graftvecs DSv2: intra-file splits, legacy-reader equality, pruning") {
    val dir = freshDir("dsv2")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    VecsIO.write(orig.repartitionByRange(2, col("id")), dir, VecsIO.F32)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val ds = spark.read.format("graftvecs").load(s"$dir/*.fvecs")
      // 2 files × ~130KB at 8KB splits → many record-aligned partitions
      assert(ds.rdd.getNumPartitions > 2, s"${ds.rdd.getNumPartitions}")
      assert(ds.count() === orig.count())
      val legacy = VecsIO.read(spark, s"$dir/*.fvecs")
        .withColumnRenamed("vec", "vl")
      assert(ds.withColumnRenamed("vec", "v2").join(legacy, Seq("id"))
        .filter(col("v2") =!= col("vl")).count() === 0)
      // pruned scans: id-only never decodes payloads (visible in scan desc)
      val plan = ds.select("id").queryExecution.executedPlan.toString
      assert(plan.contains("cols=id"), plan.take(400))
      assert(ds.select("id").agg(sum("id")).head.getLong(0) ===
        (0L until orig.count()).sum)
      // limit pushdown: head(7) plans only the first record range
      val limited = ds.limit(7)
      assert(limited.rdd.getNumPartitions === 1,
        s"${limited.rdd.getNumPartitions}")
      assert(limited.collect().map(_.getLong(0)).toSeq ===
        (0L until 7L).toSeq)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("graftvecs DSv2 write: roundtrip equality with the legacy writer") {
    val dir = freshDir("dsv2w")
    val orig = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
    orig.write.format("graftvecs").mode("overwrite").save(dir)
    val back = spark.read.format("graftvecs").load(s"$dir/*.fvecs")
      .withColumnRenamed("vec", "v2")
    assert(back.count() === orig.count())
    // dense (path, row) ids: range-partitioned sorted input reproduces ids
    assert(orig.join(back, Seq("id"))
      .filter(col("vec") =!= col("v2")).count() === 0)
    // overwrite truncates: a second write leaves exactly one copy
    orig.write.format("graftvecs").mode("overwrite").save(dir)
    assert(spark.read.format("graftvecs").load(s"$dir/*.fvecs")
      .count() === orig.count())
    // append must NOT sweep the previous write's shards
    orig.write.format("graftvecs").mode("append").save(dir)
    assert(spark.read.format("graftvecs").load(s"$dir/*.fvecs")
      .count() === orig.count() * 2)
    // an empty shard file contributes zero rows, not a crash
    new java.io.FileOutputStream(s"$dir/part-zzzzz-0-empty.fvecs").close()
    assert(spark.read.format("graftvecs").load(s"$dir/*.fvecs")
      .count() === orig.count() * 2)
  }

  test("graftvecs DSv2 bytes mode: byte-resident bvecs splits with the " +
      "u8 mark, both directions") {
    import graft.functions.ByteVecs
    val s = spark
    import s.implicits._
    val dir = freshDir("dsv2byte")
    val u8 = ByteVecs.markUnsigned(
      (0L until 64L).map(i => (i, Seq(i.toByte, (-56).toByte, 255.toByte)))
        .toDF("id", "vec"))
    // write direction: u8 frame → bvecs raw bits (one shard per partition)
    u8.repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format("graftvecs").mode("overwrite").save(dir)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
      val ds = spark.read.format("graftvecs").option("bytes", "true")
        .load(s"$dir/*.bvecs")
      assert(ds.rdd.getNumPartitions > 2, s"${ds.rdd.getNumPartitions}")
      assert(ByteVecs.isUnsigned(ds.schema, "vec"))
      val legacy = VecsIO.readBytesU8(spark, s"$dir/*.bvecs")
        .withColumnRenamed("vec", "vl")
      assert(ds.withColumnRenamed("vec", "v2").join(legacy, Seq("id"))
        .filter(col("v2") =!= col("vl")).count() === 0)
      assert(ds.select("id").agg(sum("id")).head.getLong(0) ===
        (0L until 64L).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
    // refusals: bytes=true on non-bvecs; i8-marked frame into the u8
    // container; no .tmp residue from the atomic writer
    val dirF = freshDir("dsv2bytef")
    VecsIO.write(Seq((0L, Seq(1.0))).toDF("id", "vec"), dirF, VecsIO.F32)
    intercept[Exception] {
      spark.read.format("graftvecs").option("bytes", "true")
        .load(s"$dirF/*.fvecs").count()
    }
    intercept[Exception] {
      ByteVecs.markSigned(Seq((0L, Seq(1.toByte))).toDF("id", "vec"))
        .write.format("graftvecs").mode("overwrite")
        .save(freshDir("dsv2bytei"))
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.endsWith(".tmp")))
    // an orphaned .tmp from a crashed attempt must not break dir reads
    // (legacy AND DSv2 directory form both skip non-vecs names)
    val os = fs.create(
      new org.apache.hadoop.fs.Path(dir, "part-junk.bvecs.tmp"), true)
    os.write(Array[Byte](1, 2, 3)); os.close()
    assert(VecsIO.readBytesU8(spark, dir).count() === 64)
    assert(spark.read.format("graftvecs").option("bytes", "true")
      .load(dir).count() === 64)
  }

  test("graftvecs byte write refuses an explicit contradicting eltype " +
      "and accepts an explicit bvecs") {
    import graft.functions.ByteVecs
    val s = spark
    import s.implicits._
    val u8 = ByteVecs.markUnsigned(
      Seq((0L, Seq(1.toByte, 2.toByte))).toDF("id", "vec"))
    // explicit fvecs — previously indistinguishable from the absent
    // default — must be refused: it would silently write .bvecs shards
    intercept[Exception] {
      u8.write.format("graftvecs").option("eltype", "fvecs")
        .mode("overwrite").save(freshDir("byteeltf"))
    }
    // explicit bvecs matches the byte container and writes normally
    val dirB = freshDir("byteeltb")
    u8.write.format("graftvecs").option("eltype", "bvecs")
      .mode("overwrite").save(dirB)
    assert(spark.read.format("graftvecs").option("bytes", "true")
      .load(s"$dirB/*.bvecs").count() === 1)
  }

  test("graftvecs DSv2 handles ivecs element type end to end") {
    val dir = freshDir("dsv2i")
    val s = spark
    import s.implicits._
    val orig = Seq((0L, Seq(1.0, 2.0, 3.0)), (1L, Seq(-4.0, 5.0, 127.0)))
      .toDF("id", "vec").coalesce(1).sortWithinPartitions("id")
    orig.write.format("graftvecs").option("eltype", "ivecs")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graftvecs").load(s"$dir/*.ivecs")
      .orderBy("id").collect().map(_.getSeq[Double](1).toSeq)
    assert(back.toSeq === Seq(Seq(1.0, 2.0, 3.0), Seq(-4.0, 5.0, 127.0)))
  }

  test("synthetic generator is deterministic and in [0,1)") {
    val a = SyntheticData.generate(spark, 1000, 8)
    val b = SyntheticData.generate(spark, 1000, 8)
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
    val stats = a.select(explode(col("vec")).as("v"))
      .agg(min("v"), max("v")).collect()(0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) < 1.0)
  }
}
