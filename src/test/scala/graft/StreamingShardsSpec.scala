package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.NpyIO
import graft.streaming.StreamingShards

/** Streaming `.npy` shard ingest ≡ batch read: shards landing in waves
  * decode to the same rows, and base-named shards restore exact original
  * ids (the contract a downstream dynamic index keys on). */
class StreamingShardsSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val root = s"/tmp/graft_test_shardstream_$name"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    root
  }

  private def collectStream(src: DataFrame, ckpt: String)
      (waves: (() => Unit)*): Seq[(Long, Seq[Double])] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select("id", "vec").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    try waves.foreach { w => w(); q.processAllAvailable() }
    finally q.stop()
    buf.toSeq
  }

  test("two landing waves stream-decode to exact batch rows and ids") {
    val s = spark
    import s.implicits._
    val dir = freshDir("waves")
    val ckpt = freshDir("waves_ckpt")
    val all = (0L until 40L).map(i =>
      (i, Seq(i.toDouble, i * 0.5, -i.toDouble))).toDF("id", "vec")
    val wave1 = all.filter(col("id") < 25)
    val wave2 = all.filter(col("id") >= 25)

    // wave 1 exists before the stream starts; wave 2 lands mid-stream
    NpyIO.write(wave1.repartitionByRange(3, col("id")), dir, "f8",
      idShardNames = true)
    val got = collectStream(
      StreamingShards.npyShardsWithIds(spark, dir), ckpt)(
      () => (),
      () => NpyIO.write(wave2.repartitionByRange(2, col("id")), dir, "f8",
        idShardNames = true, append = true))

    assert(got.size === 40)
    val expect = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(got.sortBy(_._1) === expect.sortBy(_._1))
    // append kept wave-1 shards: batch reader sees both waves too
    assert(NpyIO.read(spark, s"$dir/*.npy").count() === 40)
  }

  test("coordinate stream (shard, row, vec) covers un-based shards") {
    val s = spark
    import s.implicits._
    val dir = freshDir("coords")
    val ckpt = freshDir("coords_ckpt")
    val df = (0L until 10L).map(i => (i, Seq(i.toDouble))).toDF("id", "vec")
    NpyIO.write(df.coalesce(1), dir, "f8") // positional part-00000.npy
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val q = StreamingShards.npyShards(spark, dir).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getSeq[Double](2).head))
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(buf.size === 10)
    assert(buf.forall(_._1 == "part-00000.npy"))
    assert(buf.sortBy(_._2).map(_._3).toSeq === (0 until 10).map(_.toDouble))
  }

  test("landing shards feed a dynamic index end to end") {
    val s = spark
    import s.implicits._
    import graft.core.Metric
    import graft.operators.{DynamicVectorTable, FlatKnn}
    val dir = freshDir("e2e")
    val ckpt = freshDir("e2e_ckpt")
    val root = freshDir("e2e_tbl")
    val all = (0L until 30L).map(i => (i, Seq(i.toDouble, 2.0 * i)))
      .toDF("id", "vec")
    NpyIO.write(all.filter(col("id") < 15).repartitionByRange(2, col("id")),
      dir, "f8", idShardNames = true)
    val tbl = new DynamicVectorTable(spark, root)
    val q = graft.streaming.StreamingIngest.attach(
      StreamingShards.npyShardsWithIds(spark, dir), tbl, ckpt)
    try {
      q.processAllAvailable()
      assert(tbl.current.count() === 15)
      NpyIO.write(
        all.filter(col("id") >= 15).repartitionByRange(2, col("id")),
        dir, "f8", idShardNames = true, append = true)
      q.processAllAvailable()
      assert(tbl.current.count() === 30)
    } finally q.stop()
    // the landed index serves: the exact NN of (10, 20) is id 10
    val queries = Seq((0L, Seq(10.0, 20.0))).toDF("query_id", "qvec")
    val res = FlatKnn.search(queries, tbl.current.select("id", "vec"), 1,
      Metric.L2).collect()
    assert(res.length === 1)
    assert(res.head.getAs[Long]("neighbor_id") === 10L)
  }

  test("fvecs landing shards stream with exact ids too") {
    val s = spark
    import s.implicits._
    import graft.sources.VecsIO
    val dir = freshDir("vecs")
    val ckpt = freshDir("vecs_ckpt")
    val all = (0L until 20L).map(i => (i, Seq(i.toDouble, -i.toDouble)))
      .toDF("id", "vec")
    VecsIO.write(all.filter(col("id") < 12).repartitionByRange(2, col("id")),
      dir, VecsIO.F32, idShardNames = true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    val q = StreamingShards.vecsShardsWithIds(spark, dir, "fvecs")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select("id", "vec").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(buf.size === 12)
      VecsIO.write(
        all.filter(col("id") >= 12).repartitionByRange(2, col("id")),
        dir, VecsIO.F32, idShardNames = true, append = true)
      q.processAllAvailable()
    } finally q.stop()
    assert(buf.size === 20)
    val expect = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(buf.toSeq.sortBy(_._1) === expect.sortBy(_._1))
  }

  test("id restoration refuses shards without a base name") {
    val s = spark
    import s.implicits._
    val dir = freshDir("nobase")
    val ckpt = freshDir("nobase_ckpt")
    val df = (0L until 4L).map(i => (i, Seq(i.toDouble))).toDF("id", "vec")
    NpyIO.write(df.coalesce(1), dir, "f8") // part name, no base
    val e = intercept[Exception] {
      collectStream(StreamingShards.npyShardsWithIds(spark, dir), ckpt)(
        () => ())
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    assert(causes(e).exists(_.contains("base-<startId>")), causes(e))
  }

  test("idShardNames write requires contiguous ids per partition") {
    val s = spark
    import s.implicits._
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    val dir = freshDir("gap")
    val gappy = Seq((0L, Seq(1.0)), (2L, Seq(2.0))).toDF("id", "vec")
    val e = intercept[Exception] {
      NpyIO.write(gappy.coalesce(1), dir, "f8", idShardNames = true)
    }
    assert(causes(e).exists(_.contains("contiguous")), causes(e))
    // duplicates and gaps that CANCEL (span == count) must still fail:
    // ids [0, 0, 2, 3] would otherwise mint a phantom id 1 downstream
    val cancel = Seq((0L, Seq(1.0)), (0L, Seq(1.0)), (2L, Seq(2.0)),
      (3L, Seq(3.0))).toDF("id", "vec")
    val e2 = intercept[Exception] {
      NpyIO.write(cancel.coalesce(1), dir, "f8", idShardNames = true)
    }
    assert(causes(e2).exists(_.contains("contiguous")), causes(e2))
    val e3 = intercept[Exception] {
      graft.sources.VecsIO.write(cancel.coalesce(1), dir,
        graft.sources.VecsIO.F32, idShardNames = true)
    }
    assert(causes(e3).exists(_.contains("contiguous")), causes(e3))
    // a failed vecs shard leaves neither the final file nor its .tmp
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(n => n.contains("fvecs"))
    assert(left.isEmpty, left.toSeq)
    // append without id names is refused up front
    val ok = Seq((0L, Seq(1.0))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      NpyIO.write(ok, dir, "f8", append = true)
    }
  }

  test("writers leave no .tmp residue and never expose partial shards") {
    val s = spark
    import s.implicits._
    val dir = freshDir("atomic")
    val df = (0L until 12L).map(i => (i, Seq(i.toDouble))).toDF("id", "vec")
    NpyIO.write(df.repartitionByRange(2, col("id")), dir, "f8",
      idShardNames = true)
    graft.sources.VecsIO.write(df.repartitionByRange(2, col("id")),
      s"${dir}_v", graft.sources.VecsIO.F32, idShardNames = true)
    df.repartition(2).write.format("graftnpy").mode("overwrite")
      .save(s"${dir}_d")
    val conf = spark.sparkContext.hadoopConfiguration
    for (d <- Seq(dir, s"${dir}_v", s"${dir}_d")) {
      val p = new org.apache.hadoop.fs.Path(d)
      val names = p.getFileSystem(conf).listStatus(p)
        .map(_.getPath.getName).toSeq
      assert(!names.exists(_.endsWith(".tmp")), s"$d: $names")
    }
    // an unsupported descr is rejected BEFORE the destructive delete:
    // target intact
    intercept[IllegalArgumentException] {
      NpyIO.write(df, dir, "c8", idShardNames = true)
    }
    assert(NpyIO.read(spark, s"$dir/*.npy").count() === 12)
  }

  private def writeManifest(dir: String, name: String,
                            lines: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    os.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    os.close()
  }

  private def shardPaths(dir: String, ext: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.toString)
      .filter(_.endsWith(s".$ext")).sorted
  }

  test("manifest-driven ingest: exactly-once decode under manifest " +
      "replay and late-appended manifests") {
    val s = spark
    import s.implicits._
    val dataDir = freshDir("mani_data")
    val maniDir = freshDir("mani")
    val ckpt = freshDir("mani_ckpt")
    val all = (0L until 30L).map(i =>
      (i, Seq(i.toDouble, -i * 2.0))).toDF("id", "vec")
    val wave1 = all.filter(col("id") < 20)
    val wave2 = all.filter(col("id") >= 20)
    NpyIO.write(wave1.repartitionByRange(2, col("id")), dataDir, "f8",
      idShardNames = true)
    val w1Paths = shardPaths(dataDir, "npy")
    assert(w1Paths.size === 2)

    val got = collectStream(
      StreamingShards.npyShardsFromManifestsWithIds(spark, maniDir), ckpt)(
      // manifest 1: wave-1 shards, plus comments/blanks that must be
      // ignored — the stream lists ONLY the manifest dir
      () => writeManifest(maniDir, "manifest-000.txt",
        Seq("# wave 1") ++ w1Paths ++ Seq("")),
      // manifest 2 lands LATE and REPLAYS wave 1 (at-least-once
      // producer): wave-2 shards decode once, replayed wave-1 paths
      // are dropped before any bytes are fetched
      () => {
        NpyIO.write(wave2.coalesce(1), dataDir, "f8",
          idShardNames = true, append = true)
        val w2Paths = shardPaths(dataDir, "npy").diff(w1Paths)
        writeManifest(maniDir, "manifest-001.txt", w1Paths ++ w2Paths)
      })

    val expect = all.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(got.size === 30, "replayed shard paths must not decode twice")
    assert(got.sortBy(_._1) === expect.sortBy(_._1))
  }

  test("manifest-driven vecs twin restores ids; vanished shard fails " +
      "loudly") {
    val s = spark
    import s.implicits._
    val dataDir = freshDir("mani_vecs_data")
    val maniDir = freshDir("mani_vecs")
    val ckpt = freshDir("mani_vecs_ckpt")
    val all = (0L until 12L).map(i =>
      (i, Seq(i.toDouble, i + 0.5))).toDF("id", "vec")
    graft.sources.VecsIO.write(all.coalesce(1), dataDir,
      graft.sources.VecsIO.F32, idShardNames = true)
    val paths = shardPaths(dataDir, "fvecs")
    val got = collectStream(
      StreamingShards.vecsShardsFromManifestsWithIds(spark, maniDir,
        "fvecs"), ckpt)(
      () => writeManifest(maniDir, "m0.txt", paths))
    assert(got.map(_._1).sorted === (0L until 12L))
    // a manifest listing a path that does not exist fails the batch
    val ckpt2 = freshDir("mani_vecs_ckpt2")
    val maniDir2 = freshDir("mani_vecs2")
    writeManifest(maniDir2, "m0.txt", Seq(s"$dataDir/nope.fvecs"))
    intercept[Exception] {
      collectStream(
        StreamingShards.vecsShardsFromManifestsWithIds(spark, maniDir2,
          "fvecs"), ckpt2)(() => ())
    }
  }

  test("manifest dedup canonicalizes path spellings: double/trailing " +
      "slashes and dot segments of one shard decode once") {
    val s = spark
    import s.implicits._
    val dataDir = freshDir("mani_canon_data")
    val maniDir = freshDir("mani_canon")
    val ckpt = freshDir("mani_canon_ckpt")
    val df = (0L until 8L).map(i => (i, Seq(i.toDouble))).toDF("id", "vec")
    NpyIO.write(df.coalesce(1), dataDir, "f8", idShardNames = true)
    val path = shardPaths(dataDir, "npy").head
    val name = path.substring(path.lastIndexOf('/') + 1)
    // four spellings of the SAME shard — a literal-string dedup would
    // decode it four times and quadruple the rows
    val spellings = Seq(
      path,
      path.replace(s"/$name", s"//$name"),
      path.replace(s"/$name", s"/./$name"),
      s"$dataDir/../${dataDir.substring(dataDir.lastIndexOf('/') + 1)}/$name")
    val got = collectStream(
      StreamingShards.npyShardsFromManifestsWithIds(spark, maniDir), ckpt)(
      () => writeManifest(maniDir, "m0.txt", spellings.take(2)),
      () => writeManifest(maniDir, "m1.txt", spellings.drop(2)))
    assert(got.size === 8, "equivalent spellings must dedupe to one decode")
    assert(got.map(_._1).sorted === (0L until 8L))
  }

  test("manifest shard paths with URI-special characters (space, %) " +
      "open correctly AND still dedup across spellings") {
    val s = spark
    import s.implicits._
    // the canonical dedup key percent-encodes specials (space → %20,
    // % → %25); opening the shard must NOT go through that encoded
    // string, or this decode fails with file-not-found
    val dataDir = freshDir("mani uri%25 data")
    val maniDir = freshDir("mani_uri_mani")
    val ckpt = freshDir("mani_uri_ckpt")
    val df = (0L until 7L).map(i => (i, Seq(i.toDouble))).toDF("id", "vec")
    NpyIO.write(df.coalesce(1), dataDir, "f8", idShardNames = true)
    val path = shardPaths(dataDir, "npy").head
    assert(path.contains(" ") && path.contains("%"),
      s"fixture must exercise URI-special characters, got $path")
    val got = collectStream(
      StreamingShards.npyShardsFromManifestsWithIds(spark, maniDir), ckpt)(
      () => writeManifest(maniDir, "m0.txt", Seq(path)),
      // a dot-segment respelling of the same shard must still dedup
      () => writeManifest(maniDir, "m1.txt", Seq(path.replace(
        "/mani uri%25 data/", "/./mani uri%25 data/"))))
    assert(got.size === 7, "special-char shard must decode exactly once")
    assert(got.map(_._1).sorted === (0L until 7L))
  }

  test("dedupTtl bounds manifest dedup state while still dropping a " +
      "prompt replay (the append-wave contract)") {
    val s = spark
    import s.implicits._
    val dataDir = freshDir("mani_ttl_data")
    val maniDir = freshDir("mani_ttl")
    val ckpt = freshDir("mani_ttl_ckpt")
    val df = (0L until 6L).map(i => (i, Seq(i.toDouble))).toDF("id", "vec")
    NpyIO.write(df.coalesce(1), dataDir, "f8", idShardNames = true)
    val paths = shardPaths(dataDir, "npy")
    // a replay well inside the TTL window dedupes exactly like the
    // unbounded path; state for shards older than the watermark is
    // dropped by the engine (dropDuplicatesWithinWatermark) — the
    // bounded-state contract for long-lived streams
    val got = collectStream(
      StreamingShards.npyShardsFromManifestsWithIds(spark, maniDir,
        dedupTtl = Some("1 hour")), ckpt)(
      () => writeManifest(maniDir, "m0.txt", paths),
      () => writeManifest(maniDir, "m1.txt", paths)) // prompt replay
    assert(got.size === 6, "a replay inside the TTL must not decode twice")
    assert(got.map(_._1).sorted === (0L until 6L))
  }
}
