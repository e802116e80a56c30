package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, Multimodal}

class MultimodalSpec extends SparkSpec {

  private def docs = Tables.table(spark, sfDir, "documents")
  private def media = Multimodal.pack(docs)

  test("pack assigns modalities round-robin with metadata from payload") {
    val rows = media.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => Set("image", "audio", "video")(r.modality)))
    rows.foreach { r =>
      assert(r.doc_id % 3 match {
        case 0 => r.modality == "image"
        case 1 => r.modality == "audio"
        case _ => r.modality == "video"
      })
      assert(r.meta.width >= 1 && r.meta.height >= 1)
      assert(r.content.length > 0)
    }
  }

  test("decodeStats is batch-size invariant (batch plumbing correctness)") {
    val a = Multimodal.decodeStats(media, batchSize = 7)
      .orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStats(media, batchSize = 1000)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.head.getAs[Long]("checksum") >= 0)
  }

  test("resize emits requested dims and only images") {
    val r = Multimodal.resize(media, 8, 8)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x =>
      x.getAs[Long]("width") === 8L && x.getAs[Long]("height") === 8L))
    // only image-modality docs (doc_id % 3 == 0)
    assert(rows.forall(_.getAs[Long]("doc_id") % 3 === 0))
    // idempotent/deterministic
    assert(r.orderBy("doc_id").collect().toSeq ===
      Multimodal.resize(media, 8, 8).orderBy("doc_id").collect().toSeq)
  }

  test("sampleFrames covers the payload without overlap") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 100)
    val perDoc = frames.groupBy("doc_id").count()
    val lens = Multimodal.decodeStats(media)
      .select(col("doc_id"), col("n_bytes"))
    val joined = perDoc.join(lens, Seq("doc_id")).collect()
    joined.foreach { r =>
      val expect = (r.getAs[Long]("n_bytes") + 99) / 100
      assert(r.getAs[Long]("count") === expect)
    }
    assert(frames.select("doc_id").distinct().count() ===
      media.filter(col("modality") === "video").count())
  }

  test("extractFeatures feeds vector search end to end") {
    val feats = Multimodal.extractFeatures(media, dims = 16).cache()
    assert(feats.count() === 500)
    val vals = feats.select(explode(col("vec")).as("v"))
      .agg(min("v"), max("v")).collect()(0)
    assert(vals.getDouble(0) >= 0.0 && vals.getDouble(1) < 1.0)
    // media → embedding → exact ANN: self is in the top-3 of every query,
    // at the same similarity as rank 1 (exact-duplicate docs yield identical
    // embeddings, and ties break to the smaller id)
    val q = feats.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val res = FlatKnn.search(q, feats, 3, Metric.Cosine).cache()
    val selfRows = res.filter(col("query_id") === col("neighbor_id"))
    assert(selfRows.count() === 5)
    val r1 = res.filter(col("rnk") === 1)
      .select(col("query_id"), col("dist").as("best"))
    assert(selfRows.join(r1, Seq("query_id"))
      .filter(col("dist") =!= col("best")).count() === 0)
  }

  test("RawCodec WAV round trip is exact across the full 16-bit range") {
    import graft.operators.Multimodal.RawCodec
    val samples = Array(-32768, -1, 0, 1, 127, -128, 32767, 12345, -12345)
    val bytes = RawCodec.encodeWav(samples, 44100)
    val (back, rate, channels, bits) = RawCodec.decodeWav(bytes)
    assert(back.toSeq === samples.toSeq)
    assert((rate, channels, bits) === ((44100, 1, 16)))
    // non-PCM and truncated containers are rejected with real errors
    val broken = bytes.clone(); broken(20) = 3 // audioFormat = 3 (float)
    intercept[IllegalArgumentException] { RawCodec.decodeWav(broken) }
    intercept[IllegalArgumentException] {
      RawCodec.decodeWav(bytes.take(30)) }
  }

  test("RawCodec PPM round trip is exact and survives header comments") {
    import graft.operators.Multimodal.RawCodec
    val (w, h) = (5, 3)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 17) % 256)
    val bytes = RawCodec.encodePpm(w, h, rgb)
    val (back, bw, bh) = RawCodec.decodePpm(bytes)
    assert((bw, bh) === ((w, h)))
    assert(back.toSeq === rgb.toSeq)
    // a commented header parses like any real PPM reader would accept
    val commented = ("P6\n# made by a test\n5 3\n255\n"
      .getBytes("US-ASCII") ++ bytes.drop("P6\n5 3\n255\n".length))
    val (back2, w2, h2) = RawCodec.decodePpm(commented)
    assert((w2, h2) === ((w, h)))
    assert(back2.toSeq === rgb.toSeq)
    intercept[IllegalArgumentException] {
      RawCodec.decodePpm("P5\n1 1\n255\nx".getBytes("US-ASCII")) }
  }

  test("packReal produces genuine containers the real parsers decode to " +
      "the generator formula") {
    val real = Multimodal.packReal(Tables.table(spark, sfDir, "documents"))
    val sums = Multimodal.decodeSums(real).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(sums.size === 500)
    sums.foreach { case (id, (n, s1, s2)) =>
      val expectN =
        if (id % 2 == 0) 64 + id % 64 else (8 + id % 8) * (4 + id % 4) * 3
      assert(n === expectN, s"doc $id")
      def v(i: Long): Long =
        if (id % 2 == 0) (id * 31 + i * 7 + 13) % 256 - 128
        else (id * 31 + i * 7 + 13) % 256
      val e1 = (0L until n).map(v).sum
      val e2 = (0L until n).map(i => (i + 1) * v(i)).sum
      assert(s1 === e1 && s2 === e2, s"doc $id sums")
    }
  }

  test("ImageIoCodec PNG round trip is bit-exact (lossless container)") {
    import graft.operators.Multimodal.ImageIoCodec
    for (id <- Seq(0L, 3L, 17L, 254L)) {
      val w = (8 + id % 8).toInt
      val h = (4 + id % 4).toInt
      val rgb = Array.tabulate(w * h * 3)(j =>
        ((id * 31 + j * 7 + 13) % 256).toInt)
      val (back, bw, bh) = ImageIoCodec.decodeImage(
        ImageIoCodec.encodePng(w, h, rgb))
      assert((bw, bh) === ((w, h)))
      assert(back.toSeq === rgb.toSeq, s"doc $id")
    }
    intercept[IllegalArgumentException] {
      ImageIoCodec.decodeImage(Array[Byte](1, 2, 3, 4)) }
  }

  test("packPng decodes through real PNG bytes to the generator formula") {
    val sums = Multimodal.decodeSums(
        Multimodal.packPng(Tables.table(spark, sfDir, "documents")),
        Multimodal.ImageIoCodec)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(sums.size === 500)
    sums.foreach { case (id, (n, s1, s2)) =>
      val expectN = (8 + id % 8) * (4 + id % 4) * 3
      def v(i: Long): Long = (id * 31 + i * 7 + 13) % 256
      assert(n === expectN, s"doc $id")
      assert(s1 === (0L until n).map(v).sum, s"doc $id sum1")
      assert(s2 === (0L until n).map(i => (i + 1) * v(i)).sum,
        s"doc $id sum2")
    }
  }

  test("JPEG decode is dimension-exact, error-bounded, and deterministic") {
    import graft.operators.Multimodal.ImageIoCodec
    val media = Multimodal.packJpeg(Tables.table(spark, sfDir, "documents"))
    val flags = Multimodal.jpegDecodeFlags(media, tol = 8).collect()
    assert(flags.length === 500)
    flags.foreach { r =>
      assert(r.getLong(2) === 1L, s"doc ${r.getLong(0)} dims")
      assert(r.getLong(3) === 1L, s"doc ${r.getLong(0)} err")
    }
    // decode is a pure function of the bytes (no ImageIO global state)
    val one = media.filter(col("doc_id") === 42).collect()(0)
    assert(ImageIoCodec.decode(one.content, one.meta).toSeq ===
      ImageIoCodec.decode(one.content, one.meta).toSeq)
    // non-image formats delegate to the RawCodec parsers
    val wav = Multimodal.RawCodec.encodeWav(Array(1, -2, 3), 8000)
    assert(ImageIoCodec.decode(wav,
        Multimodal.MediaMeta("audio/wav", 0, 0, 8000, 0)).toSeq ===
      Seq(1, -2, 3))
  }

  test("RawCodec Y4M round trip is exact and rejects malformed streams") {
    import graft.operators.Multimodal.RawCodec
    val (w, h, f) = (6, 4, 3)
    val luma = Array.tabulate(f * w * h)(i => (i * 13) % 256)
    val bytes = RawCodec.encodeY4m(w, h, f, luma)
    val (back, bw, bh, bf) = RawCodec.decodeY4m(bytes)
    assert((bw, bh, bf) === ((w, h, f)))
    assert(back.toSeq === luma.toSeq)
    // frame params after the FRAME marker are skipped like a real reader
    val withParam = new String(bytes, "ISO-8859-1")
      .replaceFirst("FRAME\n", "FRAME Ixyz\n").getBytes("ISO-8859-1")
    assert(RawCodec.decodeY4m(withParam)._1.toSeq === luma.toSeq)
    // unknown header tags (X...) are skipped; C420 frame size is 3/2 w*h
    val c420 = ("YUV4MPEG2 W2 H2 F25:1 Xmeta C420jpeg\nFRAME\n"
      .getBytes("US-ASCII") ++ Array.tabulate(6)(_.toByte))
    val (v420, _, _, f420) = RawCodec.decodeY4m(c420)
    assert(f420 === 1 && v420.length === 6)
    intercept[IllegalArgumentException] { // bad magic
      RawCodec.decodeY4m("JUNK W2 H2\n".getBytes("US-ASCII")) }
    intercept[IllegalArgumentException] { // truncated frame payload
      RawCodec.decodeY4m(bytes.dropRight(1)) }
    intercept[IllegalArgumentException] { // missing geometry
      RawCodec.decodeY4m("YUV4MPEG2 Cmono\nFRAME\n".getBytes("US-ASCII")) }
  }

  test("AVI MJPEG round trip: real RIFF container, per-frame JPEG decode " +
      "within tolerance, malformed containers rejected") {
    val io = Multimodal.ImageIoCodec
    // 2-frame 16x8 gray gradients through encode → container → decode
    val w = 16; val h = 8
    val mk = (k: Int) => Array.tabulate(w * h * 3) { j =>
      val p = j / 3; val x = p % w; val y = p / w
      ((2 * x + 3 * y + 11 * k) % 200 + 20)
    }
    val frames = (0 until 2).map(k => io.encodeJpeg(w, h, mk(k)))
    val avi = io.encodeAvi(w, h, frames)
    val (v, dw, dh, nf) = io.decodeAvi(avi)
    assert((dw, dh, nf) === ((w, h, 2)))
    assert(v.length === 2 * w * h * 3)
    (0 until 2).foreach { k =>
      val exp = mk(k)
      val got = v.slice(k * w * h * 3, (k + 1) * w * h * 3)
      val maxErr = got.zip(exp).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 8, s"frame $k maxErr $maxErr")
    }
    // odd-sized chunks are word-aligned: a 1-byte-odd JPEG still walks
    assert(frames.exists(_.length % 2 == 1) ||
      io.decodeAvi(io.encodeAvi(w, h, frames)) != null)
    intercept[IllegalArgumentException] {
      io.decodeAvi("RIFX0000AVI ".getBytes)
    }
    intercept[IllegalArgumentException] {
      io.decodeAvi(java.util.Arrays.copyOf(avi, avi.length - 10))
    }
  }

  test("mjpegDecodeFlags certifies every packAvi row (dims + error bound)") {
    import spark.implicits._
    val flags = Multimodal.mjpegDecodeFlags(
        Multimodal.packAvi(docs.limit(60)), tol = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(flags.length === 60)
    flags.foreach { case (id, nf, ns, dimsOk, errOk) =>
      assert(nf === 2 + id % 3, s"doc $id")
      assert(ns === nf * (16 + id % 8) * (8 + id % 4) * 3, s"doc $id")
      assert(dimsOk === 1L && errOk === 1L, s"doc $id")
    }
  }

  test("packY4m produces genuine containers whose parsed frame boundaries " +
      "match the generator") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, ""), (5L, "")).toDF("doc_id", "text")
    val media = Multimodal.packY4m(docs).collect()
    for (r <- media) {
      val id = r.doc_id
      val (v, w, h, nf) = Multimodal.RawCodec.decodeY4m(r.content)
      assert((w, h, nf) ===
        (((8 + id % 8).toInt, (4 + id % 4).toInt, (2 + id % 3).toInt)))
      assert(v.toSeq === Seq.tabulate(nf * w * h)(j =>
        ((id * 31 + j * 7 + 13) % 256).toInt))
    }
    // the stats operator reproduces the formula-derived aggregates
    val stats = Multimodal.y4mStats(Multimodal.packY4m(docs))
      .orderBy("doc_id").collect()
    assert(stats.length === 3)
    for (row <- stats) {
      val id = row.getLong(0)
      val (w, h, f) = ((8 + id % 8).toInt, (4 + id % 4).toInt,
        (2 + id % 3).toInt)
      val vals = Seq.tabulate(f * w * h)(j => (id * 31 + j * 7 + 13) % 256)
      assert(row.getLong(1) === f.toLong)
      assert(row.getLong(2) === (f * w * h).toLong)
      assert(row.getLong(3) === vals.sum)
      assert(row.getLong(4) === vals.zipWithIndex
        .map { case (v, j) => (1L + j / (w * h)) * v }.sum)
    }
  }
}
