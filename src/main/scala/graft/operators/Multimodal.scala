package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for a large-scale training-data
  * pipeline: media travel as opaque `BINARY` columns with a typed metadata
  * struct; decode / resize / frame-sample / feature-extract run batch-wise
  * inside `mapPartitions` (the Scala analog of Pandas-UDF `mapInPandas`:
  * same schema contract, same bounded-batch shape, codegen-free kernel).
  *
  * Every shipped container format decodes for REAL, pure-JVM: WAV and PPM
  * ([[RawCodec]]), Y4M video, PNG/JPEG via the JDK's ImageIO, and MJPEG
  * AVI (RIFF walk + per-frame ImageIO) — no external media library.
  * [[StubCodec]] survives only as the plumbing-contract codec for the
  * self-declared `fake/`-prefixed fixture formats of [[pack]]; formats
  * outside both sets error loudly. Codecs needing system libraries (MP3,
  * H.264) would implement [[MediaCodec]] the same way, e.g. via javacv.
  */
object Multimodal {

  val FpMod = 1000000007L

  /** Typed media metadata (SURVEY §1.4 sidecar style, per row). */
  case class MediaMeta(format: String, width: Int, height: Int,
                       sampleRate: Int, durationMs: Long)

  case class MediaRow(doc_id: Long, modality: String, content: Array[Byte],
                      meta: MediaMeta)

  /** Deterministic fake decode: payload bytes are the samples. A real codec
    * implements this trait against actual image/audio formats. */
  trait MediaCodec extends Serializable {
    def decode(content: Array[Byte], meta: MediaMeta): Array[Int]
  }

  object StubCodec extends MediaCodec {
    // Plumbing-contract codec, reachable ONLY for the self-declared
    // `fake/`-prefixed fixture formats ([[pack]]): byte i is sample i,
    // which is what their oracle replays. Every real container format
    // (WAV, PPM, Y4M, PNG, JPEG, MJPEG-AVI) decodes for real via
    // [[RawCodec]]/[[ImageIoCodec]]; unknown real formats now ERROR
    // instead of silently falling back here.
    def decode(content: Array[Byte], meta: MediaMeta): Array[Int] =
      content.map(_ & 0xff)
  }

  /** REAL codec for uncompressed container formats, pure JVM — no media
    * libraries required: RIFF/WAVE PCM audio (8/16-bit), binary PPM (P6)
    * images, and YUV4MPEG2 (.y4m) video parse from actual container bytes.
    * Compressed images (PNG/JPEG) and MJPEG AVI video route to
    * [[ImageIoCodec]]; entropy codecs needing system libraries (MP3,
    * H.264) are out of scope and error loudly. */
  object RawCodec extends MediaCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    def decode(content: Array[Byte], meta: MediaMeta): Array[Int] =
      meta.format match {
        case "audio/wav" => decodeWav(content)._1
        case "image/ppm" => decodePpm(content)._1
        case "video/y4m" => decodeY4m(content)._1
        case "image/png" | "image/jpeg" | "video/avi" =>
          ImageIoCodec.decode(content, meta)
        // the self-declared plumbing fixtures ([[pack]]) — payload bytes
        // ARE the samples, by contract
        case f if f.startsWith("fake/") => StubCodec.decode(content, meta)
        case other => sys.error(s"unsupported media format: $other")
      }

    /** Parse a RIFF/WAVE file → (samples, sampleRate, channels, bits).
      * PCM only; 16-bit signed LE or 8-bit unsigned; chunk-walks so extra
      * chunks (LIST, fact) are skipped like a real reader. */
    def decodeWav(bytes: Array[Byte]): (Array[Int], Int, Int, Int) = {
      require(bytes.length >= 44, s"wav: ${bytes.length} bytes is too short")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(tag(0) == "RIFF" && tag(8) == "WAVE",
        s"wav: bad container tags ${tag(0)}/${tag(8)}")
      var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var pos = 12
      while (pos + 8 <= bytes.length && (bits == 0 || dataOff < 0)) {
        val cid = tag(pos)
        val clen = bb.getInt(pos + 4)
        if (cid == "fmt ") {
          val audioFormat = bb.getShort(pos + 8) & 0xffff
          require(audioFormat == 1, s"wav: not PCM (format $audioFormat)")
          channels = bb.getShort(pos + 10) & 0xffff
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
        } else if (cid == "data") { dataOff = pos + 8; dataLen = clen }
        // a corrupt/negative chunk length must fail loudly, not wedge the
        // executor task in a non-advancing loop
        require(clen >= 0, s"wav: negative $cid chunk length $clen")
        pos += 8 + clen + (clen & 1) // chunks are word-aligned
      }
      require(bits != 0 && dataOff >= 0, "wav: missing fmt/data chunk")
      require(dataOff + dataLen <= bytes.length, "wav: truncated data chunk")
      val out = bits match {
        case 16 =>
          Array.tabulate(dataLen / 2)(i => bb.getShort(dataOff + 2 * i).toInt)
        case 8 =>
          Array.tabulate(dataLen)(i => bytes(dataOff + i) & 0xff)
        case other => sys.error(s"wav: unsupported bit depth $other")
      }
      (out, rate, channels, bits)
    }

    /** Write 16-bit mono PCM WAV. */
    def encodeWav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
      bb.put("data".getBytes).putInt(dataLen)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }

    /** Parse a binary PPM (P6, maxval ≤ 255) → (flattened RGB, w, h).
      * Handles comments and arbitrary whitespace like a real reader. */
    def decodePpm(bytes: Array[Byte]): (Array[Int], Int, Int) = {
      var pos = 0
      def skipWs(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val c = bytes(pos).toChar
          if (c == '#') { while (pos < bytes.length &&
            bytes(pos).toChar != '\n') pos += 1 }
          else if (c.isWhitespace) pos += 1
          else go = false
        }
      }
      def token(): String = {
        skipWs()
        val start = pos
        while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
        new String(bytes, start, pos - start,
          java.nio.charset.StandardCharsets.US_ASCII)
      }
      require(token() == "P6", "ppm: not a binary P6 file")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(maxval > 0 && maxval <= 255, s"ppm: unsupported maxval $maxval")
      pos += 1 // single whitespace after maxval
      val n = w * h * 3
      require(pos + n <= bytes.length,
        s"ppm: truncated pixel data (${bytes.length - pos} of $n)")
      (Array.tabulate(n)(i => bytes(pos + i) & 0xff), w, h)
    }

    /** Write a binary P6 PPM from flattened RGB. */
    def encodePpm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"ppm: ${rgb.length} != ${w * h * 3}")
      val header = s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = 0
      while (i < rgb.length) {
        out(header.length + i) = rgb(i).toByte; i += 1 }
      out
    }

    /** Parse a YUV4MPEG2 (.y4m) stream → (samples, w, h, n_frames). The
      * uncompressed video container: an ASCII parameter line, then per
      * frame a `FRAME`[params] line + raw planar pixel data. Colorspaces
      * supported: `Cmono` (luma only, w·h bytes/frame), `C444`
      * (3·w·h) and the `C420*` family (w·h·3/2) — frame size comes from
      * the PARSED header, not caller metadata, like a real reader.
      * Unknown parameter tags (F/I/A/X) are skipped per spec. */
    def decodeY4m(bytes: Array[Byte]): (Array[Int], Int, Int, Int) = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      var pos = 0
      def line(): String = {
        val start = pos
        while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
        require(pos < bytes.length, "y4m: unterminated header line")
        pos += 1
        new String(bytes, start, pos - 1 - start, ascii)
      }
      val header = line().split(' ')
      require(header.nonEmpty && header(0) == "YUV4MPEG2",
        s"y4m: bad magic '${header.headOption.getOrElse("")}'")
      var w = -1; var h = -1; var cs = "420jpeg" // spec default
      header.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'C' => cs = p.substring(1)
          case _   => () // F (rate), I (interlace), A (aspect), X (app)
        }
      }
      require(w > 0 && h > 0, s"y4m: missing or bad geometry W$w H$h")
      val frameLen =
        if (cs == "mono") w * h
        else if (cs == "444") w * h * 3
        else if (cs.startsWith("420")) {
          require(w % 2 == 0 && h % 2 == 0,
            s"y4m: C$cs needs even geometry, got ${w}x$h")
          w * h * 3 / 2
        } else sys.error(s"y4m: unsupported colorspace C$cs")
      val out = scala.collection.mutable.ArrayBuilder.make[Int]
      var nFrames = 0
      while (pos < bytes.length) {
        val fl = line()
        require(fl == "FRAME" || fl.startsWith("FRAME "),
          s"y4m: expected FRAME marker, got '$fl'")
        require(pos + frameLen <= bytes.length,
          s"y4m: truncated frame $nFrames " +
            s"(${bytes.length - pos} of $frameLen bytes)")
        var i = 0
        while (i < frameLen) { out += (bytes(pos + i) & 0xff); i += 1 }
        pos += frameLen
        nFrames += 1
      }
      (out.result(), w, h, nFrames)
    }

    /** Write a Cmono YUV4MPEG2 stream: `luma` holds n_frames·w·h samples
      * in frame order. */
    def encodeY4m(w: Int, h: Int, nFrames: Int, luma: Array[Int])
        : Array[Byte] = {
      require(luma.length == nFrames * w * h,
        s"y4m: ${luma.length} != $nFrames*$w*$h")
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes(ascii)
      val marker = "FRAME\n".getBytes(ascii)
      val frameLen = w * h
      val out = new Array[Byte](
        header.length + nFrames * (marker.length + frameLen))
      System.arraycopy(header, 0, out, 0, header.length)
      var pos = header.length
      var f = 0
      while (f < nFrames) {
        System.arraycopy(marker, 0, out, pos, marker.length)
        pos += marker.length
        var i = 0
        while (i < frameLen) {
          out(pos + i) = luma(f * frameLen + i).toByte; i += 1 }
        pos += frameLen
        f += 1
      }
      out
    }
  }

  /** REAL codec for *compressed* image formats via the JDK's own
    * `javax.imageio` (ships in every JRE — no external media library):
    * PNG (lossless, so decoded samples replay the generator formula
    * exactly) and JPEG (lossy — certified through invariant flags, see
    * [[jpegDecodeFlags]]). Non-image formats delegate to [[RawCodec]].
    * Video containers parse via [[RawCodec]]'s Y4M reader. */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

    javax.imageio.ImageIO.setUseCache(false) // no disk cache in executors

    def decode(content: Array[Byte], meta: MediaMeta): Array[Int] =
      meta.format match {
        case "image/png" | "image/jpeg" => decodeImage(content)._1
        case "video/avi" => decodeAvi(content)._1
        case _ => RawCodec.decode(content, meta)
      }

    /** Decode any ImageIO-supported container → (flattened row-major RGB,
      * w, h). */
    def decodeImage(bytes: Array[Byte]): (Array[Int], Int, Int) = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "imageio: unrecognized image container")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          val j = 3 * (y * w + x)
          out(j) = (px >> 16) & 0xff
          out(j + 1) = (px >> 8) & 0xff
          out(j + 2) = px & 0xff
          x += 1
        }
        y += 1
      }
      (out, w, h)
    }

    private def toImage(w: Int, h: Int, rgb: Array[Int]): BufferedImage = {
      require(rgb.length == w * h * 3,
        s"imageio: ${rgb.length} != ${w * h * 3}")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val j = 3 * (y * w + x)
          img.setRGB(x, y, (rgb(j) << 16) | (rgb(j + 1) << 8) | rgb(j + 2))
          x += 1
        }
        y += 1
      }
      img
    }

    /** Encode flattened RGB as PNG (lossless). */
    def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(toImage(w, h, rgb), "png", bos)
      bos.toByteArray
    }

    /** Parse an MJPEG AVI (RIFF 'AVI ' container, JPEG frames in '..dc' /
      * '..db' movi chunks) → (concatenated row-major RGB across frames,
      * w, h, n_frames). Geometry comes from the PARSED 'avih' main header
      * (dwWidth/dwHeight at offsets 32/36) and every decoded frame must
      * match it — like a real reader. Word-aligned chunk walking per the
      * RIFF spec (odd-sized chunks carry one pad byte). This closes the
      * compressed-video gap with zero external dependencies: the container
      * walk is ~40 lines and each frame is a JPEG the JDK already
      * decodes. */
    def decodeAvi(bytes: Array[Byte]): (Array[Int], Int, Int, Int) = {
      import java.nio.{ByteBuffer, ByteOrder}
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4, ascii)
      require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
        "avi: bad RIFF/AVI magic")
      var w = -1; var h = -1; var nFrames = 0
      val out = scala.collection.mutable.ArrayBuilder.make[Int]
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = tag(pos)
          val size = bb.getInt(pos + 4)
          require(size >= 0 && pos + 8 + size <= end,
            s"avi: chunk '$id' overruns container")
          if (id == "LIST") walk(pos + 12, pos + 8 + size)
          else if (id == "avih") {
            require(size >= 40, "avi: short main header")
            w = bb.getInt(pos + 8 + 32)
            h = bb.getInt(pos + 8 + 36)
          } else if (id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            require(w > 0 && h > 0, "avi: frame chunk before main header")
            val frame = java.util.Arrays.copyOfRange(bytes, pos + 8,
              pos + 8 + size)
            val (rgb, fw, fh) = decodeImage(frame)
            require(fw == w && fh == h,
              s"avi: frame $nFrames is ${fw}x$fh, header says ${w}x$h")
            out ++= rgb
            nFrames += 1
          }
          pos += 8 + size + (size & 1)
        }
      }
      walk(12, bytes.length)
      require(w > 0 && h > 0, "avi: no main header found")
      (out.result(), w, h, nFrames)
    }

    /** Write a minimal MJPEG AVI: RIFF('AVI ' LIST('hdrl' avih
      * LIST('strl' strh strf)) LIST('movi' '00dc'…)) — a real container
      * any AVI-aware reader walks (index-free, which the format allows). */
    def encodeAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val framePad = frames.map(f => 8 + f.length + (f.length & 1))
      val moviPayload = 4 + framePad.sum
      val strlPayload = 4 + (8 + 56) + (8 + 40)
      val hdrlPayload = 4 + (8 + 56) + (8 + strlPayload)
      val riffPayload = 4 + (8 + hdrlPayload) + (8 + moviPayload)
      val bb = ByteBuffer.allocate(8 + riffPayload)
        .order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(s: String): Unit = bb.put(s.getBytes(ascii))
      fourcc("RIFF"); bb.putInt(riffPayload); fourcc("AVI ")
      fourcc("LIST"); bb.putInt(hdrlPayload); fourcc("hdrl")
      fourcc("avih"); bb.putInt(56)
      bb.putInt(40000).putInt(0).putInt(0).putInt(0) // usec/frame, bps, pad, flags
        .putInt(frames.length).putInt(0).putInt(1).putInt(0) // total, init, streams, bufsz
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0) // geometry + reserved
      fourcc("LIST"); bb.putInt(strlPayload); fourcc("strl")
      fourcc("strh"); bb.putInt(56)
      fourcc("vids"); fourcc("MJPG")
      bb.putInt(0).putInt(0).putInt(0) // flags, prio/lang, initial
        .putInt(1).putInt(25).putInt(0).putInt(frames.length) // scale, rate, start, length
        .putInt(0).putInt(-1).putInt(0) // bufsz, quality, samplesize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
      fourcc("strf"); bb.putInt(40)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      fourcc("MJPG")
      bb.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); bb.putInt(moviPayload); fourcc("movi")
      frames.foreach { f =>
        fourcc("00dc"); bb.putInt(f.length); bb.put(f)
        if ((f.length & 1) == 1) bb.put(0.toByte)
      }
      bb.array()
    }

    /** Encode flattened RGB as JPEG at the given quality (lossy). */
    def encodeJpeg(w: Int, h: Int, rgb: Array[Int],
                   quality: Float = 1.0f): Array[Byte] = {
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val bos = new ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(toImage(w, h, rgb), null, null), params)
      writer.dispose()
      ios.close()
      bos.toByteArray
    }
  }

  /** Synthesize a media table from the documents fixture: utf-8 payload
    * bytes, modality round-robin by id, metadata derived deterministically
    * from the payload length. Stands in for `binaryFile` ingest of a real
    * media directory (same output schema). */
  def pack(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = MediaMeta(
          format = modality match {
            case "image" => "fake/gray8"
            case "audio" => "fake/pcm8"
            case _ => "fake/rawvideo" },
          width = math.max(1, (bytes.length % 64).toInt),
          height = math.max(1,
            (bytes.length / math.max(1, bytes.length % 64)).toInt),
          sampleRate = 8000,
          durationMs = bytes.length.toLong * 1000 / 8000)
        MediaRow(id, modality, bytes, meta)
      }
  }

  /** Deterministic REAL-format media table: even doc_ids carry an actual
    * 16-bit PCM WAV whose samples follow
    * `s_i = ((id·31 + i·7 + 13) mod 256) − 128` (n = 64 + id mod 64), odd
    * doc_ids an actual P6 PPM with channel values
    * `c_j = (id·31 + j·7 + 13) mod 256` (w = 8 + id mod 8, h = 4 + id mod
    * 4). The container bytes are real (exercised by [[RawCodec]]'s
    * parsers); the sample formula is what the DuckDB oracle replays
    * without needing a media stack. */
  def packReal(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      if (id % 2 == 0) {
        val n = (64 + id % 64).toInt
        val samples = Array.tabulate(n)(i =>
          ((id * 31 + i * 7 + 13) % 256 - 128).toInt)
        MediaRow(id, "audio", RawCodec.encodeWav(samples, 8000),
          MediaMeta("audio/wav", 0, 0, 8000, n * 1000L / 8000))
      } else {
        val w = (8 + id % 8).toInt
        val h = (4 + id % 4).toInt
        val rgb = Array.tabulate(w * h * 3)(j =>
          ((id * 31 + j * 7 + 13) % 256).toInt)
        MediaRow(id, "image", RawCodec.encodePpm(w, h, rgb),
          MediaMeta("image/ppm", w, h, 0, 0))
      }
    }
  }

  /** Deterministic *compressed* media table: every doc_id carries an actual
    * PNG (encoded by the JDK's ImageIO) whose flattened RGB follows the same
    * formula as [[packReal]]'s PPM branch — `c_j = (id·31 + j·7 + 13) mod
    * 256`, w = 8 + id mod 8, h = 4 + id mod 4. PNG is lossless, so the
    * decode of real compressed container bytes replays the formula exactly
    * and the DuckDB oracle can hash-check the sample sums. */
  def packPng(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (8 + id % 8).toInt
      val h = (4 + id % 4).toInt
      val rgb = Array.tabulate(w * h * 3)(j =>
        ((id * 31 + j * 7 + 13) % 256).toInt)
      MediaRow(id, "image", ImageIoCodec.encodePng(w, h, rgb),
        MediaMeta("image/png", w, h, 0, 0))
    }
  }

  /** JPEG gray-gradient generator: `g(x,y) = (id·7 + 2x + 3y) mod 200 + 20`
    * at w = 16 + id mod 8, h = 8 + id mod 4, encoded at quality 1.0.
    * Gray (R=G=B) kills chroma-subsampling error and the gentle gradient
    * keeps DCT quantization error to a few counts — certified via
    * [[jpegDecodeFlags]] invariants rather than exact sums (JPEG is
    * lossy by nature). */
  def packJpeg(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (16 + id % 8).toInt
      val h = (8 + id % 4).toInt
      MediaRow(id, "image", ImageIoCodec.encodeJpeg(w, h, jpegRgb(id, w, h)),
        MediaMeta("image/jpeg", w, h, 0, 0))
    }
  }

  /** Deterministic real-video table: every doc_id carries an actual
    * YUV4MPEG2 stream (Cmono) with f = 2 + id mod 3 frames of
    * w = 8 + id mod 8 by h = 4 + id mod 4 luma, sample j (global across
    * frames) = `(id·31 + j·7 + 13) mod 256` — the container bytes are real
    * (header + per-frame FRAME markers, exercised by [[RawCodec]]'s Y4M
    * parser); the sample formula is what the DuckDB oracle replays. */
  def packY4m(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (8 + id % 8).toInt
      val h = (4 + id % 4).toInt
      val f = (2 + id % 3).toInt
      val luma = Array.tabulate(f * w * h)(j =>
        ((id * 31 + j * 7 + 13) % 256).toInt)
      MediaRow(id, "video", RawCodec.encodeY4m(w, h, f, luma),
        MediaMeta("video/y4m", w, h, 0, f * 40L))
    }
  }

  /** Per-document video decode + frame-boundary stats over real Y4M bytes:
    * (doc_id, n_frames, n_samples, sum1, sum_frame), where `sum_frame`
    * weights each sample by (1 + its frame index). Geometry and frame
    * boundaries come from the PARSED container header — not row metadata —
    * so a correct sum_frame certifies the parser found the FRAME markers
    * where the encoder put them. Same batched-mapPartitions shape as
    * [[decodeSums]] (bounded memory per task at any partition size). */
  def y4mStats(media: Dataset[MediaRow], batchSize: Int = DefaultBatch)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow]
      .mapPartitions { it =>
        batched(it, batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val (v, w, h, nf) = RawCodec.decodeY4m(r.content)
            val frameLen = w * h
            var s1 = 0L; var sf = 0L; var i = 0
            while (i < v.length) {
              s1 += v(i)
              sf += (1L + i / frameLen) * v(i)
              i += 1
            }
            (r.doc_id, nf.toLong, v.length.toLong, s1, sf)
          }
        }
      }.toDF("doc_id", "n_frames", "n_samples", "sum1", "sum_frame")
  }

  /** Deterministic COMPRESSED-video table: every doc_id carries an actual
    * MJPEG AVI — f = 2 + id mod 3 JPEG frames of w = 16 + id mod 8 by
    * h = 8 + id mod 4, frame k's gray gradient
    * `g(x,y,k) = (id·7 + 2x + 3y + 11k) mod 200 + 20` encoded at quality
    * 1.0 inside a real RIFF container. Certified like q64: lossy frames →
    * invariant flags, exact geometry/frame-count/sample-count. */
  def packAvi(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (16 + id % 8).toInt
      val h = (8 + id % 4).toInt
      val f = (2 + id % 3).toInt
      val frames = (0 until f).map(k =>
        ImageIoCodec.encodeJpeg(w, h, aviFrameRgb(id, k, w, h)))
      MediaRow(id, "video", ImageIoCodec.encodeAvi(w, h, frames),
        MediaMeta("video/avi", w, h, 0, f * 40L))
    }
  }

  private def aviFrameRgb(id: Long, k: Int, w: Int, h: Int): Array[Int] = {
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id * 7 + 2 * x + 3 * y + 11 * k) % 200 + 20).toInt
        val j = 3 * (y * w + x)
        rgb(j) = g; rgb(j + 1) = g; rgb(j + 2) = g
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Compressed-video decode certification (q64's invariant-flag pattern
    * over the AVI container): walk the RIFF structure, JPEG-decode every
    * frame, and emit (doc_id, n_frames, n_samples, dims_ok, err_ok) —
    * frame count and geometry from the PARSED container, err_ok asserting
    * every decoded sample within `tol` of its [[aviFrameRgb]]
    * pre-compression value. */
  def mjpegDecodeFlags(media: Dataset[MediaRow], tol: Int,
                       batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (v, w, h, nf) = ImageIoCodec.decodeAvi(r.content)
          val frameLen = w * h * 3
          val dimsOk = w == r.meta.width && h == r.meta.height &&
            v.length == nf * frameLen
          var maxErr = 0
          if (dimsOk) {
            var k = 0
            while (k < nf) {
              val expected = aviFrameRgb(r.doc_id, k, w, h)
              var i = 0
              while (i < frameLen) {
                val e = math.abs(v(k * frameLen + i) - expected(i))
                if (e > maxErr) maxErr = e
                i += 1
              }
              k += 1
            }
          }
          (r.doc_id, nf.toLong, v.length.toLong,
            if (dimsOk) 1L else 0L,
            if (dimsOk && maxErr <= tol) 1L else 0L)
        }
      }
    }.toDF("doc_id", "n_frames", "n_samples", "dims_ok", "err_ok")
  }

  private def jpegRgb(id: Long, w: Int, h: Int): Array[Int] = {
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id * 7 + 2 * x + 3 * y) % 200 + 20).toInt
        val j = 3 * (y * w + x)
        rgb(j) = g; rgb(j + 1) = g; rgb(j + 2) = g
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Lossy-decode certification (q50/q25's invariant-flag pattern): decode
    * the real JPEG bytes, regenerate the pre-compression samples from the
    * [[packJpeg]] formula, and emit per-row invariants the oracle asserts —
    * (doc_id, n_samples, dims_ok, err_ok) where n_samples is the decoded
    * length (the oracle recomputes w·h·3 from the formula), dims_ok checks
    * the container round-tripped the geometry, and err_ok checks every
    * decoded sample is within `tol` of its pre-compression value. */
  def jpegDecodeFlags(media: Dataset[MediaRow], tol: Int,
                      batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (v, w, h) = ImageIoCodec.decodeImage(r.content)
          val expected = jpegRgb(r.doc_id, r.meta.width, r.meta.height)
          val dimsOk = w == r.meta.width && h == r.meta.height &&
            v.length == expected.length
          var maxErr = 0
          if (dimsOk) {
            var i = 0
            while (i < v.length) {
              val e = math.abs(v(i) - expected(i))
              if (e > maxErr) maxErr = e
              i += 1
            }
          }
          (r.doc_id, v.length.toLong, if (dimsOk) 1L else 0L,
            if (dimsOk && maxErr <= tol) 1L else 0L)
        }
      }
    }.toDF("doc_id", "n_samples", "dims_ok", "err_ok")
  }

  /** Decode every row (real parsers) and emit position-weighted sample
    * sums — integers the oracle reproduces from the generator formula:
    * (doc_id, n_samples, sum1 = Σ v_i, sum2 = Σ (i+1)·v_i). */
  def decodeSums(media: Dataset[MediaRow], codec: MediaCodec = RawCodec,
                 batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val v = codec.decode(r.content, r.meta)
          var s1 = 0L; var s2 = 0L; var i = 0
          while (i < v.length) {
            s1 += v(i); s2 += (i + 1).toLong * v(i); i += 1 }
          (r.doc_id, v.length.toLong, s1, s2)
        }
      }
    }.toDF("doc_id", "n_samples", "sum1", "sum2")
  }

  /** Group an iterator into bounded batches — the `mapInPandas` batch shape;
    * keeps peak memory at `batchSize` rows per task regardless of partition
    * size. */
  private def batched[T](it: Iterator[T], batchSize: Int)
      : Iterator[Seq[T]] = it.grouped(batchSize)

  /** [[decodeSums]] re-expressed through [[BatchApi.mapInBatches]] — the
    * literal `mapInPandas` contract (declared output schema, columnar
    * batches in, columnar batches out) with the same decode kernel inside.
    * Certified against the same oracle as the mapPartitions form (q79 vs
    * q54): the two shapes must be row-identical. A Python model UDF slots
    * into this exact seam. */
  def decodeSumsBatchApi(media: Dataset[MediaRow], codec: MediaCodec = RawCodec,
                         batchSize: Int = DefaultBatch): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum1", LongType, nullable = false),
      StructField("sum2", LongType, nullable = false)))
    BatchApi.mapInBatches(media.toDF(), outSchema, batchSize) { batches =>
      batches.map { b =>
        val ids = b("doc_id")
        val contents = b("content")
        val metas = b("meta")
        val n = b.size
        val ns = new Array[Any](n)
        val s1 = new Array[Any](n)
        val s2 = new Array[Any](n)
        var i = 0
        while (i < n) {
          val m = metas(i).asInstanceOf[Row]
          val meta = MediaMeta(m.getAs[String]("format"),
            m.getAs[Int]("width"), m.getAs[Int]("height"),
            m.getAs[Int]("sampleRate"), m.getAs[Long]("durationMs"))
          val v = codec.decode(contents(i).asInstanceOf[Array[Byte]], meta)
          var a1 = 0L; var a2 = 0L; var j = 0
          while (j < v.length) { a1 += v(j); a2 += (j + 1).toLong * v(j); j += 1 }
          ns(i) = v.length.toLong; s1(i) = a1; s2(i) = a2
          i += 1
        }
        BatchApi.ColumnarBatch.of("doc_id" -> ids, "n_samples" -> ns,
          "sum1" -> s1, "sum2" -> s2)
      }
    }
  }

  val DefaultBatch = 256

  /** Decode every row and emit per-row stats
    * (doc_id, n_bytes, checksum, width, height): checksum is the
    * (acc·131 + sample) mod FpMod left fold over decoded samples —
    * reproducible in the DuckDB oracle for ASCII payloads. */
  def decodeStats(media: Dataset[MediaRow], codec: MediaCodec = RawCodec,
                  batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val samples = codec.decode(r.content, r.meta)
          var acc = 0L
          var i = 0
          while (i < samples.length) {
            acc = (acc * 131 + samples(i)) % FpMod; i += 1
          }
          (r.doc_id, samples.length.toLong, acc, r.meta.width.toLong,
            r.meta.height.toLong)
        }
      }
    }.toDF("doc_id", "n_bytes", "checksum", "width", "height")
  }

  /** Nearest-neighbor resize of the (fake) gray image to w×h; emits the new
    * metadata plus the resized payload checksum. Real pipelines put actual
    * pixel resampling in the same kernel slot. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int,
             codec: MediaCodec = RawCodec,
             batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "image").as[MediaRow].mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val src = codec.decode(r.content, r.meta)
          val sw = r.meta.width
          val sh = math.max(1, src.length / math.max(1, sw))
          var acc = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val sx = x * sw / w
              val sy = y * sh / h
              val px = src(math.min(src.length - 1, sy * sw + sx))
              acc = (acc * 131 + px) % FpMod
              x += 1
            }
            y += 1
          }
          (r.doc_id, w.toLong, h.toLong, acc)
        }
      }
    }.toDF("doc_id", "width", "height", "checksum")
  }

  /** Frame sampling for "video" rows: one frame every `frameBytes` samples
    * (stub for time-based frame extraction); emits
    * (doc_id, frame_idx, frame_checksum). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
                   codec: MediaCodec = RawCodec,
                   batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow]
      .mapPartitions { it =>
        batched(it, batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val samples = codec.decode(r.content, r.meta)
            samples.grouped(frameBytes).zipWithIndex.map { case (frame, fi) =>
              var acc = 0L
              frame.foreach(s => acc = (acc * 131 + s) % FpMod)
              (r.doc_id, fi.toLong, acc)
            }
          }
        }
      }.toDF("doc_id", "frame_idx", "frame_checksum")
  }

  /** STUB feature extractor: a hash-folded `dims`-dim embedding of the
    * decoded samples (deterministic fake for a real vision/audio model).
    * Output (id, vec) plugs directly into FlatKnn / IVF / Vamana — the
    * media→embedding→ANN pipeline end to end. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int,
                      codec: MediaCodec = RawCodec,
                      batchSize: Int = DefaultBatch): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val samples = codec.decode(r.content, r.meta)
          val vec = new Array[Double](dims)
          var d = 0
          while (d < dims) {
            // per-dim odd multiplier: dims mix independently (a shared
            // multiplier makes every dim a scalar multiple of one hash,
            // collapsing all embeddings onto near-parallel rays)
            val m = 31L + 2L * d
            var acc = (d + 1).toLong * 2654435761L % FpMod
            var i = 0
            while (i < samples.length) {
              acc = (acc * m + samples(i)) % FpMod
              i += 1
            }
            vec(d) = acc.toDouble / FpMod
            d += 1
          }
          (r.doc_id, vec)
        }
      }
    }.toDF("id", "vec")
  }
}
