package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for a large-scale training-data
  * pipeline: media travel as opaque `BINARY` columns with a typed metadata
  * struct; decode / resize / frame-sample / feature-extract run batch-wise
  * inside `mapPartitions` (the Scala analog of Pandas-UDF `mapInPandas`:
  * same schema contract, same bounded-batch shape, codegen-free kernel).
  *
  * ==== STUB CODEC ====
  * No image/audio libraries exist in this environment, so [[StubCodec]] is a
  * clearly-marked deterministic fake: it treats the payload bytes themselves
  * as decoded samples (1 byte = 1 gray pixel / PCM sample). The Spark-side
  * plumbing — schema, partitioning, batch iteration, metadata propagation,
  * and the downstream join into vector search — is real and tested; swapping
  * in a real codec (e.g. javacv) only replaces the `decode` body.
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
    // STUB: identity "decode" — byte i is sample i (0..255). Real codecs
    // would parse meta.format here.
    def decode(content: Array[Byte], meta: MediaMeta): Array[Int] =
      content.map(_ & 0xff)
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

  /** Group an iterator into bounded batches — the `mapInPandas` batch shape;
    * keeps peak memory at `batchSize` rows per task regardless of partition
    * size. */
  private def batched[T](it: Iterator[T], batchSize: Int)
      : Iterator[Seq[T]] = it.grouped(batchSize)

  val DefaultBatch = 256

  /** Decode every row and emit per-row stats
    * (doc_id, n_bytes, checksum, width, height): checksum is the
    * (acc·131 + sample) mod FpMod left fold over decoded samples —
    * reproducible in the DuckDB oracle for ASCII payloads. */
  def decodeStats(media: Dataset[MediaRow], codec: MediaCodec = StubCodec,
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
             codec: MediaCodec = StubCodec,
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
                   codec: MediaCodec = StubCodec,
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
                      codec: MediaCodec = StubCodec,
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
