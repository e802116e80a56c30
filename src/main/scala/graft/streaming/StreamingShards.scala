package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.NpyIO

/** Structured Streaming ingest of vector SHARDS landing in a directory —
  * the "a new embedding dump appears every few minutes" shape. The
  * reference ingests `.npy` dumps through its Python surface
  * (`bindings/python/src/svs/common.py:62` read_npy); here the same files
  * become a continuous source: Spark's file stream discovers new shards
  * exactly-once per checkpoint, each micro-batch decodes ONLY its new
  * files with the same executor-side kernel as the batch reader
  * ([[NpyIO.decodeAll]]), and nothing shuffles until the caller's own
  * downstream — per-shard decode is embarrassingly parallel, the 100 TB
  * shape.
  *
  * Identity: a file stream has no global row order, so dense
  * (path, row)-ordered ids — the batch reader's contract — do not exist
  * under incremental arrival. [[npyShards]] therefore emits the honest
  * coordinates `(shard, row, vec)`; [[npyShardsWithIds]] restores EXACT
  * original ids when shards were written with
  * `NpyIO.write(idShardNames = true)`, whose `base-<startId>.npy` names
  * carry each shard's id base (id = base + row). Compose with
  * [[StreamingIngest.attach]] to feed a dynamic index, or any stateful
  * sink downstream. */
object StreamingShards {

  /** The shared stream shape: binaryFile discovery of `*.{ext}` under
    * `dir`, one decode call per new file. The schema is declared up front
    * (streaming file sources require it; binaryFile's is fixed by the
    * format) and `shard` is the file NAME, not the full path, so
    * checkpoints stay relocatable. */
  private def shardStream(spark: SparkSession, dir: String, ext: String)
      (decode: (String, Array[Byte]) => Iterator[(Long, Array[Double])])
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("pathGlobFilter", s"*.$ext")
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        decode(p, bytes).map { case (r, v) => (name, r, v) }
      }
      .toDF("shard", "row", "vec")
  }

  /** Stream of `.npy` shards under `dir` decoded to
    * `(shard STRING, row BIGINT, vec ARRAY<DOUBLE>)` — `row` is the
    * position inside the shard. */
  def npyShards(spark: SparkSession, dir: String): DataFrame =
    shardStream(spark, dir, "npy")((p, bytes) => NpyIO.decodeAll(bytes, p))

  /** `*vecs` twin of [[npyShards]]: shards of `ext`
    * (`"fvecs"|"ivecs"|"bvecs"|"hvecs"`) landing under `dir` decode with
    * the batch reader's kernel ([[graft.sources.VecsIO.decode]]). */
  def vecsShards(spark: SparkSession, dir: String, ext: String): DataFrame = {
    val el = graft.sources.VecsIO.elTypeFor(s"x.$ext")
    shardStream(spark, dir, ext) { (_, bytes) =>
      graft.sources.VecsIO.decode(bytes, el).zipWithIndex.map {
        case (v, r) => (r.toLong, v)
      }
    }
  }

  /** MANIFEST-driven shard stream — the object-store answer when
    * directory LISTING is the bottleneck: at 10⁶ shards a recursive
    * list per micro-batch dominates, but producers already know exactly
    * which files they landed, so they append small manifest files (one
    * shard path per line, `#` comments allowed) to `manifestDir`; the
    * stream lists only the manifest dir (a handful of small files),
    * discovers each manifest exactly-once via the file-stream
    * checkpoint, and fetches+decodes the listed shards on executors.
    *
    * Exactly-once DECODE survives producer retries: a shard re-listed
    * by a later manifest (at-least-once manifest delivery) is dropped by
    * a streaming `dropDuplicates` on the shard path before any bytes
    * are fetched. Each line is CANONICALIZED first
    * (`FileSystem.makeQualified` — scheme/authority defaults applied,
    * `.`/`..`/double/trailing slashes collapsed), so equivalent
    * spellings of one shard collide in the dedup instead of decoding
    * twice. State is one entry per shard path, carried by the
    * checkpoint — MBs at millions of shards, but UNBOUNDED over the
    * stream's lifetime unless `dedupTtl` is set.
    *
    * `dedupTtl` is the bounded-state contract for long-lived streams:
    * manifests arrive in append-waves and a producer retries a wave
    * promptly, so a shard re-listed more than `dedupTtl` (e.g.
    * `"24 hours"`) after it was first seen is a producer bug, not a
    * retry — with the TTL set, dedup state older than the watermark is
    * dropped (`dropDuplicatesWithinWatermark`), bounding state to the
    * shards seen within one TTL window at the cost that such a
    * beyond-TTL replay would ingest again. `None` (default) keeps the
    * exact forever-dedup.
    *
    * Paths must be resolvable by
    * the executors' Hadoop filesystem (absolute URIs on an object
    * store); a listed shard that has vanished fails the batch loudly —
    * silently skipping it would under-ingest without a trace. */
  private def manifestShardStream(spark: SparkSession, manifestDir: String,
                                  dedupTtl: Option[String])
      (decode: (String, Array[Byte]) => Iterator[(Long, Array[Double])])
      : DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val canon = spark.readStream.format("text").load(manifestDir)
      .as[String]
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val p = new org.apache.hadoop.fs.Path(l)
        val q = p.getFileSystem(conf.value).makeQualified(p)
        val u = q.toUri
        // Path normalizes dot segments and duplicate slashes;
        // makeQualified adds the default scheme — but leaves a
        // null-vs-empty authority split ("file:/x" vs "file:///x"
        // depending on whether the line carried a scheme), so the DEDUP
        // KEY rebuilds with the authority pinned. The key is ONLY a
        // key: URI's multi-arg constructor percent-encodes spaces/%/
        // non-ASCII, and new Path(encodedStr) would NOT decode them —
        // so the shard is OPENED via Path.toString, which round-trips
        // through new Path un-encoded.
        val key = new java.net.URI(u.getScheme,
          Option(u.getAuthority).getOrElse(""), u.getPath, null, null)
          .toString
        (key, q.toString)
      }
      .toDF("key", "path")
    val deduped = dedupTtl match {
      case None => canon.dropDuplicates("key")
      case Some(ttl) =>
        canon.withColumn("seen_at", current_timestamp())
          .withWatermark("seen_at", ttl)
          .dropDuplicatesWithinWatermark("key")
          .drop("seen_at")
    }
    deduped
      .select("path")
      .as[String]
      .flatMap { pathStr =>
        val p = new org.apache.hadoop.fs.Path(pathStr)
        val fs = p.getFileSystem(conf.value)
        val len = fs.getFileStatus(p).getLen
        require(len <= Int.MaxValue,
          s"manifest shard $pathStr is ${len} B — single shards over " +
            "2 GiB need the range-splitting batch source (graftnpy/" +
            "graftvecs), not the shard stream")
        val bytes = new Array[Byte](len.toInt)
        val in = fs.open(p)
        try in.readFully(0L, bytes) finally in.close()
        decode(pathStr, bytes).map { case (r, v) => (p.getName, r, v) }
      }
      .toDF("shard", "row", "vec")
  }

  /** [[npyShards]] driven by manifest files instead of directory
    * listing: `(shard, row, vec)` coordinates for every `.npy` path
    * listed under `manifestDir`. `dedupTtl` bounds the exactly-once
    * dedup state for long-lived streams (see [[manifestShardStream]]'s
    * contract). */
  def npyShardsFromManifests(spark: SparkSession, manifestDir: String,
                             dedupTtl: Option[String] = None)
      : DataFrame =
    manifestShardStream(spark, manifestDir, dedupTtl)(
      (p, bytes) => NpyIO.decodeAll(bytes, p))

  /** `*vecs` twin of [[npyShardsFromManifests]]. */
  def vecsShardsFromManifests(spark: SparkSession, manifestDir: String,
                              ext: String,
                              dedupTtl: Option[String] = None): DataFrame = {
    val el = graft.sources.VecsIO.elTypeFor(s"x.$ext")
    manifestShardStream(spark, manifestDir, dedupTtl) { (_, bytes) =>
      graft.sources.VecsIO.decode(bytes, el).zipWithIndex.map {
        case (v, r) => (r.toLong, v)
      }
    }
  }

  /** [[npyShardsFromManifests]] + exact original ids from
    * `base-<startId>.npy` shard names. */
  def npyShardsFromManifestsWithIds(spark: SparkSession,
                                    manifestDir: String,
                                    dedupTtl: Option[String] = None)
      : DataFrame =
    withRestoredIds(npyShardsFromManifests(spark, manifestDir, dedupTtl),
      "npyShardsFromManifestsWithIds")

  /** [[vecsShardsFromManifests]] + exact original ids from
    * `base-<startId>.<ext>` names. */
  def vecsShardsFromManifestsWithIds(spark: SparkSession,
                                     manifestDir: String, ext: String,
                                     dedupTtl: Option[String] = None)
      : DataFrame =
    withRestoredIds(
      vecsShardsFromManifests(spark, manifestDir, ext, dedupTtl),
      "vecsShardsFromManifestsWithIds")

  private def withRestoredIds(coords: DataFrame, what: String): DataFrame = {
    val base = regexp_extract(col("shard"), "^base-(\\d+)\\.[a-z]+$", 1)
    coords
      .withColumn("id",
        when(base === "", raise_error(concat(
          lit(s"$what: shard "), col("shard"),
          lit(" has no base-<startId> name — write with " +
            "idShardNames=true or use the coordinate stream"))))
          .otherwise(base.cast("long") + col("row")))
      .select("id", "vec")
  }

  /** [[npyShards]] + exact original ids from `base-<startId>.npy` shard
    * names (`NpyIO.write(idShardNames = true)`): `id = base + row`.
    * A shard whose name does not carry a base fails the batch loudly —
    * silently minting different ids would corrupt any downstream
    * keyed state. */
  def npyShardsWithIds(spark: SparkSession, dir: String): DataFrame =
    withRestoredIds(npyShards(spark, dir), "npyShardsWithIds")

  /** [[vecsShards]] + exact original ids from `base-<startId>.<ext>`
    * names (`VecsIO.write(idShardNames = true)`). */
  def vecsShardsWithIds(spark: SparkSession, dir: String, ext: String)
      : DataFrame =
    withRestoredIds(vecsShards(spark, dir, ext), "vecsShardsWithIds")
}
