package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IndexLayout
import graft.sources.SyntheticData

/** The codec-store M-lifecycle at 10⁷ — scale evidence for
  * [[graft.operators.IndexLayout.upsert]]/[[graft.operators.IndexLayout.repair]]
  * (round 14; q191/q192 certify correctness at sf0.01, this measures the
  * partition-economics claim at 10⁷ × 64-d): an upsert touching T of S
  * shards must cost I/O ∝ the touched partitions, NOT the store — the
  * same dynamic-partition-overwrite law GraphLayout.upsert measures via
  * q152's store. Legs:
  *
  *   1. initial IVFADC layout write (residual codes resident) — the
  *      full-store baseline every incremental number is judged against,
  *   2. upsert of adds+deletes touching ~1% of shards: wall, shuffle,
  *      touched-partition bytes vs store bytes,
  *   3. the from-scratch alternative (full rewrite wall) — what the
  *      upsert SAVES,
  *   4. repair() of a synthetic crash marker over the same touched set —
  *      the recovery path's measured cost (same partition economics),
  *   5. a serve before/after (rows>0) proving the store stays servable.
  *
  * Range sharding (cluster_id = id / shardRows) like Scale100M: uniform
  * hash noise has no cluster structure to find; partition economics and
  * I/O shapes are what this harness measures. Env: SPARK_GRAFT_IU_N
  * (default 10 000 000), SPARK_GRAFT_IU_SHARD (rows/shard, default
  * 5000), SPARK_GRAFT_CPUS. One JSON line per leg. Run alone. */
object ScaleIndexUpsert {

  private final class ShuffleMeter extends SparkListener {
    private val read = new java.util.concurrent.atomic.AtomicLong
    private val write = new java.util.concurrent.atomic.AtomicLong
    private var r0 = 0L
    private var w0 = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def delta(): (Long, Long) = {
      org.apache.spark.sql.graftbridge.Bridge.drainListeners(
        org.apache.spark.SparkContext.getOrCreate())
      val r = read.get(); val w = write.get()
      val d = (r - r0, w - w0); r0 = r; w0 = w; d
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_IU_N", "10000000").toLong
    val shardRows = sys.env.getOrElse("SPARK_GRAFT_IU_SHARD", "5000").toInt
    val dims = 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def rmr(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    def duBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    val nShards = ((n + shardRows - 1) / shardRows).toInt
    val storePath = "/tmp/graft_iu_store"
    val freshPath = "/tmp/graft_iu_store_fresh"
    rmr(storePath); rmr(freshPath)

    // ---- corpus + codec params -------------------------------------------
    val clustered = SyntheticData.generateMixed(spark, n, dims)
      .withColumn("cluster_id", (col("id") / shardRows).cast("long"))
      .localCheckpoint(true)
    val cents = operators.KMeans.roundedMeans(clustered)
    val pqP = operators.Pq.trainLloyd(
      clustered.filter(col("id") % math.max(1L, n / 20000L) === 3),
      m = 8, k = 16, dims, iters = 2)

    // ---- 1. initial IVFADC layout write ----------------------------------
    meter.delta()
    val (_, tWrite) = time {
      IndexLayout.write(clustered, cents, storePath,
        IndexLayout.PqResC(pqP))
    }
    val (shufRw, shufWw) = meter.delta()
    val storeBytes = duBytes(storePath)
    println(s"""{"experiment":"scale_iu_store","n":$n,"shards":$nShards,""" +
      s""""store_write_sec":$tWrite,"store_bytes":$storeBytes,""" +
      s""""write_shuffle_read_bytes":$shufRw,""" +
      s""""write_shuffle_write_bytes":$shufWw}""")

    // ---- 2. the incremental upsert (~1% of shards touched) ---------------
    // adds land in the first nShards/200 shards; deletes leave the next
    // nShards/200 — 1% of the store's partitions in play
    val tShards = math.max(1, nShards / 200)
    val added = clustered.filter(col("cluster_id") < tShards)
      .filter(col("id") % 97 === 3)
      .select((col("id") + 2L * n).as("id"), col("vec"), col("cluster_id"))
      .localCheckpoint(true)
    val deleted = clustered
      .filter(col("cluster_id") >= tShards && col("cluster_id") < 2L * tShards)
      .filter(col("id") % 101 === 5).select("id").localCheckpoint(true)
    val touchedBytes = (0 until 2 * tShards).map(c =>
      duBytes(s"$storePath/data/cluster_id=$c")).sum
    meter.delta()
    val (up, tUpsert) = time {
      IndexLayout.upsert(spark, storePath, added, deleted)
    }
    val (shufRu, shufWu) = meter.delta()
    println(s"""{"experiment":"scale_iu_upsert","n":$n,""" +
      s""""touched_shards":${2 * tShards},"total_shards":$nShards,""" +
      s""""touched_bytes":$touchedBytes,"store_bytes":$storeBytes,""" +
      s""""n_added":${added.count()},"n_deleted":${deleted.count()},""" +
      s""""upsert_sec":$tUpsert,""" +
      s""""upsert_shuffle_read_bytes":$shufRu,""" +
      s""""upsert_shuffle_write_bytes":$shufWu}""")

    // ---- 3. the from-scratch alternative ----------------------------------
    val merged = clustered
      .join(deleted, Seq("id"), "left_anti").unionByName(added)
      .localCheckpoint(true)
    meter.delta()
    val (_, tFresh) = time {
      IndexLayout.write(merged, up.centroids, freshPath,
        IndexLayout.PqResC(pqP))
    }
    meter.delta()
    println(s"""{"experiment":"scale_iu_fresh_rewrite","n":$n,""" +
      s""""fresh_write_sec":$tFresh,"upsert_sec":$tUpsert,""" +
      s""""speedup":${tFresh / tUpsert}}""")
    rmr(freshPath)

    // ---- 4. repair() of a synthetic crash over the same touched set -------
    // the recovery path pays the same touched-partition economics: write
    // the marker the upsert would have left and measure the re-derive
    val touchedList = (0 until 2 * tShards).mkString(",")
    val mp = new org.apache.hadoop.fs.Path(s"$storePath/upsert.inprogress")
    val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = mfs.create(mp, true)
    out.write(s"""{"touched":[$touchedList]}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // age the synthetic marker past the heartbeat liveness window (the
    // r15 marker mechanization reads a fresh mtime as a LIVE writer and
    // refuses repair — a real crash leaves a stale heartbeat)
    mfs.setTimes(mp, System.currentTimeMillis -
      2 * operators.StoreMarker.LiveWindowMs, -1)
    meter.delta()
    val (rep, tRepair) = time { IndexLayout.repair(spark, storePath) }
    val (shufRr, shufWr) = meter.delta()
    println(s"""{"experiment":"scale_iu_repair","n":$n,""" +
      s""""touched_shards":${2 * tShards},"repair_sec":$tRepair,""" +
      s""""repair_shuffle_read_bytes":$shufRr,""" +
      s""""repair_shuffle_write_bytes":$shufWr}""")

    // ---- 5. the store stays servable --------------------------------------
    val queries = SyntheticData.generateMixed(spark, n + 100, dims)
      .filter(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val (served, tServe) = time {
      IndexLayout.serve(rep, queries, k = 10, nProbes = 8,
        graft.core.Metric.L2).count()
    }
    println(s"""{"experiment":"scale_iu_serve","n":$n,""" +
      s""""served_rows":$served,"serve_sec":$tServe}""")

    // ---- 6. cold-serve split: open() partition discovery vs serveCold ----
    // (r16) the serve-side half of the r15 scale bend: open() lists every
    // cluster_id= dir before any probe filter prunes, so a COLD one-shot
    // serve pays listing ∝ total shards. serveCold selects the probe
    // union driver-side and lists only the probed dirs. The session's
    // FileStatusCache is reset before each cold timing — without that the
    // second open reads the cache, not the filesystem.
    def coldReset(): Unit =
      org.apache.spark.sql.graftbridge.BridgeFiles.resetFileStatusCache()
    coldReset()
    val (opened, tOpenCold) = time { IndexLayout.open(spark, storePath) }
    val (_, tServeOpened) = time {
      IndexLayout.serve(opened, queries, k = 10, nProbes = 8,
        graft.core.Metric.L2).count()
    }
    coldReset()
    val (coldRows, tServeCold) = time {
      IndexLayout.serveCold(spark, storePath, queries, k = 10, nProbes = 8,
        graft.core.Metric.L2).count()
    }
    println(s"""{"experiment":"scale_iu_cold_serve","n":$n,""" +
      s""""shards":$nShards,"open_cold_sec":$tOpenCold,""" +
      s""""serve_opened_sec":$tServeOpened,""" +
      s""""servecold_rows":$coldRows,"servecold_sec":$tServeCold}""")
    rmr(storePath)
    spark.stop()
  }
}
