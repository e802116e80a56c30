package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. The line goes to stdout AND to a file — sbt prefixes
  * stdout with "[info] " which breaks line-oriented JSON parsing, so the
  * file copy (SPARK_GRAFT_BENCH_OUT, default BENCH_LOCAL.json in the repo
  * root) is the machine-readable artifact. Per-query failures are recorded
  * in an "errors" map instead of being swallowed. */
object Bench {

  /** The serving family's in-process repeat floor — ONE constant feeding
    * both the repsFor dial and the artifact's self-describing
    * `reps_min_serve` field (they must never drift: consumers derive
    * percentile ranks from it). */
  private val RepsMinServe = 3

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_LOCAL.json")
    // Scratch placement (parameterized, guide §6): Spark scratch
    // (spark.local.dir defaults to java.io.tmpdir), streaming checkpoint
    // fixtures and throwaway store fixtures all land under the JVM
    // tmpdir. On this sandbox /tmp is ext4-on-VM-disk and the streaming
    // family's per-micro-batch offset/commit/state fsyncs dominated its
    // wall (measured 1.4–3× on q61/q84/q99) — so default the scratch to
    // the RAM-backed /dev/shm when present, overridable with
    // SPARK_GRAFT_SCRATCH (a production deployment points this at its
    // fast local disks; durable checkpoints are a caller choice, and the
    // bench fixtures are ephemeral MemoryStream replays by design).
    // The tmpfs default is SIZE-GUARDED (r16 verdict item 4 / ADVICE):
    // shuffle scratch + streaming state in RAM competes with the heap and
    // page cache, so auto-redirect only when /dev/shm has comfortable
    // headroom (≥ 4 GiB usable — 2× a generous bound on the bench's
    // scratch footprint); an explicit SPARK_GRAFT_SCRATCH always wins.
    // The resolved path is logged AND recorded in the JSON artifact.
    val MinShmUsable = 4L * 1024 * 1024 * 1024
    val scratch: Option[String] = sys.env.get("SPARK_GRAFT_SCRATCH")
      .orElse(Some("/dev/shm").filter(p => {
        val f = new java.io.File(p)
        f.isDirectory && f.canWrite && f.getUsableSpace >= MinShmUsable
      }))
      .flatMap { s =>
        val d = new java.io.File(s, "graft-scratch")
        d.mkdirs()
        if (d.isDirectory && d.canWrite) {
          System.setProperty("java.io.tmpdir", d.getAbsolutePath)
          Some(d.getAbsolutePath)
        } else None
      }
    System.err.println(s"[bench] scratch=" +
      scratch.getOrElse(System.getProperty("java.io.tmpdir", "/tmp")))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer caches (the reference's
    // benchmark harness likewise reports post-warmup runs)
    try {
      Seq("lineitem", "embeddings", "documents").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count() }
      SparkEntry.entry(spark).limit(1).count()
    } catch { case _: Throwable => () }
    // per-query shuffle/spill accounting: plan-quality telemetry for the
    // artifact (a query whose shuffle bytes grow superlinearly with SF is a
    // scale bug even when its wall-clock looks fine)
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val gcTime = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spilled.addAndGet(m.diskBytesSpilled)
            gcTime.addAndGet(m.jvmGCTime)
          }
        }
      })
    def metricsSnapshot(): (Long, Long, Long) = {
      org.apache.spark.sql.graftbridge.Bridge
        .drainListeners(spark.sparkContext)
      (shufRead.get(), shufWrite.get(), spilled.get())
    }

    // repeated-run protocol (reference benchmark/search.h:69-96 records
    // latency vectors per config): reps > 1 reports the median per query in
    // "queries" plus the full vector + p90 in "latency"/"p90". The SERVING
    // family (every query whose name carries "serve") always runs ≥3
    // in-process repeats — those queries are sub-second, so the ~2 s of
    // extra wall buys self-adjudicating percentiles in every BENCH_LOCAL /
    // BENCH_r* artifact: envelope drift (boot noise swings wall ±15-25% on
    // this box) separates from regression without re-running the suite.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt.max(1)
    def repsFor(name: String): Int =
      if (name.contains("serve")) reps.max(RepsMinServe) else reps
    // Bisect levers (regression adjudication): ONLY= comma-separated qNN
    // prefixes restricts the run; CLEAR_MEMOS=1 drops SparkEntry's memoized
    // caches before every query (isolates cache-eviction/GC interference at
    // the cost of rebuilding shared tables per query).
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").filter(_.nonEmpty)
        .map(_.split(",").map(_.trim.takeWhile(_ != '_')).toSet)
    val clearEach = sys.env.get("SPARK_GRAFT_BENCH_CLEAR_MEMOS")
      .exists(v => v == "1" || v == "true")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (name, _) => only.forall(_.contains(name.takeWhile(_ != '_')))
    }
    // STORAGE=1: per-query block-manager telemetry (persistent-RDD count +
    // storage bytes AFTER the query) — the r5 regression diagnosis tool: a
    // monotonically growing curve means cached/checkpointed state leaks
    // across queries and later queries pay the GC/eviction tax.
    val storageLog = sys.env.get("SPARK_GRAFT_BENCH_STORAGE")
      .exists(v => v == "1" || v == "true")
    // Memo-pool cap (guide §5 "cached data competes with execution
    // memory; unpersist when done"): a long single-JVM session over all
    // 192 queries accumulates every family's memoized caches, and cached
    // state beyond what fits comfortably taxes later queries via
    // storage-pool eviction + old-gen GC (the r5 and r16 regression
    // clusters). When the block manager's stored bytes exceed the cap
    // after a query, drop ALL memos — the next family rebuilds its own
    // (bounded, one-time) and the pool stays flat instead of monotonic.
    // Parameterized (SPARK_GRAFT_MEMO_CAP_BYTES); the default, a quarter
    // of the heap, never fires at bench SFs (~200 MB cached at sf0.1 on
    // an 8 GiB heap — bench comparability is unaffected) and bounds the
    // session at the SFs where eviction would start.
    val memoCap = sys.env.get("SPARK_GRAFT_MEMO_CAP_BYTES").map(_.toLong)
      .getOrElse(Runtime.getRuntime.maxMemory / 4)
    val results = selected.map {
      case (name, fn) =>
        if (clearEach) SparkEntry.clearMemos()
        var err: Option[String] = None
        // per-REP shuffle deltas, reported as the per-rep MEDIAN: plans
        // are deterministic per rep so for a steady query median ==
        // every rep's delta (== the single-rep value — manifests stay
        // comparable), while one-time first-rep work (a memoized build
        // under CLEAR_MEMOS, a cold side table) lands in rep 1 only and
        // the median reports the steady-state execution instead of
        // smearing build shuffle across reps
        var snap = metricsSnapshot()
        val repDeltas = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)]
        val times = (0 until repsFor(name)).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count() catch {
            case e: Throwable => err = Some(Option(e.getMessage)
              .getOrElse(e.getClass.getName).take(300))
          }
          val dt = (System.nanoTime() - t0) / 1e9
          val next = metricsSnapshot()
          repDeltas += ((next._1 - snap._1, next._2 - snap._2,
            next._3 - snap._3))
          snap = next
          dt
        }.sorted
        def medOf(f: ((Long, Long, Long)) => Long): Long = {
          val xs = repDeltas.map(f).sorted
          xs(xs.length / 2)
        }
        // post-query hygiene (untimed): local checkpoints are terminal
        // result/round materializations (Dedup pair epilogues, Components
        // rounds, BSP search state) that nothing re-reads once the query's
        // count() returned — but their blocks outlive the query and taxed
        // late-alphabet queries in long 104-query sessions (the r5 bench
        // regression cluster). Memoized shared frames use .cache(), never
        // localCheckpoint (keep it that way), so sweeping only
        // locally-checkpointed RDDs preserves every memo.
        spark.sparkContext.getPersistentRDDs.values.foreach { r =>
          if (org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(r))
            r.unpersist(blocking = false)
        }
        val storedBytes = spark.sparkContext.getExecutorMemoryStatus
          .values.map { case (max, free) => max - free }.sum
        if (storedBytes > memoCap) {
          System.err.println(s"[bench] memo pool $storedBytes B over the " +
            s"$memoCap B cap after $name — clearing memoized caches")
          SparkEntry.clearMemos()
        }
        if (storageLog) {
          val sc = spark.sparkContext
          val nRdds = sc.getPersistentRDDs.size
          val mem = sc.getExecutorMemoryStatus.values
            .map { case (max, free) => max - free }.sum
          val heap = {
            val rt = Runtime.getRuntime
            rt.totalMemory() - rt.freeMemory()
          }
          System.err.println(
            f"[bench-storage] $name rdds=$nRdds mem=$mem heap=$heap " +
            f"gcms=${gcTime.get()}")
        }
        val median = times(times.length / 2)
        (name, median, times, err,
          (medOf(_._1), medOf(_._2), medOf(_._3)))
    }
    val qs = results.map { case (k, v, _, _, _) => jstr(k) + ":" + f"$v%.6f" }
      .mkString("{", ",", "}")
    val errs = results.collect {
      case (k, _, _, Some(e), _) => jstr(k) + ":" + jstr(e)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val shuffle = results.map { case (k, _, _, _, (r, w, s)) =>
      jstr(k) + s""":{"read":$r,"write":$w,"spill":$s}"""
    }.mkString("{", ",", "}")
    // latency vectors + p90 whenever ANY query repeated (the serving
    // family always does); single-rep queries carry their one sample
    val anyMulti = results.exists(_._3.length > 1)
    val extra =
      if (!anyMulti) s""","shuffle_bytes":$shuffle"""
      else {
        val lat = results.collect { case (k, _, ts, _, _) if ts.length > 1 =>
          jstr(k) + ":" + ts.map(t => f"$t%.6f").mkString("[", ",", "]")
        }.mkString("{", ",", "}")
        // nearest-rank p90: ceil(0.9·n)-1 (reps=10 → index 8, not the max)
        val p90 = results.collect { case (k, _, ts, _, _) if ts.length > 1 =>
          val idx = (math.ceil(0.9 * ts.length).toInt - 1).max(0)
          jstr(k) + ":" + f"${ts(idx)}%.6f"
        }.mkString("{", ",", "}")
        // `reps` is the GLOBAL dial; serve-family queries run
        // max(reps, 3) — `reps_min_serve` makes that self-describing and
        // the authoritative per-query count is each latency vector's
        // length (a consumer deriving percentile ranks must use those,
        // not `reps`)
        s""","reps":$reps,"reps_min_serve":$RepsMinServe,""" +
          s""""latency":$lat,"p90":$p90""" +
          s""","shuffle_bytes":$shuffle"""
      }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"n_queries":${results.size},""" +
      s""""n_errors":${results.count(_._4.isDefined)}$extra,""" +
      s""""scratch":${jstr(scratch.getOrElse(
        System.getProperty("java.io.tmpdir", "/tmp")))},""" +
      s""""sf":${jstr(sfDir)}}"""
    try Files.writeString(Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    // The driver keeps only the last ~2 KB of stdout and line-parses JSON
    // out of that tail, so the stdout copy must (a) stay SHORT and (b)
    // start the line with `{`: sbt's logger prefixes System.out with
    // "[info] " (why rounds 1–2 came back parsed:null), and a line longer
    // than the tail loses its HEAD — at 189 queries the full qNN map
    // overflowed the window and rounds 11–12 came back parsed:null again.
    // So the compact line carries the headline numbers plus only the TOP
    // 25 most expensive queries (the grading-relevant ones) and the
    // serving-family p90s; the full-fidelity artifact is the file above.
    // Writing to FileDescriptor.out bypasses sbt's System.out redirection.
    val qsShort = results.sortBy(-_._2).take(25).map {
      case (k, v, _, _, _) =>
        jstr(k.takeWhile(_ != '_')) + ":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    // stdout p90s stay serving-family-only regardless of the global
    // reps dial: at SPARK_GRAFT_BENCH_REPS>1 EVERY query is multi-rep
    // and an unrestricted collect would put ~190 p90 entries on this
    // line — overflowing the driver's ~2 KB tail again, the exact
    // parsed:null failure the compact line exists to avoid
    val p90Short = results.collect {
      case (k, _, ts, _, _) if ts.length > 1 && k.contains("serve") =>
        val idx = (math.ceil(0.9 * ts.length).toInt - 1).max(0)
        jstr(k.takeWhile(_ != '_')) + ":" + f"${ts(idx)}%.3f"
    }.mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""n_queries":${results.size},""" +
      s""""queries":$qsShort,"p90":$p90Short,""" +
      s""""n_errors":${results.count(_._4.isDefined)},""" +
      s""""sf":${jstr(sfDir)}}"""
    // driver-tail contract self-check: the line must fit the ~2 KB
    // stdout tail WITH margin or the head (metric/value) scrolls out
    // and the driver records parsed:null (the r11/r12 failure). If a
    // future change grows the line past the margin, drop the heaviest
    // optional map rather than ship an unparseable artifact.
    val compactFinal =
      if (compact.length <= 1800) compact
      else {
        System.err.println(s"[bench] compact line ${compact.length} B " +
          "exceeds the 1800 B driver-tail margin — dropping the " +
          "queries map from stdout (file artifact keeps everything)")
        s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
        s""""n_queries":${results.size},"p90":$p90Short,""" +
        s""""n_errors":${results.count(_._4.isDefined)},""" +
        s""""sf":${jstr(sfDir)}}"""
      }
    val raw = new java.io.FileOutputStream(java.io.FileDescriptor.out)
    raw.write(("\n" + compactFinal + "\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    raw.flush()
    spark.stop()
  }
}
