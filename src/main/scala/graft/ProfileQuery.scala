package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Optimization-round tooling: run ONE declared query and print every Spark
  * job it launches (callsite, wall ms) — the fixed-overhead breakdown the
  * Spark UI would show, in a form that works with spark.ui.enabled=false.
  * Usage: ProfileQuery <sfDir> <queryName> [reps]  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "100000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup like Bench
    try {
      Seq("lineitem", "embeddings", "documents").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count() }
      SparkEntry.entry(spark).limit(1).count()
    } catch { case _: Throwable => () }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // AQE stage-materialization futures all share one callsite
        // (withThreadLocalCaptured), so print every DISTINCT stage
        // callsite in the job — that is what actually runs
        val sites = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          .mkString(" | ")
        val site = sites +
          s" [${j.stageInfos.length} stages, " +
          s"${j.stageInfos.map(_.numTasks).sum} tasks]"
        jobs.put(j.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(j.jobId)
        if (st != null)
          done.add((j.jobId, st._1, (System.nanoTime() - st._2) / 1000000L))
      }
    })
    // comma-separated names run sequentially in ONE session (reps applies
    // to the LAST name; earlier ones run once as in-bench warmup context)
    val names = qname.split(",").toSeq
    names.dropRight(1).foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count()
    }
    val fn = SparkEntry.queries(names.last)
    (1 to reps).foreach { rep =>
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading
      org.apache.spark.sql.graftbridge.Bridge.drainListeners(spark.sparkContext)
      Thread.sleep(200)
      val rows = done.toArray(Array.empty[(Int, String, Long)]).sortBy(_._1)
      val raw = new java.io.PrintStream(
        new java.io.FileOutputStream(java.io.FileDescriptor.out))
      raw.println(f"== $qname rep $rep wall ${wall}%.3f s, ${rows.length} jobs, " +
        f"job-sum ${rows.map(_._3).sum / 1000.0}%.3f s")
      rows.foreach { case (id, site, ms) =>
        raw.println(f"  job $id%4d $ms%6d ms  $site") }
      raw.flush()
    }
    spark.stop()
  }
}
