package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: dump `.explain("formatted")` for declared
  * queries to files (plans/rNN/<query>_<tag>.txt) so plan-shape claims in
  * OPTIMIZATION_rNN.md are checkable without running Spark. Builds each
  * query's DataFrame exactly like Bench/Verify (fixture side effects and
  * memoized tables included) but does NOT execute the final frame — the
  * committed plan is the pre-execution AdaptiveSparkPlan, whose Exchange
  * placement / join strategy / PushedFilters are what the round's notes
  * cite. Usage: PlanDump <sfDir> <outDir> <tag> <q1,q2,...|all>  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, namesCsv) = args
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
    new java.io.File(outDir).mkdirs()
    val all = namesCsv == "all"
    val wanted = namesCsv.split(",").map(_.trim).toSet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val short = name.takeWhile(_ != '_')
      if (all || wanted.contains(name) || wanted.contains(short)) {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
