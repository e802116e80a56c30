package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup

/** Stage-level profile of the q18 ppjoin prefix join (the bench maximum):
  * times the document-frequency aggregate, the per-doc rank window, the
  * prefix self-join, and the verify join separately on the driver's
  * documents fixture, so bench movements can be attributed to a stage.
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.JaccardProfile"`. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val docs = graft.core.Tables.table(spark, dir, "documents")
    val threshold = 0.5

    val (codes, tCodes) = time {
      val c = Dedup.shingleCodeTable(docs).cache(); c.count(); c
    }
    val grams = codes.withColumnRenamed("codes", "grams")

    val inv = grams.select(col("id"), explode(col("grams")).as("g"))
    val (dfreq, tDfreq) = time {
      val d = inv.groupBy("g").agg(count(lit(1)).as("df")).cache()
      d.count(); d
    }
    val (nVocabProbe, tProbe) = time(
      inv.select("g").limit(65536).distinct().count())
    val sz = grams.select(col("id"), size(col("grams")).as("sz"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("g"))
    val (pref, tPref) = time {
      val p = inv.join(dfreq, "g").join(sz, "id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
        .select("id", "g").cache()
      p.count(); p
    }
    val (nCand, tCand) = time {
      pref.as("x").join(pref.as("y"),
          col("x.g") === col("y.g") && col("x.id") < col("y.id"))
        .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
        .distinct().cache().count()
    }
    val (nPairs, tAll) = time(
      Dedup.jaccardPairsPrefix(grams, threshold).count())

    println(s"""{"experiment":"jaccard_profile","sf_dir":"$dir",""" +
      s""""n_docs":${docs.count()},""" +
      s""""shingle_prep_sec":$tCodes,"dfreq_sec":$tDfreq,""" +
      s""""vocab_probe_sec":$tProbe,"vocab_probe_distinct":$nVocabProbe,""" +
      s""""prefix_window_sec":$tPref,""" +
      s""""cand_join_sec":$tCand,"n_candidates":$nCand,""" +
      s""""full_operator_sec":$tAll,"n_pairs":$nPairs}""")
    spark.stop()
  }
}
