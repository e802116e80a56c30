package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.BatchIterator

/** Query cancellation (reference: cancel predicate threaded through search,
  * index/flat/flat.h:286-290, certified by tests/integration/cancel.cpp):
  * the Spark form is a named job group with interrupt-on-cancel. Contract
  * under test: cancel lands mid-search, the action fails with a
  * cancellation error, the SESSION stays fully reusable, and no partial
  * state stays cached. */
class CancelSpec extends SparkSpec {

  /** Embedding data slowed down per partition so a search job reliably
    * outlives the cancel signal (the reference test's "cancel after 3
    * predicate checks" analog). */
  private def slowData = {
    val s = spark
    import s.implicits._
    Tables.embeddingVectors(s, sfDir).select("id", "vec")
      .as[(Long, Seq[Double])]
      .mapPartitions { it => Thread.sleep(400); it }
      .toDF("id", "vec")
  }

  private def cancelOnJobStart(group: String): Unit = {
    val sc = spark.sparkContext
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (group == j.properties.getProperty("spark.jobGroup.id"))
          sc.cancelJobGroup(group)
      }
    })
  }

  test("cancel mid-search fails the action, session reusable, no residue") {
    val queries = Tables.embeddingQueries(spark, sfDir)
    val idx = FlatVectorIndex(slowData, Metric.L2)
    val group = "cancel-spec-flat"
    cancelOnJobStart(group)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val e = intercept[Exception] {
      idx.searchCancellable(queries, 5, group)(_.collect())
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    assert(msg.toLowerCase.contains("cancel"), s"not a cancellation: $msg")
    // no cached partial state survived the abort
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    // the session is reusable: the SAME index searches fine outside the
    // cancelled group (fast data so no listener interference)
    val ok = FlatVectorIndex(
        Tables.embeddingVectors(spark, sfDir).select("id", "vec"), Metric.L2)
      .search(queries, 5).collect()
    assert(ok.length === queries.count() * 5)
  }

  test("cancelled iterator page unpersists its partial cache; iterator " +
      "resumes after cancellation") {
    val s = spark
    val queries = Tables.embeddingQueries(s, sfDir).limit(3)
    val group = "cancel-spec-iter"
    val it = new BatchIterator(queries, slowData, Metric.L2, Some(group))
    cancelOnJobStart(group)
    val before = s.sparkContext.getPersistentRDDs.keySet
    intercept[Exception] { it.next(4) }
    assert(s.sparkContext.getPersistentRDDs.keySet == before,
      "cancelled page left cached partial state")
    // Job groups are per-submission: with no listener re-arm the SAME
    // iterator's next page runs to completion (driver-side schedule state
    // was not corrupted by the abort). A fresh group id sidesteps the
    // already-fired cancel.
    val it2 = new BatchIterator(queries, Tables.embeddingVectors(s, sfDir)
      .select("id", "vec"), Metric.L2, Some(group + "-resume"))
    val page = it2.next(4).collect()
    assert(page.length === 12)
  }
}
