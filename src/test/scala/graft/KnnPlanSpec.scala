package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.FlatKnn
import graft.plans.KnnJoinApi

class KnnPlanSpec extends SparkSpec {

  private def emb = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)

  test("plan-native kNN join equals FlatKnn for every metric") {
    for (m <- Metric.all) {
      val viaPlan = KnnJoinApi.knnJoin(q, emb, 10, m)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      val viaOp = FlatKnn.search(q, emb, 10, m)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      assert(viaPlan === viaOp, s"mismatch for ${m.name}")
    }
  }

  test("the custom exec node appears in the physical plan") {
    val df = KnnJoinApi.knnJoin(q, emb, 5, Metric.L2)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("KnnPartial"), plan.take(1500))
    // merge stays declarative: window machinery over the partials
    assert(plan.contains("WindowGroupLimit") || plan.contains("Window"),
      plan.take(800))
  }

  test("float32 data works through the plan node (cast in the child plan)") {
    val f32 = emb.select(col("id"), col("vec").cast("array<float>").as("vec"))
    val viaPlan = KnnJoinApi.knnJoin(q, f32, 5, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val viaOp = FlatKnn.search(q, emb, 5, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(viaPlan === viaOp)
  }
}
