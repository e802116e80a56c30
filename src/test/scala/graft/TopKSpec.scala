package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, TopK}

class TopKSpec extends SparkSpec {

  private def randomScored = {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (0 until 5000).map { i =>
      (i % 7L, i.toLong, math.floor(rng.nextDouble() * 100) / 10)  // many ties
    }.toDF("q", "id", "dist").repartition(4)
  }

  test("aggregator top-k == window top-k (asc, with ties)") {
    val df = randomScored
    val a = TopK.perKey(df, Seq("q"), col("id"), col("dist"), 10, ascending = true)
      .select("q", "rnk", "neighbor_id").orderBy("q", "rnk").collect()
    val w = TopK.perKeyViaWindow(df, Seq("q"), col("id"), col("dist"), 10,
      ascending = true)
      .select("q", "rnk", "neighbor_id").orderBy("q", "rnk").collect()
    assert(a.toSeq == w.toSeq)
  }

  test("aggregator top-k == window top-k (desc)") {
    val df = randomScored
    val a = TopK.perKey(df, Seq("q"), col("id"), col("dist"), 7, ascending = false)
      .select("q", "rnk", "neighbor_id").orderBy("q", "rnk").collect()
    val w = TopK.perKeyViaWindow(df, Seq("q"), col("id"), col("dist"), 7,
      ascending = false)
      .select("q", "rnk", "neighbor_id").orderBy("q", "rnk").collect()
    assert(a.toSeq == w.toSeq)
  }

  test("k larger than group size returns whole group sorted") {
    import spark.implicits._
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 2.0))
      .toDF("q", "id", "dist")
    val r = TopK.perKey(df, Seq("q"), col("id"), col("dist"), 10, ascending = true)
      .orderBy("rnk").select("neighbor_id").as[Long].collect()
    assert(r.toSeq == Seq(11L, 12L, 10L))
  }

  test("flat knn: nearest L2 neighbor of a vector is itself") {
    import spark.implicits._
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val top1 = FlatKnn.search(q, data, 1, Metric.L2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.nonEmpty && top1.forall { case (a, b) => a == b })
  }

  test("flat knn fast path == window path on embeddings (all metrics)") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    for (m <- Metric.all) {
      val a = FlatKnn.search(q, data, 10, m)
        .select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
        .collect()
      val w = FlatKnn.searchViaWindow(q, data, 10, m)
        .select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
        .collect()
      assert(a.toSeq == w.toSeq, s"metric ${m.name}")
    }
  }

  test("tombstoned ids never appear in results") {
    import spark.implicits._
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val dead = Seq(0L, 50L, 100L, 150L, 200L, 250L, 300L, 350L, 400L, 450L)
    val tomb = dead.toDF("id")
    val r = FlatKnn.searchWithTombstones(q, data, tomb, 5, Metric.L2)
      .select("neighbor_id").as[Long].collect()
    assert(r.nonEmpty && r.toSet.intersect(dead.toSet).isEmpty)
  }
}
