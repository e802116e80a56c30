package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators._

class KMeansIvfSpec extends SparkSpec {

  private lazy val data = Tables.embeddingVectors(spark, sfDir)
    .select("id", "vec").cache()
  private lazy val queries = Tables.embeddingQueries(spark, sfDir)
  private lazy val cents: Seq[(Long, Seq[Double])] =
    data.filter(col("id") % 50 === 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq.sortBy(_._1)

  test("assign matches brute-force argmin join") {
    import spark.implicits._
    val fast = KMeans.assign(data, cents).select("id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    // brute force via crossJoin + window rank 1
    val centsDf = cents.toDF("cid", "cvec")
    val pairs = data.crossJoin(broadcast(centsDf))
      .select(col("id"), col("cid"),
        graft.functions.VectorFunctions.l2Distance(col("vec"), col("cvec"))
          .as("dist"))
    val slow = TopK.perKeyViaWindow(pairs, Seq("id"), col("cid"), col("dist"),
        1, ascending = true)
      .select("id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(fast == slow)
  }

  test("lloyd: inertia non-increasing over iterations") {
    val i0 = KMeans.inertia(data, cents)
    val c1 = KMeans.lloyd(data, cents, 1, Tables.embDims)
    val i1 = KMeans.inertia(data, c1)
    val c3 = KMeans.lloyd(data, cents, 3, Tables.embDims)
    val i3 = KMeans.inertia(data, c3)
    assert(i1 <= i0 + 1e-9, s"$i1 > $i0")
    assert(i3 <= i1 + 1e-9, s"$i3 > $i1")
  }

  test("lloyd keeps empty-cluster centroids") {
    // two far-apart centroids + one unreachable: it must survive unchanged
    val far = Seq(999L -> Seq.fill(Tables.embDims)(1e9))
    val c = KMeans.lloyd(data, cents.take(2) ++ far, 2, Tables.embDims)
    assert(c.exists { case (cid, v) => cid == 999L && v.head == 1e9 })
  }

  test("IVF with all clusters probed == flat search") {
    val clustered = IvfIndex.cluster(data, cents)
    val ivf = IvfIndex.search(queries, clustered, cents, 10, cents.size,
        Metric.L2)
      .select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
      .collect()
    val flat = FlatKnn.search(queries, data, 10, Metric.L2)
      .select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
      .collect()
    assert(ivf.toSeq == flat.toSeq)
  }

  test("IVF recall at 1 probe is in (0, 1]; more probes never hurts") {
    val clustered = IvfIndex.cluster(data, cents).cache()
    val truth = FlatKnn.search(queries, data, 10, Metric.L2)
    val r1 = Recall.recallAtK(
      IvfIndex.search(queries, clustered, cents, 10, 1, Metric.L2), truth, 10)
    val r5 = Recall.recallAtK(
      IvfIndex.search(queries, clustered, cents, 10, 5, Metric.L2), truth, 10)
    assert(r1 > 0.0 && r1 <= 1.0)
    assert(r5 >= r1)
  }

  test("hierarchical IVF routing: exhaustive level-1 equals search " +
      "bit-for-bit; realistic probes fill k with a recall floor") {
    val clustered = IvfIndex.cluster(data, cents).cache()
    val (l1, groupOf) = Vamana.trainRoutingLevel(cents, nGroups = 3)
    val a = IvfIndex.searchHierarchical(queries, clustered, cents, l1,
        groupOf, 10, l1Probes = l1.length, nProbes = 4, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val b = IvfIndex.search(queries, clustered, cents, 10, 4, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(a === b)
    val real = IvfIndex.searchHierarchical(queries, clustered, cents, l1,
      groupOf, 10, l1Probes = 2, nProbes = 4, Metric.L2)
    assert(real.groupBy("query_id").count()
      .filter(col("count") =!= 10).count() === 0)
    val truth = FlatKnn.search(queries, data, 10, Metric.L2)
    assert(Recall.recallAtK(real, truth, 10) > 0.2)
  }

  test("recall of a result against itself is 1.0; against disjoint is 0.0") {
    val r = FlatKnn.search(queries, data, 10, Metric.L2)
    assert(Recall.recallAtK(r, r, 10) == 1.0)
    val shifted = r.withColumn("neighbor_id", col("neighbor_id") + 100000L)
    assert(Recall.recallAtK(shifted, r, 10) == 0.0)
  }
}
