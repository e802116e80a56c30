package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, Lvq}

class LvqSpec extends SparkSpec {

  private def data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)
  private lazy val p = Lvq.Params(Lvq.trainMean(data))

  private def maxAbsErr(decoded: org.apache.spark.sql.DataFrame): Double =
    data.join(decoded.withColumnRenamed("vec", "dec"), Seq("id"))
      .select(max(aggregate(zip_with(col("vec"), col("dec"),
        (a, b) => abs(a - b)), lit(0.0), (acc, x) => greatest(acc, x)))
        .as("e"))
      .head.getDouble(0)

  test("level-1 error within the per-vector half-step; level-2 refines it") {
    val enc = Lvq.encode(data, p).cache()
    // per-vector half-step bound: |v - dec1(v)| <= s1/2 everywhere
    val viol1 = data.join(Lvq.decode(enc, p, twoLevel = false)
        .withColumnRenamed("vec", "dec"), Seq("id"))
      .join(enc.select("id", "s1"), Seq("id"))
      .filter(exists(zip_with(col("vec"), col("dec"),
        (a, b) => abs(a - b) > col("s1") * 0.5 + lit(1e-12)), x => x))
      .count()
    assert(viol1 === 0L)
    // residual level shrinks the worst-case error by ~the level-2 fanout
    val e1 = maxAbsErr(Lvq.decode(enc, p, twoLevel = false))
    val e2 = maxAbsErr(Lvq.decode(enc, p, twoLevel = true))
    assert(e2 < e1 / 50, s"level-2 err $e2 vs level-1 $e1")
    enc.unpersist()
  }

  test("8x8 compressed search matches exact flat kNN on the embeddings") {
    val enc = Lvq.encode(data, p)
    val compressed = Lvq.search(q, enc, p, 10, kReorder = 3)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val exact = FlatKnn.search(q, data, 10, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    // 16 bits of per-vector precision: the two-pass result should be
    // indistinguishable from exact on this data (recall 1.0)
    val hits = compressed.toSet.intersect(exact.toSet).size
    assert(hits >= (exact.size * 0.95).toInt,
      s"only $hits/${exact.size} rows matched exact")
  }

  test("IVF+LVQ reorder with all clusters probed equals the exhaustive " +
      "two-pass LVQ search (codegen'd code-space distance is exact)") {
    import graft.operators.IvfIndex
    val clustered = Tables.embeddingVectors(spark, sfDir)
      .select(col("id"), col("vec"), col("label").cast("long").as("cluster_id"))
    val withLvq = IvfIndex.withResidentLvq(clustered, p).cache()
    val centroids = clustered.select(col("cluster_id"), posexplode(col("vec")))
      .groupBy("cluster_id", "pos").agg(round(avg("col"), 6).as("m"))
      .collect().groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq) }
      .toSeq
    val nClusters = centroids.size
    val ivf = IvfIndex.searchWithLvqReorder(q, withLvq, centroids, p,
        k = 10, nProbes = nClusters, kReorder = 3)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val exhaustive = Lvq.search(q, Lvq.encode(data, p), p, 10, kReorder = 3)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(ivf === exhaustive)
    withLvq.unpersist()
  }

  test("encode is deterministic and codes fit 8 bits") {
    val a = Lvq.encodeExploded(data, p).orderBy("id", "pos").collect().toSeq
    val b = Lvq.encodeExploded(data, p).orderBy("id", "pos").collect().toSeq
    assert(a === b)
    assert(a.forall { r =>
      val c1 = r.getLong(2); val c2 = r.getLong(3)
      c1 >= 0 && c1 <= 255 && c2 >= 0 && c2 <= 255
    })
  }
}
