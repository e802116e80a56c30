package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, KMeans, Vamana}
import graft.operators.VamanaKernel.BuildParams

/** Skew hardening (NOTES item 3 / VERDICT round-1 #8): plant one shard at
  * ~10× the median size and prove the splitter bounds every build task while
  * keeping the index exact under full probing. */
class SkewSpec extends SparkSpec {

  private val params = BuildParams(maxDegree = 12, buildWindow = 24)

  test("planted 10x hot shard is split to bounded sub-shards; " +
      "build completes and full-probe search stays exact") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    // hot key: cluster 0 holds 350 of 500 rows (~23x the median shard of 15)
    val clustered = data.withColumn("cluster_id",
      when(col("id") < 350, 0L).otherwise(col("id") % 10 + 1))
    val cents = labelMeans(clustered)
    val maxRows = 50L

    val (split, splitCents) = Vamana.splitOversized(clustered, cents, maxRows)

    // every task-sized unit is bounded and no row was lost or duplicated
    val sizes = split.groupBy("cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(sizes.map(_._2).max <= maxRows,
      s"max shard ${sizes.map(_._2).max} > $maxRows")
    assert(sizes.map(_._2).sum === 500L)
    assert(splitCents.map(_._1).toSet === sizes.map(_._1).toSet)

    // the build completes with every shard bounded, and probing every
    // sub-shard yields the exact flat result (exhaustive window)
    val graph = Vamana.buildSharded(split, params, Metric.L2).cache()
    val q = Tables.embeddingQueries(spark, sfDir)
    val res = Vamana.searchSharded(q, split, graph, splitCents, k = 10,
        searchWindow = 1 << 14, nProbes = splitCents.length, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val exact = FlatKnn.search(q, data, 10, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(res === exact)

    // determinism: the split (and thus the rebuilt graph) is reproducible
    val (split2, splitCents2) = Vamana.splitOversized(clustered, cents,
      maxRows)
    assert(splitCents2 === splitCents)
    assert(split2.orderBy("id").collect().toSeq ===
      split.orderBy("id").collect().toSeq)
  }

  test("the recall grid holds on a split shard: full-probe search over " +
      "splitOversized sub-shards stays within tolerance of the pinned " +
      "single-shard golden") {
    val (data, queries, truth) =
      GoldenRecall.dataset(spark, 10000L, 128, 100, 10)
    val one = data.withColumn("cluster_id", lit(0L))
    val oneCents = Seq(0L -> Seq.fill(128)(0.5))
    // 10k rows / maxRows 2000 → 5 rank-striped sub-shards
    val (split, splitCents) = Vamana.splitOversized(one, oneCents, 2000L)
    assert(splitCents.length === 5)
    val bp = BuildParams(maxDegree = 32, buildWindow = 64, alpha = 1.2,
      pruneTo = 28)
    val graph = Vamana.buildSharded(split.cache(), bp, Metric.L2).cache()
    val res = Vamana.searchSharded(queries, split, graph, splitCents, 10,
      searchWindow = 40, nProbes = splitCents.length, Metric.L2)
    val recall = res.select("query_id", "neighbor_id")
      .intersect(truth.select("query_id", "neighbor_id")).count() / 1000.0
    // pinned deg32_w64 w40 single-shard golden from goldens/golden_grid.json
    val grid = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("goldens/golden_grid.json")))
    val pinned = ("\"family\":\"vamana\",\"config\":\"deg32_w64\"," +
      "\"param\":\"window\",\"value\":40,\"recall\":([0-9.eE+-]+)").r
      .findFirstMatchIn(grid).map(_.group(1).toDouble)
      .getOrElse(fail("no deg32_w64 w40 golden row"))
    assert(recall >= pinned - 0.05,
      s"split-shard recall $recall fell below pinned $pinned - 0.05")
    graph.unpersist(); split.unpersist(); truth.unpersist()
  }

  test("no-op when nothing is oversized") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val clustered = data.withColumn("cluster_id", col("id") % 10)
    val cents = labelMeans(clustered)
    val (split, splitCents) = Vamana.splitOversized(clustered, cents, 1000L)
    assert(splitCents === cents)
    assert(split.orderBy("id").collect().toSeq ===
      clustered.orderBy("id").collect().toSeq)
  }

  private def labelMeans(clustered: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Seq[Double])] =
    clustered.select(col("cluster_id"), posexplode(col("vec")))
      .groupBy("cluster_id", "pos").agg(round(avg("col"), 6).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (cid, xs) => cid -> xs.sortBy(_._2).map(_._3).toIndexedSeq }
      .toIndexedSeq.sortBy(_._1)
}
