package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions._

class DistanceSpec extends SparkSpec {

  private lazy val pairs = {
    val e = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    broadcast(q).crossJoin(e).limit(2000).cache()
  }

  test("L2Distance matches built-in reference form") {
    val diff = pairs.select(
      abs(l2Distance(col("qvec"), col("vec")) -
        l2DistanceRef(col("qvec"), col("vec"))).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff == 0.0, s"codegen vs reference L2 differ by $diff")
  }

  test("InnerProduct matches built-in reference form") {
    val diff = pairs.select(
      abs(innerProduct(col("qvec"), col("vec")) -
        innerProductRef(col("qvec"), col("vec"))).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff == 0.0, s"codegen vs reference IP differ by $diff")
  }

  test("CosineSimilarity = dot/(norm*norm) and bounded in [-1,1]") {
    val r = pairs.select(
      cosineSimilarity(col("qvec"), col("vec")).as("c"),
      (innerProductRef(col("qvec"), col("vec")) /
        (l2Norm(col("qvec")) * l2Norm(col("vec")))).as("ref"))
    val diff = r.select(abs(col("c") - col("ref")).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff < 1e-12)
    val bounds = r.agg(min("c"), max("c")).head
    assert(bounds.getDouble(0) >= -1.0 - 1e-9 && bounds.getDouble(1) <= 1.0 + 1e-9)
  }

  test("self-distance: L2(v,v)=0, cosine(v,v)=1") {
    val e = Tables.embeddingVectors(spark, sfDir).limit(50)
    val r = e.select(l2Distance(col("vec"), col("vec")).as("l2"),
      cosineSimilarity(col("vec"), col("vec")).as("cos"))
    val row = r.agg(max("l2"), min("cos")).head
    assert(row.getDouble(0) == 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("normalized inner product reproduces cosine ranking exactly " +
      "(fixed-argument fast path)") {
    import graft.core.Metric
    import graft.operators.FlatKnn
    val e = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val eN = e.select(col("id"), normalize(col("vec")).as("vec"))
    val qN = q.select(col("query_id"), normalize(col("qvec")).as("qvec"))
    val viaIp = FlatKnn.search(qN, eN, 10, Metric.IP)
    val viaCos = FlatKnn.search(q, e, 10, Metric.Cosine)
    assert(viaIp.select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq ===
      viaCos.select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq)
    // normalized vectors have unit norm
    val norms = eN.select(l2Norm(col("vec")).as("n"))
      .agg(min("n"), max("n")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-12 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-12)
  }

  test("float arrays accepted (embeddings raw float column)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").as("vec")).limit(10)
    val n = e.select(l2Distance(col("vec"), col("vec"))).count()
    assert(n == 10)
  }

  test("cosine top-k via normalized-IP matches the direct cosine ranking") {
    import graft.core.Metric
    import graft.operators.FlatKnn
    // unique query_ids only (the operator's documented contract): the
    // deduped lineitem fixtures, not the raw ones — duplicate query rows
    // carry different |q| scale factors and break merged comparability
    for ((q, d) <- Seq(
      (Tables.embeddingQueries(spark, sfDir),
        Tables.embeddingVectors(spark, sfDir).select("id", "vec")),
      (Tables.lineitemQueriesDedup(spark, sfDir),
        Tables.lineitemVectorsDedup(spark, sfDir)))) {
      val direct = FlatKnn.search(q, d, 9, Metric.Cosine)
        .select("query_id", "rnk", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val viaIp = FlatKnn.searchCosineNormalized(q, d, 9)
        .select("query_id", "rnk", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(viaIp === direct)
      assert(viaIp.nonEmpty)
    }
  }

  test("mixed double x float args equal the cast-up pair bit for bit " +
      "(all three kernels, both orders)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").cast("array<float>").as("f"))
      .withColumn("d", reverse(col("f")).cast("array<double>"))
      .limit(50).cache()
    for (fn <- Seq(l2Distance _, innerProduct _, cosineSimilarity _)) {
      val mixedDF = e.select(fn(col("d"), col("f"))).collect().map(_.getDouble(0))
      val mixedFD = e.select(fn(col("f"), col("d"))).collect().map(_.getDouble(0))
      val cast = e.select(fn(col("d"), col("f").cast("array<double>")))
        .collect().map(_.getDouble(0))
      val castR = e.select(fn(col("f").cast("array<double>"), col("d")))
        .collect().map(_.getDouble(0))
      assert(mixedDF.toSeq === cast.toSeq)
      assert(mixedFD.toSeq === castR.toSeq)
    }
    e.unpersist()
  }
}
