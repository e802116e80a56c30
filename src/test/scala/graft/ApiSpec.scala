package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, Inverted}
import graft.operators.VamanaKernel.BuildParams

class ApiSpec extends SparkSpec {

  private def emb = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)

  private def freshDir(name: String): String = {
    val root = s"/tmp/graft_test_api_$name"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  test("registered SQL functions match DataFrame kernels") {
    GraftFunctions.register(spark)
    emb.limit(10).createOrReplaceTempView("api_t")
    val viaSql = spark.sql(
      """SELECT a.id AS ia, b.id AS ib,
        |  l2_distance(a.vec, b.vec) AS l2,
        |  inner_product(a.vec, b.vec) AS ip,
        |  cosine_similarity(a.vec, b.vec) AS cos
        |FROM api_t a JOIN api_t b ON a.id < b.id""".stripMargin)
      .orderBy("ia", "ib").collect()
    val viaDf = emb.limit(10).as("a")
      .join(emb.limit(10).as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        Metric.L2.column(col("a.vec"), col("b.vec")).as("l2"),
        Metric.IP.column(col("a.vec"), col("b.vec")).as("ip"),
        Metric.Cosine.column(col("a.vec"), col("b.vec")).as("cos"))
      .orderBy("ia", "ib").collect()
    assert(viaSql.toSeq === viaDf.toSeq)
  }

  test("text-analysis SQL functions match the DataFrame expression trees") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.table(spark, sfDir, "documents").limit(50)
    docs.createOrReplaceTempView("api_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_quality_score(text) AS s,
        |  graft_lang_id(text) AS l, graft_token_count(text) AS n,
        |  graft_fingerprint(text) AS f
        |FROM api_docs""".stripMargin).orderBy("doc_id").collect()
    val ta = graft.operators.TextAnalysis
    val viaDf = docs.select(col("doc_id"),
        ta.qualityScore(col("text")).as("s"),
        ta.langId(col("text")).as("l"),
        ta.tokenCount(ta.tokens(col("text"))).as("n"),
        ta.fingerprint(col("text")).as("f"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq === viaDf.toSeq)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_quality_score('a', 'b')").collect() }
    assert(e.getMessage.contains("1 argument"))
  }

  test("SQL function rejects wrong arity and types with a clear error") {
    GraftFunctions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT l2_distance(array(1.0))").collect() }
    assert(e1.getMessage.contains("2 arguments"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT l2_distance('a', 'b')").collect() }
    assert(e2.getMessage.toLowerCase.contains("array"))
  }

  test("every index family round-trips through save + open with identical " +
      "results") {
    val cents = emb.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val leaders = Inverted.pickLeaders(emb, col("id") % 25 === 7)
    val indexes: Seq[VectorIndex] = Seq(
      FlatVectorIndex(emb, Metric.L2),
      IvfVectorIndex.build(emb, cents, nProbes = 2, Metric.L2),
      VamanaVectorIndex.build(emb, cents,
        BuildParams(maxDegree = 16, buildWindow = 32), searchWindow = 40,
        nProbes = 2, Metric.L2),
      InvertedVectorIndex(Inverted.cluster(emb, leaders), leaders,
        nLeaders = 3, epsilon = 1.2, Metric.L2))
    indexes.foreach { idx =>
      val dir = freshDir(idx.indexType)
      idx.save(dir)
      val reopened = VectorIndex.open(spark, dir)
      assert(reopened.indexType === idx.indexType)
      assert(reopened.metric === idx.metric)
      val a = idx.search(q, 5).select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      val b = reopened.search(q, 5).select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      assert(a === b, s"${idx.indexType} mismatch after reopen")
    }
  }

  test("IndexLayout round-trips each codec through disk with search " +
      "results equal to the in-memory attach path") {
    import graft.operators.{IndexLayout, IvfIndex, KMeans, Lvq, ScalarQuant}
    val cents = emb.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(emb, cents).cache()
    val sqP = ScalarQuant.train(emb)
    val lvqP = Lvq.Params(Lvq.trainMean(emb))
    val lvM = graft.operators.LeanVec.train(emb, 4)
    val cases: Seq[(String, IndexLayout.Codec, () => Seq[Any])] = Seq(
      ("none", IndexLayout.Uncompressed, () =>
        IvfIndex.search(q, clustered, cents, 5, 2, Metric.L2)
          .select("query_id", "rnk", "neighbor_id")
          .orderBy("query_id", "rnk").collect().toSeq),
      ("sq", IndexLayout.Sq(sqP), () =>
        IvfIndex.searchWithReorder(q,
            IvfIndex.withResidentCodes(clustered, sqP), cents, sqP, 5, 2, 3)
          .select("query_id", "rnk", "neighbor_id")
          .orderBy("query_id", "rnk").collect().toSeq),
      ("lvq", IndexLayout.LvqC(lvqP), () =>
        IvfIndex.searchWithLvqReorder(q,
            IvfIndex.withResidentLvq(clustered, lvqP), cents, lvqP, 5, 2, 3)
          .select("query_id", "rnk", "neighbor_id")
          .orderBy("query_id", "rnk").collect().toSeq),
      ("leanvec", IndexLayout.LeanVecC(lvM), () =>
        IvfIndex.searchWithLeanVecReorder(q,
            IvfIndex.withResidentLeanVec(clustered, lvM), cents, lvM,
            5, 2, 3)
          .select("query_id", "rnk", "neighbor_id")
          .orderBy("query_id", "rnk").collect().toSeq))
    cases.foreach { case (name, codec, direct) =>
      val dir = freshDir(s"layout_$name")
      IndexLayout.write(clustered, cents, dir, codec)
      val layout = IndexLayout.open(spark, dir)
      (layout.codec, codec) match {
        case (IndexLayout.LeanVecC(a), IndexLayout.LeanVecC(b)) =>
          // Model holds Arrays; compare element-wise (and bit-EXACT:
          // the sidecar writes shortest-round-trip doubles)
          assert(a.mean.toSeq === b.mean.toSeq, s"$name mean round-trip")
          assert(a.proj.map(_.toSeq).toSeq === b.proj.map(_.toSeq).toSeq,
            s"$name projection round-trip")
          assert(a.eigvals.toSeq === b.eigvals.toSeq,
            s"$name eigvals round-trip")
        case _ =>
          assert(layout.codec === codec, s"$name codec round-trip")
      }
      assert(layout.centroids === cents, s"$name centroid round-trip")
      val viaLayout = IndexLayout.search(layout, q, 5, 2, Metric.L2)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      assert(viaLayout === direct(), s"$name search mismatch through disk")
    }
    // a layout whose sidecar is missing fails loudly, not with floor-0 data
    intercept[IllegalArgumentException] {
      IndexLayout.open(spark, freshDir("layout_missing")) }
  }

  test("open fails loudly on a missing or unknown index") {
    val dir = freshDir("broken")
    intercept[IllegalArgumentException] { VectorIndex.open(spark, dir) }
    VectorIndex.writeJson(spark, dir, """{"index_type":"bogus","metric":"l2"}""")
    val e = intercept[RuntimeException] { VectorIndex.open(spark, dir) }
    assert(e.getMessage.contains("bogus"))
  }

  test("flat index via facade equals direct FlatKnn") {
    val a = FlatVectorIndex(emb, Metric.Cosine).search(q, 10)
      .select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
    val b = FlatKnn.search(q, emb, 10, Metric.Cosine)
      .select("query_id", "rnk", "neighbor_id").orderBy("query_id", "rnk")
    assert(a.collect().toSeq === b.collect().toSeq)
  }
}
