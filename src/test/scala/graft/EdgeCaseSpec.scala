package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators._
import graft.operators.VamanaKernel.BuildParams

/** Boundary-condition hardening: k larger than the data, empty query sets,
  * single-row shards, duplicate candidate ids, similarity-metric ordering. */
class EdgeCaseSpec extends SparkSpec {

  private def emb = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
  private def q = Tables.embeddingQueries(spark, sfDir)

  test("k greater than the dataset returns all rows, still best-first") {
    val data = emb.filter(col("id") < 5)
    val res = FlatKnn.search(q.limit(1), data, k = 50, Metric.L2)
    assert(res.count() === 5)
    val ranks = res.orderBy("rnk").collect().map(_.getAs[Long]("rnk")).toSeq
    assert(ranks === Seq(1L, 2L, 3L, 4L, 5L))
    val dists = res.orderBy("rnk").collect().map(_.getAs[Double]("dist")).toSeq
    assert(dists === dists.sorted)
  }

  test("empty query set yields an empty result, not a failure") {
    val res = FlatKnn.search(q.filter(col("query_id") < 0), emb, 10, Metric.L2)
    assert(res.count() === 0)
    assert(res.columns.toSeq ===
      Seq("query_id", "rnk", "neighbor_id", "dist"))
  }

  test("LVQ encodes a single-row and a constant-vector table without NaNs") {
    import spark.implicits._
    val one = Seq((7L, (0 until 8).map(_.toDouble))).toDF("id", "vec")
    val pOne = Lvq.Params(Lvq.trainMean(one))
    val decOne = Lvq.decode(Lvq.encode(one, pOne), pOne, twoLevel = true)
      .collect()(0).getSeq[Double](1)
    // one row: mean == vec, residuals 0 → reconstruction is exact
    assert(decOne === (0 until 8).map(_.toDouble))
    val const = Seq((0L, Seq(3.0, 3.0, 3.0)), (1L, Seq(3.0, 3.0, 3.0)))
      .toDF("id", "vec")
    val pC = Lvq.Params(Lvq.trainMean(const))
    val backC = Lvq.decode(Lvq.encode(const, pC), pC, twoLevel = true)
      .collect().map(_.getSeq[Double](1))
    assert(backC.forall(_ === Seq(3.0, 3.0, 3.0)))
  }

  test("splitOversized with maxRows = 1 degenerates to singleton shards " +
      "and still searches exactly") {
    val data = emb.filter(col("id") < 20)
    val clustered = data.withColumn("cluster_id", lit(0L))
    val cents = Seq(0L -> Seq.fill(64)(0.0))
    val (split, splitCents) = Vamana.splitOversized(clustered, cents, 1L)
    val sizes = split.groupBy("cluster_id").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ === 1L) && sizes.length === 20)
    val graph = Vamana.buildSharded(split,
      BuildParams(maxDegree = 4, buildWindow = 8), Metric.L2)
    val res = Vamana.searchSharded(q.limit(2), split, graph, splitCents,
        k = 5, searchWindow = 8, nProbes = splitCents.length, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    val exact = FlatKnn.search(q.limit(2), data, 5, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq
    assert(res === exact)
  }

  test("single-row dataset: vamana build and search degenerate cleanly") {
    val data = emb.filter(col("id") === 3)
    val graph = Vamana.buildSingle(data,
      BuildParams(maxDegree = 8, buildWindow = 16), Metric.L2)
    assert(graph.count() === 1)
    assert(graph.select(size(col("neighbors"))).first().getInt(0) === 0)
    val clustered = data.withColumn("cluster_id", lit(0L))
    val cents = Seq(0L -> Seq.fill(64)(0.0))
    val res = Vamana.searchSharded(q.limit(2), clustered, graph, cents,
      k = 10, searchWindow = 16, nProbes = 1, Metric.L2)
    assert(res.count() === 2) // one row per query: the only vector
    assert(res.select("neighbor_id").distinct().first().getLong(0) === 3L)
  }

  test("similarity metrics rank descending (the IP/cosine inversion trap)") {
    for (m <- Seq(Metric.IP, Metric.Cosine)) {
      val res = FlatKnn.search(q.limit(2), emb, 10, m)
      val perQuery = res.orderBy("query_id", "rnk").collect()
        .groupBy(_.getAs[Long]("query_id"))
      perQuery.values.foreach { rows =>
        val dists = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist"))
        assert(dists.toSeq === dists.sortBy(-_).toSeq,
          s"${m.name} not descending: ${dists.toSeq}")
      }
    }
  }

  test("float32-stored vectors search identically to their double cast") {
    val f32 = emb.select(col("id"), col("vec").cast("array<float>").as("vec"))
    val viaFloat = FlatKnn.search(q, f32, 10, Metric.L2)
    val viaCast = FlatKnn.search(q,
      f32.select(col("id"), col("vec").cast("array<double>").as("vec")),
      10, Metric.L2)
    assert(viaFloat.orderBy("query_id", "rnk").collect().toSeq ===
      viaCast.orderBy("query_id", "rnk").collect().toSeq)
  }

  test("IVF search over a float32 clustered table equals the double cast") {
    val cents = emb.filter(col("id") % 7 === 0).limit(4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val f32 = emb.select(col("id"), col("vec").cast("array<float>").as("vec"))
    val c32 = IvfIndex.cluster(f32, cents)
    val c64 = IvfIndex.cluster(
      f32.select(col("id"), col("vec").cast("array<double>").as("vec")),
      cents)
    def run(cl: org.apache.spark.sql.DataFrame) =
      IvfIndex.search(q, cl, cents, 5, nProbes = 2, Metric.L2)
        .orderBy("query_id", "rnk").collect().toSeq
    assert(run(c32) === run(c64))
    assert(run(c32).nonEmpty)
  }

  test("duplicate ids on the data side are kept, ties ordered by id") {
    import spark.implicits._
    val dup = Seq((7L, Seq(1.0, 0.0)), (7L, Seq(1.0, 0.0)),
      (8L, Seq(0.0, 1.0))).toDF("id", "vec")
    val qq = Seq((0L, Seq(1.0, 0.0))).toDF("query_id", "qvec")
    val res = FlatKnn.search(qq, dup, 3, Metric.L2).orderBy("rnk").collect()
    assert(res.length === 3)
    assert(res(0).getAs[Long]("neighbor_id") === 7L)
    assert(res(1).getAs[Long]("neighbor_id") === 7L)
    assert(res(2).getAs[Long]("neighbor_id") === 8L)
  }

  test("IVF with nProbes exceeding the cluster count scans everything") {
    val cents = emb.filter(col("id") < 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = IvfIndex.cluster(emb, cents)
    val res = IvfIndex.search(q, clustered, cents, 10, nProbes = 99, Metric.L2)
    val exact = FlatKnn.search(q, emb, 10, Metric.L2)
    assert(res.select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq ===
      exact.select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq)
  }

  test("quantizer handles a constant column (zero scale) without NaN codes") {
    import spark.implicits._
    val const = Seq((0L, Seq(5.0, 5.0)), (1L, Seq(5.0, 5.0)))
      .toDF("id", "vec")
    val p = ScalarQuant.train(const)
    // zero-range domain: train guards scale to 1.0 so every code is 0 and
    // decode restores the bias exactly — no 0/0 NaN anywhere
    assert(p.scale === 1.0)
    val codes = const.select(
      ScalarQuant.encodeColumn(col("vec"), p).as("c"))
      .collect()(0).getSeq[Long](0)
    assert(codes === Seq(0L, 0L))
    val dec = ScalarQuant.decodeColumn(
      ScalarQuant.encodeColumn(col("vec"), p), p)
    val back = const.select(dec.as("v")).collect()(0).getSeq[Double](0)
    assert(back === Seq(5.0, 5.0))
  }

  test("bm25: absent query terms are ignored; all-absent queries vanish") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "alpha beta"), (1L, "beta gamma"))
      .toDF("doc_id", "text")
    val res = TextIndex.bm25TopK(corpus,
      Seq(0L -> Seq("alpha", "nosuchterm"), 1L -> Seq("zzz", "qqq")),
      k = 10)
    val got = res.collect()
    // query 1 (all terms absent) yields no rows; query 0 ranks doc 0 by
    // its present term alone
    assert(got.map(_.getLong(0)).toSet === Set(0L))
    assert(got.filter(_.getLong(2) == 1L).head.getLong(1) === 0L)
  }

  test("phrase longer than any document yields empty, not a failure") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "a b"), (1L, "")).toDF("doc_id", "text")
    assert(TextIndex.phraseSearch(corpus, Seq("a", "b", "a", "b"))
      .count() === 0)
    assert(TextIndex.searchMinMatch(corpus, Seq("zzz"), 1).count() === 0)
  }

  test("rrfFuse with one empty side keeps the other side's ranking") {
    val s = spark
    import s.implicits._
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "id", "rnk")
    val b = a.filter(col("rnk") < 0) // empty, same schema
    val got = TextIndex.rrfFuse(a, b, k = 5).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((10L, 1L), (11L, 2L)))
  }

  test("maxsim with a single-token bag and k beyond the corpus") {
    val s = spark
    import s.implicits._
    val docsV = Seq((0L, 0L, Seq(1.0, 0.0)), (1L, 0L, Seq(0.0, 1.0)))
      .toDF("doc_id", "dtok", "dvec")
    val queries = Seq((9L, 0L, Seq(1.0, 0.0)))
      .toDF("query_id", "qtok", "qvec")
    val got = MaxSim.topK(queries, docsV, k = 10, Metric.Cosine)
      .orderBy("rnk").collect()
    assert(got.length === 2)
    assert(got(0).getLong(1) === 0L) // identical vector ranks first
  }
}
