package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.functions.HalfFloat
import graft.operators.{FlatKnn, ScalarQuant}

class HalfFloatQuantSpec extends SparkSpec {

  import HalfFloat._

  test("float16 encode/decode round trip on exactly-representable values") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0f, -2.5f, 0.0f, 65504f, 0.0009765625f)))
      .toDF("id", "vec")
    val back = df.select(float16Decode(float16Encode(col("vec"))).as("v"))
      .collect()(0).getSeq[Float](0)
    assert(back === Seq(1.0f, -2.5f, 0.0f, 65504f, 0.0009765625f))
  }

  test("float16 narrows with bounded error (relative 2^-10 in the normal " +
      "range, absolute 2^-24 in the subnormal range)") {
    val data = Tables.embeddingVectors(spark, sfDir)
      .select(col("id"), col("vec").cast("array<float>").as("vec")).limit(50)
    val errs = data.select(explode(arrays_zip(col("vec"),
        float16Decode(float16Encode(col("vec"))).as("half"))).as("z"))
      .select(abs(col("z.vec") - col("z.half")).as("abs_err"),
        abs(col("z.vec")).as("mag"))
    val relNormal = errs.filter(col("mag") >= math.pow(2, -14))
      .agg(max(col("abs_err") / col("mag"))).head.getDouble(0)
    assert(relNormal <= math.pow(2, -10), s"relative error $relNormal")
    val absSub = errs.filter(col("mag") < math.pow(2, -14))
      .agg(coalesce(max(col("abs_err")), lit(0.0))).head.getDouble(0)
    assert(absSub <= math.pow(2, -24), s"subnormal abs error $absSub")
  }

  test("bfloat16 decode matches truncated float bits") {
    import spark.implicits._
    val vals = Seq(1.0f, -3.140625f, 256.0f)
    val df = Seq((0L, vals)).toDF("id", "vec")
    val back = df.select(bfloat16Decode(bfloat16Encode(col("vec"))).as("v"))
      .collect()(0).getSeq[Float](0)
    // these values are exactly representable in bf16 (8 mantissa bits)
    assert(back === vals)
  }

  test("half-float kNN through decode expressions matches float32 ranking " +
      "closely") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    // store raw f16 bits, decode inside the query — the §1.4 physical layout
    val stored = data.select(col("id"),
      float16Encode(col("vec").cast("array<float>")).as("raw"))
    val decoded = stored.select(col("id"),
      float16Decode(col("raw")).cast("array<double>").as("vec"))
    val halfRes = FlatKnn.search(q, decoded, 10, Metric.L2)
    val fullRes = FlatKnn.search(q, data, 10, Metric.L2)
    val hits = halfRes.select("query_id", "neighbor_id")
      .intersect(fullRes.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / fullRes.count()
    assert(recall >= 0.95, s"f16 recall $recall")
  }

  test("quantized search ranking matches decoded-space search exactly (L2 " +
      "algebra) and tracks full precision at 8 bits") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val p = ScalarQuant.train(data)
    val enc = ScalarQuant.encode(data, p)
    val viaCodes = ScalarQuant.searchQuantized(q, enc, p, 10)
    // decoded-space reference: decode codes, encode queries+decode, search
    val dec = enc.select(col("id"),
      ScalarQuant.decodeColumn(col("codes"), p).as("vec"))
    val decQ = q.select(col("query_id"),
      ScalarQuant.decodeColumn(
        ScalarQuant.encodeColumn(col("qvec"), p), p).as("qvec"))
    val viaDecode = FlatKnn.search(decQ, dec, 10, Metric.L2)
    assert(viaCodes.select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().toSeq ===
      viaDecode.select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq)
    // and 8-bit quantization preserves most of the true ranking
    val full = FlatKnn.search(q, data, 10, Metric.L2)
    val hits = viaCodes.select("query_id", "neighbor_id")
      .intersect(full.select("query_id", "neighbor_id")).count()
    assert(hits.toDouble / full.count() >= 0.9)
  }

  test("decode-free IP/cosine on codes ranks like searching the decoded " +
      "vectors (affine bias algebra)") {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val q = Tables.embeddingQueries(spark, sfDir)
    val p = ScalarQuant.train(data)
    val encS = ScalarQuant.encodeWithSums(data, p).cache()
    // reference result: decode the codes, then search the decoded table —
    // the algebra must produce the same ranking without decoding
    val decoded = ScalarQuant.encode(data, p)
      .select(col("id"),
        ScalarQuant.decodeColumn(col("codes"), p).as("vec"))
    val decQ = q.select(col("query_id"),
      ScalarQuant.decodeColumn(
        ScalarQuant.encodeColumn(col("qvec"), p), p).as("qvec"))
    for (m <- Seq(Metric.IP, Metric.Cosine)) {
      val onCodes = ScalarQuant.searchOnCodes(q, encS, p, 10, m)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      val viaDecode = FlatKnn.search(decQ, decoded, 10, m)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk").collect().toSeq
      assert(onCodes === viaDecode, s"metric ${m.name}")
    }
    encS.unpersist()
  }
}
