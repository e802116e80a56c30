package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Medioid, ScalarQuant}

class QuantMedioidSpec extends SparkSpec {

  private lazy val data = Tables.embeddingVectors(spark, sfDir)
    .select("id", "vec").cache()

  test("SQ codes are within [0, 2^bits-1]") {
    val p = ScalarQuant.train(data)
    val ex = ScalarQuant.encodeExploded(data, p)
    val row = ex.agg(min("code"), max("code")).head
    assert(row.getLong(0) >= 0L && row.getLong(1) <= 255L)
  }

  test("SQ roundtrip error bounded by scale/2") {
    val p = ScalarQuant.train(data)
    val enc = data.select(col("id"), col("vec"),
      ScalarQuant.encodeColumn(col("vec"), p).as("codes"))
    val dec = enc.select(col("id"),
      zip_with(col("vec"), ScalarQuant.decodeColumn(col("codes"), p),
        (a, b) => abs(a - b)).as("err"))
    val maxErr = dec.select(array_max(col("err")).as("e"))
      .agg(max("e")).head.getDouble(0)
    assert(maxErr <= p.scale / 2 + 1e-12, s"maxErr=$maxErr scale=${p.scale}")
  }

  test("medioid equals brute-force argmin-to-mean (unrounded tolerance)") {
    import spark.implicits._
    val m = Medioid.find(data, Tables.embDims).as[Long].head()
    // brute force with the same rounding
    val mean = data.select(posexplode(col("vec")))
      .groupBy("pos").agg(avg("col").as("m"))
      .orderBy("pos").select(round(col("m"), 3).as("m"))
      .as[Double].collect()
    val best = data.collect().map { r =>
      val v = r.getSeq[Double](1)
      val d = v.zip(mean).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, r.getLong(0))
    }.minBy(identity)
    assert(m == best._2)
  }
}
