package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{FlatKnn, Multimodal}

class MultimodalSpec extends SparkSpec {

  private def docs = Tables.table(spark, sfDir, "documents")
  private def media = Multimodal.pack(docs)

  test("pack assigns modalities round-robin with metadata from payload") {
    val rows = media.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => Set("image", "audio", "video")(r.modality)))
    rows.foreach { r =>
      assert(r.doc_id % 3 match {
        case 0 => r.modality == "image"
        case 1 => r.modality == "audio"
        case _ => r.modality == "video"
      })
      assert(r.meta.width >= 1 && r.meta.height >= 1)
      assert(r.content.length > 0)
    }
  }

  test("decodeStats is batch-size invariant (batch plumbing correctness)") {
    val a = Multimodal.decodeStats(media, batchSize = 7)
      .orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStats(media, batchSize = 1000)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.head.getAs[Long]("checksum") >= 0)
  }

  test("resize emits requested dims and only images") {
    val r = Multimodal.resize(media, 8, 8)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x =>
      x.getAs[Long]("width") === 8L && x.getAs[Long]("height") === 8L))
    // only image-modality docs (doc_id % 3 == 0)
    assert(rows.forall(_.getAs[Long]("doc_id") % 3 === 0))
    // idempotent/deterministic
    assert(r.orderBy("doc_id").collect().toSeq ===
      Multimodal.resize(media, 8, 8).orderBy("doc_id").collect().toSeq)
  }

  test("sampleFrames covers the payload without overlap") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 100)
    val perDoc = frames.groupBy("doc_id").count()
    val lens = Multimodal.decodeStats(media)
      .select(col("doc_id"), col("n_bytes"))
    val joined = perDoc.join(lens, Seq("doc_id")).collect()
    joined.foreach { r =>
      val expect = (r.getAs[Long]("n_bytes") + 99) / 100
      assert(r.getAs[Long]("count") === expect)
    }
    assert(frames.select("doc_id").distinct().count() ===
      media.filter(col("modality") === "video").count())
  }

  test("extractFeatures feeds vector search end to end") {
    val feats = Multimodal.extractFeatures(media, dims = 16).cache()
    assert(feats.count() === 500)
    val vals = feats.select(explode(col("vec")).as("v"))
      .agg(min("v"), max("v")).collect()(0)
    assert(vals.getDouble(0) >= 0.0 && vals.getDouble(1) < 1.0)
    // media → embedding → exact ANN: self is in the top-3 of every query,
    // at the same similarity as rank 1 (exact-duplicate docs yield identical
    // embeddings, and ties break to the smaller id)
    val q = feats.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val res = FlatKnn.search(q, feats, 3, Metric.Cosine).cache()
    val selfRows = res.filter(col("query_id") === col("neighbor_id"))
    assert(selfRows.count() === 5)
    val r1 = res.filter(col("rnk") === 1)
      .select(col("query_id"), col("dist").as("best"))
    assert(selfRows.join(r1, Seq("query_id"))
      .filter(col("dist") =!= col("best")).count() === 0)
  }
}
