package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.Tables
import graft.operators.{BatchApi, Multimodal}
import graft.operators.BatchApi.ColumnarBatch

/** The mapInPandas-shaped columnar batch contract: bounded batch sizes, a
  * runtime-enforced declared output schema, flexible batch fan-out, and
  * row-identity with the mapPartitions kernels it wraps. */
class BatchApiSpec extends SparkSpec {

  private def docs = Tables.table(spark, sfDir, "documents")

  test("decodeSumsBatchApi is row-identical to the mapPartitions kernel") {
    val media = Multimodal.packReal(docs)
    val a = Multimodal.decodeSums(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val b = Multimodal.decodeSumsBatchApi(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(b === a)
    assert(b.nonEmpty)
  }

  private val idSchema = StructType(Seq(
    StructField("id", LongType, nullable = false)))

  test("batches are bounded by batchSize and cover every row") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).toDF("id").repartition(3)
    val acc = s.sparkContext.collectionAccumulator[Int]("batch_sizes")
    val out = BatchApi.mapInBatches(df, idSchema, batchSize = 64) { batches =>
      batches.map { b => acc.add(b.size); b }
    }
    val ids = out.collect().map(_.getLong(0)).sorted
    assert(ids === (0L until 1000L).toArray)
    import scala.jdk.CollectionConverters._
    val sizes = acc.value.asScala
    assert(sizes.nonEmpty && sizes.forall(_ <= 64),
      s"oversized batch in ${sizes.distinct.sorted}")
  }

  test("kernels may fan batches out (1:N) like mapInPandas") {
    val s = spark
    import s.implicits._
    val df = (0L until 10L).toDF("id").coalesce(1)
    // duplicate every batch: each input row appears twice in the output
    val out = BatchApi.mapInBatches(df, idSchema) { batches =>
      batches.flatMap(b => Iterator(b, b))
    }
    val ids = out.collect().map(_.getLong(0)).toSeq.sorted
    assert(ids === (0L until 10L).flatMap(i => Seq(i, i)).sorted)
  }

  test("missing declared columns and ragged batches fail loudly") {
    val s = spark
    import s.implicits._
    val df = (0L until 8L).toDF("id")
    val twoCol = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", LongType, nullable = false)))
    val missing = intercept[org.apache.spark.SparkException] {
      BatchApi.mapInBatches(df, twoCol) { batches => batches }.collect()
    }
    assert(missing.getMessage.contains("extra") ||
      Option(missing.getCause).exists(_.getMessage.contains("extra")))
    val ragged = intercept[Exception] {
      BatchApi.mapInBatches(df, idSchema) { batches =>
        batches.map(b => b.copy(columns =
          Map("id" -> b("id").take(math.max(0, b.size - 1)))))
      }.collect()
    }
    assert(ragged.getMessage.contains("ragged") ||
      Option(ragged.getCause).exists(_.getMessage.contains("ragged")))
    intercept[IllegalArgumentException] {
      ColumnarBatch.of("a" -> Array[Any](1L, 2L), "b" -> Array[Any](1L))
    }
  }
}
