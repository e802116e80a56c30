package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.core.{Metric, SimdSupport, Tables}
import graft.operators.{DynamicVectorTable, FlatKnn, MultiVector}

/** Float32 residency across the dynamic-index and index-API surfaces: the
  * parquet-segment lifecycle, the multi-label reducer, and the save/open
  * round trip must all keep ARRAY<FLOAT> storage (half the bytes) while
  * producing results bit-identical to the widened-double twin — the
  * Metric/expression layers widen per element inside the same double fold.
  */
class DynF32Spec extends SparkSpec {

  private def embF32 = Tables.table(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("label").cast("long").as("label"))

  private def isFloatArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match { case ArrayType(FloatType, _) => true; case _ => false }

  test("dynamic lifecycle keeps f32 segments and searches bit-identically " +
      "to the widened twin") {
    val root = "/tmp/graft_dynf32_spec"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val tbl = new DynamicVectorTable(spark, root)
    tbl.addPoints(embF32.filter(col("id") < 200))
    tbl.addPoints(embF32.filter(col("id") >= 200))
    tbl.deleteIds(embF32.filter(col("id") % 5 === 1).select("id"))
    assert(isFloatArray(tbl.current.schema("vec").dataType), "pre-consolidate")
    tbl.consolidate()
    val live = tbl.current
    assert(isFloatArray(live.schema("vec").dataType), "post-consolidate")

    val q = Tables.table(spark, sfDir, "embeddings")
      .filter(expr(Tables.embQueryPredSql))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def rows(d: org.apache.spark.sql.DataFrame,
             qd: org.apache.spark.sql.DataFrame) =
      FlatKnn.search(qd, d.select("id", "vec"), 8, Metric.L2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
    val f32 = rows(live, q)
    val f64 = rows(live.withColumn("vec", col("vec").cast("array<double>")),
      q.withColumn("qvec", col("qvec").cast("array<double>")))
    assert(f32 === f64)
    assert(f32.nonEmpty)
  }

  test("MultiVector.searchByLabel on f32 data equals the widened twin") {
    val q = Tables.table(spark, sfDir, "embeddings")
      .filter(expr(Tables.embQueryPredSql)).limit(4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def run(d: org.apache.spark.sql.DataFrame) =
      MultiVector.searchByLabel(q, d, 5, Metric.L2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted
    val f32 = run(embF32)
    val f64 = run(embF32.withColumn("vec", col("vec").cast("array<double>")))
    assert(f32 === f64)
    assert(f32.nonEmpty)
  }

  test("flat index save/open keeps f32 storage and search results") {
    val dir = "/tmp/graft_dynf32_flatidx"
    val idx = FlatVectorIndex(embF32.select("id", "vec"), Metric.L2)
    idx.save(dir)
    val reopened = VectorIndex.open(spark, dir)
    assert(isFloatArray(
      reopened.asInstanceOf[FlatVectorIndex].data.schema("vec").dataType),
      "save/open widened the stored vectors")
    val q = Tables.table(spark, sfDir, "embeddings")
      .filter(expr(Tables.embQueryPredSql))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val a = idx.search(q, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val b = reopened.search(q, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("IVF build over f32 rows assigns and searches like the widened twin") {
    val cents = embF32.filter(col("id") % 40 === 0)
      .withColumn("vec", col("vec").cast("array<double>"))
      .select("id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq.sortBy(_._1)
    val q = Tables.table(spark, sfDir, "embeddings")
      .filter(expr(Tables.embQueryPredSql)).limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def run(d: org.apache.spark.sql.DataFrame) = {
      val idx = IvfVectorIndex.build(d.select("id", "vec"), cents,
        nProbes = 3, Metric.L2)
      idx.search(q, 6).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
    }
    val f32 = run(embF32)
    val f64 = run(embF32.withColumn("vec", col("vec").cast("array<double>")))
    assert(f32 === f64)
    assert(f32.nonEmpty)
  }

  test("an index saved with a SIMD metric reopens (sidecar metric _simd)") {
    assume(SimdSupport.available)
    val dir = "/tmp/graft_dynf32_simdidx"
    val idx = FlatVectorIndex(embF32.select("id", "vec"),
      Metric.simd(Metric.L2))
    idx.save(dir)
    val reopened = VectorIndex.open(spark, dir)
    assert(reopened.metric == Metric.simd(Metric.L2))
    val q = Tables.table(spark, sfDir, "embeddings")
      .filter(expr(Tables.embQueryPredSql)).limit(3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    assert(reopened.search(q, 4).count() > 0)
  }
}
