package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned directory save/load (SURVEY §2 S5/S6/S7): Parquet payload plus a
  * JSON sidecar carrying `(schema, version, dims, eltype, metric, count)` —
  * the Spark form of the reference's TOML SaveTable + compatibility check
  * (core/data/simple.h:69-91,158-242) and its load-time `Matcher` hints.
  * Loading verifies schema name/version and any caller expectations, and
  * dispatches by path suffix (S6: vecs files vs saved directories).
  */
object VectorTable {

  val SchemaName = "graft_vector_table"
  val Version = 1

  case class Meta(schema: String, version: Int, dims: Int, eltype: String,
                  metric: String, count: Long)

  private def metaJson(m: Meta): String =
    s"""{"schema":"${m.schema}","version":${m.version},"dims":${m.dims},""" +
      s""""eltype":"${m.eltype}","metric":"${m.metric}","count":${m.count}}"""

  private def parseField(json: String, key: String): String = {
    val p = ("\"" + key + "\"\\s*:\\s*(\"([^\"]*)\"|[-0-9]+)").r
    p.findFirstMatchIn(json) match {
      case Some(mm) => Option(mm.group(2)).getOrElse(mm.group(1))
      case None => sys.error(s"sidecar missing field $key")
    }
  }

  /** Save `(id, vec, ...)` with its sidecar. */
  def save(df: DataFrame, dir: String, eltype: String = "float64",
           metric: String = "l2"): Meta = {
    val spark = df.sparkSession
    val dims = df.select(size(col("vec"))).first().getInt(0)
    val badDims = df.filter(size(col("vec")) =!= dims).count()
    require(badDims == 0, s"$badDims rows with dims != $dims")
    df.write.mode("overwrite").parquet(s"$dir/data")
    val count = spark.read.parquet(s"$dir/data").count()
    val meta = Meta(SchemaName, Version, dims, eltype, metric, count)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, "meta.json"), true)
    out.write(metaJson(meta).getBytes(StandardCharsets.UTF_8))
    out.close()
    meta
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val p = new Path(dir, "meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no sidecar at $p")
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes)
    in.close()
    val json = new String(bytes, StandardCharsets.UTF_8)
    Meta(parseField(json, "schema"), parseField(json, "version").toInt,
      parseField(json, "dims").toInt, parseField(json, "eltype"),
      parseField(json, "metric"), parseField(json, "count").toLong)
  }

  /** Load with compatibility checks (mirror of check_compatibility,
    * core/data/simple.h:72-75): schema/version must match; optional dims /
    * eltype expectations mirror the Matcher hints. */
  def load(spark: SparkSession, dir: String, expectDims: Option[Int] = None,
           expectElType: Option[String] = None): DataFrame = {
    val meta = readMeta(spark, dir)
    require(meta.schema == SchemaName,
      s"schema mismatch: ${meta.schema} != $SchemaName")
    require(meta.version == Version,
      s"version mismatch: ${meta.version} != $Version")
    expectDims.foreach(d => require(meta.dims == d,
      s"dims mismatch: ${meta.dims} != $d"))
    expectElType.foreach(t => require(meta.eltype == t,
      s"eltype mismatch: ${meta.eltype} != $t"))
    spark.read.parquet(s"$dir/data")
  }

  /** S6 auto-dispatch by path shape: vecs file extensions load through
    * VecsIO, `.npy` through NpyIO; anything else is treated as a saved
    * directory. */
  def open(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".fvecs") || path.endsWith(".ivecs") ||
        path.endsWith(".bvecs"))
      VecsIO.read(spark, path)
    else if (path.endsWith(".npy")) NpyIO.read(spark, path)
    else load(spark, path)

  /** S7 type-converting ingest: cast vector elements (e.g. float64 →
    * float32 storage) and save — the analog of convert_fvecs_to_float16
    * (python_bindings.cpp:61-72); Spark has no half floats (SURVEY §7), so
    * narrow conversions target float32/int8 etc. */
  def convert(df: DataFrame, dir: String, targetType: String,
              metric: String = "l2"): Meta = {
    val converted = df.withColumn("vec",
      col("vec").cast(s"array<$targetType>").cast("array<double>"))
    save(converted, dir, eltype = targetType, metric = metric)
  }
}

/** Deterministic synthetic dataset generator (SURVEY §2 S8 — the reference's
  * svs.generate_test_dataset, examples/python/example_vamana.py:88-104):
  * data + queries + exact groundtruth. Values come from a pure integer LCG
  * on (id, dim) so any engine (Spark, DuckDB) reproduces them bit-for-bit —
  * no RNG state, fully distributed via spark.range. */
object SyntheticData {

  /** v(id, dim) = ((id·1103515245 + dim·12345 + 12345) mod 2³¹) / 2³¹. */
  def valueSql(idExpr: String, dimExpr: String): String =
    s"CAST((($idExpr * 1103515245 + $dimExpr * 12345 + 12345) % 2147483648) " +
      s"AS DOUBLE) / 2147483648.0"

  def vecSql(idExpr: String, dims: Int): String =
    (0 until dims).map(d => valueSql(idExpr, d.toString))
      .mkString("array(", ", ", ")")

  /** `(id, vec)` with n rows of `dims` values in [0, 1). */
  def generate(spark: SparkSession, n: Long, dims: Int): DataFrame =
    spark.range(n).select(col("id"),
      expr(vecSql("id", dims)).as("vec"))

  /** Query set: every `stride`-th row, re-labelled query_id. */
  def generateQueries(spark: SparkSession, n: Long, dims: Int, stride: Long)
      : DataFrame =
    generate(spark, n, dims).filter(col("id") % stride === 0)
      .select(col("id").as("query_id"), col("vec").as("qvec"))

  /** Well-mixed generator for geometry-sensitive benchmarks: the plain LCG's
    * dims form an arithmetic progression mod 1 (a 1-D manifold — trivially
    * searchable), so recall experiments need this Murmur3-hashed variant
    * instead. Deterministic and fully distributed (codegen'd `hash`). */
  def generateMixed(spark: SparkSession, n: Long, dims: Int, seed: Int = 0)
      : DataFrame = {
    val dimExprs = (0 until dims).map { d =>
      (pmod(hash(col("id"), lit(d), lit(seed)).cast("long"),
        lit(2147483648L)).cast("double") / lit(2147483648.0))
    }
    spark.range(n).select(col("id"), array(dimExprs: _*).as("vec"))
  }
}
