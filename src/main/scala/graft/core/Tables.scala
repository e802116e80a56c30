package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access + the deterministic synthetic vector derivations shared
  * (as SQL text) between the Spark queries and the DuckDB oracle, so both
  * engines do bit-identical double arithmetic (SURVEY §7: float determinism).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ---- synthetic 8-d vectors from lineitem (FIXTURES.md §4) ----------------

  val liDims: Int = 8

  /** SQL fragments (valid in both Spark SQL and DuckDB) for each dimension. */
  val liDimSql: Seq[String] = Seq(
    "CAST(l_quantity AS DOUBLE)",
    "CAST(l_extendedprice/1000 AS DOUBLE)",
    "CAST(l_discount*10 AS DOUBLE)",
    "CAST(l_tax*10 AS DOUBLE)",
    "CAST(l_partkey%97 AS DOUBLE)",
    "CAST(l_suppkey%89 AS DOUBLE)",
    "CAST(l_linenumber AS DOUBLE)",
    "CAST(l_orderkey%101 AS DOUBLE)")

  val liIdSql: String = "l_orderkey*10 + l_linenumber"

  /** Rows used as the query set — small, deterministic, present at every SF. */
  val liQueryPredSql: String = "l_orderkey % 300 = 0 AND l_linenumber = 1"

  /** `(id BIGINT, vec ARRAY<DOUBLE>)` over all of lineitem. */
  def lineitemVectors(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(
      expr(liIdSql).as("id"),
      expr(liDimSql.mkString("array(", ", ", ")")).as("vec"))

  /** `(query_id BIGINT, qvec ARRAY<DOUBLE>)` — the query subset. */
  def lineitemQueries(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").filter(expr(liQueryPredSql)).select(
      expr(liIdSql).as("query_id"),
      expr(liDimSql.mkString("array(", ", ", ")")).as("qvec"))

  /** lineitem has duplicate (l_orderkey, l_linenumber) rows, so `id` above is
    * not unique. Operators needing unique ids (k-means, IVF, medioid) use the
    * grouped form: one row per id, each dim = min over duplicates — an
    * order-insensitive, engine-portable dedup. */
  val liCentroidPredSql: String = "l_orderkey % 400 = 1 AND l_linenumber = 1"

  private def groupedVectors(spark: SparkSession, sfDir: String,
                             pred: Option[String], idName: String): DataFrame = {
    val base = table(spark, sfDir, "lineitem")
    val filtered = pred.map(p => base.filter(expr(p))).getOrElse(base)
    val aggs = liDimSql.zipWithIndex.map { case (e, i) =>
      min(expr(e)).as(s"v$i") }
    filtered
      .groupBy(expr(liIdSql).as(idName))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idName),
        array((0 until liDims).map(i => col(s"v$i")): _*).as(
          if (idName == "query_id") "qvec" else "vec"))
  }

  /** `(id, vec)` with unique ids (dim-wise min over duplicate rows). */
  def lineitemVectorsDedup(spark: SparkSession, sfDir: String): DataFrame =
    groupedVectors(spark, sfDir, None, "id")

  /** `(query_id, qvec)` deduped query subset. */
  def lineitemQueriesDedup(spark: SparkSession, sfDir: String): DataFrame =
    groupedVectors(spark, sfDir, Some(liQueryPredSql), "query_id")

  /** Level-2 seed rows for hierarchical k-means (A3). */
  val liL2SeedPredSql: String = "l_orderkey % 40 = 1 AND l_linenumber = 1"

  def lineitemL2Seeds(spark: SparkSession, sfDir: String): DataFrame =
    groupedVectors(spark, sfDir, Some(liL2SeedPredSql), "id")

  /** Deterministic centroid seed set, collected (small at every SF). */
  def lineitemCentroids(spark: SparkSession, sfDir: String)
      : Seq[(Long, Seq[Double])] =
    groupedVectors(spark, sfDir, Some(liCentroidPredSql), "id")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq
      .sortBy(_._1)

  /** events.parquet has shipped `ts` as either TIMESTAMP(NANOS) — which
    * Spark rejects unless read as long (legacy conf) — or plain
    * timestamp[us] (read as TIMESTAMP_NTZ). Normalize both to a session-TZ
    * TimestampType column; all fixture values are whole microseconds
    * (checked), so either conversion is lossless. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  // ---- embeddings table (64-d float vectors, 500 rows) ---------------------

  val embDims: Int = 64

  /** `(id BIGINT, vec ARRAY<DOUBLE>, label INT)` — cast to double once so all
    * downstream arithmetic matches the DuckDB oracle bit-for-bit. */
  def embeddingVectors(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings").select(
      col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"),
      col("label"))

  /** Query subset of the embeddings: every 50th vector (10 queries). */
  val embQueryPredSql: String = "vec_id % 50 = 0"

  def embeddingQueries(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings").filter(expr(embQueryPredSql)).select(
      col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qvec"))
}
