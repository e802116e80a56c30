package graft

import graft.core.{Metric, Tables}

/** Generates the DuckDB oracle SQL for the kNN-shaped queries from the same
  * SQL fragments the Spark side uses (graft.core.Tables), so the two engines
  * perform bit-identical double arithmetic and the driver's hash compare is
  * stable. Outputs only integer columns (ids/ranks) — float columns are kept
  * out of hashed results (SURVEY §7: float determinism vs DuckDB).
  */
object OracleGen {

  private def dimCols(prefix: String, exprs: Seq[String]): String =
    exprs.zipWithIndex.map { case (e, i) => s"$e AS $prefix$i" }.mkString(", ")

  /** kNN over the synthetic lineitem vectors. */
  def lineitemKnn(metric: Metric, k: Int): String = {
    val d = Tables.liDims
    s"""WITH data AS (
       |  SELECT ${Tables.liIdSql} AS id, ${dimCols("v", Tables.liDimSql)}
       |  FROM lineitem),
       |q AS (
       |  SELECT ${Tables.liIdSql} AS query_id, ${dimCols("q", Tables.liDimSql)}
       |  FROM lineitem WHERE ${Tables.liQueryPredSql}),
       |pairs AS (
       |  SELECT q.query_id, d.id,
       |         ${metric.sqlExpr("q.q", "d.v", d)} AS dist
       |  FROM q CROSS JOIN data d),
       |ranked AS (
       |  SELECT query_id, id AS neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY dist ${if (metric.ascending) "ASC" else "DESC"}, id ASC) AS rnk
       |  FROM pairs)
       |SELECT query_id, rnk, neighbor_id FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  private def embDimExprs: Seq[String] =
    (1 to Tables.embDims).map(i => s"CAST(embedding[$i] AS DOUBLE)")

  /** kNN over the 64-d embeddings table (DuckDB lists are 1-indexed). */
  def embeddingKnn(metric: Metric, k: Int): String = {
    val d = Tables.embDims
    s"""WITH data AS (
       |  SELECT vec_id AS id, ${dimCols("v", embDimExprs)}
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, ${dimCols("q", embDimExprs)}
       |  FROM embeddings WHERE ${Tables.embQueryPredSql}),
       |pairs AS (
       |  SELECT q.query_id, d.id,
       |         ${metric.sqlExpr("q.q", "d.v", d)} AS dist
       |  FROM q CROSS JOIN data d),
       |ranked AS (
       |  SELECT query_id, id AS neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY dist ${if (metric.ascending) "ASC" else "DESC"}, id ASC) AS rnk
       |  FROM pairs)
       |SELECT query_id, rnk, neighbor_id FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }
}
