package graft.operators

import org.apache.spark.sql.DataFrame

/** Pre-explode width hint (guide §2 map-side parallelism; the r16-verdict
  * prescription for the corpus text passes): a pass that multiplies rows
  * ~tokens-per-doc × and burns its CPU in tokenize+explode+partial-agg has
  * its parallelism bounded by the INPUT's partition count — a
  * single-row-group corpus scans as 1-3 splits and the whole pass runs on
  * as many cores. Repartition the corpus BEFORE the explode only when it
  * is narrower than the session's parallelism: the shuffle moves
  * pre-explode corpus bytes once (the cheap side of guide §3.3's
  * explode-multiplies-the-shuffle rule), and at real scale the scan
  * already carries ≥ parallelism splits so no shuffle is added. Uncached
  * and operator-local — no cross-query cached state (the r16 regression
  * mechanism this replaces). Callers must be partition-count invariant:
  * key aggregations or order-pinned folds only. */
private[operators] object Width {
  def widen(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }
}
