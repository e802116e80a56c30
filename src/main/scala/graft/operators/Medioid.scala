package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Medioid / entry-point selection (SURVEY §2 A5): per-dimension mean, then
  * argmin distance-to-mean (reference: include/svs/core/medioid.h:270-300 —
  * the Vamana graph entry point). The mean is rounded to `meanScale` decimals
  * before the argmin so the result is stable across engines/summation orders
  * (float sums are order-sensitive; SURVEY §7). */
object Medioid {

  /** data(id, vec) → single-row DataFrame(medioid_id). */
  def find(data: DataFrame, dims: Int, meanScale: Int = 3): DataFrame = {
    val avgAgg = udaf(new VectorAvgAggregator(dims))
    val mean = data.agg(avgAgg(col("vec")).as("m"))
      .select(transform(col("m"), x => round(x, meanScale)).as("m"))
    data.crossJoin(broadcast(mean))
      .select(col("id"),
        VectorFunctions.l2Distance(col("vec"), col("m")).as("dist"))
      .orderBy(col("dist").asc, col("id").asc)
      .limit(1)
      .select(col("id").as("medioid_id"))
  }
}
