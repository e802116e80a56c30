package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is `private[rdd]`; this shim (inside the rdd
  * package tree, like `graftbridge.Bridge` for `private[sql]` members) lets
  * a benchmark/driver loop distinguish terminal local-checkpoint
  * materializations (safe to sweep between queries) from cached datasets it
  * must keep. */
object GraftRddBridge {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
