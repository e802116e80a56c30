package org.apache.spark.sql.graftbridge

/** Listing-cache control for scale measurements: Spark caches partition
  * file listings per session (FileStatusCache), so a second open() of
  * the same store path reads the cache, not the filesystem — resetting
  * it is the only way to measure COLD partition discovery twice in one
  * JVM (ScaleIndexUpsert leg 6). Test/measurement seam only. */
object BridgeFiles {
  def resetFileStatusCache(): Unit =
    org.apache.spark.sql.execution.datasources.FileStatusCache
      .resetForTesting()
}
