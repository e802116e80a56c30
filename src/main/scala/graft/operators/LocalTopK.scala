package graft.operators

/** Executor-local fixed-capacity best-k buffer, sorted best-first — the JVM
  * twin of TopKBuffer for mapPartitions kernels (reference semantics:
  * include/svs/index/vamana/search_buffer.h:104). Ties break by smaller id,
  * identical to the TopKAggregator and the window/oracle ordering. */
final class LocalTopK(k: Int, ascending: Boolean) {
  val ids = new Array[Long](k)
  val dists = new Array[Double](k)
  var n: Int = 0

  @inline private def better(d1: Double, i1: Long, d2: Double, i2: Long)
      : Boolean =
    if (d1 != d2) { if (ascending) d1 < d2 else d1 > d2 } else i1 < i2

  /** Worst currently-kept distance (only valid when n == k). */
  @inline def worstDist: Double = dists(k - 1)
  @inline def worstId: Long = ids(k - 1)
  @inline def full: Boolean = n == k

  def insert(d: Double, id: Long): Unit = {
    if (n == k && !better(d, id, dists(k - 1), ids(k - 1))) return
    var pos = if (n == k) k - 1 else n
    while (pos > 0 && better(d, id, dists(pos - 1), ids(pos - 1))) pos -= 1
    val last = math.min(n, k - 1)
    var i = last
    while (i > pos) { dists(i) = dists(i - 1); ids(i) = ids(i - 1); i -= 1 }
    dists(pos) = d; ids(pos) = id
    if (n < k) n += 1
  }

  def clear(): Unit = n = 0
}
