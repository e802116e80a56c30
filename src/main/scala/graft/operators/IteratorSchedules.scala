package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Pluggable per-batch search-parameter schedules for paged index iteration
  * (reference index/vamana/iterator_schedule.h:60-79 IteratorSchedule
  * concept): batch `i` searches with `windowFor(i)` / `capacityFor(i)` and
  * yields `batchSizeFor(i)` fresh neighbors. */
sealed trait IteratorSchedule extends Serializable {
  def windowFor(i: Int): Int
  def capacityFor(i: Int): Int
  def batchSizeFor(i: Int): Int
}

/** The reference's DefaultSchedule (iterator_schedule.h:80-116): window and
  * capacity both grow by `i·batchSize`; the page size stays constant. */
final case class DefaultSchedule(baseWindow: Int, baseCapacity: Int,
                                 batchSize: Int) extends IteratorSchedule {
  require(batchSize >= 1, s"batch size must be at least 1, got $batchSize")
  def windowFor(i: Int): Int = baseWindow + i * batchSize
  def capacityFor(i: Int): Int =
    math.max(baseCapacity, baseWindow) + i * batchSize
  def batchSizeFor(i: Int): Int = batchSize
}

/** The reference's LinearSchedule (iterator_schedule.h:123-210): independent
  * linear scaling knobs for window, capacity, and page size, with the same
  * invariants — capacity must scale at least as fast as the window (or they
  * eventually collide), and the starting page size must be positive. */
final case class LinearSchedule(baseWindow: Int, baseCapacity: Int,
                                scaleWindow: Int, scaleCapacity: Int,
                                batchSizeStart: Int, scaleBatchSize: Int)
    extends IteratorSchedule {
  require(scaleCapacity >= scaleWindow,
    s"capacity scaling ($scaleCapacity) must be at least as big as window " +
      s"scaling ($scaleWindow)")
  require(batchSizeStart >= 1,
    s"batch size start must be at least 1, got $batchSizeStart")
  def windowFor(i: Int): Int = baseWindow + i * scaleWindow
  def capacityFor(i: Int): Int =
    math.max(baseCapacity, baseWindow) + i * scaleCapacity
  def batchSizeFor(i: Int): Int = batchSizeStart + i * scaleBatchSize
}

/** Schedule-driven paged iteration over any [[graft.VectorIndex]]: batch `i`
  * rebuilds the search configuration from the schedule (the reference
  * re-runs its graph search with the widened buffer the same way,
  * index/vamana/iterator.h:81-220) and anti-joins the already-returned pairs
  * so pages never repeat ids. `mkIndex(window, capacity)` supplies the
  * index searching at that configuration. */
final class ScheduledBatchIterator(mkIndex: (Int, Int) => graft.VectorIndex,
                                   queries: DataFrame,
                                   schedule: IteratorSchedule) {
  private var returned: Option[DataFrame] = None
  private var fetched = 0
  private var batch = 0

  /** Yield the next page; its size is the schedule's `batchSizeFor`. */
  def next(): DataFrame = {
    val bs = schedule.batchSizeFor(batch)
    val idx = mkIndex(schedule.windowFor(batch), schedule.capacityFor(batch))
    val res = returned match {
      case None => idx.search(queries, bs)
      case Some(r) =>
        val kept = idx.search(queries, fetched + bs)
          .join(r, Seq("query_id", "neighbor_id"), "left_anti")
          .withColumnRenamed("neighbor_id", "nid")
        TopK.perKeyViaWindow(kept, Seq("query_id"), col("nid"), col("dist"),
          bs, idx.metric.ascending)
    }
    val out = res.select("query_id", "rnk", "neighbor_id", "dist").cache()
    out.count()
    returned = returned match {
      case None => Some(out.select("query_id", "neighbor_id"))
      case Some(r) => Some(r.union(out.select("query_id", "neighbor_id")))
    }
    fetched += bs
    batch += 1
    out
  }
}

/** IVF batch iterator (reference index/ivf/iterator.h:44-200): unlike the
  * graph iterator, IVF expands its search space by growing `n_probes` by
  * the page size each iteration (capped at the cluster count) and growing
  * the fetch depth, deduping against everything already yielded. */
final class IvfBatchIterator(queries: DataFrame, clustered: DataFrame,
                             centroids: Seq[(Long, Seq[Double])],
                             metric: Metric, baseProbes: Int) {
  private var returned: Option[DataFrame] = None
  private var fetched = 0
  private var batch = 0

  def next(batchSize: Int): DataFrame = {
    // n_probes_ = min(n_probes_ + batch_size, num_clusters), iterator.h:106
    val nProbes = math.min(baseProbes + batch * batchSize, centroids.size)
    val res = returned match {
      case None =>
        IvfIndex.search(queries, clustered, centroids, batchSize, nProbes,
          metric)
      case Some(r) =>
        val kept = IvfIndex.search(queries, clustered, centroids,
            fetched + batchSize, nProbes, metric)
          .join(r, Seq("query_id", "neighbor_id"), "left_anti")
          .withColumnRenamed("neighbor_id", "nid")
        TopK.perKeyViaWindow(kept, Seq("query_id"), col("nid"), col("dist"),
          batchSize, metric.ascending)
    }
    val out = res.select("query_id", "rnk", "neighbor_id", "dist").cache()
    out.count()
    returned = returned match {
      case None => Some(out.select("query_id", "neighbor_id"))
      case Some(r) => Some(r.union(out.select("query_id", "neighbor_id")))
    }
    fetched += batchSize
    batch += 1
    out
  }
}

/** Paged multi-label search with cross-batch label dedupe (reference
  * index/vamana/multi.h:60-123 — its iterators dedupe yielded *labels*, not
  * vector ids, across batches): each page returns the next `batchSize`
  * closest not-yet-returned labels per query, with each label's best vector
  * id. Page ranks renumber from 1 within every page. */
final class MultiLabelBatchIterator(queries: DataFrame, data: DataFrame,
                                    metric: Metric) {
  private var returnedLabels: Option[DataFrame] = None
  private var fetched = 0

  def next(batchSize: Int): DataFrame = {
    val res = returnedLabels match {
      case None =>
        MultiVector.searchByLabel(queries, data, batchSize, metric)
      case Some(r) =>
        // the global label ranking is consistent across calls, so the page
        // is the lowest-ranked labels that survive the label anti-join
        val kept = MultiVector.searchByLabel(queries, data,
            fetched + batchSize, metric)
          .join(r, Seq("query_id", "label"), "left_anti")
        val w = Window.partitionBy("query_id")
          .orderBy(col("rnk").asc, col("label").asc)
        kept.withColumn("prnk", row_number().over(w).cast("long"))
          .filter(col("prnk") <= batchSize)
          .select(col("query_id"), col("prnk").as("rnk"), col("label"),
            col("best_id"))
    }
    val out = res.select("query_id", "rnk", "label", "best_id").cache()
    out.count()
    returnedLabels = returnedLabels match {
      case None => Some(out.select("query_id", "label"))
      case Some(r) => Some(r.union(out.select("query_id", "label")))
    }
    fetched += batchSize
    out
  }
}
