package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.{Metric, Tables}
import graft.operators._
import graft.operators.VamanaKernel.BuildParams
import graft.streaming.StreamingIngest

class DynamicSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_test_$name"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  private def emb = Tables.embeddingVectors(spark, sfDir)
    .select(col("id"), col("vec"), col("label").cast("long").as("label"))

  test("dynamic table: append, soft delete, consolidate") {
    val root = freshRoot("dyn")
    val tbl = new DynamicVectorTable(spark, root)
    tbl.addPoints(emb.filter(col("id") < 250))
    tbl.addPoints(emb.filter(col("id") >= 250))
    assert(tbl.segmentCount === 2)
    assert(tbl.current.count() === 500)

    tbl.deleteIds(emb.filter(col("id") % 9 === 0).select("id"))
    val live = tbl.current.count()
    assert(live === 500 - 56) // ids 0,9,...,495
    assert(tbl.allRows.count() === 500) // soft delete: rows still present
    // reference has_id / all_ids surface
    assert(!tbl.hasId(9L) && tbl.hasId(10L) && !tbl.hasId(10000L))
    assert(tbl.allIds.count() === live)

    tbl.consolidate()
    assert(tbl.segmentCount === 1)
    assert(tbl.tombstones.isEmpty)
    assert(tbl.current.count() === live)
  }

  test("search with tombstones never returns deleted ids") {
    val data = emb.select("id", "vec")
    val ts = data.filter(col("id") % 7 === 0).select("id")
    val res = FlatKnn.searchWithTombstones(
      Tables.embeddingQueries(spark, sfDir), data, ts, 10, Metric.L2)
    assert(res.filter(col("neighbor_id") % 7 === 0).count() === 0)
    assert(res.count() === Tables.embeddingQueries(spark, sfDir).count() * 10)
  }

  test("multi-label search: per-label min, labels ranked, best_id correct") {
    val q = Tables.embeddingQueries(spark, sfDir).filter(col("query_id") === 0)
    val res = MultiVector.searchByLabel(q, emb, 5, Metric.L2).collect()
    assert(res.length === 5)
    assert(res.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(res.map(_.getAs[Long]("label")).distinct.length === 5)
    // brute-force check of rank-1
    val qv = q.collect()(0).getSeq[Double](1).toArray
    val all = emb.collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)) }
    val bestByLabel = all.groupBy(_._3).view.mapValues { vs =>
      vs.map(v => (Metric.L2.compute(qv, v._2), v._1)).min }.toMap
    val (bd, bid) = bestByLabel.values.min
    val top = bestByLabel.minBy { case (l, (d, i)) => (d, l) }
    assert(res(0).getAs[Long]("label") === top._1)
    assert(res(0).getAs[Long]("best_id") === top._2._2)
  }

  test("batch iterator pages without repeats and in global order") {
    val q = Tables.embeddingQueries(spark, sfDir).filter(col("query_id") === 0)
    val data = emb.select("id", "vec")
    val it = new BatchIterator(q, data, Metric.L2)
    val b1 = it.next(5).collect().map(_.getAs[Long]("neighbor_id"))
    val b2 = it.next(5).collect().map(_.getAs[Long]("neighbor_id"))
    assert(b1.length === 5 && b2.length === 5)
    assert(b1.toSet.intersect(b2.toSet).isEmpty)
    // union of two pages == exact top-10
    val exact = FlatKnn.search(q, data, 10, Metric.L2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert((b1 ++ b2).toSet === exact)
  }

  test("vamana updateShards rebuilds only touched shards") {
    val data = emb.select("id", "vec").filter(col("id") < 400)
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val params = BuildParams(maxDegree = 16, buildWindow = 32)
    val graph = Vamana.buildSharded(clustered, params, Metric.L2).cache()

    // delta: add the rows 400..449 (routed), delete ids 0..9
    val added = KMeans.assign(
      emb.select("id", "vec").filter(col("id") >= 400 && col("id") < 450),
      cents)
    val deleted = spark.range(10).toDF("id")
    val (newClustered, newGraph) =
      Vamana.updateShards(clustered, graph, added, deleted, params, Metric.L2)

    assert(newClustered.count() === 400 - 10 + 50)
    // graph covers exactly the live rows
    assert(newGraph.count() === newClustered.count())
    // untouched shards byte-identical
    val touched = added.select("cluster_id")
      .union(clustered.join(deleted, Seq("id")).select("cluster_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val untouchedOld = graph
      .filter(!col("cluster_id").isin(touched.toSeq: _*))
      .orderBy("cluster_id", "id").collect().toSeq
    val untouchedNew = newGraph
      .filter(!col("cluster_id").isin(touched.toSeq: _*))
      .orderBy("cluster_id", "id").collect().toSeq
    assert(untouchedOld === untouchedNew)
    // search still works against the updated index
    val res = Vamana.searchSharded(Tables.embeddingQueries(spark, sfDir),
      newClustered, newGraph, cents, 10, 40, 4, Metric.L2)
    assert(res.filter(col("neighbor_id") < 10).count() === 0)
  }

  test("multi-label over a Vamana index converges to the exact answer at " +
      "high fanout") {
    val cents = emb.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val idx = VamanaVectorIndex.build(emb.select("id", "vec"), cents,
      graft.operators.VamanaKernel.BuildParams(maxDegree = 24,
        buildWindow = 48),
      searchWindow = 500, nProbes = 4, Metric.L2)
    val q = Tables.embeddingQueries(spark, sfDir).limit(3)
    val approx = MultiVectorApprox.searchByLabel(idx, q, emb, 5, fanout = 20)
    val exact = MultiVector.searchByLabel(q, emb, 5, Metric.L2)
    assert(approx.select("query_id", "rnk", "label", "best_id")
      .orderBy("query_id", "rnk").collect().toSeq ===
      exact.select("query_id", "rnk", "label", "best_id")
        .orderBy("query_id", "rnk").collect().toSeq)
  }

  test("vamana batch iterator grows its window and never repeats ids") {
    val data = emb.select("id", "vec")
    val cents = emb.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      graft.operators.VamanaKernel.BuildParams(maxDegree = 24,
        buildWindow = 48), Metric.L2).cache()
    def mk(window: Int): graft.VectorIndex =
      graft.VamanaVectorIndex(clustered, graph, cents, window, 4, Metric.L2)
    val q = Tables.embeddingQueries(spark, sfDir).limit(2)
    val it = new VamanaBatchIterator(mk, q, baseWindow = 20, windowStep = 20)
    val b1 = it.next(5).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b2 = it.next(5).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1.size === 10 && b2.size === 10)
    assert(b1.intersect(b2).isEmpty)
  }

  test("iterator schedules replay the reference growth laws and invariants") {
    val d = DefaultSchedule(baseWindow = 10, baseCapacity = 20, batchSize = 5)
    assert((0 to 3).map(d.windowFor) === Seq(10, 15, 20, 25))
    assert((0 to 3).map(d.capacityFor) === Seq(20, 25, 30, 35))
    assert((0 to 3).map(d.batchSizeFor) === Seq(5, 5, 5, 5))
    val l = LinearSchedule(baseWindow = 10, baseCapacity = 20,
      scaleWindow = 3, scaleCapacity = 7, batchSizeStart = 2,
      scaleBatchSize = 1)
    assert((0 to 2).map(l.windowFor) === Seq(10, 13, 16))
    assert((0 to 2).map(l.capacityFor) === Seq(20, 27, 34))
    assert((0 to 2).map(l.batchSizeFor) === Seq(2, 3, 4))
    // capacity scaling slower than window scaling: the reference throws
    intercept[IllegalArgumentException] {
      LinearSchedule(10, 20, scaleWindow = 5, scaleCapacity = 3,
        batchSizeStart = 2, scaleBatchSize = 0) }
    intercept[IllegalArgumentException] { DefaultSchedule(10, 20, 0) }
  }

  test("scheduled batch iterator pages grow by the schedule and equal the " +
      "exact ranking under an exhaustive window") {
    val data = emb.select("id", "vec")
    val cents = emb.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      graft.operators.VamanaKernel.BuildParams(maxDegree = 24,
        buildWindow = 48), Metric.L2).cache()
    // exhaustive window: every page is a slice of the exact ranking, so
    // LinearSchedule's growing page sizes (2, 3, 4) tile ranks 1..9
    def mk(window: Int, capacity: Int): graft.VectorIndex =
      graft.VamanaVectorIndex(clustered, graph, cents,
        math.max(window, 1 << 14), 4, Metric.L2)
    val q = Tables.embeddingQueries(spark, sfDir).limit(2)
    val it = new ScheduledBatchIterator(mk, q,
      LinearSchedule(20, 20, 10, 10, batchSizeStart = 2, scaleBatchSize = 1))
    val pages = (0 until 3).map(_ => it.next()
      .select("query_id", "rnk", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    assert(pages.map(_.length) === Seq(4, 6, 8)) // 2 queries × (2, 3, 4)
    val exact = FlatKnn.search(q, data, 9, Metric.L2)
      .select("query_id", "rnk", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // flatten pages back to global ranks: page offsets 0, 2, 5
    val flat = pages(0) ++
      pages(1).map { case (q0, r, n) => (q0, r + 2, n) } ++
      pages(2).map { case (q0, r, n) => (q0, r + 5, n) }
    assert(flat.sortBy(x => (x._1, x._2)).toSeq ===
      exact.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("ivf batch iterator grows probes, never repeats, and recall never " +
      "degrades to zero on later pages") {
    val data = emb.select("id", "vec")
    val cents = emb.filter(col("id") < 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents).cache()
    val q = Tables.embeddingQueries(spark, sfDir).limit(2)
    // start at 2 probes of 8: later pages widen coverage like the reference
    val it = new IvfBatchIterator(q, clustered, cents, Metric.L2,
      baseProbes = 2)
    val b1 = it.next(5).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b2 = it.next(5).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1.size === 10 && b2.size === 10)
    assert(b1.intersect(b2).isEmpty)
  }

  test("multi-label batch iterator pages tile the exact label ranking " +
      "without repeating labels") {
    val q = Tables.embeddingQueries(spark, sfDir).limit(3)
    val it = new MultiLabelBatchIterator(q, emb, Metric.L2)
    val p1 = it.next(2).select("query_id", "rnk", "label", "best_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val p2 = it.next(2).select("query_id", "rnk", "label", "best_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exact = MultiVector.searchByLabel(q, emb, 4, Metric.L2)
      .select("query_id", "rnk", "label", "best_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val flat = p1 ++ p2.map { case (q0, r, l, b) => (q0, r + 2, l, b) }
    assert(flat.sortBy(x => (x._1, x._2)).toSeq ===
      exact.sortBy(x => (x._1, x._2)).toSeq)
    assert(p1.map(x => (x._1, x._3)).toSet
      .intersect(p2.map(x => (x._1, x._3)).toSet).isEmpty)
  }

  test("label-level mutation: delete-label excludes the label from " +
      "searchByLabel; re-add replaces the label's vectors") {
    val s = spark
    import s.implicits._
    val root = freshRoot("labels")
    val tbl = new DynamicVectorTable(spark, root)
    MultiVector.addLabels(tbl, emb)
    val q = Tables.embeddingQueries(spark, sfDir)
    val labels = emb.select("label").distinct()
      .filter(col("label") % 3 === 1)
    MultiVector.deleteLabels(tbl, labels)
    val res = MultiVector.searchByLabel(q, tbl.current, 5, Metric.L2)
    assert(res.filter(col("label") % 3 === 1).count() === 0,
      "deleted labels leaked into the ranking")
    // equal to searching the label-filtered corpus directly
    val want = MultiVector.searchByLabel(q,
        emb.filter(col("label") % 3 =!= 1), 5, Metric.L2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(res.orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq ===
      want)
    // re-add label 1 with REPLACED vectors under fresh ids: the old ids
    // must not resurface (replace-on-add at label granularity)
    val replacement = emb.filter(col("label") === 4L)
      .select((col("id") + 100000L).as("id"), col("vec"),
        lit(4L).as("label"))
    MultiVector.addLabels(tbl, replacement)
    val live4 = tbl.current.filter(col("label") === 4L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(live4.forall(_ >= 100000L),
      s"stale label-4 ids survived the replace: $live4")
    assert(live4.nonEmpty)
    // labelIds expands labels for the stored-graph deletedIds path
    val ids = MultiVector.labelIds(emb.select("id", "label"),
      Seq(4L).toDF("label")).collect().map(_.getLong(0)).toSet
    assert(ids === emb.filter(col("label") === 4L)
      .select("id").collect().map(_.getLong(0)).toSet)
    // reusing a LIVE id in a replacement fails loudly: tombstones apply
    // to every segment, so a reused id would erase its own replacement
    val e = intercept[IllegalArgumentException] {
      MultiVector.addLabels(tbl, tbl.current.filter(col("label") === 4L)
        .limit(1).select(col("id"), col("vec"), lit(4L).as("label")))
    }
    assert(e.getMessage.contains("fresh ids"))
    // a TOMBSTONED id is just as unsafe (the re-added row would be
    // invisible now and silently dropped by the next consolidate)
    val deadId = emb.filter(col("label") % 3 === 1).select("id")
      .head.getLong(0)
    val e2 = intercept[IllegalArgumentException] {
      MultiVector.addLabels(tbl, emb.filter(col("id") === deadId)
        .select(col("id"), col("vec"), lit(99L).as("label")))
    }
    assert(e2.getMessage.contains("tombstoned"))
    // duplicate ids WITHIN a batch are rejected before anything writes
    val dupRows = emb.filter(col("id") === 3L)
      .select((col("id") + 200000L).as("id"), col("vec"),
        lit(98L).as("label"))
    val e3 = intercept[IllegalArgumentException] {
      MultiVector.addLabels(tbl, dupRows.unionByName(dupRows))
    }
    assert(e3.getMessage.contains("duplicate incoming ids"))
  }

  test("streaming ingest appends micro-batches as segments") {
    val root = freshRoot("stream")
    val ckpt = freshRoot("stream_ckpt")
    val tbl = new DynamicVectorTable(spark, root)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double])]
    val stream = mem.toDF().toDF("id", "vec")
    val query = StreamingIngest.attach(stream, tbl, ckpt)
    try {
      mem.addData((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)))
      query.processAllAvailable()
      assert(tbl.current.count() === 2)
      mem.addData((3L, Seq(5.0, 6.0)))
      query.processAllAvailable()
      assert(tbl.segmentCount === 2)
      assert(tbl.current.orderBy("id").collect().map(_.getLong(0)).toSeq ===
        Seq(1L, 2L, 3L))
    } finally query.stop()
  }
}
