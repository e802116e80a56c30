package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric

/** Mutable vector dataset (SURVEY §2 M1-M4): the Spark re-expression of the
  * reference's dynamic index surface (include/svs/index/vamana/
  * dynamic_index.h:630-849). Storage is a directory of append-only parquet
  * segments plus a tombstone table — the slot-metadata lifecycle
  * (Empty/Valid/Deleted, dynamic_index.h:69-76) becomes segment files +
  * anti-joined tombstones; external ids persist end-to-end so no
  * IDTranslator is needed (SURVEY §1.4).
  *
  * Layout: `root/segments/seg-<n>/` parquet dirs, `root/tombstones/ts-<n>/`
  * parquet dirs of `(id)`. All operations are idempotent rewrites or appends;
  * at scale each segment write is a normal distributed parquet job and
  * `consolidate` is the compaction batch (dynamic_index.h:950,
  * core/compact.h).
  */
final class DynamicVectorTable(spark: SparkSession, root: String) {

  private val fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def list(sub: String): Seq[String] = {
    val p = new Path(root, sub)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.toString).sorted.toSeq
  }

  private def nextName(sub: String, prefix: String): String = {
    val n = list(sub).size
    f"$root%s/$sub%s/$prefix%s-$n%05d"
  }

  // --- byte signedness sidecar ------------------------------------------
  // The authoritative copy of the ByteVecs i8/u8 mark for byte-resident
  // segments: the first byte add DECLARES the table's value space here,
  // every later add must agree, and reads re-attach the mark — so a
  // segment whose schema metadata was stripped still serves in the
  // declared space instead of silently flipping u8 → i8.

  private def byteMetaPath = new Path(root, "byte_meta.json")

  private def readByteMeta(): Option[Boolean] =
    if (!fs.exists(byteMetaPath)) None
    else {
      val in = fs.open(byteMetaPath)
      val text =
        try {
          val bytes = new Array[Byte](
            fs.getFileStatus(byteMetaPath).getLen.toInt)
          in.readFully(bytes)
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      Some((org.json4s.jackson.JsonMethods.parse(text) \ "unsigned")
        .extract[Boolean])
    }

  private def writeByteMeta(unsigned: Boolean): Unit = {
    val out = fs.create(byteMetaPath, true)
    out.write(s"""{"unsigned":$unsigned}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  private def isByteVecTable(df: DataFrame): Boolean =
    df.columns.contains("vec") &&
      graft.functions.ByteVecs.isByteVec(df.schema("vec").dataType)

  private def remark(df: DataFrame): DataFrame =
    if (!isByteVecTable(df)) df
    else readByteMeta() match {
      case Some(u) =>
        graft.functions.ByteVecs.markSignedness(df, "vec", u)
      case None => df
    }

  /** M1 add_points: append a new segment of `(id, vec, ...)` rows. Byte
    * vec segments must declare i8/u8 (ByteVecs mark) on the FIRST add —
    * recorded in the table sidecar — and stay consistent after. */
  def addPoints(df: DataFrame): Unit = {
    // declaration to RECORD after a successful write (sidecar follows
    // the segment, never precedes it — a failed first write must not
    // leave a data-less declaration that refuses every retry)
    var record: Option[Boolean] = None
    val toWrite =
      if (!isByteVecTable(df)) df
      else {
        val declared =
          graft.functions.ByteVecs.signednessOf(df.schema, "vec")
        (declared, readByteMeta()) match {
          case (Some(d), Some(s)) =>
            require(d == s, s"addPoints: segment is " +
              s"${if (d) "u8" else "i8"} but the table was declared " +
              s"${if (s) "u8" else "i8"}")
            df
          case (Some(d), None) => record = Some(d); df
          case (None, Some(s)) =>
            graft.functions.ByteVecs.markSignedness(df, "vec", s)
          case (None, None) => sys.error(
            "addPoints: byte vec segment carries no signedness mark and " +
              "the table has none on record — declare it with " +
              "ByteVecs.markSigned / markUnsigned on the first add")
        }
      }
    toWrite.write.mode("overwrite").parquet(nextName("segments", "seg"))
    record.foreach(writeByteMeta)
  }

  /** M2 delete_entries: soft delete — append ids to the tombstone set. The
    * rows stay in their segments (still traversed by any index build) but are
    * filtered from every read, mirroring the reference's Deleted slots
    * (bindings docstring dynamic_vamana.cpp:196-198). */
  def deleteIds(ids: DataFrame): Unit =
    ids.select(col("id").cast("long")).write.mode("overwrite")
      .parquet(nextName("tombstones", "ts"))

  private def readAll(paths: Seq[String]): Option[DataFrame] =
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))

  /** All live rows: segments minus tombstones (P8 anti-join). */
  def current: DataFrame = {
    val segs = remark(readAll(list("segments"))
      .getOrElse(sys.error(s"empty dynamic table at $root")))
    readAll(list("tombstones"))
      .map(ts => segs.join(ts.select("id"), Seq("id"), "left_anti"))
      .getOrElse(segs)
  }

  /** Raw rows including soft-deleted ones (what an index build traverses). */
  def allRows: DataFrame =
    remark(readAll(list("segments"))
      .getOrElse(sys.error(s"empty table at $root")))

  def tombstones: Option[DataFrame] = readAll(list("tombstones"))

  /** Live external ids (reference `all_ids`,
    * bindings dynamic_vamana.cpp / dynamic_ivf.cpp). */
  def allIds: DataFrame = current.select("id")

  /** Membership probe (reference `has_id`): true iff `id` is live —
    * present in a segment and not tombstoned. */
  def hasId(id: Long): Boolean =
    current.filter(col("id") === id).limit(1).count() > 0

  /** M3/M4 consolidate + compact: physically rewrite live rows as one
    * segment and drop the tombstones. In Spark the two reference steps
    * (graph patching + id-space defrag) collapse into a single rewrite —
    * external ids persist, so no renumbering. */
  def consolidate(): Unit = {
    val live = current.cache()
    live.count() // materialize before deleting inputs
    val tmp = s"$root/consolidating"
    live.write.mode("overwrite").parquet(tmp)
    list("segments").foreach(p => fs.delete(new Path(p), true))
    list("tombstones").foreach(p => fs.delete(new Path(p), true))
    fs.rename(new Path(tmp), new Path(s"$root/segments/seg-00000"))
    live.unpersist()
  }

  def segmentCount: Int = list("segments").size
}

/** Multi-vector labels (SURVEY §1.3 / index/vamana/multi.h:155): one label
  * maps to many vectors; search returns the best distance per label and the
  * top-k *labels* per query (multi.h:340 TotalOrder(min)). */
object MultiVector {

  /** queries(query_id, qvec); data(id, vec, label). Output best-first:
    * (query_id, rnk, label, best_id) where best_id is the label's closest
    * vector (ties by id).
    *
    * Scale shape: broadcast queries × data is a map-only projection; the
    * per-(query,label) min is a bounded aggregate Catalyst computes with
    * map-side partials, so the shuffle carries |partitions|·|Q|·|labels|
    * rows, never the pair count. */
  def searchByLabel(queries: DataFrame, data: DataFrame, k: Int,
                    metric: Metric): DataFrame = {
    val pairs = broadcast(queries).crossJoin(data)
      .select(col("query_id"), col("label"), col("id"),
        metric.column(col("qvec"), col("vec")).as("dist"))
    // per-label min distance; struct min breaks distance ties by smaller id
    val perLabel = pairs.groupBy("query_id", "label")
      .agg(min(struct(
        (if (metric.ascending) col("dist") else -col("dist")).as("d"),
        col("id"))).as("best"))
      .select(col("query_id"), col("label"),
        (if (metric.ascending) col("best.d") else -col("best.d")).as("dist"),
        col("best.id").as("best_id"))
    TopK.perKeyViaWindow(perLabel, Seq("query_id"), col("label"), col("dist"),
        k, metric.ascending)
      .withColumnRenamed("neighbor_id", "label")
      .join(perLabel.select("query_id", "label", "best_id"),
        Seq("query_id", "label"))
      .select("query_id", "rnk", "label", "best_id")
  }

  // ---- label-level mutation (the reference's MultiMutableVamanaIndex
  // surface, index/vamana/multi.h:155: add/delete whole labels) --------

  /** Add (or REPLACE) whole labels in a dynamic table whose segments
    * carry `(id, vec, label)`: the new rows append first, then the
    * incoming labels' PREVIOUS ids are tombstoned (replace-on-add at
    * label granularity — the reference's multi-index add of an existing
    * label is an error; here the doc-level-replace posture of the rest
    * of the engine wins).
    *
    * Incoming ids must be FRESH (not live in the table) — enforced
    * loudly, matching the reference dynamic index's existing-id add
    * error: tombstones anti-join ALL segments, so a reused id's
    * replacement row would be silently filtered along with the old one.
    * Append-before-tombstone ordering means a crash mid-call degrades to
    * transient old+new duplicates (masked by searchByLabel's per-label
    * min and cleaned by the next consolidate), never to a lost label. */
  def addLabels(table: DynamicVectorTable, rows: DataFrame): Unit = {
    val labels = rows.select("label").distinct()
    val dup = rows.groupBy("id").count().filter(col("count") > 1)
      .select("id").limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"addLabels: duplicate incoming ids ${dup.mkString(", ")} — the " +
        "table holds one row per external id")
    val prev =
      if (table.segmentCount > 0) {
        // fresh means UNSEEN: an id in any segment OR the tombstone set
        // is unsafe — tombstones anti-join every segment, so a re-added
        // tombstoned id would be invisible now and silently dropped by
        // the next consolidate
        val seen = table.allRows.select("id")
          .unionByName(table.tombstones.map(_.select("id"))
            .getOrElse(table.allRows.select("id").limit(0)))
        val reused = seen.join(rows.select("id"), Seq("id")).select("id")
          .limit(5).collect().map(_.getLong(0))
        require(reused.isEmpty,
          s"addLabels: incoming ids ${reused.mkString(", ")} were already " +
            "used (live or tombstoned) — replacement rows need fresh ids; " +
            "consolidate() first to reclaim tombstoned ids")
        // materialize the previous ids BEFORE the append (afterwards the
        // label join would also match the replacement rows); eager local
        // checkpoint keeps the set distributed
        Some(table.current.join(labels, Seq("label")).select("id")
          .localCheckpoint(true))
      } else None
    table.addPoints(rows)
    prev.filter(_.count() > 0).foreach(table.deleteIds)
  }

  /** Delete whole labels: the label→ids expansion over the table's live
    * rows, tombstoned as ordinary id deletes — [[searchByLabel]] over
    * `table.current` then never sees the label (DynamicSpec; q166). */
  def deleteLabels(table: DynamicVectorTable, labels: DataFrame): Unit = {
    val ids = table.current
      .join(labels.select("label").distinct(), Seq("label"))
      .select("id")
    table.deleteIds(ids)
  }

  /** The same expansion for a STORED graph index: the id set to pass as
    * `deletedIds` to [[GraphLayout.upsert]] when deleting whole labels
    * (the label map is the caller's `(id, label)` table — graph layouts
    * store vectors only). */
  def labelIds(labelMap: DataFrame, labels: DataFrame): DataFrame =
    labelMap.join(labels.select("label").distinct(), Seq("label"))
      .select("id")
}

object MultiVectorApprox {

  /** Multi-label search over any [[graft.VectorIndex]] (the reference's
    * MultiMutableVamanaIndex, index/vamana/multi.h:155,340): retrieve
    * `fanout·k` vector-level candidates from the index, reduce to per-label
    * minima, return the top-k labels. Exact per-label minima are only
    * guaranteed when every surviving label's best vector is inside the
    * candidate set — raise `fanout` (the reference over-fetches and dedupes
    * by label the same way, multi.h:60-123). */
  def searchByLabel(index: graft.VectorIndex, queries: DataFrame,
                    labels: DataFrame, k: Int, fanout: Int): DataFrame = {
    val metric = index.metric
    val cand = index.search(queries, fanout * k)
      .join(labels.select(col("id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
    val perLabel = cand.groupBy("query_id", "label")
      .agg(min(struct(
        (if (metric.ascending) col("dist") else -col("dist")).as("d"),
        col("neighbor_id").as("id"))).as("best"))
      .select(col("query_id"), col("label"),
        (if (metric.ascending) col("best.d") else -col("best.d")).as("dist"),
        col("best.id").as("best_id"))
    TopK.perKeyViaWindow(perLabel, Seq("query_id"), col("label"), col("dist"),
        k, metric.ascending)
      .withColumnRenamed("neighbor_id", "label")
      .join(perLabel.select("query_id", "label", "best_id"),
        Seq("query_id", "label"))
      .select("query_id", "rnk", "label", "best_id")
  }
}

/** Paginated batch iterator (SURVEY §2 M5 — index/vamana/iterator.h:81-220):
  * successive `next(batchSize)` calls yield further neighbors, never
  * repeating ids, by anti-joining the already-returned set. Driver-side
  * stateful orchestration over distributed searches, like the reference's
  * restartable schedule. */
/** Window-growth schedule for index-backed iteration (the reference's
  * DefaultSchedule/LinearSchedule, index/vamana/iterator_schedule.h:80,123):
  * batch `b` searches with window `base + b·step`, so later pages — which
  * must see past the already-returned neighbors — get a wider beam. */
final class VamanaBatchIterator(index: graft.VectorIndex,
                                mkIndexAt: Int => graft.VectorIndex,
                                queries: DataFrame, baseWindow: Int,
                                windowStep: Int,
                                jobGroup: Option[String] = None) {
  def this(mk: Int => graft.VectorIndex, queries: DataFrame, baseWindow: Int,
           windowStep: Int) = this(mk(baseWindow), mk, queries, baseWindow,
    windowStep)

  private var returned: Option[DataFrame] = None
  private var batch = 0

  /** See [[BatchIterator.next]]: page runs inside the cancellable job
    * group when one is set; a cancelled page leaves no cached residue. */
  def next(batchSize: Int): DataFrame = jobGroup match {
    case Some(g) =>
      graft.VectorIndex.runCancellable(queries.sparkSession, g,
        "graft vamana iterator page")(nextPage(batchSize))
    case None => nextPage(batchSize)
  }

  private def nextPage(batchSize: Int): DataFrame = {
    val window = baseWindow + batch * windowStep
    val idx = if (batch == 0) index else mkIndexAt(window)
    val fetch = batchSize * (batch + 1)
    val res = returned match {
      case None => idx.search(queries, batchSize)
      case Some(r) =>
        val kept = idx.search(queries, fetch + batchSize)
          .join(r, Seq("query_id", "neighbor_id"), "left_anti")
          .withColumnRenamed("neighbor_id", "nid")
        TopK.perKeyViaWindow(kept, Seq("query_id"), col("nid"), col("dist"),
          batchSize, idx.metric.ascending)
    }
    val out = res.select("query_id", "rnk", "neighbor_id", "dist").cache()
    try out.count() catch {
      case t: Throwable => out.unpersist(blocking = true); throw t
    }
    returned = returned match {
      case None => Some(out.select("query_id", "neighbor_id"))
      case Some(r) => Some(r.union(out.select("query_id", "neighbor_id")))
    }
    batch += 1
    out
  }
}

final class BatchIterator(queries: DataFrame, data: DataFrame, metric: Metric,
                          jobGroup: Option[String] = None) {
  private var returned: Option[DataFrame] = None

  /** Page materialization, optionally inside a cancellable job group (the
    * reference's batch iterator takes the same cancel predicate as
    * search). A cancelled page unpersists its partial cache before
    * rethrowing, so the iterator can be resumed or dropped with no
    * executor-storage residue. */
  def next(batchSize: Int): DataFrame = jobGroup match {
    case Some(g) =>
      graft.VectorIndex.runCancellable(queries.sparkSession, g,
        "graft batch iterator page")(nextPage(batchSize))
    case None => nextPage(batchSize)
  }

  private def nextPage(batchSize: Int): DataFrame = {
    // exclusion must be per query, so anti-join candidate pairs, not data
    val res = returned match {
      case None =>
        FlatKnn.search(queries, data, batchSize, metric)
      case Some(r) =>
        val excluded = r.select(col("query_id"), col("neighbor_id"))
        val all = FlatKnn.search(queries, data,
          batchSize + excluded.groupBy("query_id").count()
            .agg(max("count")).collect()(0).getLong(0).toInt, metric)
        val kept = all.join(excluded, Seq("query_id", "neighbor_id"),
          "left_anti")
        TopK.perKeyViaWindow(kept.withColumnRenamed("neighbor_id", "nid"),
          Seq("query_id"), col("nid"), col("dist"), batchSize,
          metric.ascending)
    }
    val out = res.select("query_id", "rnk", "neighbor_id", "dist").cache()
    try out.count() catch {
      case t: Throwable => out.unpersist(blocking = true); throw t
    }
    returned = returned match {
      case None => Some(out.select("query_id", "neighbor_id"))
      case Some(r) => Some(r.union(out.select("query_id", "neighbor_id")))
    }
    out
  }
}
