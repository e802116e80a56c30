package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bounded driver-side micro-batch hygiene for the store upserts
  * ([[GraphLayout.upsert]], [[IndexLayout.upsert]]).
  *
  * The distributed form of the batch contract — duplicate adds collapse,
  * conflicting payloads fail loudly, delete wins over add, removed =
  * deletes ∪ re-added ids — spent ~10 Spark jobs per upsert on frames
  * that are MICRO-BATCH-SMALL by the maintenance contract (isEmpty probe,
  * distinct, conflict groupBy + bounded collect, dels distinct, removed
  * union-distinct — each materialized as its own AQE stage-job, ~70–150 ms
  * of fixed cost apiece at any data size). This helper collects the batch
  * ONCE (bounded, [[MaxRows]]+1 probe — the [[Vamana.LocateIsinMax]]
  * fast-path pattern) and applies the same hygiene as Scala collection
  * arithmetic; callers fall back to the distributed path verbatim when
  * either side exceeds the bound, so bulk loads are never driver-bound.
  *
  * Semantics match the distributed path exactly:
  *  - duplicate collapse compares WHOLE rows with Spark's grouping
  *    equality (−0.0 ≡ 0.0, NaN ≡ NaN — [[canon]]);
  *  - the conflict error carries the same message text and the same
  *    ≤ 6-id bound;
  *  - NULL delete ids drop (they can match no stored row either way);
  *  - a delete-only batch returns zero added rows, so the caller's
  *    schema-matched empty-frame substitution still applies.
  */
private[operators] object UpsertBatch {

  /** Fast-path bound: batches at or below this (both sides) collect to
    * the driver; larger batches run the distributed path. Shares the
    * delete-locate fast-path contract ([[Vamana.LocateIsinMax]]). */
  val MaxRows: Int = Vamana.LocateIsinMax

  /** The prepped batch: deduped, conflict-checked, delete-wins-applied
    * added rows (schema = the caller's added frame, marks included) and
    * the removed-id set (explicit deletes ∪ re-added ids). `hadRows`
    * distinguishes a raw-EMPTY adds frame (CDC delete-only — callers
    * substitute their store-schema empty frame, because the placeholder
    * vec type must not hit the value-space checks) from a batch whose
    * adds were all deleted in-batch (payloads were present — the
    * distributed path would have flowed them typed, so the signedness /
    * half-format checks must still fire on the batch's schema). */
  final case class Prepped(addedRows: Array[Row], addedSchema: StructType,
                           removedIds: Array[Long], hadRows: Boolean) {
    /** Local-relation frame of the added rows (empty input → the caller
      * substitutes its schema-matched empty frame instead). */
    def addedDF(spark: SparkSession): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(addedRows.toSeq.asJava, addedSchema)
    }
    /** Local-relation (id BIGINT) frame of the removed ids. */
    def removedDF(spark: SparkSession): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        removedIds.toSeq.map(i => Row(i): Row).asJava,
        StructType(Seq(StructField("id", LongType, nullable = true))))
    }
  }

  /** Canonicalize a value for dedup keys the way Spark's grouping
    * equality does: −0.0 ≡ 0.0 and all NaNs equal (UnsafeRow normalizes
    * both before hashing); recurses into array elements. */
  private def canon(v: Any): Any = v match {
    case d: java.lang.Double =>
      if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
      else java.lang.Double.valueOf(d.doubleValue + 0.0)
    case f: java.lang.Float =>
      if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
      else java.lang.Float.valueOf(f.floatValue + 0.0f)
    case s: scala.collection.Seq[_] => s.map(canon).toList
    case x => x
  }

  /** Run independent Spark write actions concurrently (optimization
    * guide §2.6: actions are only sequential because the driver calls
    * them sequentially — overlapping lets one write's task tail
    * back-fill with the next write's tasks). The writes target disjoint
    * directories, so commit protocols never interleave; the first
    * failure propagates (callers keep their crash-marker semantics) —
    * but only after EVERY task has settled: a fail-fast await would let
    * the caller's marker bracket exit (and a retry/repair begin) while a
    * sibling write is still committing to the same store. */
  def runConcurrently(tasks: Seq[() => Unit]): Unit =
    if (tasks.lengthCompare(1) <= 0) tasks.foreach(_())
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      import scala.util.{Failure, Try}
      implicit val ec: ExecutionContext = ExecutionContext.global
      val settled = Await.result(
        Future.sequence(tasks.map(t => Future(Try(t())))), Duration.Inf)
      settled.collectFirst { case Failure(e) => throw e }
      ()
    }

  /** Collect + hygiene, or None when either frame exceeds [[MaxRows]]
    * (the caller then runs its distributed path unchanged). `added` must
    * already carry the caller's (id, vec, cluster_id) shape — raw or
    * normalized, exactly what its distributed path would distinct. */
  def prep(added: DataFrame, deletedIds: DataFrame): Option[Prepped] = {
    // size-probe on ids ONLY (8 bytes/row) before touching payloads: a
    // bulk upsert that will take the distributed path anyway must not
    // collect MaxRows full vector rows (tens-to-hundreds of MB of driver
    // heap at production dims) just to learn it is over the bound
    val idProbe = added.select(col("id")).limit(MaxRows + 1).collect()
    if (idProbe.length > MaxRows) return None
    val aRows = added.limit(MaxRows + 1).collect()
    if (aRows.length > MaxRows) return None
    val dRows = deletedIds.select(col("id").cast("long").as("id"))
      .limit(MaxRows + 1).collect()
    if (dRows.length > MaxRows) return None
    val delIds: Array[Long] = dRows.iterator.filterNot(_.isNullAt(0))
      .map(_.getLong(0)).toArray.distinct
    val idIdx = added.schema.fieldIndex("id")
    def idOf(r: Row): Option[Long] =
      if (r.isNullAt(idIdx)) None
      else Some(r.get(idIdx).asInstanceOf[Number].longValue)
    // 1. exact duplicate rows collapse (whole-row grouping equality)
    val distinctRows = {
      val seen = scala.collection.mutable.LinkedHashMap
        .empty[List[Any], Row]
      aRows.foreach { r =>
        val k = r.toSeq.map(canon).toList
        if (!seen.contains(k)) seen.put(k, r)
      }
      seen.values.toArray
    }
    // 2. two DIFFERENT payloads for one id is ambiguous — fail loudly,
    //    same message + ≤6-id bound as the distributed check
    val conflicted = distinctRows.groupBy(idOf).collect {
      case (Some(id), rs) if rs.length > 1 => id
    }.toSeq.sorted.take(6)
    require(conflicted.isEmpty,
      s"upsert: conflicting added payloads for ids " +
        s"${conflicted.take(5).mkString(", ")}" +
        (if (conflicted.length > 5) ", …" else ""))
    // 3. delete wins over add in one batch
    val delSet = delIds.toSet
    val addedFinal = distinctRows.filter(r =>
      idOf(r).forall(id => !delSet.contains(id)))
    // removed = explicit deletes ∪ re-added ids (replace-on-add)
    val removed = (delIds.iterator ++
      addedFinal.iterator.flatMap(idOf)).toArray.distinct
    Some(Prepped(addedFinal, added.schema, removed, aRows.nonEmpty))
  }
}
