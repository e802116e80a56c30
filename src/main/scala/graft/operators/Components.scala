package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise near-dup evidence (Jaccard / MinHash-LSH / SimHash /
  * embedding-cosine pairs from [[Dedup]]) into dedup GROUPS, so a pipeline
  * can keep one canonical document per group. The reference engine stops at
  * similarity search; a corpus-dedup deployment of it needs exactly this
  * step between "pairs found" and "rows dropped".
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
  * one shuffle (groupByKey on node id); the edge set converges to a star
  * per component — every node pointing at its component's minimum id — in
  * O(log² n) rounds REGARDLESS of component diameter. That is the 100 TB
  * property: plain min-label propagation needs diameter rounds, and
  * duplicate chains at corpus scale (A≈B≈C≈… template families) can be
  * thousands of hops deep while log²(10¹¹) ≈ 13.
  *
  * Per-group state is one node's neighbor list — bounded by the same
  * argument as the paper: large-star strictly shrinks the set of nodes with
  * large neighborhoods, and the input near-dup graph is band/bucket-sparse
  * by construction (the pair generators only emit verified near-dups).
  */
object Components {

  /** (doc_a, doc_b) pairs → (node, comp): every node that appears in a pair
    * mapped to min(id) of its connected component. Deterministic; pure
    * DataFrame/Dataset ops; one shuffle per star round plus one cheap
    * convergence check (an except-count on star edges).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b"): DataFrame =
    connectedComponentsRounds(pairs, aCol, bCol)._1

  /** As [[connectedComponents]] but also returns the number of
    * large+small-star rounds it took to converge (spec'd: a 200-node path
    * converges in far fewer than 200 rounds — the diameter-independence
    * claim, measured). */
  def connectedComponentsRounds(pairs: DataFrame, aCol: String = "doc_a",
                                bCol: String = "doc_b"): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Orient (max, min), drop self loops + dups: the small-star form.
    var edges: Dataset[(Long, Long)] = pairs
      .select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)]
      .filter(e => e._1 != e._2)
      .map(e => (math.max(e._1, e._2), math.min(e._1, e._2)))
      .distinct()
      .localCheckpoint(eager = true)
    // Convergence fingerprint: (count, XOR of per-edge xxhash64) in ONE
    // aggregate job over the (checkpointed) round output. Equal
    // fingerprints trigger the exact `except` certification ONCE — the
    // prior per-round `count + except` paid a full extra shuffle every
    // round whose counts matched, which is exactly the common final
    // rounds. XOR over a DISTINCT edge set collides only if two different
    // sets share count and 64-bit hash-xor (≈2⁻⁶⁴); a collision is not a
    // correctness risk — `except` still arbitrates, we just loop again.
    def fingerprint(d: Dataset[(Long, Long)]): (Long, Long) = {
      val r = d.toDF("a", "b")
        .agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)))
        .first()
      (r.getLong(0), r.getLong(1))
    }
    var cur = fingerprint(edges)
    var rounds = 0
    var converged = false
    while (!converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = true)
      rounds += 1
      val ns = fingerprint(next)
      converged = ns == cur && next.except(edges).isEmpty
      // the superseded round's blocks are dead the moment `next` is
      // materialized (eager checkpoint above) — free them so an iterative
      // caller holds at most two edge sets in executor storage
      edges.unpersist(blocking = false)
      edges = next
      cur = ns
    }
    // At the fixpoint every edge is (node, componentMin); roots have no
    // outgoing edge and are their own component.
    val comps = edges.toDF("node", "comp")
      .groupBy("node").agg(min("comp").as("comp"))
    val roots = edges.toDF("node", "comp")
      .select(col("comp").as("node")).distinct()
      .join(comps, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("comp"))
    (comps.unionByName(roots), rounds)
  }

  /** Large-star: for each node u, connect every STRICTLY LARGER neighbor to
    * the minimum of u's closed neighborhood. Keeps (big, small)
    * orientation; never creates self loops (m < v by construction). */
  private def largeStar(edges: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.flatMap(e => Iterator(e, e.swap))
      .groupByKey(_._1)
      .flatMapGroups { (u: Long, it: Iterator[(Long, Long)]) =>
        val nbrs = it.map(_._2).toArray
        var m = u
        var i = 0
        while (i < nbrs.length) { if (nbrs(i) < m) m = nbrs(i); i += 1 }
        nbrs.iterator.filter(_ > u).map(v => (v, m))
      }
      .distinct()
  }

  /** Small-star: for each node u over its SMALLER-OR-EQUAL neighbors
    * (guaranteed by orientation), connect u and every neighbor to the
    * neighborhood minimum. */
  private def smallStar(edges: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges
      .groupByKey(_._1)
      .flatMapGroups { (u: Long, it: Iterator[(Long, Long)]) =>
        val nbrs = it.map(_._2).toArray
        var m = u
        var i = 0
        while (i < nbrs.length) { if (nbrs(i) < m) m = nbrs(i); i += 1 }
        val out = nbrs.iterator.filter(_ != m).map(v => (v, m)) ++
          (if (u != m) Iterator((u, m)) else Iterator.empty)
        out
      }
      .distinct()
  }

  /** The full dedup-apply view: every document of `docs` with its component
    * id (its own id when it is in no near-dup pair) and a keep flag — 1 for
    * the canonical (minimum-id) member of each component, 0 for rows a
    * dedup pass would drop. One broadcast-sized join against the component
    * map at these densities; at 100 TB the map is a shuffle join keyed by
    * doc id, still a single pass over the corpus. */
  def dedupApply(docs: DataFrame, pairs: DataFrame,
                 idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(comps.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("keep",
        when(col("comp") === col("doc_id"), 1L).otherwise(0L))
  }

  /** [[dedupApply]] with QUALITY-AWARE canonical selection: within each
    * duplicate group, keep the member with the highest `scoreCol`
    * (ties → lowest doc_id) instead of the smallest id — what production
    * pipelines actually do (drop the worse copy, not the later one).
    * `scoreCol` is evaluated over `docs`' columns. The per-group argmax is
    * a window over `comp` — group-sized, not corpus-sized, partitions. */
  def dedupApplyBest(docs: DataFrame, pairs: DataFrame, scoreCol: Column,
                     idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(pairs)
    val scored = docs
      .select(col(idCol).cast("long").as("doc_id"),
        scoreCol.cast("long").as("score"))
      .join(comps.withColumnRenamed("node", "doc_id"), Seq("doc_id"),
        "left")
      .select(col("doc_id"), col("score"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("keep",
      when(row_number().over(w) === 1, 1L).otherwise(0L))
  }
}
