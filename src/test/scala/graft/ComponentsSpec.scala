package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Components, Dedup, TextAnalysis}

class ComponentsSpec extends SparkSpec {

  /** Brute-force union-find ground truth for a pair list. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // Roots may not be minima after arbitrary unions; normalize to min-id.
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap { grp =>
      val m = grp.min
      grp.map(_ -> m)
    }.toMap
  }

  private def run(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    val (comps, rounds) = Components.connectedComponentsRounds(df)
    (comps.as[(Long, Long)].collect().toMap, rounds)
  }

  test("random graphs match union-find ground truth") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 20
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(80).toLong; val b = rnd.nextInt(80).toLong
        (a, b)
      }.filter(p => p._1 != p._2)
      val (got, _) = run(pairs)
      assert(got == unionFind(pairs), s"trial $trial")
    }
  }

  test("a 200-node path converges in far fewer than diameter rounds") {
    val path = (0L until 199L).map(i => (i, i + 1))
    val (got, rounds) = run(path)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 199L).toSet)
    // Diameter is 199; star-contraction must beat it by an order of
    // magnitude (log²-round convergence is the operator's scale claim).
    assert(rounds <= 15, s"took $rounds rounds on a 199-hop path")
    // Convergence detection fires exactly when next == edges in both the
    // original (count + per-round except) and the fingerprint form
    // (count+hash-xor, except once at equality), so round counts are
    // identical by construction; pin the deterministic value so a future
    // detection change that alters rounds is caught here.
    assert(rounds == 9, s"round count drifted: $rounds")
  }

  test("empty and single-pair inputs") {
    import spark.implicits._
    val (empty, _) = run(Seq.empty)
    assert(empty.isEmpty)
    val (one, _) = run(Seq((7L, 3L)))
    assert(one == Map(7L -> 3L, 3L -> 3L))
  }

  test("dedupApply keeps exactly one doc per component and all singletons") {
    import spark.implicits._
    val docs = Tables.table(spark, sfDir, "documents")
    val pairs = Dedup.jaccardPairsPrefix(
      Dedup.shingleCodeTable(docs).withColumnRenamed("codes", "grams"), 0.5)
    val out = Components.dedupApply(docs, pairs).cache()
    val total = docs.count()
    assert(out.count() == total)
    // keep flags: one per component.
    val perComp = out.groupBy("comp")
      .agg(sum("keep").as("kept"), count(lit(1)).as("n"))
    assert(perComp.filter(col("kept") =!= 1L).isEmpty)
    // canonical member is the component min == comp id itself.
    assert(out.filter(col("keep") === 1L && col("comp") =!= col("doc_id"))
      .isEmpty)
    out.unpersist()
  }
}
