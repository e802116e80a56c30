package graft

import org.apache.spark.sql.functions._
import graft.operators.TextIndex

/** Full-text retrieval: reference-scorer equality for BM25, ground-truth
  * checks for postings/keyword/phrase, RRF arithmetic, and the plan
  * shapes the 100 TB posture depends on (broadcast query/df sides, scan-
  * side term filter). */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana banana cherry"),
    (2L, "apple durian"),
    (3L, "cherry cherry cherry cherry"),
    (4L, ""),
    (5L, "durian apple banana")).toDF("doc_id", "text")

  test("postings and termStats match hand counts") {
    val post = TextIndex.postings(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(post.contains(("apple", 0L, 2L)))
    assert(post.contains(("cherry", 3L, 4L)))
    assert(!post.exists(_._2 == 4L)) // empty doc emits nothing
    val stats = TextIndex.termStats(TextIndex.postings(corpus)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("apple") === ((3L, 4L)))  // df=3 docs, cf=4 occurrences
    assert(stats("banana") === ((3L, 4L)))
    assert(stats("cherry") === ((3L, 6L)))
    assert(stats("durian") === ((2L, 2L)))
  }

  test("searchMinMatch: AND, OR, and minimum-should-match semantics") {
    def ids(terms: Seq[String], mm: Int): Set[Long] =
      TextIndex.searchMinMatch(corpus, terms, mm)
        .collect().map(_.getLong(0)).toSet
    val terms = Seq("apple", "banana", "cherry")
    assert(ids(terms, 3) === Set(0L))             // conjunctive
    assert(ids(terms, 1) === Set(0L, 1L, 2L, 3L, 5L)) // disjunctive
    assert(ids(terms, 2) === Set(0L, 1L, 5L))     // 2-of-3
    // distinct-term counting: doc 3's four cherries count once
    val n = TextIndex.searchMinMatch(corpus, terms, 1)
      .filter($"doc_id" === 3L).head().getLong(1)
    assert(n === 1L)
  }

  test("phraseSearch counts overlapping hits and handles repeated words") {
    val tri = Seq((0L, "b b b b"), (1L, "a b b a"), (2L, "b a b a"))
      .toDF("doc_id", "text")
    val hits2 = TextIndex.phraseSearch(tri, Seq("b", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits2 === Map(0L -> 3L, 1L -> 1L)) // overlaps count; doc 2 none
    val hits3 = TextIndex.phraseSearch(tri, Seq("b", "b", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits3 === Map(1L -> 1L))
    val multi = TextIndex.phraseSearch(tri, Seq("b", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi === Map(1L -> 1L, 2L -> 2L))
  }

  /** Driver-side reference BM25 with the same fold order. */
  private def refBm25(docsLocal: Seq[(Long, String)],
      queries: Seq[(Long, Seq[String])], k1: Double, b: Double)
      : Map[(Long, Long), Double] = {
    val toks = docsLocal.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val n = docsLocal.size.toLong
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val out = scala.collection.mutable.Map[(Long, Long), Double]()
    for ((qid, ts) <- queries; (did, dtoks) <- toks) {
      val dl = dtoks.size
      val ws = ts.distinct.flatMap { t =>
        val tf = dtoks.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 +
            ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))
          Some(t -> (idf * (tf.toDouble * (k1 + 1.0) /
            (tf.toDouble + k1 * ((1.0 - b) + b * dl.toDouble / avgdl)))))
        }
      }
      if (ws.nonEmpty)
        out((qid, did)) = ws.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    }
    out.toMap
  }

  /** Local (doc_id, text) rows for the reference scorer. */
  private def docsLocal(): Seq[(Long, String)] =
    graft.core.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), coalesce(col("text"), lit("")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("bm25TopK equals the reference scorer bit-for-bit on real docs") {
    val local = docsLocal()
    val queries = SparkEntry.Bm25Queries
    val ref = refBm25(local, queries, 1.2, 0.75)
    val got = TextIndex.bm25TopK(
        graft.core.Tables.table(spark, sfDir, "documents"),
        queries, k = 8, k1 = 1.2, b = 0.75)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // scores bit-identical (nano floor of the same double)
    got.foreach { case (qid, did, _, nano) =>
      assert(nano ===
        math.floor(1e9 * ref((qid, did))).toLong, s"q$qid d$did")
    }
    // ranks are the reference ordering (desc score, asc doc_id)
    val byQ = got.groupBy(_._1)
    for ((qid, rows) <- byQ) {
      val expect = ref.collect { case ((q, d), s) if q == qid => (d, s) }
        .toSeq.sortBy { case (d, s) => (-s, d) }.take(8).map(_._1)
      assert(rows.sortBy(_._3).map(_._2).toSeq === expect, s"q$qid")
    }
  }

  test("rrfFuse: both-sides sum, one-side zero, rank ties by id") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "id", "rnk")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("query_id", "id", "rnk")
    val got = TextIndex.rrfFuse(a, b, k = 10, k0 = 60).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toList
      .sortBy(_._2)
    // 11: 1/62 + 1/61 (both sides) beats 10: 1/61 and 12: 1/62
    val s11 = math.floor(1e9 * (1.0 / 62 + 1.0 / 61)).toLong
    val s10 = math.floor(1e9 * (1.0 / 61)).toLong
    val s12 = math.floor(1e9 * (1.0 / 62)).toLong
    assert(got === List((11L, 1L, s11), (10L, 2L, s10), (12L, 3L, s12)))
  }

  test("stored posting probe ≡ in-memory search and prunes bucket partitions") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-postings").toString
    val d = graft.core.Tables.table(spark, sfDir, "documents")
    TextIndex.writePostings(TextIndex.postings(d), path, nBuckets = 16)
    val stored = TextIndex.readPostings(spark, path)
    val terms = Seq("dup", "data", "join")
    val got = TextIndex.searchMinMatchStored(stored, terms, 2, 16)
    val want = TextIndex.searchMinMatch(d, terms, 2)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      want.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      plan.take(600))
  }

  test("dynamic lifecycle: re-ingest drops vanished terms, remove deletes") {
    val v1 = Seq((0L, "apple banana"), (1L, "cherry")).toDF("doc_id", "text")
    // doc 0 re-ingested WITHOUT banana — the stale posting must vanish
    val v2 = Seq((0L, "apple apple"), (2L, "durian")).toDF("doc_id", "text")
    val merged = TextIndex.replaceDocs(
      TextIndex.postings(v1), TextIndex.postings(v2))
    val got = merged.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("apple", 0L, 2L), ("cherry", 1L, 1L),
      ("durian", 2L, 1L)))
    val afterRemove = TextIndex.removeDocs(merged,
      Seq(1L).toDF("doc_id")).select("term", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(afterRemove === Set(("apple", 0L), ("durian", 2L)))
  }

  test("replaceDocs preserves positions; mixed positional pair fails loudly") {
    val v1 = Seq((0L, "a b a"), (1L, "c")).toDF("doc_id", "text")
    val v2 = Seq((0L, "b a")).toDF("doc_id", "text")
    val merged = TextIndex.replaceDocs(
      TextIndex.postingsPositional(v1), TextIndex.postingsPositional(v2))
    assert(merged.columns.toSeq ===
      Seq("term", "doc_id", "tf", "positions"))
    val got = merged.collect().map(r => (r.getString(0), r.getLong(1),
      r.getSeq[Int](3))).toSet
    assert(got === Set(("a", 0L, Seq(1)), ("b", 0L, Seq(0)),
      ("c", 1L, Seq(0))))
    val e = intercept[IllegalArgumentException] {
      TextIndex.replaceDocs(
        TextIndex.postingsPositional(v1), TextIndex.postings(v2))
    }
    assert(e.getMessage.contains("positional mismatch"))
  }

  test("streaming term stats converge to batch termStats, replay-safe") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docsSeq = Seq(
      (0L, "apple banana apple"), (1L, "banana cherry"),
      (2L, "apple"), (3L, "cherry banana cherry"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ti-stream").toString
    val q = graft.streaming.StreamingTextIndex
      .attachTermStats(stream, ckpt) { b =>
        val ups = b.select("term", "df", "cf").collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        acc.synchronized {
          ups.foreach { case (k, v) =>
            if (v._1 == 0L) acc.remove(k) else acc(k) = v
          }
        }
      }
    // doc 0 re-ingested WITHOUT banana — its stale posting must vanish
    // from the running stats (the replaceDocs symmetry, streamed); doc 4
    // loses `elderberry` entirely → df hits 0 → the sink's delete path
    val doc0v2 = (0L, "apple apple cherry")
    val doc4v1 = (4L, "elderberry fig")
    val doc4v2 = (4L, "fig")
    try {
      // split arrival + a REPLAYED doc (doc 1 delivered twice) — the
      // per-doc diff must not double-count it
      mem.addData(docsSeq.take(2)); q.processAllAvailable()
      mem.addData((docsSeq.drop(2) :+ docsSeq(1)) :+ doc4v1)
      q.processAllAvailable()
      mem.addData(Seq(doc0v2, doc4v2)); q.processAllAvailable()
    } finally q.stop()
    val finalDocs = docsSeq.updated(0, doc0v2) :+ doc4v2
    val batch = TextIndex.termStats(
        TextIndex.postings(finalDocs.toDF("doc_id", "text")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(acc.toMap === batch)
  }

  test("versioned streaming term stats: highest version wins in-batch, " +
      "stale later-batch arrivals are ignored") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("doc_id", "text", "ver")
    val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ti-stream-ver").toString
    val q = graft.streaming.StreamingTextIndex
      .attachTermStats(stream, ckpt, versionCol = Some("ver")) { b =>
        val ups = b.select("term", "df", "cf").collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        acc.synchronized {
          ups.foreach { case (k, v) =>
            if (v._1 == 0L) acc.remove(k) else acc(k) = v
          }
        }
      }
    try {
      // same-batch conflict: v2 beats v1 whatever the delivery order
      mem.addData(Seq((0L, "apple banana", 2L), (0L, "cherry", 1L)))
      q.processAllAvailable()
      // stale version in a LATER batch: must be ignored
      mem.addData(Seq((0L, "durian", 1L)))
      q.processAllAvailable()
      // a genuinely newer version applies
      mem.addData(Seq((0L, "apple apple", 3L)))
      q.processAllAvailable()
    } finally q.stop()
    val batch = TextIndex.termStats(
        TextIndex.postings(Seq((0L, "apple apple")).toDF("doc_id", "text")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(acc.toMap === batch)
  }

  test("proximitySearch counts slop-bounded co-occurrence pairs") {
    val tri = Seq(
      (0L, "a x x b"),     // |0-3| = 3
      (1L, "a b x a"),     // pairs: (0,1)=1, (3,1)=2 → both ≤ 3
      (2L, "a x x x x b"), // |0-5| = 5 > 3
      (3L, "b a")          // order-independent
    ).toDF("doc_id", "text")
    val got = TextIndex.proximitySearch(tri, "a", "b", slop = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }

  test("stored-index BM25 and phrase equal the corpus-scan paths and prune buckets") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ti-index").toString
    val d = graft.core.Tables.table(spark, sfDir, "documents")
    TextIndex.buildIndex(d, path, nBuckets = 16)
    val queries = SparkEntry.Bm25Queries
    val stored = TextIndex.bm25TopKStored(spark, path, queries, 10, 16)
    val scan = TextIndex.bm25TopK(d, queries, 10)
    assert(stored.collect().map(_.toSeq).toSet ===
      scan.collect().map(_.toSeq).toSet)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      plan.take(600))
    val ph = TextIndex.phraseSearchStored(spark, path,
      Seq("batch", "batch"), 16)
    val phScan = TextIndex.phraseSearch(d, Seq("batch", "batch"))
    assert(ph.collect().map(_.toSeq).toSet ===
      phScan.collect().map(_.toSeq).toSet)
    val st = TextIndex.indexStats(spark, path).head()
    assert(st.getAs[Long]("n_docs") === d.count())
    assert(st.getAs[Long]("n_terms") ===
      TextIndex.termStats(TextIndex.postings(d)).count())
    assert(st.getAs[Long]("n_postings") ===
      TextIndex.postings(d).count())
  }

  test("compressionRatio: repetitive text compresses harder than random") {
    val rnd = new scala.util.Random(7)
    val random = Array.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    val repetitive = "spark " * 80
    val df = Seq((0L, random), (1L, repetitive.trim), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.compressionRatio(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) < got(0L), s"repetitive ${got(1L)} !< random ${got(0L)}")
    assert(got(2L) === 1000L && got(3L) === 1000L) // neutral for empty/NULL
    assert(got.values.forall(_ > 0))
  }

  test("bm25 plan: query table, df and corpus stats broadcast; term filter at the scan") {
    val df = TextIndex.bm25TopK(
      graft.core.Tables.table(spark, sfDir, "documents"),
      SparkEntry.Bm25Queries, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastExchange".r.findAllIn(plan).size
    assert(nBroadcast >= 3, s"want >=3 broadcast sides, got $nBroadcast")
    // the isin prune must run before the (doc, term) aggregation
    val filterIdx = plan.indexOf("dup")
    assert(filterIdx >= 0, "term filter not visible in plan")
  }
}
