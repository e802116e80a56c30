package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus — the keyword half of a
  * hybrid (lexical + vector) search engine, and the audit surface a
  * training-data pipeline needs ("which documents mention X", "rank the
  * corpus against this probe query", "find exact phrase hits").
  *
  * Pieces:
  *  1. [[postings]] / [[termStats]] — the classic inverted-index build:
  *     `(term, doc_id, tf)` postings and `(term, df, cf)` vocabulary
  *     statistics. ONE corpus-wide shuffle keyed on term — the canonical
  *     index-build cost; everything downstream is vocabulary-bounded.
  *  2. [[searchMinMatch]] — conjunctive / disjunctive keyword search:
  *     query terms are a literal set, so the filter sits NEXT TO THE SCAN
  *     (only matching tokens ever shuffle) and `minMatch = |terms|` gives
  *     AND semantics, `1` gives OR, anything between gives the usual
  *     minimum-should-match.
  *  3. [[phraseSearch]] — positional phrase match via the inverted
  *     positional-join shape: per phrase term, the (doc, pos) posting rows
  *     are equi-joined on (doc_id, pos − offset); only phrase-term
  *     positions shuffle, never the corpus.
  *  4. [[bm25TopK]] — Okapi/Lucene BM25 ranking of a broadcast query
  *     batch. All arithmetic except the final `ln` is exactly-rounded
  *     IEEE (integer counts, one division chain per term, an ORDERED
  *     per-(query, doc) fold), so scores hash-certify against the DuckDB
  *     oracle; `ln` itself is bitwise-identical between HotSpot's
  *     `Math.log` (interpreted AND C2-intrinsic paths) and DuckDB's
  *     `std::log` on this stack — verified on the idf input range before
  *     certification. On a libm where that ever stopped holding, the
  *     score column is a 1-ulp boundary case, not a ranking change.
  *  5. [[rrfFuse]] — reciprocal-rank fusion of two ranked lists
  *     (Cormack et al. SIGIR'09): score = Σ 1/(k₀ + rank). Pure rational
  *     arithmetic over integer ranks — hash-exact with no caveat — which
  *     is exactly why RRF is the right certified fusion for hybrid
  *     BM25 + vector search (the scores of the two sides are never
  *     compared directly, only their ranks).
  *
  * Scale shape (100 TB corpus, small query batch): query terms broadcast;
  * the token explode filters to query terms BEFORE the (doc, term)
  * aggregation so the per-query search only shuffles matching postings;
  * df/N/avgdl are vocabulary- or scalar-sized broadcasts; the final
  * per-query rank is a window over each query's candidate set (bounded by
  * the postings of its terms — use [[TopK.perKey]] when a term's posting
  * list alone exceeds window comfort).
  *
  * The reference engine is vector-only; this family is brief-mandated
  * pipeline surface. BM25 constants follow Robertson et al. TREC-3 as
  * popularized by Lucene's BM25Similarity (k1 = 1.2, b = 0.75,
  * idf = ln(1 + (N − df + 0.5)/(df + 0.5))).
  */
object TextIndex {

  /** Nano-scale for certified double scores (LmScore precedent). */
  val ScoreScale = 1000000000L

  /** Whitespace tokens with empties dropped — the corpus tokenizer shared
    * by every operator here (and consistent with LmScore.trainUnigrams'
    * non-empty filter). */
  private def toksCol(textCol: String): Column =
    filter(split(col(textCol), " "), t => t =!= "")

  /** `(term, doc_id, tf)` postings — the inverted-index build. One
    * map-side-combined aggregation keyed on (term, doc_id). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(toksCol(textCol)).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** `(term, df, cf)` vocabulary statistics from a postings table:
    * document frequency and collection frequency. Vocabulary-bounded. */
  def termStats(post: DataFrame): DataFrame =
    post.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))

  /** Docs matching at least `minMatch` DISTINCT terms of `terms`:
    * `(doc_id, n_matched)`. `minMatch = terms.size` ⇒ conjunctive AND.
    * The isin filter runs next to the scan; only matching (doc, term)
    * rows reach the aggregation. */
  def searchMinMatch(docs: DataFrame, terms: Seq[String], minMatch: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && minMatch >= 1 && minMatch <= terms.size,
      "1 <= minMatch <= |terms|")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(toksCol(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
  }

  /** Exact phrase occurrence count per doc: `(doc_id, n_hits)` for docs
    * with ≥ 1 hit, where a hit is `phrase` appearing as consecutive
    * tokens. Inverted positional-join shape: the corpus is exploded to
    * (doc_id, pos, term) ONCE, filtered to phrase terms at the scan, and
    * the phrase is an m−1-way equi-join on (doc_id, pos − offset) — each
    * join key is (doc, alignedPos), so repeated words in the phrase and
    * overlapping hits are handled by construction. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val pos = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(toksCol(textCol)))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
      .filter(col("term").isin(phrase.distinct: _*))
    val starts = phrase.zipWithIndex.map { case (t, j) =>
      pos.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - j).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    starts.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** BM25 top-k for a literal query batch `(query_id, terms)`:
    * `(query_id, doc_id, rnk, bm25_nano)` with rnk = 1..k best-first,
    * ties broken by doc_id, bm25_nano = floor(1e9 · score).
    *
    * Per matched (query, doc, term):
    *   idf  = ln(1 + ((N − df) + 0.5) / (df + 0.5))
    *   tfw  = tf·(k1+1) / (tf + k1·((1−b) + b·dl/avgdl))
    * summed over the query's terms in TERM-SORTED order (the fold order
    * is part of the certified contract). Duplicate terms within one query
    * are collapsed (set-of-terms semantics, as Lucene's boolean BM25). */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && k >= 1)
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids would double-count their terms")
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qTable = broadcast(
      queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
        .toDF("query_id", "term"))

    // one pass: per-doc length + the query-term tokens only
    val toks = toksCol(textCol)
    val tf = docs
      .select(col(idCol).cast("long").as("doc_id"), size(toks).as("dl"),
        explode(toks).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))

    // scalar corpus stats (N, avgdl) — one tiny broadcast row; df per term
    val stats = broadcast(docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl")))
    val df0 = broadcast(tf.groupBy("term").agg(count(lit(1)).as("df")))

    val perTerm = tf
      .join(df0, Seq("term"))
      .crossJoin(stats)
      .join(qTable, Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term"),
        (log(lit(1.0) +
            ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(k1 + 1.0) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) +
                lit(b) * col("dl").cast("double") / col("avgdl")))))
          .as("w"))

    rankScores(perTerm, k)
  }

  /** (query_id, doc_id, term, w) → term-sorted exact fold, windowed rank,
    * nano floor — shared by the corpus-scan and stored-index BM25 paths
    * so both produce bit-identical rows. */
  private def rankScores(perTerm: DataFrame, k: Int): DataFrame = {
    val scored = perTerm
      .groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("term"), col("w"))).as("ws"))
      .select(col("query_id"), col("doc_id"),
        aggregate(sort_array(col("ws")), lit(0.0),
          (acc, x) => acc + x.getField("w")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"),
        floor(lit(ScoreScale.toDouble) * col("score")).cast("long")
          .as("bm25_nano"))
  }

  // ---- persistent posting store --------------------------------------

  /** Term bucket for the persistent store: pmod(xxhash64(term), n) — the
    * SAME expression writer- and probe-side, so a literal term set always
    * maps to the partitions it was written to. */
  private def bucketCol(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** Persist a postings table partitioned by term-hash bucket — the
    * text-index analog of the IVF cluster-partitioned layout: a keyword
    * probe reads only its terms' buckets (parquet partition pruning), not
    * the corpus-wide index. `nBuckets` trades pruning granularity against
    * file count; at 100 TB the postings for one bucket are still a
    * splittable parquet prefix, so no bucket is a task-size hazard. */
  def writePostings(post: DataFrame, path: String, nBuckets: Int = 64)
      : Unit =
    post
      .withColumn("bucket", bucketCol(col("term"), nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  def readPostings(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame = spark.read.parquet(path)

  /** [[searchMinMatch]] over a STORED posting table: the literal terms'
    * buckets are resolved with the same Spark hash (one driver-side
    * mini-job, no hand-rolled twin of xxhash64) and pushed as a partition
    * filter, so the scan touches only those buckets. */
  def searchMinMatchStored(post: DataFrame, terms: Seq[String],
      minMatch: Int, nBuckets: Int): DataFrame = {
    require(terms.nonEmpty && minMatch >= 1 && minMatch <= terms.size,
      "1 <= minMatch <= |terms|")
    val spark = post.sparkSession
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(bucketCol(col("term"), nBuckets))
      .collect().map(_.getLong(0)).distinct.toSeq
    post
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
  }

  /** Proximity (NEAR) search: docs where `termA` and `termB` co-occur
    * within `slop` token positions, with the co-occurrence pair count —
    * `(doc_id, n_pairs)` over pairs (pA, pB), |pA − pB| ≤ slop. The
    * classic relevance signal between bag-of-words AND and exact phrase.
    * Same inverted positional-join shape as [[phraseSearch]]: only the
    * two terms' position rows leave the scan, the join is doc-keyed with
    * a range predicate evaluated inside it. */
  def proximitySearch(docs: DataFrame, termA: String, termB: String,
      slop: Int, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(termA != termB && slop >= 0, "distinct terms, slop >= 0")
    val pos = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(toksCol(textCol)))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
      .filter(col("term").isin(termA, termB))
    val a = pos.filter(col("term") === termA)
      .select(col("doc_id"), col("pos").as("pa"))
    val b = pos.filter(col("term") === termB)
      .select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .filter(abs(col("pa") - col("pb")) <= slop)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  // ---- full on-disk index: postings + doclens + stats sidecars -------

  /** POSITIONAL postings: `(term, doc_id, tf, positions)` with 0-based
    * token positions — one row per (term, doc); tf = |positions|. The
    * richer build that lets the STORE serve phrase queries too. */
  def postingsPositional(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(toksCol(textCol)))
      .groupBy(col("col").as("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** One-call on-disk text index (the IndexLayout analog): bucketed
    * positional postings + a doc-length sidecar + a one-row corpus-stats
    * sidecar (n_docs, avgdl — computed with the SAME fold as
    * [[bm25TopK]], so stored-index BM25 scores are bit-identical to the
    * corpus-scan path). Everything a keyword / BM25 / phrase probe needs
    * without touching the corpus again. */
  def buildIndex(docs: DataFrame, path: String, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    writePostings(postingsPositional(docs, idCol, textCol),
      s"$path/postings", nBuckets)
    val toks = toksCol(textCol)
    docs.select(col(idCol).cast("long").as("doc_id"), size(toks).as("dl"))
      .write.mode("overwrite").parquet(s"$path/doclens")
    docs.agg(count(lit(1)).as("n_docs"),
        (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k SERVED FROM THE STORE: reads only the query terms'
    * bucket partitions (df/tf/dl come from the index, the corpus is
    * never scanned), then the exact [[bm25TopK]] arithmetic — q128's
    * oracle certifies both paths. */
  def bm25TopKStored(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: Seq[(Long, Seq[String])], k: Int,
      nBuckets: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k >= 1)
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids would double-count their terms")
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val buckets = allTerms.toDF("term")
      .select(bucketCol(col("term"), nBuckets))
      .collect().map(_.getLong(0)).distinct.toSeq
    val qTable = broadcast(
      queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
        .toDF("query_id", "term"))
    val tf = readPostings(spark, s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(allTerms: _*))
      .select("term", "doc_id", "tf")
    val dl = spark.read.parquet(s"$path/doclens")
    val stats = broadcast(spark.read.parquet(s"$path/stats"))
    val df0 = broadcast(tf.groupBy("term").agg(count(lit(1)).as("df")))
    val perTerm = tf
      .join(dl, Seq("doc_id"))
      .join(df0, Seq("term"))
      .crossJoin(stats)
      .join(qTable, Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term"),
        (log(lit(1.0) +
            ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(k1 + 1.0) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) +
                lit(b) * col("dl").cast("double") / col("avgdl")))))
          .as("w"))
    rankScores(perTerm, k)
  }

  /** Phrase search SERVED FROM THE STORE: per phrase term, its posting
    * rows' positions explode to (doc_id, pos − offset) and the phrase is
    * the same m−1-way equi-join as [[phraseSearch]] — only the phrase
    * terms' buckets are read. */
  def phraseSearchStored(spark: org.apache.spark.sql.SparkSession,
      path: String, phrase: Seq[String], nBuckets: Int): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    import spark.implicits._
    val buckets = phrase.distinct.toDF("term")
      .select(bucketCol(col("term"), nBuckets))
      .collect().map(_.getLong(0)).distinct.toSeq
    val post = readPostings(spark, s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(phrase.distinct: _*))
      .select(col("term"), col("doc_id"),
        explode(col("positions")).as("pos"))
    val starts = phrase.zipWithIndex.map { case (t, j) =>
      post.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - j).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    starts.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** One-row summary of an on-disk index built by [[buildIndex]]:
    * (n_docs, avgdl, n_terms, n_postings) — the numbers a query planner
    * (or a capacity estimate) wants before probing. Sidecars give the
    * corpus stats for free; the postings summary is one vocabulary-
    * bounded aggregation over the store. */
  def indexStats(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame = {
    val stats = spark.read.parquet(s"$path/stats")
    val post = readPostings(spark, s"$path/postings")
      .agg(count_distinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_postings"))
    stats.crossJoin(post)
  }

  // ---- dynamic maintenance (the M1–M4 analog for the text index) -----

  /** DOC-LEVEL upsert of freshly-ingested postings into a stored posting
    * set: every stored row of a re-ingested doc_id is dropped first (a
    * re-ingested document's VANISHED terms must not survive as stale
    * postings — per-(term, doc) merging alone would leak them), then the
    * fresh rows are appended. Anti-join keyed on doc_id + union — both
    * sides stay distributed. */
  def replaceDocs(stored: DataFrame, fresh: DataFrame): DataFrame = {
    // preserve the positional column when both sides carry it; a MIXED
    // pair (one positional, one not) would silently downgrade the store,
    // so it fails loudly instead
    val storedPos = stored.columns.contains("positions")
    val freshPos = fresh.columns.contains("positions")
    require(storedPos == freshPos,
      s"replaceDocs: positional mismatch — stored " +
        s"${if (storedPos) "has" else "lacks"} positions but fresh " +
        s"${if (freshPos) "has" else "lacks"} it; re-tokenize with " +
        "positionalPostings (or postings) so both sides match")
    val cols = Seq("term", "doc_id", "tf") ++
      (if (storedPos) Seq("positions") else Nil)
    val ids = fresh.select("doc_id").distinct()
    stored.select(cols.map(col): _*)
      .join(ids, Seq("doc_id"), "left_anti")
      .unionByName(fresh.select(cols.map(col): _*))
      .select(cols.map(col): _*) // using-join fronts doc_id; pin order
  }

  /** Drop all postings of the given doc ids (M2 delete analog — here a
    * hard delete: parquet stores rewrite on compaction anyway, so no
    * tombstone pass is needed). */
  def removeDocs(stored: DataFrame, ids: DataFrame): DataFrame =
    stored.join(ids.select("doc_id").distinct(), Seq("doc_id"),
      "left_anti")

  /** Consolidate a stored posting set plus fresh postings into a new
    * bucketed store (M3/M4 analog): doc-level upsert, then one bucketed
    * rewrite. Readers of the old path are unaffected until they reopen. */
  def compactInto(stored: DataFrame, fresh: DataFrame, path: String,
      nBuckets: Int = 64): Unit =
    writePostings(replaceDocs(stored, fresh), path, nBuckets)

  /** Reciprocal-rank fusion of two ranked lists (Cormack et al.
    * SIGIR'09): both inputs are `(query_id, id, rnk)`; output is
    * `(query_id, id, rnk, rrf_nano)` re-ranked by
    * score = 1/(k0 + rankA) + 1/(k0 + rankB), a missing side contributing
    * 0, ties by id. Integer ranks + two exact divisions + one add — the
    * whole fusion is exactly-rounded IEEE, which is the point: the two
    * sides' native scores (BM25 doubles vs cosine distances) never meet,
    * only their ranks do. k0 = 60 is the paper's constant. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60)
      : DataFrame = {
    val fa = a.select(col("query_id"), col("id"),
      (lit(1.0) / (col("rnk") + lit(k0)).cast("double")).as("ra"))
    val fb = b.select(col("query_id"), col("id"),
      (lit(1.0) / (col("rnk") + lit(k0)).cast("double")).as("rb"))
    val fused = fa.join(fb, Seq("query_id", "id"), "full")
      .select(col("query_id"), col("id"),
        (coalesce(col("ra"), lit(0.0)) + coalesce(col("rb"), lit(0.0)))
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id").asc)
    fused
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("id"), col("rnk"),
        floor(lit(ScoreScale.toDouble) * col("score")).cast("long")
          .as("rrf_nano"))
  }
}
