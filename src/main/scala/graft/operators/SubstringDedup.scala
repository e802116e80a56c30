package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication: find (and remove) token spans that occur
  * more than once anywhere in the corpus — the ExactSubstr operator of
  * Lee et al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL 2022). The reference corpus-prep surface covers document-level
  * dedup (exact / MinHash / SimHash); this adds the span-level variant a
  * training-data pipeline runs after it: boilerplate, licenses, and quoted
  * passages duplicate across documents that are NOT near-duplicates as
  * wholes, and only a substring-level pass catches them.
  *
  * The paper builds a corpus-wide suffix array — inherently single-machine.
  * The Spark-native equivalent used here is the standard rolling-window
  * relaxation: every width-`w` token window is keyed, a window whose key
  * occurs ≥ 2 times anywhere (same doc or not) is duplicated, and
  * overlapping/adjacent duplicated windows merge into maximal spans — so
  * any duplicated substring of ≥ `w` tokens is found exactly (a suffix
  * array additionally finds shorter repeats; `w` is the paper's min-match
  * length, 50 tokens there, configurable here).
  *
  * Scale shape (100 TB): one explode to ~n_tokens window rows, one
  * map-side-combined groupBy on the window key to find duplicated keys, one
  * shuffle semi-join back, and a per-doc window function for the interval
  * merge — everything partitions by window key or doc id; no driver
  * collect, no broadcast of corpus-sized state. Windows are keyed by the
  * literal w-token string: exact (zero false merges), and Spark shuffles
  * string keys by their internal hash anyway, so the only cost vs a 64-bit
  * fingerprint is shuffle width — swap in xxhash64(gram) for the key at
  * scale if those bytes matter (collisions then need a verify pass).
  */
object SubstringDedup {

  /** Default minimum duplicated-run width, in tokens. (The paper uses 50
    * BPE tokens at web scale; the test corpora are ~50-token documents, so
    * certification runs at 8.) */
  val DefaultW = 8

  /** Token windows of width `w`: (id, pos, gram), pos 1-based, gram the
    * space-joined w-token substring. Docs shorter than `w` tokens emit no
    * windows. Codegen'd functions only — no UDF in the explode path. */
  private def windows(docs: DataFrame, w: Int, idCol: String,
                      textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - ${w - 1}), " +
        s"i -> concat_ws(' ', slice(toks, i, $w)))")))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gram"))

  /** Maximal duplicated spans: (doc_id, span_start, span_end, span_len),
    * token positions 1-based inclusive. A span is any maximal run of tokens
    * covered by width-`w` windows whose key occurs ≥ 2 times corpus-wide
    * (across docs or repeated within one). */
  def duplicateSpans(docs: DataFrame, w: Int = DefaultW,
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     hashKeys: Boolean = false): DataFrame = {
    val win = windows(docs, w, idCol, textCol)
    // hashKeys: the 100 TB lever — shuffle an 8-byte fingerprint instead of
    // the ~w·token_len gram string (a false dup window needs an xxhash64
    // collision among co-partitioned keys; at 2^-64 per pair it never
    // decides a corpus). The certified queries keep string keys, which the
    // oracle replays exactly; DedupBench measures both.
    val keyed =
      if (hashKeys) win.select(col("id"), col("pos"),
        xxhash64(col("gram")).as("k"))
      else win.withColumnRenamed("gram", "k")
    // duplicated keys via one partition-count window — a single shuffle on
    // the key, replacing the groupBy + semi-join pair (which re-evaluated
    // the explode subtree on both sides and shuffled it twice)
    val marked = keyed
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("k")))
      .filter(col("cnt") >= 2)
      .select(col("id"), col("pos"), (col("pos") + w - 1).as("e"))
    // gaps-and-islands interval merge, per doc: a window starts a new span
    // iff its start exceeds the running max end of its predecessors + 1
    // (adjacent windows — sharing no token but abutting — also merge, so a
    // duplicated run of 2w tokens is one span, not two)
    val runEnd = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val byPos = Window.partitionBy("id").orderBy("pos")
    marked
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("e")).over(runEnd), lit(-1L)) + 1,
          1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(byPos))
      .groupBy(col("id"), col("grp"))
      .agg(min("pos").as("span_start"), max("e").as("span_end"))
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** Span removal: every doc with its duplicated spans deleted —
    * (doc_id, clean_text, removed_tokens, n_tokens). Removes ALL
    * occurrences of duplicated runs (the conservative variant; keeping one
    * canonical occurrence needs a global tie-break — compose with
    * [[Components.dedupApply]]-style keep flags if that policy is wanted).
    * Every input doc appears, including fully-removed ones (empty string)
    * and docs shorter than `w` (untouched). */
  def removeSpans(docs: DataFrame, w: Int = DefaultW,
                  idCol: String = "doc_id",
                  textCol: String = "text",
                  hashKeys: Boolean = false): DataFrame = {
    val spans = duplicateSpans(docs, w, idCol, textCol, hashKeys)
      .select(col("doc_id").as("sid"), col("span_start"), col("span_end"))
    val toks = docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(TextAnalysis.tokens(coalesce(col(textCol), lit("")))))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
    // equi-join on doc id + range filter; spans within a doc are disjoint
    // (merged islands), so each token matches at most one span and the left
    // join preserves exactly one row per token
    val cleaned = toks.join(spans,
        toks("id") === spans("sid") &&
          col("pos").between(col("span_start"), col("span_end")), "left")
      .withColumn("covered", col("span_start").isNotNull)
      .groupBy(col("id").as("doc_id"))
      .agg(
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(" +
          "case when not covered then struct(pos, tok) end)), x -> x.tok)"))
          .as("clean_text"),
        sum(when(col("covered"), 1L).otherwise(0L)).as("removed_tokens"),
        count(lit(1)).as("n_tokens"))
    // "every input doc appears" includes docs whose text is NULL or
    // tokenizes to nothing (posexplode over an empty array emits no rows,
    // which would drop the doc): restore them with empty-output defaults.
    // The join keys on doc_id, the same key the groupBy above shuffled on,
    // so AQE plans it shuffle-free on the already-partitioned side.
    docs.select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
