package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag every training
  * document that shares an n-gram with a (small) held-out benchmark set —
  * the standard published recipe for keeping eval data out of training data
  * (n-gram-overlap decontamination as described in the GPT-3 and PaLM
  * papers' data sections).
  *
  * Scale shape: the benchmark gram set is tiny relative to the corpus
  * (thousands of eval documents vs billions of training documents), so the
  * corpus-side pass is one broadcast semi-join — no shuffle of the 100 TB
  * side, filter evaluated map-side next to the scan. The corpus is read
  * once; output is one row per document.
  */
object Decontaminate {

  /** corpus(id, codes) × bench(id, codes) → (doc_id, hits, contaminated):
    * per corpus document, the number of its distinct shingle codes that
    * appear anywhere in the benchmark set, and a 0/1 flag. `codes` are the
    * distinct n-gram shingle codes of [[Dedup.shingleCodeTable]] — the
    * same certified arithmetic the Jaccard joins run on. */
  /** Fuzzy (MinHash-LSH) decontamination — the scale twin of [[flags]]:
    * flag corpus docs NEAR-DUPLICATE to a benchmark doc, not just sharing
    * one n-gram (the fuzzy dedup step of the GPT-3 appendix recipe). A doc
    * is contaminated when any of its LSH band keys collides with a
    * benchmark band key; `band_hits` counts colliding bands (0..NumBands).
    * Same 100 TB shape as [[flags]]: the benchmark band-key set stays tiny
    * (NumBands rows per eval doc), so the corpus side is one broadcast
    * equi-join on (band, key) next to the scan — no corpus shuffle beyond
    * the per-doc band_hits count, which partial-aggregates map-side. */
  def fuzzyFlags(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val benchKeys = Dedup.minhashBandKeys(bench)
      .select("band", "key").distinct()
    // one key per (doc, band) and benchKeys distinct on (band, key), so the
    // join emits at most one row per corpus doc per band
    val hits = Dedup.minhashBandKeys(corpus)
      .join(broadcast(benchKeys), Seq("band", "key"))
      .groupBy(col("id")).agg(count(lit(1)).as("band_hits"))
    corpus.select(col("id").as("doc_id"))
      .join(hits.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("band_hits"), lit(0L)).as("band_hits"),
        when(coalesce(col("band_hits"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("contaminated"))
  }

  def flags(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val benchGrams = bench
      .select(explode(col("codes")).as("gram")).distinct()
    val hits = corpus.select(col("id"), explode(col("codes")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("id").agg(count(lit(1)).as("hits"))
    corpus.select(col("id").as("doc_id"))
      .join(hits.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(coalesce(col("hits"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("contaminated"))
  }
}
