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
