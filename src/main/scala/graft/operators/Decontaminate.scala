package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- Bloom-filter membership (the very-large-benchmark scale path) ----

  /** Bloom parameters: `mBits` filter size (power of two), `k` probe count.
    * Defaults give ~0.2% theoretical FP at 10k distinct benchmark grams. */
  final case class BloomParams(mBits: Int = 1 << 17, k: Int = 4,
      seed: Long = 1L) {
    require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    require(k >= 1 && k <= 8, "k in [1, 8]")
    val words: Int = mBits / 64
  }

  /** Per-probe Lehmer multipliers (distinct primes < 2^17 so the product
    * with a mod-M residue stays < 2^48). A DISTINCT multiplier per probe is
    * load-bearing: probes of the form `(base + i·c) mod m` are translates
    * of one base hash, so two grams colliding in probe 0 collide in ALL
    * probes — effective k collapses toward 1 and the FP rate degrades ~10×
    * (measured in BloomSpec before the fix). Independent multipliers
    * restore the (1−e^{−kn/m})^k rate. */
  private val ProbeMuls = Array(48271L, 69621L, 16807L, 40014L,
    45991L, 65537L, 75571L, 93167L)

  /** The i-th probe position of gram code `g` — identical arithmetic on
    * the JVM build side and the Column probe side. */
  @inline private def probePos(g: Long, i: Int, p: BloomParams): Int =
    (((Math.floorMod(g, Mixture.HashMod) * ProbeMuls(i)
      + i * 1013904223L + p.seed) % Mixture.HashMod) % p.mBits).toInt

  private def probePosCol(g: Column, i: Int, p: BloomParams): Column =
    (pmod(g, lit(Mixture.HashMod)) * lit(ProbeMuls(i))
      + lit(i * 1013904223L + p.seed)) % lit(Mixture.HashMod) % lit(p.mBits)

  /** Build the benchmark-side Bloom bit array over `codes`. Distributed
    * per-partition OR-fold, driver merges `words` longs per partition —
    * the filter is KB–MB scale regardless of benchmark size, which is the
    * point: a 10M-gram benchmark set broadcasts as a ~1 MB bit array
    * instead of a multi-hundred-MB hash set. */
  def bloomBuild(bench: DataFrame, params: BloomParams = BloomParams())
      : Array[Long] = {
    val spark = bench.sparkSession
    import spark.implicits._
    val p = params
    bench.select(explode(col("codes")).as("gram")).as[Long]
      .rdd.treeAggregate(new Array[Long](p.words))(
        seqOp = { (bits, g) =>
          var i = 0
          while (i < p.k) {
            val pos = probePos(g, i, p)
            bits(pos >> 6) |= 1L << (pos & 63)
            i += 1
          }
          bits
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  /** Membership test as a pure Column over a document's `codes` array:
    * true iff ANY gram has all `k` probe bits set. The bit array rides the
    * plan as one array literal (plan-broadcast, evaluated map-side next to
    * the scan — the corpus never shuffles), and the whole predicate stays
    * inside whole-stage codegen. */
  def bloomHitCol(codes: Column, bits: Array[Long],
      params: BloomParams = BloomParams()): Column = {
    val mask = typedlit(bits.toSeq)
    exists(codes, g => (0 until params.k).map { i =>
      val pos = probePosCol(g, i, params)
      // bitwiseAND, not % 2: shiftright is ARITHMETIC, so a set bit in a
      // sign-extended (negative) word yields -1 under % 2.
      call_function("shiftright",
        element_at(mask, (pos / 64).cast("int") + 1),
        (pos % 64).cast("int")).bitwiseAND(lit(1L)) === 1
    }.reduce(_ && _))
  }

  /** One-row certification summary of Bloom decontamination vs the exact
    * broadcast-join path on the same corpus/benchmark:
    *  - `n_docs`, `n_exact` — corpus size and exactly-contaminated count
    *    (both replayed by the SQL oracle);
    *  - `no_false_neg` — every exactly-contaminated doc is Bloom-flagged
    *    (the Bloom guarantee; false would mean build/probe hash mismatch);
    *  - `fp_ok` — false positives ≤ `fpBoundPermille` of clean docs.
    * The flags are genuine invariants of the implementation, certified the
    * q25/q50 way: the Spark side computes them from data, the oracle pins
    * them true. */
  def bloomFlags(corpus: DataFrame, bench: DataFrame,
      params: BloomParams = BloomParams(),
      fpBoundPermille: Long = 50L): DataFrame = {
    val bits = bloomBuild(bench, params)
    val probed = corpus.select(col("id"),
      bloomHitCol(col("codes"), bits, params).as("bloom_hit"))
    val exact = flags(corpus, bench)
      .select(col("doc_id").as("id"), col("contaminated"))
    probed.join(exact, Seq("id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contaminated")).as("n_exact"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom"),
        min(when(col("contaminated") === 1L && !col("bloom_hit"), 0L)
          .otherwise(1L)).as("nfn"),
        sum(when(col("bloom_hit") && col("contaminated") === 0L, 1L)
          .otherwise(0L)).as("n_fp"))
      .select(col("n_docs"), col("n_exact"),
        (col("nfn") === 1L).as("no_false_neg"),
        (col("n_fp") * 1000L <=
          lit(fpBoundPermille) * greatest(col("n_docs") - col("n_exact"),
            lit(1L))).as("fp_ok"))
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
