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
    * Defaults give ~0.2% theoretical per-GRAM FP at 10k distinct benchmark
    * grams. SIZING FOR DOC-LEVEL FLAGS: a document is flagged when ANY of
    * its G grams hits, so the per-doc FP is 1−(1−p)^G ≈ G·p — budget the
    * per-gram rate at docFp/G (e.g. G≈128 grams/doc and a 1% doc budget
    * needs p ≈ 10⁻⁴ → ~32 bits/gram, k=5). Use [[BloomParams.forGrams]]
    * rather than hand-picking (the 1M-doc PipelineBench run with the
    * per-gram default at a 7.7M-gram benchmark flagged ~90% of clean docs
    * — measured, which is why this note exists). */
  final case class BloomParams(mBits: Int = 1 << 17, k: Int = 4,
      seed: Long = 1L) {
    require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    require(k >= 1 && k <= 8, "k in [1, 8]")
    val words: Int = mBits / 64
  }

  object BloomParams {
    /** Size for doc-level flag semantics: ≥ `bitsPerGram` bits per
      * distinct benchmark gram (next power of two, capped at 2^30 =
      * 128 MB), k = 5. 32 bits/gram ⇒ per-gram FP ~1e-4 ⇒ sub-percent
      * per-doc FP at ~100-gram documents. */
    def forGrams(nGrams: Long, bitsPerGram: Int = 32, k: Int = 5,
        seed: Long = 1L): BloomParams = {
      var m = 1L << 12
      while (m < nGrams * bitsPerGram && m < (1L << 30)) m <<= 1
      BloomParams(m.toInt, k, seed)
    }
  }

  /** Probe positions use REAL avalanche hashing (XXH64) with
    * Kirsch–Mitzenmacher double hashing: pos_i = (h1 + i·h2) mod m over
    * two independently-seeded XXH64 values. Lehmer-style modular mixes —
    * one round, per-probe addends, per-probe multipliers, two rounds — all
    * failed empirically here: shingle codes are Horner folds, so the gram
    * population lives on an arithmetic lattice that multiplicative-
    * congruential maps carry onto correlated positions, and the measured
    * FP rate at a 7.7M-gram benchmark stayed ~100× above the
    * (1−e^{−kn/m})^k theory (PipelineBench, 1M docs). XXH64's xor-shift-
    * multiply rounds destroy the lattice; KM double hashing provably
    * preserves Bloom asymptotics with just two base hashes. The probe hash
    * needs NO SQL replay (the oracle pins invariant flags and replays only
    * exact counts), so a non-modular hash is free; JVM and Column sides
    * call the same engine XXH64 (`XxHash64Function` / `xxhash64`). */
  private val ProbeSeedDelta = 1000003L

  @inline private def xxh(g: Long, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      g, org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        seed, org.apache.spark.sql.types.LongType, 42L))

  @inline private def probePos(g: Long, i: Int, p: BloomParams): Int = {
    val h1 = Math.floorMod(xxh(g, p.seed), p.mBits.toLong)
    val h2 = Math.floorMod(xxh(g, p.seed + ProbeSeedDelta), p.mBits.toLong)
    ((h1 + i * h2) % p.mBits).toInt
  }

  private def probePosCol(g: Column, i: Int, p: BloomParams): Column = {
    val h1 = pmod(xxhash64(lit(p.seed), g), lit(p.mBits.toLong))
    val h2 = pmod(xxhash64(lit(p.seed + ProbeSeedDelta), g),
      lit(p.mBits.toLong))
    (h1 + lit(i.toLong) * h2) % lit(p.mBits.toLong)
  }

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
    * plan as one array literal. NOTE: fine for KB-scale filters and the
    * certification query, but Spark evaluates higher-order functions like
    * `exists` interpreted (outside whole-stage codegen), so at MB-scale
    * filters × 100M+ grams this path measured ~15× slower than the
    * [[bloomProbe]] kernel — use that for bulk probing. */
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

  /** Bulk membership probe: same probePos arithmetic as [[bloomHitCol]]
    * (bit-identical verdicts) evaluated by a tight JVM kernel over a
    * BROADCAST bit array — one map over the corpus, no shuffle, and the
    * filter ships once per executor instead of riding the plan as a
    * literal. The scale path: 1M docs × ~128 grams probed in ~2 s where
    * the Column form took 95 s (PipelineBench). */
  def bloomProbe(corpus: DataFrame, bits: Array[Long],
      params: BloomParams = BloomParams()): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bits)
    val p = params
    // Array[Long], not Seq[Long]: the primitive-array encoder reads the
    // tungsten array without per-element boxing (the boxing path measured
    // ~2× the whole probe cost at 1M docs × 128 grams)
    corpus.select(col("id").cast("long"), col("codes"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val b = bc.value
        it.map { case (id, codes) =>
          var hit = false
          var j = 0
          val n = codes.length
          while (j < n && !hit) {
            val g = codes(j)
            var ok = true
            var i = 0
            while (ok && i < p.k) {
              val pos = probePos(g, i, p)
              ok = (b(pos >> 6) >> (pos & 63) & 1L) == 1L
              i += 1
            }
            hit = ok
            j += 1
          }
          (id, hit)
        }
      }.toDF("id", "bloom_hit")
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
    val probed = bloomProbe(corpus, bits, params)
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
