package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines: exact key dedup,
  * n-gram Jaccard similarity join, MinHash+LSH, SimHash, and embedding-cosine
  * near-dup (exact + random-hyperplane LSH). All shuffles are on
  * key/shingle/bucket — never a full cross join at scale (the exact-pair
  * variants exist as oracles for the bucketed paths). */
object Dedup {

  // ---- exact -----------------------------------------------------------

  /** Group by a derived key; keep the minimum id as the canonical row.
    * Output: (key, keep_id, cnt). One shuffle on the key — at 100 TB this is
    * the standard hash-dedup, map-side partial aggregation applies. */
  def exactByKey(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("cnt"))

  // ---- n-gram machinery ------------------------------------------------

  /** Distinct word n-grams of a token array, joined with '_'. */
  def wordNGrams(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws("_", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(grams))
  }

  /** Distinct numeric 2-gram shingle codes (MinHash input):
    * code = tokenCode(t_i)·100003 + tokenCode(t_{i+1}). */
  def shingleCodes2(toks: Column): Column = {
    def code(t: Column) = TextAnalysis.tokenCode(t)
    val grams = transform(sequence(lit(1), size(toks) - lit(1)),
      i => code(element_at(toks, i)) * lit(100003L) +
        code(element_at(toks, i + lit(1))))
    when(size(toks) < 2, array().cast("array<bigint>"))
      .otherwise(array_distinct(grams))
  }

  /** (doc_id, text) → (id, codes): distinct n-gram shingle codes computed
    * in one JVM pass (Horner fold base 100003, identical arithmetic to
    * shingleCodes2 / the oracle at n=2). The shingle ORDER is the density
    * lever for the prefix join: on single-script corpora whose 2-gram
    * space is dense (every shingle common, prefix filter can't prune —
    * SCALE.md "Dedup at scale"), n=3 re-sparsifies the space and restores
    * the pruning. tokenCode ≤ ~1.1e8 and base 100003² ≈ 1e10 keep n=3
    * inside Long range. */
  def shingleCodeTable(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", n: Int = 2): DataFrame = {
    require(n == 2 || n == 3, s"shingle order $n not in {2, 3}")
    val spark = docs.sparkSession
    import spark.implicits._
    val order = n
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, shingleCodesOf(text, order)) }
      .toDF("id", "codes")
  }

  /** Row kernel behind [[shingleCodeTable]]: the distinct n-gram Horner
    * codes of one text, insertion-ordered. Shared by the streaming twin so
    * stream and batch signatures are bit-identical. */
  def shingleCodesOf(text: String, n: Int): Seq[Long] = {
    val toks = text.split(" ", -1)
    @inline def tc(t: String): Long =
      (if (t.isEmpty) 0L else t.codePointAt(0).toLong) * 100L + t.length
    val codes = new java.util.LinkedHashSet[Long]()
    var i = 0
    while (i < toks.length - (n - 1)) {
      var c = tc(toks(i))
      var j = 1
      while (j < n) { c = c * 100003L + tc(toks(i + j)); j += 1 }
      codes.add(c)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    codes.asScala.toSeq
  }

  /** Prefix-filtered Jaccard join (ppjoin-lite) — the 100 TB path. Each doc
    * indexes only its `|d| - ceil(t·|d|) + 1` globally-rarest shingles
    * (ordered by document frequency, then code): any pair with J ≥ t must
    * collide inside these prefixes, so the inverted index skips the hot
    * shingles that dominate the naive join. Candidates are then verified with
    * the exact Jaccard over the full sets.
    * Input: docs(id, grams). Output: (doc_a, doc_b), doc_a < doc_b. */
  /** Vocabularies at or below this size get the bitset verify: the whole
    * dictionary broadcasts in KBs, each doc's set packs into ≤ 512 bytes,
    * and the candidate check is a codegen'd AND+popcount instead of a
    * per-pair hash intersection (measured 2.9× on the verify stage when a
    * tiny vocabulary makes the candidate set near-quadratic). */
  val BitsetVocabMax = 4096

  /** Corpus-size cap for the FULL bitset all-pairs sweep: up to this many
    * docs, small-vocab inputs skip the prefix machinery entirely (the
    * broadcast is ≤ ~100k × 512 B). Above it, small-vocab inputs still get
    * prefix candidates with the bitset verify. */
  val BitsetDocsMax = 100000L

  def jaccardPairsPrefix(docs: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val inv = docs.select(col("id"), explode(col("grams")).as("g"))
    val dfreq = inv.groupBy("g").agg(count(lit(1)).as("df")).cache()
    val sz = docs.select(col("id"), size(col("grams")).as("sz"))
    // The bitset paths dictionary-encode gram codes — only valid for
    // integral gram types (string n-grams take the array_intersect verify).
    val integralGrams = docs.schema("grams").dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => et match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      case _ => false
    }
    // cheap small-vocab gate: a bounded sample can prove the vocabulary
    // LARGE without aggregating the corpus; only when the sample stays under
    // the cap do we pay the exact distinct count (at 100 TB the sample
    // overflows the cap and exits without a full scan)
    val smallVocab = integralGrams &&
      inv.select("g").limit(65536).distinct().count() <= BitsetVocabMax &&
      dfreq.count() <= BitsetVocabMax
    // Dense-vocab small corpus: prefix filtering cannot prune (JaccardProfile
    // measured 7.9M candidates from 5k docs at 753 distinct shingles — the
    // candidate shuffle IS the cost), so skip it wholesale and run the
    // blocked bitset all-pairs sweep (proven ≡ in DedupTextSpec). Bounded:
    // the doc-count probe pays limit(cap+1) rows, never a full count at
    // scale, and only after smallVocab already held.
    if (smallVocab &&
        docs.select("id").limit(BitsetDocsMax.toInt + 1).count()
          <= BitsetDocsMax) {
      dfreq.unpersist(false)
      return jaccardPairsBitset(docs, threshold)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("g"))
    // prefix length with integer arithmetic: sz - ceil(t*sz) + 1 for t=1/2^k
    // generalized: ceil(t*sz) computed on doubles is exact for t with short
    // binary expansions; keep double ceil (same in DuckDB)
    // cached: the self-join consumes the prefix index twice and would
    // otherwise recompute the explode + document-frequency aggregate + rank
    // window once per branch (measured 39 s → 2 s at 5k docs without/with)
    val pref = inv.join(dfreq, "g").join(sz, "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("id", "g", "sz", "rn")
      .cache()
    // ppjoin prunes on top of the prefix match, both evaluated inside the
    // equi-join before the distinct (so pruned pairs never shuffle):
    // - length filter: J ≥ t forces t·sz_a ≤ sz_b ≤ sz_a/t
    // - positional filter: all common grams sit at rank ≥ rn in each doc's
    //   (df, g)-sorted list, so overlap ≤ 1 + min(sz−rn); a qualifying pair
    //   needs overlap ≥ t/(1+t)·(sz_a+sz_b), and at the pair's FIRST common
    //   prefix gram the bound is loosest — any J ≥ t pair survives there,
    //   so filtering per match then distinct keeps a superset of true pairs
    val minOverlap =
      ceil(lit(threshold / (1 + threshold)) * (col("x.sz") + col("y.sz")))
    val cand = pref.as("x").join(pref.as("y"),
        col("x.g") === col("y.g") && col("x.id") < col("y.id") &&
        lit(threshold) * col("x.sz") <= col("y.sz") &&
        lit(threshold) * col("y.sz") <= col("x.sz") &&
        least(col("x.sz") - col("x.rn"), col("y.sz") - col("y.rn")) + 1 >=
          minOverlap)
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .distinct()
    val verified = if (smallVocab) {
      // small shingle universe: prefix filtering cannot prune (every
      // "rare" shingle is still common), so the candidate set is
      // near-quadratic and verify dominates — dictionary-encode sets into
      // broadcast-indexed bitsets and verify with AND+popcount
      val dict = dfreq.select("g").collect()
        .map(_.get(0).asInstanceOf[Number].longValue).sorted
        .zipWithIndex.toMap
      val words = (dict.size + 63) / 64
      val bcDict = spark.sparkContext.broadcast(dict)
      val bits = docs
        .select(col("id").cast("long"), col("grams").cast("array<bigint>"))
        .as[(Long, Seq[Long])]
        .map { case (id, gs) =>
          val arr = new Array[Long](words)
          gs.foreach { c =>
            val i = bcDict.value(c); arr(i >> 6) |= 1L << (i & 63) }
          (id, arr)
        }.toDF("id", "bits")
      val sza = sz.select(col("id").as("doc_a"), col("sz").as("sza"))
      val szb = sz.select(col("id").as("doc_b"), col("sz").as("szb"))
      val ba = bits.select(col("id").as("doc_a"), col("bits").as("ba"))
      val bb = bits.select(col("id").as("doc_b"), col("bits").as("bb"))
      val cCol = org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.BitsetIntersectCount(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("ba")),
          org.apache.spark.sql.graftbridge.Bridge.expression(col("bb"))))
      cand.join(ba, "doc_a").join(bb, "doc_b")
        .join(sza, "doc_a").join(szb, "doc_b")
        .withColumn("c", cCol)
        .filter(col("c").cast("double") /
          (col("sza") + col("szb") - col("c")) >= threshold)
        .select("doc_a", "doc_b")
    } else {
      val ga = docs.select(col("id").as("doc_a"), col("grams").as("gs_a"))
      val gb = docs.select(col("id").as("doc_b"), col("grams").as("gs_b"))
      cand.join(ga, "doc_a").join(gb, "doc_b")
        .withColumn("c", size(array_intersect(col("gs_a"), col("gs_b"))))
        .filter(col("c").cast("double") /
          (size(col("gs_a")) + size(col("gs_b")) - col("c")) >= threshold)
        .select("doc_a", "doc_b")
    }
    // Materialize the (duplicate-pair-sized, i.e. small) result so the
    // builder caches can be freed — repeated calls would otherwise
    // accumulate cached dfreq/pref partitions in executor storage. An eager
    // local checkpoint truncates the lineage on the executors, so the input
    // caches can be dropped without a driver round-trip.
    val out = verified.localCheckpoint(eager = true)
    dfreq.unpersist(false)
    pref.unpersist(false)
    out
  }

  /** Exact all-pairs Jaccard for small-to-medium corpora with a *small
    * shingle universe* (where prefix filtering cannot prune): dictionary-
    * encode shingles into bitsets, broadcast, and sweep pair blocks with
    * AND+popcount — ~10⁸ word-ops/s per core. Distributed over row blocks;
    * the broadcast must fit in executor memory (fine to ~100k docs × small
    * vocab). For web-scale corpora use jaccardPairsPrefix / minhashLshPairs.
    * Input: docs(id, grams). Output: (doc_a, doc_b), doc_a < doc_b. */
  def jaccardPairsBitset(docs: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val local = docs.select(col("id").cast("long"),
        col("grams").cast("array<bigint>"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    val dict = scala.collection.mutable.HashMap[Long, Int]()
    local.foreach(_._2.foreach(c => dict.getOrElseUpdate(c, dict.size)))
    val words = (dict.size + 63) / 64
    val ids = local.map(_._1)
    val sizes = local.map(_._2.distinct.length)
    val bits = local.map { case (_, cs) =>
      val b = new Array[Long](words)
      cs.foreach { c => val i = dict(c); b(i >> 6) |= 1L << (i & 63) }
      b
    }
    val bc = spark.sparkContext.broadcast((ids, sizes, bits))
    val n = ids.length
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { iter =>
        val (ids, sizes, bits) = bc.value
        iter.flatMap { ii =>
          val i = ii.toInt
          val bi = bits(i)
          (i + 1 until ids.length).iterator.flatMap { j =>
            val bj = bits(j)
            var c = 0
            var w = 0
            while (w < bi.length) {
              c += java.lang.Long.bitCount(bi(w) & bj(w)); w += 1
            }
            val jac = c.toDouble / (sizes(i) + sizes(j) - c)
            if (jac >= threshold) Iterator.single((ids(i), ids(j))) else Iterator.empty
          }
        }
      }.toDF("doc_a", "doc_b")
  }

  /** Jaccard similarity join via inverted index: explode shingles, equi-join
    * on the shingle, count shared per pair, filter by threshold. The join key
    * is the shingle — no cross join; skewed (ultra-common) shingles should be
    * frequency-capped upstream at extreme scale.
    * Input: docs(id, grams). Output: (doc_a, doc_b), doc_a < doc_b. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sizes = docs.select(col("id"), size(col("grams")).as("sz"))
    val inv = docs.select(col("id"), explode(col("grams")).as("g"))
    val shared = inv.as("x").join(inv.as("y"),
        col("x.g") === col("y.g") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sizes.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("sz", "szb"), "doc_b")
      .filter(col("c").cast("double") / (col("sza") + col("szb") - col("c"))
        >= threshold)
      .select("doc_a", "doc_b")
  }

  // ---- MinHash + LSH -----------------------------------------------------

  val MinhashP = 2147483647L
  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand: Int = NumHashes / NumBands

  /** Deterministic affine hash parameters (a_i, b_i), identical in oracle. */
  val minhashParams: Seq[(Long, Long)] = (0 until NumHashes).map { i =>
    val a = ((1103515245L * (i + 1) + 12345L) % (MinhashP - 1)) + 1L
    val b = (69069L * (i + 1) + 1L) % MinhashP
    (a, b)
  }

  /** docs(id, codes) → (id, sigs ARRAY<BIGINT>[H]) via a typed-map JVM kernel
    * (Spark higher-order functions evaluate interpreted — the kernel keeps
    * minhashing a cheap single pass; arithmetic identical to the oracle). */
  def minhashSigTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("id").cast("long"), col("codes").cast("array<bigint>"))
      .as[(Long, Seq[Long])]
      .map { case (id, cs) => (id, minhashSigsOf(cs).toSeq) }
      .toDF("doc_id", "sigs")
  }

  /** Row kernel behind [[minhashSigTable]]: the H minhash values of one
    * shingle-code set (affine hashes mod MinhashP, min-folded). Shared by
    * the streaming twin. */
  def minhashSigsOf(cs: Seq[Long]): Array[Long] = {
    val params = minhashParams.toArray
    val p = MinhashP
    val sigs = Array.fill(params.length)(Long.MaxValue)
    cs.foreach { c =>
      var i = 0
      while (i < params.length) {
        val (a, b) = params(i)
        val v = (a * c + b) % p
        if (v < sigs(i)) sigs(i) = v
        i += 1
      }
    }
    sigs
  }

  /** docs(id, codes) → exploded (doc_id, i, sig) signature table. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSigTable(docs)
      .select(col("doc_id"), posexplode(col("sigs")))
      .select(col("doc_id"), col("pos").cast("long").as("i"),
        col("col").as("sig"))

  /** docs(id, codes) → (id, band, key): each doc's NumBands LSH band keys
    * (band = RowsPerBand consecutive sigs, '_'-joined). The shared keying
    * behind the pair join and the fuzzy-decontamination semi-join. */
  def minhashBandKeys(docs: DataFrame): DataFrame = {
    val sigs = minhashSigTable(docs)
    (0 until NumBands).map { j =>
      val keyCols = (1 to RowsPerBand)
        .map(r => element_at(col("sigs"), j * RowsPerBand + r))
      sigs.select(col("doc_id").as("id"), lit(j).as("band"),
        concat_ws("_", keyCols: _*).as("key"))
    }.reduce(_ unionAll _)
  }

  /** LSH candidate pairs: docs sharing any band (band = RowsPerBand
    * consecutive sigs). The only shuffle is on (band, key) — the classic
    * scale path. */
  def minhashLshPairs(docs: DataFrame): DataFrame = {
    val bands = minhashBandKeys(docs)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .distinct()
  }

  /** Multi-probe MinHash-LSH: candidate pairs are docs agreeing on every
    * signature row of some band EXCEPT one — the leave-one-out band keys,
    * the minhash analog of the single-plane bucket flips in
    * [[embeddingNearDupLshMultiProbe]]. A pair with Jaccard s collides on
    * a probe with probability s^(r−1) instead of s^r, lifting
    * near-threshold recall with the SAME signature table and the same
    * (probe, key) equi-join shape — no new hash passes, no cross join;
    * keys per doc grow from b to b·r. Any full-band agreement implies
    * agreement on each of its leave-one-out keys, so the output is a
    * strict superset of [[minhashLshPairs]] (spec'd). */
  def minhashLshPairsMultiProbe(docs: DataFrame): DataFrame = {
    val sigs = minhashSigTable(docs)
    val keys = (for { j <- 0 until NumBands; l <- 0 until RowsPerBand }
      yield {
        val keyCols = (0 until RowsPerBand).filter(_ != l)
          .map(r => element_at(col("sigs"), j * RowsPerBand + r + 1))
        sigs.select(col("doc_id").as("id"),
          lit(j * RowsPerBand + l).as("probe"),
          concat_ws("_", keyCols: _*).as("key"))
      }).reduce(_ unionAll _)
    keys.as("x").join(keys.as("y"),
        col("x.probe") === col("y.probe") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .distinct()
  }

  // ---- SimHash -----------------------------------------------------------

  val SimhashBits = 16
  val SimhashMult = 40503L
  val SimhashMod = 65536L

  /** 16-bit SimHash over the (frequency-weighted) token stream: per-bit
    * majority vote of token hashes. docs(doc_id, toks) → (doc_id, simhash). */
  def simhash(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"),
        (TextAnalysis.tokenCode(col("t")) * lit(SimhashMult) % lit(SimhashMod))
          .as("hv"))
    val votes = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("hv"), j) % 2 === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val value = (0 until SimhashBits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    h.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), value.cast("long").as("simhash"))
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ maxHamming.
    * Scale path is a banded equi-join (split the hash into `nBands` bit
    * bands; by pigeonhole any pair within `nBands − 1` hamming shares one
    * exact band), then the exact popcount filter on the candidates — the
    * same band-then-verify shape as MinHash-LSH. Requires
    * `nBands > maxHamming` for losslessness. */
  def simhashPairs(docs: DataFrame, maxHamming: Int, nBands: Int)
      : DataFrame =
    bandedHammingPairs(simhash(docs), SimhashBits, maxHamming, nBands)

  /** Pigeonhole band join + popcount verify over any (doc_id, simhash)
    * table with `bits` significant bits — shared by the 16-bit and wide
    * variants. */
  private def bandedHammingPairs(sh: DataFrame, bits: Int, maxHamming: Int,
                                 nBands: Int): DataFrame = {
    require(nBands > maxHamming, "need nBands > maxHamming (pigeonhole)")
    require(bits % nBands == 0, s"$nBands bands must divide $bits bits")
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))
            .as("key"))
      }: _*)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk.band") === col("b.bk.band") &&
          col("a.bk.key") === col("b.bk.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
      .filter(expr("bit_count(ha ^ hb)") <= maxHamming)
      .select("doc_a", "doc_b")
  }

  // ---- wide SimHash (the scale twin) ---------------------------------------

  /** 60-bit SimHash: four 15-bit sub-hashes with distinct multipliers,
    * concatenated. 2^60 hash space removes the 16-bit variant's saturation
    * (DedupBench measures the hamming-ball blowup past ~20k docs), while
    * every per-token hash stays small modular arithmetic the DuckDB oracle
    * replays exactly — same certification contract as [[simhash]], 60 vote
    * columns instead of 16. */
  val SimhashWideSubBits = 15
  val SimhashWideSubMod = 1L << SimhashWideSubBits
  val SimhashWideMults = Seq(40503L, 48271L, 69621L, 16807L)
  val SimhashWideBits: Int = SimhashWideSubBits * SimhashWideMults.length

  /** docs(doc_id, toks) → (doc_id, simhash) with 60 significant bits. */
  def simhashWide(docs: DataFrame): DataFrame = {
    val hvs = SimhashWideMults.zipWithIndex.map { case (m, k) =>
      (TextAnalysis.tokenCode(col("t")) * lit(m) % lit(SimhashWideSubMod))
        .as(s"hv$k")
    }
    val h = docs.select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id") +: hvs: _*)
    val votes = (0 until SimhashWideBits).map { j =>
      val k = j / SimhashWideSubBits
      val jj = j % SimhashWideSubBits
      sum(when(shiftright(col(s"hv$k"), jj) % 2 === 1, 1).otherwise(-1))
        .as(s"s$j")
    }
    // bits are disjoint, so the sum never exceeds 2^60 — no overflow
    val value = (0 until SimhashWideBits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    h.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), value.cast("long").as("simhash"))
  }

  /** Wide-SimHash near-dup pairs — the banded pigeonhole join over the
    * 60-bit hashes; nBands must divide 60 (e.g. 4 bands × 15 bits for
    * maxHamming ≤ 3). */
  def simhashWidePairs(docs: DataFrame, maxHamming: Int, nBands: Int)
      : DataFrame =
    bandedHammingPairs(simhashWide(docs), SimhashWideBits, maxHamming, nBands)

  // ---- embedding near-dup --------------------------------------------------

  /** Exact cosine near-dup pairs (oracle / small-N path): full self-join.
    * data(id, vec) → (id_a, id_b) with cosine ≥ threshold, id_a < id_b. */
  def embeddingNearDupExact(data: DataFrame, threshold: Double): DataFrame =
    data.as("x").join(data.as("y"), col("x.id") < col("y.id"))
      .filter(VectorFunctions.cosineSimilarity(col("x.vec"), col("y.vec"))
        >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))

  /** Random-hyperplane LSH bucket id: bit i = [dot(vec, plane_i) > 0].
    * planes: (power-of-two weight, plane vector) literals. */
  def hyperplaneBucket(vec: Column, planes: Seq[(Long, Seq[Double])]): Column =
    planes.map { case (pw, pvec) =>
      when(VectorFunctions.innerProduct(vec, typedlit(pvec)) > 0, lit(pw))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-dup: only same-bucket pairs are compared — the scale
    * path (bucket join instead of cross join); recall < 1 by construction. */
  def embeddingNearDupLsh(data: DataFrame, planes: Seq[(Long, Seq[Double])],
                          threshold: Double): DataFrame = {
    val b = data.withColumn("bucket", hyperplaneBucket(col("vec"), planes))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .filter(VectorFunctions.cosineSimilarity(col("x.vec"), col("y.vec"))
        >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
  }

  /** Multi-probe LSH near-dup: one side additionally probes every
    * single-plane flip of its bucket, so any pair whose hyperplane signs
    * differ on AT MOST ONE plane is compared — recall strictly contains the
    * single-bucket join's (near-dups that straddle one boundary are the
    * common miss) at (nPlanes+1)× the candidate volume, still a plain
    * bucket equi-join: one shuffle, no cross product. Each qualifying pair
    * matches exactly one probe (flip values are distinct powers of two),
    * so no dedup pass is needed. */
  def embeddingNearDupLshMultiProbe(data: DataFrame,
                                    planes: Seq[(Long, Seq[Double])],
                                    threshold: Double): DataFrame = {
    val b = data.withColumn("bucket", hyperplaneBucket(col("vec"), planes))
    val probes = b.select(col("id"), col("vec"),
        explode(array((lit(0L) +: planes.map(p => lit(p._1))): _*)).as("flip"),
        col("bucket"))
      .select(col("id"), col("vec"),
        col("bucket").bitwiseXOR(col("flip")).as("probe"))
    b.as("x").join(probes.as("y"),
        col("x.bucket") === col("y.probe") && col("x.id") < col("y.id"))
      .filter(VectorFunctions.cosineSimilarity(col("x.vec"), col("y.vec"))
        >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup — the
    * k-means partition turns the quadratic cosine comparison into
    * per-cluster blocks, the standard way the embedding-dedup stage of a
    * pretraining pipeline survives web scale (cross-cluster near-dups are
    * the accepted recall loss; centroid count tunes block size). Within a
    * cluster a doc is a semantic duplicate when some SMALLER-id cluster-mate
    * has cosine ≥ threshold ("keep first" — deterministic, order-free).
    *
    * Output per doc: (id, cluster_id, dup_of, keep) with dup_of the minimum
    * such partner id (−1 when none) and keep = [dup_of = −1].
    *
    * 100 TB shape: assignment is a codegen'd map over the scan
    * ([[KMeans.assignColumn]], centroid literals broadcast in the closure);
    * the only shuffle keys on cluster_id. Per-cluster work is
    * (n/K)²·d — K grows with the corpus to hold block size constant, and a
    * hot cluster is exactly the skew-join case AQE splits. */
  def semanticDedup(data: DataFrame, centroids: Seq[(Long, Seq[Double])],
                    threshold: Double): DataFrame = {
    val a = data.select(col("id"), col("vec"),
      KMeans.assignColumn(col("vec"), centroids).as("cluster_id"))
    val dup = a.as("x").join(a.as("y"),
        col("x.cluster_id") === col("y.cluster_id") &&
          col("y.id") < col("x.id") &&
          VectorFunctions.cosineSimilarity(col("x.vec"), col("y.vec"))
            >= threshold)
      .groupBy(col("x.id").as("id")).agg(min(col("y.id")).as("dup_of"))
    a.select("id", "cluster_id").join(dup, Seq("id"), "left")
      .select(col("id"), col("cluster_id"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        when(col("dup_of").isNull, 1L).otherwise(0L).as("keep"))
  }
}
