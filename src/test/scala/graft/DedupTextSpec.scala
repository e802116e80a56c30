package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}

class DedupTextSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sfDir, "documents").cache()

  private lazy val grams = docs.select(col("doc_id").as("id"),
    Dedup.wordNGrams(TextAnalysis.tokens(col("text")), 2).as("grams")).cache()

  private lazy val codes = docs.select(col("doc_id").as("id"),
    Dedup.shingleCodes2(TextAnalysis.tokens(col("text"))).as("codes")).cache()

  test("wordNGrams: counts and short-doc edge case") {
    import spark.implicits._
    val df = Seq("a b c d", "x", "").toDF("text")
      .select(Dedup.wordNGrams(TextAnalysis.tokens(col("text")), 2).as("g"))
    val sizes = df.select(size(col("g"))).as[Int].collect().toSeq
    assert(sizes == Seq(3, 0, 0))
  }

  test("langId returns a profile language for every doc") {
    import spark.implicits._
    val langs = docs.select(TextAnalysis.langId(col("text"))).as[String]
      .distinct().collect().toSet
    assert(langs.nonEmpty &&
      langs.subsetOf(TextAnalysis.langProfiles.map(_._1).toSet))
  }

  test("fingerprint: deterministic and mostly distinct") {
    import spark.implicits._
    val fps = docs.select(TextAnalysis.fingerprint(col("text"))).as[Long]
      .collect()
    assert(fps.distinct.length > fps.length * 9 / 10)
    val fps2 = docs.select(TextAnalysis.fingerprint(col("text"))).as[Long]
      .collect()
    assert(fps.toSeq == fps2.toSeq)
  }

  test("jaccard pairs found by inverted index match brute force") {
    import spark.implicits._
    val fast = Dedup.jaccardPairs(grams, 0.5)
      .as[(Long, Long)].collect().toSet
    // brute force on collected gram sets
    val local = grams.as[(Long, Seq[String])].collect()
    val slow = (for {
      (a, ga) <- local; (b, gb) <- local if a < b
      inter = ga.toSet.intersect(gb.toSet).size
      j = inter.toDouble / (ga.size + gb.size - inter)
      if j >= 0.5
    } yield (a, b)).toSet
    assert(fast == slow && fast.nonEmpty)
  }

  test("three jaccard implementations agree (inverted / prefix / bitset)") {
    import spark.implicits._
    val codes = Dedup.shingleCodeTable(docs)
      .withColumnRenamed("codes", "grams")
    val naive = Dedup.jaccardPairs(codes, 0.5).as[(Long, Long)].collect().toSet
    val prefix = Dedup.jaccardPairsPrefix(codes, 0.5)
      .as[(Long, Long)].collect().toSet
    val bitset = Dedup.jaccardPairsBitset(codes, 0.5)
      .as[(Long, Long)].collect().toSet
    assert(naive == prefix && naive == bitset && naive.nonEmpty)
  }

  test("prefix join accepts string grams with a tiny vocabulary " +
      "(bitset dictionary-encode must not fire on non-integral grams)") {
    import spark.implicits._
    // ~20 distinct string grams over 60 docs — well under BitsetVocabMax,
    // so an element-type-blind small-vocab gate would ClassCastException
    val vocab = ('a' to 't').map(c => s"w_$c")
    val sdocs = (0L until 60L).map { i =>
      val gs = (0 until 6).map(j => vocab(((i % 7) + j * 3).toInt % vocab.size))
      (i, gs.distinct)
    }.toDF("id", "grams")
    val prefix = Dedup.jaccardPairsPrefix(sdocs, 0.5)
      .as[(Long, Long)].collect().toSet
    val naive = Dedup.jaccardPairs(sdocs, 0.5)
      .as[(Long, Long)].collect().toSet
    assert(prefix === naive && prefix.nonEmpty)
  }

  test("prefix join with string grams from real documents matches the " +
      "inverted-index join") {
    import spark.implicits._
    val prefix = Dedup.jaccardPairsPrefix(grams, 0.5)
      .as[(Long, Long)].collect().toSet
    val naive = Dedup.jaccardPairs(grams, 0.5).as[(Long, Long)].collect().toSet
    assert(prefix === naive && prefix.nonEmpty)
  }

  test("shingleCodeTable kernel matches the Column-expression form") {
    import spark.implicits._
    val kernel = Dedup.shingleCodeTable(docs)
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    val expr = docs.select(col("doc_id"),
        Dedup.shingleCodes2(TextAnalysis.tokens(col("text"))).as("c"))
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    assert(kernel == expr)
  }

  test("minhash LSH candidates cover most true near-dup pairs") {
    import spark.implicits._
    val truth = Dedup.jaccardPairs(grams, 0.5).as[(Long, Long)].collect().toSet
    val cand = Dedup.minhashLshPairs(codes).as[(Long, Long)].collect().toSet
    val covered = truth.intersect(cand).size
    assert(covered >= truth.size * 7 / 10,
      s"LSH covered $covered of ${truth.size} true pairs")
  }

  test("simhash: near-dup pairs closer in hamming than random pairs") {
    import spark.implicits._
    val sh = Dedup.simhash(docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("toks")))
      .as[(Long, Long)].collect().toMap
    val dups = Dedup.jaccardPairs(grams, 0.5).as[(Long, Long)].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupAvg = dups.map { case (a, b) => ham(sh(a), sh(b)) }.sum.toDouble /
      dups.length
    val ids = sh.keys.toSeq.sorted.take(60)
    val rnd = for (a <- ids; b <- ids if a < b) yield ham(sh(a), sh(b))
    val rndAvg = rnd.sum.toDouble / rnd.length
    assert(dupAvg < rndAvg, s"dup=$dupAvg rnd=$rndAvg")
  }

  test("wide simhash: banded pairs equal brute-force hamming pairs, and " +
      "60 bits separate random docs the 16-bit hash cannot") {
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val sh = Dedup.simhashWide(toks).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // pigeonhole losslessness: banded join == brute force at maxHamming 3
    val banded = Dedup.simhashWidePairs(toks, maxHamming = 3, nBands = 4)
      .as[(Long, Long)].collect().toSet
    val ids = sh.keys.toSeq.sorted
    val brute = (for (a <- ids; b <- ids if a < b && ham(sh(a), sh(b)) <= 3)
      yield (a, b)).toSet
    assert(banded === brute)
    // every bit index 0..59 is populated somewhere (sub-hashes all live)
    val orAll = sh.values.reduce(_ | _)
    assert(java.lang.Long.bitCount(orAll) > 40, orAll.toBinaryString)
    assert((orAll >>> Dedup.SimhashWideBits) == 0, "bits above 60 set")
    // wide hashes separate random docs far better than 16-bit ones
    val sh16 = Dedup.simhash(toks).as[(Long, Long)].collect().toMap
    val sample = ids.take(50)
    val pairs = for (a <- sample; b <- sample if a < b) yield (a, b)
    val wideAvg = pairs.map { case (a, b) => ham(sh(a), sh(b)) }.sum.toDouble /
      pairs.length
    val narrowAvg = pairs.map { case (a, b) =>
      ham(sh16(a), sh16(b)) }.sum.toDouble / pairs.length
    assert(wideAvg > 2 * narrowAvg, s"wide=$wideAvg narrow=$narrowAvg")
  }

  test("embedding LSH near-dups are a subset of exact near-dups") {
    import spark.implicits._
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val planes = data.filter(col("id") % 125 === 0).collect()
      .map(r => (1L << (r.getLong(0) / 125).toInt) ->
        r.getSeq[Double](1).toIndexedSeq).toIndexedSeq.sortBy(_._1)
    val exact = Dedup.embeddingNearDupExact(data, 0.4)
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(data, planes, 0.4)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact) && lsh.nonEmpty && exact.nonEmpty)
    // multi-probe strictly widens the net: contains the single-bucket
    // pairs, stays within the exact set, emits no duplicate rows
    val mp = Dedup.embeddingNearDupLshMultiProbe(data, planes, 0.4)
      .as[(Long, Long)].collect()
    assert(mp.length == mp.toSet.size, "duplicate pair rows")
    assert(lsh.subsetOf(mp.toSet))
    assert(mp.toSet.subsetOf(exact))
    assert(mp.toSet.size > lsh.size,
      s"multi-probe (${mp.length}) should beat single-bucket (${lsh.size})")
  }

  test("exact dedup: keep_id is the min id and counts sum to total") {
    import spark.implicits._
    val toks = TextAnalysis.tokens(col("text"))
    val d = Dedup.exactByKey(docs,
      concat_ws(" ", element_at(toks, 1), element_at(toks, 2)), col("doc_id"))
    val total = d.agg(sum("cnt")).as[Long].head()
    assert(total == docs.count())
    assert(d.filter(col("cnt") > 1).count() > 0)
  }

  test("stratifiedSample: heap aggregate equals per-stratum window rank, " +
      "reproducible under repartition") {
    import spark.implicits._
    val n = 7
    val strata = TextAnalysis.langId(col("text"))
    val got = TextAnalysis.stratifiedSample(docs, strata, n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // reference semantics: global window rank within each stratum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(col("fp"), col("doc_id"))
    val ref = docs.select(col("doc_id").cast("long"),
        strata.as("stratum"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
      .select("stratum", "rnk", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(got === ref)
    assert(got.nonEmpty && got.map(_._1).distinct.length > 1,
      "expected several strata")
    // physical layout must not change the sample
    val reshuffled = TextAnalysis.stratifiedSample(
        docs.repartition(17), strata, n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(reshuffled === got)
  }

  test("multi-probe minhash pairs are a superset of single-band pairs " +
      "with higher candidate recall") {
    import spark.implicits._
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val single = pairSet(Dedup.minhashLshPairs(codes))
    val multi = pairSet(Dedup.minhashLshPairsMultiProbe(codes))
    assert(single.subsetOf(multi))
    assert(multi.size >= single.size)
  }

  test("Decontaminate.flags: bench docs self-flag; disjoint corpus clean") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1L, 2L, 3L)), (1L, Seq(4L, 5L)), (2L, Seq(3L, 9L)))
      .toDF("id", "codes")
    val bench = Seq((100L, Seq(3L, 7L))).toDF("id", "codes")
    val got = graft.operators.Decontaminate.flags(corpus, bench)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 0L, 0L), (2L, 1L, 1L)))
    // bench drawn from the corpus: flagged rows are a superset of bench ids
    val self = graft.operators.Decontaminate
      .flags(corpus, corpus.filter(col("id") === 0L))
    assert(self.filter(col("doc_id") === 0L && col("contaminated") === 1L)
      .count() == 1)
  }

  test("Decontaminate.fuzzyFlags: verbatim copy hits all bands; " +
      "exact gram-hit flags are a superset of fuzzy flags on the corpus") {
    import spark.implicits._
    // a corpus doc that IS a benchmark doc shares every minhash sig, so
    // every band key collides: band_hits == NumBands deterministically
    val bench = codes.filter(col("id") === 7L)
    val fuzzy = graft.operators.Decontaminate.fuzzyFlags(codes, bench)
    val self = fuzzy.filter(col("doc_id") === 7L).head()
    assert(self.getLong(1) == Dedup.NumBands.toLong &&
      self.getLong(2) == 1L)
    // a band collision needs RowsPerBand simultaneous sig matches — far
    // stronger evidence than sharing ONE gram, so fuzzy-flagged docs must
    // be a subset of the exact gram-hit flags against the same bench set
    val exact = graft.operators.Decontaminate.flags(codes, bench)
    val fuzzyIds = fuzzy.filter(col("contaminated") === 1L)
      .select("doc_id").as[Long].collect().toSet
    val exactIds = exact.filter(col("contaminated") === 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(fuzzyIds.subsetOf(exactIds), s"fuzzy-only: ${fuzzyIds -- exactIds}")
  }

  test("semanticDedup: keep-first within clusters, dups a subset of the " +
      "all-pairs near-dup set, verbatim copy always deduped") {
    import spark.implicits._
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val cents = vecs.filter(col("id") % 37 === 0 && col("id") < 296)
      .collect().map(r => (r.getLong(0) / 37, r.getSeq[Double](1).toIndexedSeq))
      .toIndexedSeq.sortBy(_._1)
    val out = graft.operators.Dedup.semanticDedup(vecs, cents, 0.4).cache()
    // every doc appears once; keep == [dup_of == -1]; dup_of < id when set
    assert(out.count() == vecs.count())
    assert(out.filter((col("keep") === 1L) =!= (col("dup_of") === -1L))
      .count() == 0)
    assert(out.filter(col("dup_of") =!= -1L && col("dup_of") >= col("id"))
      .count() == 0)
    // cluster blocking only LOSES pairs vs the exact all-pairs join, so
    // semantically-deduped ids must all be flagged by the exact join too
    val semDups = out.filter(col("keep") === 0L)
      .select("id").as[Long].collect().toSet
    val exactDups = graft.operators.Dedup
      .embeddingNearDupExact(vecs, 0.4)
      .select(col("id_b")).as[Long].collect().toSet
    assert(semDups.subsetOf(exactDups), s"sem-only: ${semDups -- exactDups}")
    // a verbatim copy lands in its original's cluster at cosine 1
    val copy = vecs.filter(col("id") === 11L)
      .select((col("id") + 100000L).as("id"), col("vec"))
    val withCopy = graft.operators.Dedup
      .semanticDedup(vecs.unionAll(copy), cents, 0.4)
    assert(withCopy.filter(col("id") === 100011L).head().getLong(3) == 0L)
    out.unpersist()
  }

  test("piiScan: counts and ordered redaction on hand-built text") {
    import spark.implicits._
    val in = Seq(
      (0L, "reach me at bob.smith@corp.example or 12-345-6789 ok"),
      (1L, "see https://a.b/c?x=1 and mail root@a.io"),
      (2L, "clean text only")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(in).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got(0) == (0L, 1L, 1L, 0L, "reach me at <EMAIL> or <PHONE> ok"))
    assert(got(1) == (1L, 1L, 0L, 1L, "see <URL> and mail <EMAIL>"))
    assert(got(2) == (2L, 0L, 0L, 0L, "clean text only"))
  }

  test("repetitionMetrics: hand-computed fractions and edge cases") {
    import spark.implicits._
    val in = Seq(
      (0L, "a a a a"),        // dup_tok 3/4=750; grams a_a x3 dup 2/3=666 top 3
      (1L, "a b c d"),        // all distinct: 0 / 0 / top 1
      (2L, "x"),              // single token: 0 / no grams -> 0 / 0
      (3L, "a b a b a")       // toks 5 distinct 2 -> 600; grams a_b,b_a,a_b,b_a -> 500, top 2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(in).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, 750L, 666L, 3L),
      (1L, 0L, 0L, 1L),
      (2L, 0L, 0L, 0L),
      (3L, 600L, 500L, 2L)))
  }
}
