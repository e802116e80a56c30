package graft

import org.apache.spark.sql.functions._
import graft.operators.LmScore

class LmSpec extends SparkSpec {

  private def corpusDF(docs: Seq[String]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** Scala reference: bigram counts and per-doc ordered mean probability. */
  private def refScores(docs: Seq[String]): Map[Long, Long] = {
    val pairs = docs.flatMap { t =>
      val w = t.split(" ").filter(_.nonEmpty)
      w.zip(w.tail)
    }
    val c2 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    docs.zipWithIndex.flatMap { case (t, i) =>
      val w = t.split(" ").filter(_.nonEmpty)
      val ps = w.zip(w.tail).map(p => c2(p).toDouble / c1(p._1))
      if (ps.isEmpty) None
      else {
        var acc = 0.0
        ps.foreach(acc += _) // ordered left fold, like the operator
        Some(i.toLong ->
          math.floor(LmScore.ScoreScale.toDouble * acc / ps.length).toLong)
      }
    }.toMap
  }

  test("scoreMeanProb matches the reference ordered-fold arithmetic") {
    val docs = Seq(
      "the cat sat on the mat",
      "the cat ran",
      "a dog sat on a log",
      "the the the the",       // repeated bigram, p = 1 within 'the the'
      "solo")                  // single token: no row
    val df = corpusDF(docs)
    val (bg, ug) = LmScore.trainBigrams(df)
    val got = LmScore.scoreMeanProb(df, bg, ug).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refScores(docs))
    assert(!got.contains(4L)) // single-token doc emits no row
  }

  test("self-trained corpus of one repeated doc scores probability 1") {
    val docs = Seq.fill(5)("alpha beta gamma alpha beta")
    val df = corpusDF(docs)
    val (bg, ug) = LmScore.trainBigrams(df)
    val scores = LmScore.scoreMeanProb(df, bg, ug).collect()
    // every transition is deterministic except alpha -> {beta, beta, ...}:
    // all alpha transitions go to beta, gamma -> alpha always, beta ->
    // gamma half the time (beta ends the doc otherwise)... compute: the
    // reference fold is the ground truth; here just assert scores equal
    // across identical docs and within (0, 1e9]
    assert(scores.map(_.getLong(1)).distinct.length === 1)
    assert(scores.head.getLong(1) > 0L &&
      scores.head.getLong(1) <= LmScore.ScoreScale)
  }

  test("scoring a foreign corpus: unseen bigrams take probability 0 and " +
      "lower the mean") {
    val train = corpusDF(Seq("x y z x y", "x y x y"))
    val (bg, ug) = LmScore.trainBigrams(train)
    val eval = corpusDF(Seq("x y z", "q r s x y"))
    val got = LmScore.scoreMeanProb(eval, bg, ug).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) > got(1L)) // doc 1 is mostly unseen transitions
  }

  test("hashed-key scoring equals string-key scoring (the shuffle-width " +
      "lever)") {
    val docs = Seq(
      "the cat sat on the mat and the cat ran",
      "a dog sat on a log",
      "the dog and the cat sat",
      "mat log dog cat the a on the")
    val df = corpusDF(docs)
    val (bg, ug) = LmScore.trainBigrams(df)
    val (bgH, ugH) = LmScore.trainBigramsHashed(df)
    val str = LmScore.scoreMeanProb(df, bg, ug).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hsh = LmScore.scoreMeanProb(df, bgH, ugH, hashKeys = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hsh === str)
  }

  test("hashed-key scoring equals string-key scoring on the documents " +
      "corpus") {
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val (bg, ug) = LmScore.trainBigrams(docs)
    val (bgH, ugH) = LmScore.trainBigramsHashed(docs)
    val str = LmScore.scoreMeanProb(docs, bg, ug).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hsh = LmScore.scoreMeanProb(docs, bgH, ugH, hashKeys = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hsh === str)
  }

  test("interpolated score removes the hard zero on unseen bigrams and " +
      "degenerates correctly at lambda = 1 and 0") {
    val train = corpusDF(Seq("x y z x y", "x y x y z"))
    val (bg, ug) = LmScore.trainBigrams(train)
    val tu = LmScore.trainUnigrams(train)
    // doc 0: transition (z,z) never occurs in training; word z is known
    val eval = corpusDF(Seq("z z z", "x y z"))
    def scores(lambda: Double) =
      LmScore.scoreInterpolated(eval, bg, ug, tu, lambda).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lambda = 1: pure bigram — doc 0 (all unseen transitions) scores 0
    val pure = scores(1.0)
    assert(pure(0L) === 0L)
    assert(pure(1L) > 0L)
    // lambda = 0.75: unigram mass rescues doc 0 from zero
    val interp = scores(0.75)
    assert(interp(0L) > 0L)
    assert(interp(1L) > interp(0L)) // seen transitions still rank higher
    // lambda = 0: pure unigram — tokens x:4 y:4 z:2 of 10:
    // doc 0 transitions target z,z -> mean 0.2; doc 1 targets y,z -> 0.3
    val uni = scores(0.0)
    assert(uni(0L) === 200000000L)
    assert(uni(1L) === 300000000L)
  }

  test("ccnetBuckets: equal-mass head/middle/tail by score rank; " +
      "cutoff twin reproduces the exact-rank buckets") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val (bg, ug) = LmScore.trainBigrams(docs)
    val b = LmScore.ccnetBuckets(docs, bg, ug).cache()
    val rows = b.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byBucket = rows.groupBy(_._3)
    assert(byBucket.keySet === Set(0L, 1L, 2L))
    // equal mass within 1 doc
    val sizes = byBucket.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, sizes.toString)
    // bucket boundaries respect score order: min(head) >= max(middle) etc.
    assert(byBucket(0L).map(_._2).min >= byBucket(1L).map(_._2).max)
    assert(byBucket(1L).map(_._2).min >= byBucket(2L).map(_._2).max)
    // the 100 TB twin: cutoffs read off the exact buckets reproduce them
    // for every doc whose score is unambiguous (strictly between cuts);
    // on this corpus scores are distinct enough that all docs agree
    val c0 = byBucket(0L).map(_._2).min
    val c1 = byBucket(1L).map(_._2).min
    val viaCut = LmScore.bucketsByCutoffs(
        LmScore.scoreMeanProb(docs, bg, ug), Seq(c0, c1))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.foreach { case (id, _, bk) =>
      assert(viaCut(id) === bk, s"doc $id") }
    b.unpersist()
  }

  test("dsirWeights: target-domain docs score higher on average than " +
      "the rest; all-target degenerates to zero-mean-free ratios") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val (rbg, _) = LmScore.trainBigrams(docs)
    val (tbg, _) = LmScore.trainBigrams(docs.filter(col("doc_id") % 7 === 0))
    val w = LmScore.dsirWeights(docs, tbg, rbg).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (tgt, rest) = w.partition(_._1 % 7 == 0)
    val mTgt = tgt.map(_._2.toDouble).sum / tgt.length
    val mRest = rest.map(_._2.toDouble).sum / rest.length
    assert(mTgt > mRest,
      s"target mean $mTgt not above non-target mean $mRest")
    // target = raw => every term is ln(x) - ln(x) = 0 exactly
    val zero = LmScore.dsirWeights(docs, rbg, rbg).collect()
    assert(zero.forall(_.getLong(1) == 0L))
  }

  test("perplexity is strictly anti-monotone with mean log-prob on the " +
      "same model (transcendental variant, spec-certified)") {
    val docs = Seq(
      "the cat sat on the mat and the cat ran",
      "a dog sat on a log",
      "the dog and the cat",
      "mat log dog cat the a on")
    val df = corpusDF(docs)
    val (bg, ug) = LmScore.trainBigrams(df)
    val ppl = LmScore.perplexity(df, bg, ug).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference mean log-prob per doc
    val pairsAll = docs.flatMap { t =>
      val w = t.split(" ").filter(_.nonEmpty); w.zip(w.tail)
    }
    val c2 = pairsAll.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = pairsAll.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val meanLp = docs.zipWithIndex.map { case (t, i) =>
      val w = t.split(" ").filter(_.nonEmpty)
      val lps = w.zip(w.tail)
        .map(p => math.log(math.max(c2(p).toDouble / c1(p._1), 1e-9)))
      i.toLong -> lps.sum / lps.length
    }.toMap
    // higher mean log-prob <=> lower perplexity, exactly
    val ord = ppl.keys.toSeq.sorted
    for (a <- ord; b <- ord if a < b) {
      assert((meanLp(a) > meanLp(b)) === (ppl(a) < ppl(b)) ||
        meanLp(a) == meanLp(b))
    }
  }
}
