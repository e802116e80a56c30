package graft

import org.scalacheck.Gen
import graft.operators.TextIndex

/** Randomized corpora vs naive Scala references for the retrieval family
  * — keyword/phrase/proximity semantics and BM25 scores must agree with
  * brute force on every sampled corpus (PropertySpec's fixed-seed driver;
  * Spark-backed, so fewer cases than the pure-kernel properties). */
class TextIndexPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], cases: Int = 12)(f: T => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(f)
    }

  private val vocab = Vector("a", "b", "c", "d", "e")

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 18)
    seed <- Gen.choose(0L, 1000000L)
  } yield {
    val rng = new scala.util.Random(seed)
    (0L until n).map { id =>
      val len = rng.nextInt(12) // 0..11 tokens, including empty docs
      id -> Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
  }

  private def toks(t: String): Seq[String] =
    t.split(" ").filter(_.nonEmpty).toSeq

  test("searchMinMatch agrees with brute force on random corpora") {
    forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val terms = Seq("a", "c", "e")
      for (mm <- 1 to 3) {
        val got = TextIndex.searchMinMatch(df, terms, mm).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = corpus.flatMap { case (id, t) =>
          val m = toks(t).distinct.count(terms.contains)
          if (m >= mm) Some(id -> m.toLong) else None
        }.toMap
        assert(got === want, s"minMatch=$mm corpus=$corpus")
      }
    }
  }

  test("phraseSearch agrees with a sliding-window reference") {
    forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      for (phrase <- Seq(Seq("a", "b"), Seq("b", "b"), Seq("a", "b", "a"))) {
        val got = TextIndex.phraseSearch(df, phrase).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = corpus.flatMap { case (id, t) =>
          val ts = toks(t)
          val hits = (0 to ts.length - phrase.length)
            .count(i => ts.slice(i, i + phrase.length) == phrase)
          if (hits > 0) Some(id -> hits.toLong) else None
        }.toMap
        assert(got === want, s"phrase=$phrase corpus=$corpus")
      }
    }
  }

  test("proximitySearch agrees with a pair-counting reference") {
    forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      for (slop <- Seq(0, 2, 5)) {
        val got = TextIndex.proximitySearch(df, "a", "b", slop).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = corpus.flatMap { case (id, t) =>
          val ts = toks(t)
          val pa = ts.zipWithIndex.collect { case ("a", i) => i }
          val pb = ts.zipWithIndex.collect { case ("b", i) => i }
          val pairs = (for (x <- pa; y <- pb
            if math.abs(x - y) <= slop) yield 1).size
          if (pairs > 0) Some(id -> pairs.toLong) else None
        }.toMap
        assert(got === want, s"slop=$slop corpus=$corpus")
      }
    }
  }

  test("bm25 scores agree bit-for-bit with the reference on random corpora") {
    forAll(corpusGen, cases = 8) { corpus =>
      if (corpus.exists(c => toks(c._2).nonEmpty)) {
        val df = corpus.toDF("doc_id", "text")
        val queries = Seq(0L -> Seq("a", "d"), 1L -> Seq("b", "c", "e"))
        val got = TextIndex.bm25TopK(df, queries, k = 50).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
        // naive reference with the contract fold order
        val tks = corpus.map { case (id, t) => id -> toks(t) }.toMap
        val n = corpus.size.toLong
        val avgdl = tks.values.map(_.size).sum.toDouble / n
        val dfm = tks.values.flatMap(_.distinct).groupBy(identity)
          .map { case (t, xs) => t -> xs.size.toLong }
        val want = (for ((qid, ts) <- queries; (did, dtoks) <- tks) yield {
          val ws = ts.distinct.sorted.flatMap { t =>
            val tf = dtoks.count(_ == t)
            if (tf == 0) None else Some(
              math.log(1.0 + ((n - dfm(t)).toDouble + 0.5) /
                (dfm(t).toDouble + 0.5)) *
              (tf.toDouble * 2.2 / (tf.toDouble + 1.2 *
                (0.25 + 0.75 * dtoks.size.toDouble / avgdl))))
          }
          if (ws.isEmpty) None
          else Some((qid, did) ->
            math.floor(1e9 * ws.foldLeft(0.0)(_ + _)).toLong)
        }).flatten.toMap
        assert(got === want, s"corpus=$corpus")
      }
    }
  }
}
