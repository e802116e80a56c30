package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  /** Scala reference BPE trainer over (word, freq) pairs. */
  private def refTrain(wf: Map[String, Long], m: Int)
      : Seq[(String, String, Long)] = {
    var symbols: Map[String, Seq[String]] = wf.keys.map { w =>
      w -> (w.map(_.toString) :+ Bpe.EndMark)
    }.toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to m) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      symbols.foreach { case (w, syms) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + wf(w)
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) =>
          (-c, l + Bpe.Sep + r)
        }
        merges += ((l, r, c))
        symbols = symbols.map { case (w, syms) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    merges.result()
  }

  private def corpusDF(docs: Seq[String]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("train matches the reference BPE trainer, including repeated and " +
      "overlapping pairs") {
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "aaa aa aaaa",            // overlapping same-symbol pairs
      "low new wide wider")
    val df = corpusDF(docs)
    val wf = docs.flatMap(_.split(" ")).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    for (m <- Seq(1, 3, 8)) {
      val got = Bpe.train(df, m)._1
        .select("round", "lhs", "rhs", "cnt")
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got === refTrain(wf, m), s"m=$m")
    }
  }

  test("final vocab symbols equal the reference greedy encoder per word") {
    val docs = Seq("low lower lowest", "new newer", "low low new")
    val df = corpusDF(docs)
    val (mergesDf, vocab) = Bpe.train(df, 5)
    val merges = mergesDf.orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    vocab.select("w", "s").collect().foreach { r =>
      val syms = r.getString(1).trim.split("  ").toSeq
      assert(syms === Bpe.encodeWordRef(r.getString(0), merges),
        s"word ${r.getString(0)}")
    }
  }

  test("canonical form survives every merge round") {
    val df = corpusDF(Seq("abab ababab ab", "ba bab abba"))
    val (_, vocab) = Bpe.train(df, 6)
    vocab.select("s").collect().foreach { r =>
      val s = r.getString(0)
      assert(s.startsWith(" ") && s.endsWith(" ") &&
        !s.drop(1).dropRight(1).split("  ", -1).exists(_.isEmpty) &&
        !s.contains("   "), s"non-canonical: '$s'")
    }
  }

  test("tokenCounts equals summed reference-encoder lengths") {
    val docs = Seq("low lower", "new newest lowest", "low low")
    val df = corpusDF(docs)
    val (mergesDf, vocab) = Bpe.train(df, 4)
    val merges = mergesDf.orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.tokenCounts(df, vocab).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val expect = t.split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encodeWordRef(w, merges).length.toLong).sum
      assert(got(i.toLong) === expect, s"doc $i")
    }
  }

  test("encode emits the reference token sequence; unseen words fall back") {
    val docs = Seq("low lower", "new newest lowest", "low low")
    val df = corpusDF(docs)
    val (mergesDf, vocab) = Bpe.train(df, 4)
    val merges = mergesDf.orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.encode(df, vocab).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWordRef(w, merges))
      assert(got(i.toLong)._1 === toks.mkString(" "), s"doc $i tokens")
      assert(got(i.toLong)._2 === toks.length.toLong, s"doc $i count")
    }
    // a word the vocab never saw: character fallback + end mark
    val unseen = Bpe.encode(corpusDF(Seq("zq")), vocab).collect().head
    assert(unseen.getString(1) === "z q " + Bpe.EndMark)
    assert(unseen.getLong(2) === 3L)
  }

  test("ties break to the lexicographically smallest pair") {
    // 'xy' and 'ab' both occur twice; 'ab' < 'xy'
    val df = corpusDF(Seq("xy xy ab ab"))
    val first = Bpe.train(df, 1)._1.collect().head
    assert(first.getString(1) === "a" && first.getString(2) === "b")
  }
}
