package graft

import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(docs: org.apache.spark.sql.DataFrame, w: Int) =
    SubstringDedup.duplicateSpans(docs, w)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("cross-doc shared passage found with exact boundaries") {
    val shared = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = df(
      1L -> s"alpha beta $shared gamma delta epsilon zeta eta theta",
      2L -> s"one two three four $shared five six seven eight nine")
    // w=8: the 10-token passage is duplicated, surrounding text is not
    assert(spans(d, 8) == Seq((1L, 3L, 12L), (2L, 5L, 14L)))
  }

  test("unique corpus yields no spans") {
    val d = df(
      1L -> (1 to 30).map(i => s"a$i").mkString(" "),
      2L -> (1 to 30).map(i => s"b$i").mkString(" "))
    assert(spans(d, 8).isEmpty)
  }

  test("within-doc repetition counts as duplication") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = df(1L -> s"x1 x2 $run y1 y2 y3 $run z1 z2")
    assert(spans(d, 8) == Seq((1L, 3L, 10L), (1L, 14L, 21L)))
  }

  test("adjacent duplicated windows merge into one maximal span") {
    // a 16-token duplicated run at w=8 must be ONE span of 16, not two
    val run = (1 to 16).map(i => s"m$i").mkString(" ")
    val d = df(
      1L -> s"a b c $run d e f g h",
      2L -> s"q r s t u $run v w x y z")
    assert(spans(d, 8) == Seq((1L, 4L, 19L), (2L, 6L, 21L)))
  }

  test("docs shorter than w emit no windows and survive removal untouched") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val d = df(1L -> "tiny doc", 2L -> shared, 3L -> shared)
    assert(spans(d, 8) == Seq((2L, 1L, 8L), (3L, 1L, 8L)))
    val out = SubstringDedup.removeSpans(d, 8).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "tiny doc" && out(0).getLong(2) == 0L)
    // fully-duplicated docs are fully removed but still present
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 8L &&
      out(1).getLong(3) == 8L)
  }

  test("NULL-text and empty docs survive removal with empty output") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"n$i").mkString(" ")
    val d = Seq((1L, shared), (2L, shared), (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val out = SubstringDedup.removeSpans(d, 8).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
      "every input doc must appear, including NULL/empty text")
    Seq(2, 3).foreach { i =>
      assert(out(i).getString(1) == "" && out(i).getLong(2) == 0L)
    }
  }

  test("removal is consistent: kept + removed = total, spans excised") {
    val shared = (1 to 10).map(i => s"c$i").mkString(" ")
    val d = df(
      1L -> s"k1 k2 $shared k3 k4",
      2L -> s"j1 $shared j2 j3 j4 j5")
    val out = SubstringDedup.removeSpans(d, 8).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(
      1L -> "k1 k2 k3 k4", 2L -> "j1 j2 j3 j4 j5"))
    out.foreach { r =>
      val kept = if (r.getString(1).isEmpty) 0 else
        r.getString(1).split(" ", -1).length
      assert(kept + r.getLong(2) == r.getLong(3))
    }
  }

  test("hashKeys variant is span-identical to string keys on the corpus") {
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val s1 = SubstringDedup.duplicateSpans(docs)
    val s2 = SubstringDedup.duplicateSpans(docs, hashKeys = true)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("corpus invariants at sfDir: spans within bounds, removal total") {
    val docs = graft.core.Tables.table(spark, sfDir, "documents")
    val sp = SubstringDedup.duplicateSpans(docs).cache()
    val n = sp.count()
    assert(n > 0, "test corpus plants duplicates; expected spans")
    // spans lie inside their documents and are at least w tokens long
    val lens = docs.select(col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    assert(sp.join(lens, "doc_id")
      .filter(col("span_start") < 1 || col("span_end") > col("n") ||
        col("span_len") < SubstringDedup.DefaultW)
      .count() == 0)
    // spans within a doc are disjoint and non-adjacent (maximality)
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("span_start")
    assert(sp.withColumn("prev_end", lag(col("span_end"), 1).over(byDoc))
      .filter(col("prev_end").isNotNull &&
        col("span_start") <= col("prev_end") + 1)
      .count() == 0)
    sp.unpersist(false)
  }
}
