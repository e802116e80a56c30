package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Decontaminate, Dedup}

class BloomSpec extends SparkSpec {

  test("no false negatives: every inserted gram set is flagged," +
      " including via sign-extended (negative) filter words") {
    import spark.implicits._
    val p = Decontaminate.BloomParams()
    val r = new scala.util.Random(1L)
    // enough random grams that many filter words have bit 63 set — the
    // regression surface for the arithmetic-shiftright parity bug
    val grams = Seq.fill(20000)(math.abs(r.nextLong()) % (1L << 60))
      .distinct
    val bench = Seq((0L, grams)).toDF("id", "codes")
    val bits = Decontaminate.bloomBuild(bench, p)
    assert(bits.exists(_ < 0), "test corpus too small to set any bit 63")
    // probe each gram individually through the Column path
    val probe = grams.zipWithIndex
      .map { case (g, i) => (i.toLong, Seq(g)) }.toDF("id", "codes")
    val misses = probe.select(
        Decontaminate.bloomHitCol(col("codes"), bits, p).as("hit"))
      .filter(!col("hit")).count()
    assert(misses === 0L)
  }

  test("false-positive rate at defaults stays below 2% for 10k members") {
    import spark.implicits._
    val p = Decontaminate.BloomParams()
    val r = new scala.util.Random(2L)
    val members = Seq.fill(10000)(math.abs(r.nextLong()) % (1L << 60))
      .distinct
    val memberSet = members.toSet
    val bits = Decontaminate.bloomBuild(
      Seq((0L, members)).toDF("id", "codes"), p)
    val outsiders = Seq.fill(20000)(math.abs(r.nextLong()) % (1L << 60))
      .filterNot(memberSet.contains).distinct
    val probe = outsiders.zipWithIndex
      .map { case (g, i) => (i.toLong, Seq(g)) }.toDF("id", "codes")
    val fp = probe.select(
        Decontaminate.bloomHitCol(col("codes"), bits, p).as("hit"))
      .filter(col("hit")).count()
    assert(fp.toDouble / outsiders.size < 0.02,
      s"$fp false positives of ${outsiders.size}")
  }

  test("bloomFlags invariants hold on the documents corpus") {
    val docs = Tables.table(spark, TestSpark.sfDir, "documents")
    val codes3 = Dedup.shingleCodeTable(docs, n = 3)
    val row = Decontaminate.bloomFlags(codes3,
      codes3.filter(col("id") % 97 === 0)).collect().head
    assert(row.getAs[Boolean]("no_false_neg"))
    assert(row.getAs[Boolean]("fp_ok"))
    assert(row.getAs[Long]("n_docs") === docs.count())
    assert(row.getAs[Long]("n_exact") > 0L)
  }

  test("bloom filter size is independent of benchmark size (the scale" +
      " contract: MB-scale broadcast for any benchmark)") {
    val p = Decontaminate.BloomParams(mBits = 1 << 12, k = 2)
    assert(p.words === (1 << 12) / 64)
    import spark.implicits._
    val small = Decontaminate.bloomBuild(
      Seq((0L, Seq(1L, 2L))).toDF("id", "codes"), p)
    val big = Decontaminate.bloomBuild(
      Seq((0L, (1L to 5000L).toSeq)).toDF("id", "codes"), p)
    assert(small.length === big.length)
  }
}
