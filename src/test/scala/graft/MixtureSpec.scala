package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

class MixtureSpec extends SparkSpec {

  private def refHash(id: Long, seed: Long): Long =
    Mixture.rowHashJvm(id, seed)

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"dom${i % 5}")).toDF("id", "dom")
  }

  test("sampleByRate keeps exactly the rows below the rate threshold") {
    import spark.implicits._
    val df = corpus(4000)
    val rate = 0.3
    val seed = 11L
    val kept = Mixture.sampleByRate(df, col("id"), lit(rate), seed)
      .select("id").as[Long].collect().toSet
    val thresh = Mixture.rateThreshold(rate)
    val expect = (0L until 4000L).filter(refHash(_, seed) < thresh).toSet
    assert(kept === expect)
    // rate accuracy: Binomial(4000, 0.3) within 5 sigma
    val sigma = math.sqrt(4000 * rate * (1 - rate))
    assert(math.abs(kept.size - 4000 * rate) < 5 * sigma)
  }

  test("sampleByRate is invariant under repartitioning and column order") {
    import spark.implicits._
    val df = corpus(1000)
    val a = Mixture.sampleByRate(df, col("id"), lit(0.5), 3L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Mixture.sampleByRate(
        df.repartition(17, col("dom")).select("dom", "id"),
        col("id"), lit(0.5), 3L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("domainRates looks up per-domain rates with default fallback") {
    import spark.implicits._
    val df = corpus(2000)
    val rates = Map("dom0" -> 1.0, "dom1" -> 0.0)
    val kept = Mixture.sampleByRate(df, col("id"),
        Mixture.domainRates(col("dom"), rates, 0.5), 7L)
      .select("id", "dom").as[(Long, String)].collect()
    val byDom = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("dom0") === 400)            // rate 1.0 keeps all
    assert(!byDom.contains("dom1"))           // rate 0.0 keeps none
    // defaults: ~200 of 400 per remaining domain
    Seq("dom2", "dom3", "dom4").foreach { d =>
      assert(math.abs(byDom(d) - 200) < 60, s"$d got ${byDom(d)}")
    }
  }

  /** Brute-force ground truth for rebalanceExact. */
  private def refRebalance(n: Int, targets: Map[String, Long], seed: Long)
      : Map[String, Seq[Long]] =
    (0 until n).map(i => (i.toLong, s"dom${i % 5}"))
      .groupBy(_._2)
      .map { case (dom, rows) =>
        val t = targets.getOrElse(dom, 0L).toInt
        dom -> rows.map(_._1)
          .sortBy(id => (refHash(id, seed), id)).take(t).toSeq
      }

  test("rebalanceExact delivers exactly min(target, |domain|) per domain," +
      " ranked by (hash, id)") {
    import spark.implicits._
    val targets = Map("dom0" -> 50L, "dom1" -> 10L, "dom2" -> 400L,
      "dom3" -> 399L)
    val seed = 13L
    val out = Mixture.rebalanceExact(corpus(2000), col("id"), col("dom"),
        targets, seed)
      .select(col("dom"), col("id"), col("rnk"))
      .as[(String, Long, Int)].collect()
    val expect = refRebalance(2000, targets, seed)
    val byDom = out.groupBy(_._1)
    assert(byDom.keySet === expect.filter(_._2.nonEmpty).keySet)
    expect.foreach { case (dom, ids) =>
      if (ids.nonEmpty) {
        val got = byDom(dom).sortBy(_._3).map(_._2).toSeq
        assert(got === ids, s"domain $dom")
      }
    }
    // dom2 target 400 > 400 avail keeps all; dom4 unlisted drops
    assert(byDom("dom2").length === 400)
  }

  test("upsampleByFactor: whole factors repeat exactly, fractional copies" +
      " hit the expected rate, factor 0 drops, repeat_idx contiguous") {
    import spark.implicits._
    val df = corpus(2000)
    val factors = Mixture.domainRates(col("dom"),
      Map("dom0" -> 3.0, "dom1" -> 2.5, "dom2" -> 0.0), 1.0)
    val out = Mixture.upsampleByFactor(df, col("id"), factors, 9L)
      .select(col("dom"), col("id"), col("repeat_idx"))
      .as[(String, Long, Long)].collect()
    val byDoc = out.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    // dom0: exactly 3 copies each, idx 0,1,2
    (0 until 2000 by 5).foreach { i =>
      assert(byDoc(("dom0", i.toLong)) === Seq(0L, 1L, 2L))
    }
    // dom2: dropped entirely
    assert(!out.exists(_._1 == "dom2"))
    // dom3 (default 1.0): single copy
    assert(out.filter(_._1 == "dom3").forall(_._3 == 0L))
    assert(out.count(_._1 == "dom3") === 400)
    // dom1: 2 or 3 copies; third-copy fraction ~0.5 (400 docs, 5 sigma)
    val dom1 = out.filter(_._1 == "dom1").groupBy(_._2).view
      .mapValues(_.length).toMap
    assert(dom1.values.forall(c => c == 2 || c == 3))
    val thirds = dom1.values.count(_ == 3)
    assert(math.abs(thirds - 200) < 5 * math.sqrt(400 * 0.25), s"$thirds")
    // multiplicity is the declared hash rule
    dom1.foreach { case (id, c) =>
      val extra = if (Mixture.rowHashJvm(id, 9L) <
        math.floor(0.5 * Mixture.HashMod).toLong) 1 else 0
      assert(c === 2 + extra)
    }
  }

  test("oversample shortfall falls back to full rank with identical output") {
    import spark.implicits._
    val targets = Map("dom0" -> 300L)
    val seed = 13L
    // oversample tight enough that the hash-threshold cut keeps fewer than
    // 300 of dom0's 400 rows for at least one seed/domain combination —
    // sweep seeds until the cheap path would fall short, then assert the
    // fallback result still equals ground truth.
    val loose = Mixture.rebalanceExact(corpus(2000), col("id"), col("dom"),
        targets, seed, oversample = 2.0)
      .select("id").as[Long].collect().sorted.toSeq
    val tight = Mixture.rebalanceExact(corpus(2000), col("id"), col("dom"),
        targets, seed, oversample = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val expect = refRebalance(2000, targets, seed)("dom0").sorted
    assert(loose === expect)
    assert(tight === expect)
  }

  test("permuteShards: complete permutation, contiguous positions, " +
      "repartition-invariant, seed-sensitive") {
    import spark.implicits._
    val n = 3000
    val df = spark.range(n).toDF("id")
    val got = Mixture.permuteShards(df, col("id"), 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc exactly once
    assert(got.map(_._1).sorted.toSeq === (0L until n).toSeq)
    // per shard: positions are 0..n_i-1 with no gaps, order = (hash, id)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === rows.indices.map(_.toLong),
        s"shard $shard positions not contiguous")
      val byPos = rows.sortBy(_._3).map(_._1)
      val expect = rows.map(_._1)
        .sortBy(id => (Mixture.rowHashJvm(id, 7L), id))
      assert(byPos.toSeq === expect.toSeq, s"shard $shard order")
    }
    // physical layout must not matter
    val re = Mixture.permuteShards(df.repartition(13), col("id"), 8, 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
    // a different seed produces a different order
    val other = Mixture.permuteShards(df, col("id"), 8, seed = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(other.sortBy(_._1).toSeq !== got.sortBy(_._1).toSeq)
  }
}
