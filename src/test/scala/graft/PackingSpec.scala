package graft

import org.apache.spark.sql.functions._
import graft.operators.{Mixture, Packing}

class PackingSpec extends SparkSpec {

  /** Reference greedy packer over one ordered stream. */
  private def refPack(sizes: Seq[(Long, Long)], cap: Long)
      : Seq[(Long, Long)] = {           // (ord, bin)
    var bin = 0L; var fill = 0L
    var first = true
    sizes.sortBy(_._1).map { case (ord, sz) =>
      if (first) { first = false }
      else if (fill + sz > cap && fill > 0) { bin += 1; fill = 0 }
      fill += sz
      (ord, bin)
    }
  }

  private def randomDocs(n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, s"g${r.nextInt(4)}", 1L + r.nextInt(200))
    }
  }

  test("packGreedy matches the reference greedy packer per group") {
    import spark.implicits._
    val rows = randomDocs(3000, 1L)
    val df = rows.toDF("ord", "grp", "sz")
    val cap = 256L
    val out = Packing.packGreedy(df, "grp", "ord", "sz", cap)
      .select("grp", "ord", "bin").as[(String, Long, Long)].collect()
    val expect = rows.groupBy(_._2).flatMap { case (g, rs) =>
      refPack(rs.map(r => (r._1, r._3)), cap).map { case (o, b) =>
        (g, o, b)
      }
    }.toSet
    assert(out.toSet === expect)
  }

  test("packGreedy invariants: capacity respected, bins contiguous," +
      " oversized docs isolated") {
    import spark.implicits._
    val r = new scala.util.Random(2L)
    // include docs LARGER than capacity
    val rows = (0 until 500).map { i =>
      (i.toLong, s"g${i % 3}", 1L + r.nextInt(400))
    }
    val cap = 100L
    val out = Packing.packGreedy(rows.toDF("ord", "grp", "sz"),
        "grp", "ord", "sz", cap)
      .select("grp", "bin", "ord", "sz")
      .as[(String, Long, Long, Long)].collect()
    out.groupBy(r => (r._1, r._2)).foreach { case ((g, b), docs) =>
      val total = docs.map(_._4).sum
      if (docs.length > 1)
        assert(total <= cap, s"bin ($g,$b) overflows with ${docs.length} docs")
      // oversized docs sit alone
      docs.filter(_._4 > cap).foreach { d =>
        assert(docs.length == 1, s"oversized doc ${d._3} shares bin")
      }
    }
    // bins contiguous from 0 per group
    out.groupBy(_._1).foreach { case (g, docs) =>
      val bins = docs.map(_._2).distinct.sorted
      assert(bins === (0L until bins.length).toSeq, s"group $g bins $bins")
    }
  }

  test("packGreedy is deterministic under input repartitioning") {
    import spark.implicits._
    val df = randomDocs(1000, 3L).toDF("ord", "grp", "sz")
    val a = Packing.packGreedy(df, "grp", "ord", "sz", 300L)
      .select("grp", "ord", "bin").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val b = Packing.packGreedy(df.repartition(13), "grp", "ord", "sz", 300L)
      .select("grp", "ord", "bin").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a === b)
  }

  test("sharded packing = reference packer per hash substream") {
    import spark.implicits._
    val rows = randomDocs(2000, 4L)
    val cap = 256L
    val shards = 4
    val out = Packing.packGreedy(rows.toDF("ord", "grp", "sz"),
        "grp", "ord", "sz", cap, shards)
      .select("grp", "shard", "ord", "bin")
      .as[(String, Int, Long, Long)].collect()
    // every doc appears exactly once
    assert(out.map(_._3).sorted.toSeq === rows.map(_._1).sorted)
    // shard assignment is the declared hash
    out.foreach { r =>
      assert(r._2 === (Mixture.rowHashJvm(r._3, 7L) % shards).toInt)
    }
    // per (group, shard) stream: greedy reference
    val byStream = rows.groupBy(r => (r._2,
      (Mixture.rowHashJvm(r._1, 7L) % shards).toInt))
    byStream.foreach { case ((g, sh), rs) =>
      val expect = refPack(rs.map(r => (r._1, r._3)), cap).toMap
      out.filter(r => r._1 == g && r._2 == sh).foreach { r =>
        assert(r._4 === expect(r._3), s"stream ($g,$sh) ord ${r._3}")
      }
    }
  }

  /** Reference best-fit-decreasing packer over one stream. */
  private def refBfd(rows: Seq[(Long, Long)], cap: Long)
      : Map[Long, Long] = {          // ord -> bin
    val open = scala.collection.mutable.TreeMap[Long,
      scala.collection.mutable.TreeSet[Long]]()
    var next = 0L
    rows.sortBy { case (ord, sz) => (-sz, ord) }.map { case (ord, sz) =>
      val fit = open.rangeFrom(sz).headOption
      val bin = fit match {
        case Some((rem, ids)) =>
          val b = ids.head
          ids.remove(b); if (ids.isEmpty) open.remove(rem)
          val nr = rem - sz
          if (nr > 0) open.getOrElseUpdate(nr,
            scala.collection.mutable.TreeSet()) += b
          b
        case None =>
          val b = next; next += 1
          val nr = cap - sz
          if (nr > 0) open.getOrElseUpdate(nr,
            scala.collection.mutable.TreeSet()) += b
          b
      }
      ord -> bin
    }.toMap
  }

  test("packBestFit matches the reference BFD packer and never overflows") {
    import spark.implicits._
    val rows = randomDocs(2500, 7L)
    val cap = 256L
    val out = Packing.packBestFit(rows.toDF("ord", "grp", "sz"),
        "grp", "ord", "sz", cap)
      .select("grp", "ord", "sz", "bin")
      .as[(String, Long, Long, Long)].collect()
    rows.groupBy(_._2).foreach { case (g, rs) =>
      val expect = refBfd(rs.map(r => (r._1, r._3)), cap)
      out.filter(_._1 == g).foreach { r =>
        assert(r._4 === expect(r._2), s"group $g ord ${r._2}")
      }
    }
    out.groupBy(r => (r._1, r._4)).foreach { case ((g, b), docs) =>
      if (docs.length > 1)
        assert(docs.map(_._3).sum <= cap, s"bin ($g,$b) overflows")
    }
  }

  test("packBestFit uses no more bins than first-fit-in-order on random " +
      "corpora (the utilization claim)") {
    import spark.implicits._
    for (seed <- 10L to 12L) {
      val df = randomDocs(2000, seed).toDF("ord", "grp", "sz")
      def bins(d: org.apache.spark.sql.DataFrame) = d
        .groupBy("grp").agg(countDistinct("bin").as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val greedy = bins(Packing.packGreedy(df, "grp", "ord", "sz", 200L))
      val bfd = bins(Packing.packBestFit(df, "grp", "ord", "sz", 200L))
      greedy.keys.foreach { g =>
        assert(bfd(g) <= greedy(g), s"seed $seed group $g")
      }
    }
  }

  test("binStats aggregates are consistent with the per-doc assignment") {
    import spark.implicits._
    val df = randomDocs(1500, 5L).toDF("ord", "grp", "sz")
    val cap = 200L
    val packed = Packing.packGreedy(df, "grp", "ord", "sz", cap)
    val stats = Packing.binStats(packed, "grp", "sz", cap)
      .select("grp", "bin", "n_docs", "bin_sz", "util_permille")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(stats.map(_._3).sum === 1500L)
    val perBin = packed.select("grp", "bin", "sz")
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    stats.foreach { s =>
      val (n, tot) = perBin((s._1, s._2))
      assert(s._3 === n && s._4 === tot)
      assert(s._5 === math.floor(tot * 1000.0 / cap).toLong)
    }
  }

  test("chunkByTokens: chunks cover the doc with exact overlap and " +
      "reassemble to the original text") {
    import spark.implicits._
    val r = new scala.util.Random(9L)
    val docs = (0 until 200).map { i =>
      val n = 1 + r.nextInt(150)
      (i.toLong, Array.tabulate(n)(j => s"t${i}_$j").mkString(" "))
    }
    val (max, ov) = (40, 8)
    val out = Packing.chunkByTokens(docs.toDF("doc_id", "text"),
        "doc_id", "text", max, ov)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val stride = max - ov
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val chunks = out(id)
      // chunk_idx contiguous from 0
      assert(chunks.map(_._2).toSeq === chunks.indices.toSeq)
      chunks.foreach { case (_, ci, n, ct) =>
        val expect = toks.slice(ci * stride,
          math.min(ci * stride + max, toks.length))
        assert(ct.split(" ").toSeq === expect.toSeq, s"doc $id chunk $ci")
        assert(n === expect.length && n <= max)
      }
      // first chunk + non-overlap tails reassemble the doc exactly
      val reassembled = chunks.head._4.split(" ").toSeq ++
        chunks.tail.toSeq.flatMap(c => c._4.split(" ").drop(ov).toSeq)
      assert(reassembled === toks.toSeq, s"doc $id reassembly")
      // every token covered at least once
      assert(chunks.map(_._3).sum >= toks.length)
    }
  }

  test("shardByRunningSize: shard = floor(preceding cumsum / target)," +
      " monotone per group, closed shards meet the target") {
    import spark.implicits._
    val rows = randomDocs(1200, 6L)
    val target = 1000L
    val out = Packing.shardByRunningSize(rows.toDF("ord", "grp", "sz"),
        "grp", "ord", "sz", target)
      .select("grp", "ord", "sz", "out_shard")
      .as[(String, Long, Long, Long)].collect()
    rows.groupBy(_._2).foreach { case (g, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { r =>
        val expect = cum / target
        val got = out.find(o => o._1 == g && o._2 == r._1).get._4
        assert(got === expect, s"group $g ord ${r._1}")
        cum += r._3
      }
    }
    // shard ids non-decreasing in ord order per group
    out.groupBy(_._1).foreach { case (_, os) =>
      val sh = os.sortBy(_._2).map(_._4)
      assert(sh.zip(sh.tail).forall { case (a, b) => a <= b })
    }
  }
}
