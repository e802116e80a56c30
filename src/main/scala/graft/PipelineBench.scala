package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators._

/** Scale probe for the corpus-shaping operators (mixture, packing, Bloom
  * decontamination, C4 gate) at 1M docs — DedupBench's sibling for the
  * round-6 pipeline additions. A synthetic corpus with a SKEWED domain
  * distribution (domain 0 holds ~50% of docs — the shape that breaks
  * naive per-domain windows) is materialized to parquet first so every
  * measurement includes the scan.
  *
  * Run: `sbt "runMain graft.PipelineBench"`.
  * Env: SPARK_GRAFT_PIPE_N (docs, default 1000000), SPARK_GRAFT_CPUS. */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val n = sys.env.getOrElse("SPARK_GRAFT_PIPE_N", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = 50000
    val path = "/tmp/graft_pipeline_bench"
    spark.range(n).as[Long].map { id =>
      val rnd = new scala.util.Random(id * 2654435761L + 11)
      // skewed domains: half the corpus in dom0, tail over 19 more
      val dom = if (rnd.nextInt(2) == 0) 0 else 1 + rnd.nextInt(19)
      val len = 20 + rnd.nextInt(120)
      def word(v: Int): String = {
        val c = (0x4E00 + v % 2000).toChar
        c.toString + (v.toString * 2).take(2 + (v / 2000) % 8)
      }
      val words = Array.tabulate(len)(_ => word(rnd.nextInt(vocab)))
      (id, s"src$dom", words.mkString(" "), len.toLong)
    }.toDF("doc_id", "source", "text", "n_tokens")
      .repartition(cpus.toInt * 4)
      .write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def stage(name: String)(secs: Double): Unit =
      System.err.println(f"[pipeline-bench] $name: $secs%.1f s")

    val (_, tScan) = time(docs.count())
    stage("scan")(tScan)

    // 1. rate sampling: pure scan filter, the 100 TB mixture default
    val (nRate, tRate) = time {
      Mixture.sampleByRate(docs, col("doc_id"),
        Mixture.domainRates(col("source"), Map("src0" -> 0.1), 0.5), 5L)
        .count()
    }
    stage("sample-by-rate")(tRate)

    // 2. exact rebalance — oversampled-threshold rank (the shipped path)
    val targets = (0 until 20).map(i => s"src$i" -> 10000L).toMap
    val (nReb, tReb) = time {
      Mixture.rebalanceExact(docs, col("doc_id"), col("source"), targets,
        5L).count()
    }
    stage("rebalance-oversampled")(tReb)

    // 2b. the naive alternative: full row_number window per domain —
    // every domain funnels through one reducer; dom0 pushes 500k rows
    // through a single partition. Measured to quantify what the
    // oversampling pre-filter buys.
    val (nRebNaive, tRebNaive) = time {
      val tgt = targets.foldLeft(lit(0L)) { case (acc, (d, t)) =>
        when(col("source") === lit(d), lit(t)).otherwise(acc)
      }
      val w = Window.partitionBy(col("source"))
        .orderBy(Mixture.rowHash(col("doc_id"), 5L), col("doc_id"))
      docs.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= tgt).count()
    }
    stage("rebalance-naive-window")(tRebNaive)

    // 3. greedy packing: single stream per domain (dom0 = one 500k-doc
    // sequential walk) vs 8 hash substreams (the skew lever)
    val (bins1, tPack1) = time {
      Packing.packGreedy(docs, "source", "doc_id", "n_tokens", 2048L)
        .agg(countDistinct(col("source"), col("bin"))).head().getLong(0)
    }
    stage("pack-1shard")(tPack1)
    val (bins8, tPack8) = time {
      Packing.packGreedy(docs, "source", "doc_id", "n_tokens", 2048L,
        shards = 8)
        .agg(countDistinct(col("source"), col("shard"), col("bin")))
        .head().getLong(0)
    }
    stage("pack-8shards")(tPack8)
    // best-fit-decreasing: utilization vs first-fit, same capacity
    val (binsBfd, tBfd) = time {
      Packing.packBestFit(docs, "source", "doc_id", "n_tokens", 2048L)
        .agg(countDistinct(col("source"), col("bin"))).head().getLong(0)
    }
    stage(s"pack-bestfit ($binsBfd vs $bins1 bins)")(tBfd)

    // 4. size-targeted sharding: one window cumsum per domain
    val (nShards, tShard) = time {
      Packing.shardByRunningSize(docs, "source", "doc_id", "n_tokens",
        1L << 20)
        .agg(countDistinct(col("source"), col("out_shard"))).head()
        .getLong(0)
    }
    stage("shard-by-size")(tShard)

    // 5. decontamination with a LARGE benchmark (every 10th doc = 100k
    // docs, ~7M distinct grams): exact broadcast-set semi-join vs Bloom.
    // The exact path broadcasts the full distinct-gram table; the Bloom
    // path broadcasts 2^26 bits = 8 MB regardless of benchmark size.
    val (codes, tCodes) = time {
      val c = Dedup.shingleCodeTable(docs, n = 3).cache(); c.count(); c
    }
    stage("shingle3-prep")(tCodes)
    val bench = codes.filter(col("id") % 10 === 0)
    val (nGrams, tGrams) = time {
      bench.select(explode(col("codes")).as("g")).distinct().count()
    }
    stage(s"bench-grams ($nGrams)")(tGrams)
    val (nExact, tExact) = time {
      Decontaminate.flags(codes, bench)
        .agg(sum("contaminated")).head().getLong(0)
    }
    stage("decontaminate-exact")(tExact)
    val p = Decontaminate.BloomParams.forGrams(nGrams)
    val (bloomRow, tBloom) = time {
      Decontaminate.bloomFlags(codes, bench, p).collect().head
    }
    stage(s"decontaminate-bloom (m=2^${Integer.numberOfTrailingZeros(
      p.mBits)}, k=${p.k})")(tBloom)
    codes.unpersist()

    // 6. C4 gate: shuffle-free codegen'd map
    val (nKept, tC4) = time {
      TextAnalysis.c4Filters(docs).filter(col("kept")).count()
    }
    stage("c4-gate")(tC4)

    // 7. BPE training: m rounds over the distinct-word table (vocab-sized,
    // ~50k words here regardless of corpus size) + the corpus-side encode
    val bpeM = sys.env.getOrElse("SPARK_GRAFT_PIPE_BPE_M", "20").toInt
    val ((nMerges, bpeVocab), tBpe) = time {
      val (mg, vb) = Bpe.train(docs, bpeM)
      (mg.count(), vb)
    }
    stage(s"bpe-train (m=$bpeM)")(tBpe)
    val (_, tBpeEnc) = time {
      Bpe.tokenCounts(docs, bpeVocab).count()
    }
    stage("bpe-encode")(tBpeEnc)

    // 8. bigram-LM training + scoring: count tables are vocab²-bounded,
    // the corpus side is one explode + join + per-doc ordered fold
    val ((nBg, lmBg, lmUg), tLmTrain) = time {
      val (bg, ug) = LmScore.trainBigrams(docs)
      val b = bg.cache(); val u = ug.cache()
      (b.count(), b, u)
    }
    stage(s"lm-train ($nBg bigrams)")(tLmTrain)
    val (nScored, tLmScore) = time {
      LmScore.scoreMeanProb(docs, lmBg, lmUg).count()
    }
    stage("lm-score")(tLmScore)
    // CCNet bucketing over the same model, scored ONCE and cached so the
    // two bucketing shapes are attributed honestly (the scoring pass
    // dominates both end-to-end): exact global rank vs sampled-cutoff map
    val (scored, tScoreCache) = time {
      // persist to parquet, not cache: the 77M-row LM count caches own
      // the storage pool here, and caching the scored frame on top
      // starves the scoring job's execution memory (measured OOM at 16
      // threads); the 16 MB score table reads back instantly
      val scPath = "/tmp/graft_pipeline_scored"
      LmScore.scoreMeanProb(docs, lmBg, lmUg)
        .write.mode("overwrite").parquet(scPath)
      spark.read.parquet(scPath)
    }
    stage("ccnet-score-stored")(tScoreCache)
    val (bDist, tCcnet) = time {
      LmScore.bucketsByRank(scored)
        .groupBy("bucket").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    stage(s"ccnet-buckets (exact rank; sizes $bDist)")(tCcnet)
    val (_, tCcnetCut) = time {
      val cuts = scored.stat.approxQuantile("lm_score_nano",
        Array(2.0 / 3, 1.0 / 3), 0.001).map(_.toLong)
      LmScore.bucketsByCutoffs(scored, cuts.toSeq).groupBy("bucket")
        .count().count()
    }
    stage("ccnet-buckets (sampled cutoffs)")(tCcnetCut)
    // DSIR importance weights: target = src0 docs, raw = full corpus —
    // two vocabulary-bounded count tables + a broadcast shuffle-free map
    val (_, tDsir) = time {
      val (tbg, _) = LmScore.trainBigrams(docs.filter(col("source") === "src0"))
      LmScore.dsirWeights(docs, tbg, lmBg).count()
    }
    stage("dsir-weights")(tDsir)
    lmBg.unpersist(); lmUg.unpersist()
    // hashed-key lever: 8-byte fingerprints instead of string-pair keys
    val ((nBgH, lmBgH, lmUgH), tLmTrainH) = time {
      val (bg, ug) = LmScore.trainBigramsHashed(docs)
      val b = bg.cache(); val u = ug.cache()
      (b.count(), b, u)
    }
    stage(s"lm-train-hashed ($nBgH bigrams)")(tLmTrainH)
    val (_, tLmScoreH) = time {
      LmScore.scoreMeanProb(docs, lmBgH, lmUgH, hashKeys = true).count()
    }
    stage("lm-score-hashed")(tLmScoreH)
    lmBgH.unpersist(); lmUgH.unpersist()

    // 8. full-text retrieval: index build, bucketed store, probes, BM25
    val tiqTerms = Seq(0, 7, 123, 4567, 49999).map(v => {
      val c = (0x4E00 + v % 2000).toChar
      c.toString + (v.toString * 2).take(2 + (v / 2000) % 8)
    })
    val post = TextIndex.postings(docs)
    val (nPost, tPost) = time(post.count())
    stage(s"ti-postings ($nPost rows)")(tPost)
    val (_, tStore) = time {
      TextIndex.writePostings(post, "/tmp/graft_pipeline_postings", 64)
    }
    stage("ti-store-write (64 buckets)")(tStore)
    val stored = TextIndex.readPostings(spark, "/tmp/graft_pipeline_postings")
    val (nProbe, tProbe) = time {
      TextIndex.searchMinMatchStored(stored, tiqTerms, 2, 64).count()
    }
    stage(s"ti-stored-probe ($nProbe docs)")(tProbe)
    val (nScan, tScanProbe) = time {
      TextIndex.searchMinMatch(docs, tiqTerms, 2).count()
    }
    stage(s"ti-scan-probe ($nScan docs)")(tScanProbe)
    val bmQueries = Seq(
      0L -> Seq(tiqTerms(0), tiqTerms(1)),
      1L -> Seq(tiqTerms(2), tiqTerms(3), tiqTerms(4)))
    val (nBm, tBm) = time {
      TextIndex.bm25TopK(docs, bmQueries, 10).count()
    }
    stage(s"ti-bm25 ($nBm rows)")(tBm)
    val (nPhrase, tPhrase) = time {
      TextIndex.phraseSearch(docs, Seq(tiqTerms(0), tiqTerms(1))).count()
    }
    stage(s"ti-phrase ($nPhrase docs)")(tPhrase)
    val tiPath = "/tmp/graft_pipeline_ti_index"
    val (_, tIdxBuild) = time {
      TextIndex.buildIndex(docs, tiPath, nBuckets = 64)
    }
    stage("ti-index-build (positional, 64 buckets)")(tIdxBuild)
    val (nBmS, tBmS) = time {
      TextIndex.bm25TopKStored(spark, tiPath, bmQueries, 10, 64).count()
    }
    stage(s"ti-bm25-stored ($nBmS rows)")(tBmS)
    val (nPhS, tPhS) = time {
      TextIndex.phraseSearchStored(spark, tiPath,
        Seq(tiqTerms(0), tiqTerms(1)), 64).count()
    }
    stage(s"ti-phrase-stored ($nPhS docs)")(tPhS)

    // 9. HYBRID text+vector retrieval at 1M docs (opt-in): BM25 served
    // from the bucketed store (query-term partitions only) + flat cosine
    // over per-doc embeddings + reciprocal-rank fusion — q129's shape at
    // corpus scale. The vector side is the cost driver (one full
    // embedding scan per batch); the text side reads ~|terms| buckets;
    // fusion joins two |Q|·kIn rank frames (trivial at any scale).
    if (sys.env.get("SPARK_GRAFT_PIPE_HYBRID").contains("1")) {
      import graft.core.Metric
      val dEmb = 64
      val embPath = "/tmp/graft_pipeline_emb"
      spark.range(n).as[Long].map { id =>
        val rnd = new scala.util.Random(id * -0x61c8864680b583ebL + 5)
        (id, Array.fill(dEmb)(rnd.nextDouble()).toSeq)
      }.toDF("id", "vec").repartition(cpus.toInt * 4)
        .write.mode("overwrite").parquet(embPath)
      val emb = spark.read.parquet(embPath)
      val (_, tEmbScan) = time(emb.count())
      stage("hybrid-emb-scan")(tEmbScan)
      val hq = (0L until 5L)
      val hbQueries = hq.map(q => q ->
        Seq(tiqTerms((q % 5).toInt), tiqTerms(((q + 1) % 5).toInt)))
      val qvecs = emb.filter(col("id").isin(hq.map(_ * 1000): _*))
        .select((col("id") / 1000).cast("long").as("query_id"),
          col("vec").as("qvec")).cache()
      qvecs.count()
      val kIn = 20
      def textSide = TextIndex
        .bm25TopKStored(spark, tiPath, hbQueries, kIn, 64)
        .select(col("query_id"), col("doc_id").as("id"), col("rnk"))
      def vecSide = FlatKnn
        .search(qvecs, emb.select("id", "vec"), kIn, Metric.Cosine)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rnk"))
      val (nT, tText) = time(textSide.count())
      stage(s"hybrid-text-bm25-stored ($nT rows)")(tText)
      val (nV, tVec) = time(vecSide.count())
      stage(s"hybrid-vec-cosine ($nV rows)")(tVec)
      val (nF, tFuse) = time(
        TextIndex.rrfFuse(textSide, vecSide, 10, 60).count())
      stage(s"hybrid-rrf-end-to-end ($nF rows)")(tFuse)
      println(s"""{"experiment":"hybrid_1m","n_docs":$n,"dims":$dEmb,""" +
        s""""n_queries":${hq.size},"k_in":$kIn,"k_out":10,""" +
        s""""text_stored_sec":$tText,"vec_cosine_sec":$tVec,""" +
        s""""fused_end_to_end_sec":$tFuse}""")
    }

    println(s"""{"experiment":"pipeline_bench","n_docs":$n,""" +
      s""""scan_sec":$tScan,""" +
      s""""sample_rate_sec":$tRate,"sample_rate_kept":$nRate,""" +
      s""""rebalance_sec":$tReb,"rebalance_kept":$nReb,""" +
      s""""rebalance_naive_sec":$tRebNaive,""" +
      s""""rebalance_naive_kept":$nRebNaive,""" +
      s""""pack1_sec":$tPack1,"pack1_bins":$bins1,""" +
      s""""pack8_sec":$tPack8,"pack8_bins":$bins8,""" +
      s""""bfd_sec":$tBfd,"bfd_bins":$binsBfd,""" +
      s""""shard_sec":$tShard,"shard_count":$nShards,""" +
      s""""shingle3_prep_sec":$tCodes,"bench_grams":$nGrams,""" +
      s""""exact_decontaminate_sec":$tExact,"exact_contaminated":$nExact,""" +
      s""""bloom_decontaminate_sec":$tBloom,""" +
      s""""bloom_no_false_neg":${bloomRow.getAs[Boolean]("no_false_neg")},""" +
      s""""bloom_fp_ok":${bloomRow.getAs[Boolean]("fp_ok")},""" +
      s""""bloom_bits_mb":${p.mBits / 8 / 1048576},""" +
      s""""c4_sec":$tC4,"c4_kept":$nKept,""" +
      s""""bpe_m":$bpeM,"bpe_train_sec":$tBpe,"bpe_merges":$nMerges,""" +
      s""""bpe_encode_sec":$tBpeEnc,""" +
      s""""lm_bigrams":$nBg,"lm_train_sec":$tLmTrain,""" +
      s""""lm_score_sec":$tLmScore,"lm_scored":$nScored,""" +
      s""""ccnet_score_sec":$tScoreCache,"ccnet_exact_sec":$tCcnet,""" +
      s""""ccnet_cutoff_sec":$tCcnetCut,""" +
      s""""dsir_sec":$tDsir,""" +
      s""""lm_train_hashed_sec":$tLmTrainH,""" +
      s""""lm_score_hashed_sec":$tLmScoreH,""" +
      s""""ti_postings_sec":$tPost,"ti_postings_rows":$nPost,""" +
      s""""ti_store_write_sec":$tStore,""" +
      s""""ti_stored_probe_sec":$tProbe,"ti_probe_docs":$nProbe,""" +
      s""""ti_scan_probe_sec":$tScanProbe,""" +
      s""""ti_bm25_sec":$tBm,"ti_bm25_rows":$nBm,""" +
      s""""ti_phrase_sec":$tPhrase,"ti_phrase_docs":$nPhrase,""" +
      s""""ti_index_build_sec":$tIdxBuild,""" +
      s""""ti_bm25_stored_sec":$tBmS,""" +
      s""""ti_phrase_stored_sec":$tPhS}""")
    spark.stop()
  }
}
