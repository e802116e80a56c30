package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dedup-operator scale probe: a synthetic corpus far beyond the test SFs
  * (default 200k docs, ~85 words each) with planted exact duplicates (every
  * 17th doc repeats a neighbor verbatim) and near-duplicates (every 10th doc
  * perturbs ~8% of a neighbor's words), pushed through the four dedup
  * families on their scale paths — exact fingerprint groupBy, MinHash-LSH
  * band join, SimHash pigeonhole band join, and the ppjoin-style
  * prefix-filtered Jaccard join. The input is materialized to parquet first
  * so every measurement includes the scan, like a 100 TB run would.
  * Run: `sbt "runMain graft.DedupBench"`.
  * Env: SPARK_GRAFT_DEDUP_N (docs, default 200000), SPARK_GRAFT_CPUS. */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_N", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = 50000
    // distinct first codepoints in the vocabulary. tokenCode (the
    // oracle-replayable shingle base) is firstCp*100 + length, so this
    // controls the SHINGLE-SPACE density: 52 models a single-script ASCII
    // corpus (dense buckets — the prefix join's worst case), the default
    // 2000 (CJK block) models realistic multilingual text where the token
    // space grows with the corpus
    val firstChars = sys.env.getOrElse("SPARK_GRAFT_DEDUP_CHARS", "2000").toInt
    val path = "/tmp/graft_dedup_bench"
    spark.range(n).as[Long].map { id =>
      // exact duplicates: every 17th doc repeats the doc 5 back verbatim;
      // near-duplicates: every 10th doc perturbs ~8% of the doc 3 back
      val exactDup = id % 17 == 5 && id >= 5
      val nearDup = !exactDup && id % 10 == 3 && id >= 3
      val base = if (exactDup) id - 5 else if (nearDup) id - 3 else id
      val rnd = new scala.util.Random(base * 2654435761L + 11)
      val len = 50 + (base % 70).toInt
      // words must spread over FIRST CODEPOINT and LENGTH: the engine's
      // oracle-replayable tokenCode is firstCp*100 + length, so a
      // fixed-prefix vocabulary ("w123"...) collapses every token to a
      // handful of codes and degenerates all shingle-based operators
      def word(v: Int): String = {
        val k = v % firstChars
        val c =
          if (firstChars <= 52)
            (if (k < 26) 'a' + k else 'A' + (k - 26)).toChar
          else (0x4E00 + k).toChar // CJK block: 20k+ contiguous letters
        val body = 2 + (v / firstChars) % 9
        c.toString + (v.toString * 4).take(body)
      }
      val words = Array.tabulate(len)(_ => word(rnd.nextInt(vocab)))
      if (nearDup) {
        val r2 = new scala.util.Random(id * 40503L + 7)
        var i = 0
        while (i < math.max(1, len / 12)) {
          words(r2.nextInt(len)) = word(r2.nextInt(vocab))
          i += 1
        }
      }
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
      .repartition(cpus.toInt * 4)
      .write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def stage(name: String)(secs: Double): Unit =
      System.err.println(f"[dedup-bench] $name: $secs%.1f s")

    val (_, tWarm) = time(docs.count())
    stage("scan")(tWarm)

    // exact dedup: fingerprint groupBy with map-side partials
    val (nKeys, tExact) = time {
      Dedup.exactByKey(docs, TextAnalysis.fingerprint(col("text")),
        col("doc_id")).count()
    }
    stage("exact")(tExact)

    // shingle-code prep shared by minhash + jaccard (the ingest cost a
    // pipeline pays once)
    val (codes, tCodes) = time {
      val c = Dedup.shingleCodeTable(docs).cache()
      c.count(); c
    }
    stage("shingle-prep")(tCodes)

    val (nLsh, tLsh) = time(Dedup.minhashLshPairs(codes).count())
    stage("minhash-lsh")(tLsh)

    // SimHash is 16-bit (pinned for oracle parity): with only 65536
    // distinct hashes the hamming-3 ball saturates as the corpus grows, so
    // the banded join's candidate set turns quadratic past ~20k docs —
    // an inherent parameter boundary (production would widen the hash),
    // measured here at a capped size rather than hidden
    val simN = math.min(n, 20000L)
    val (nSim, tSim) = time {
      Dedup.simhashPairs(
        docs.filter(col("doc_id") < simN)
          .select(col("doc_id"), TextAnalysis.tokens(col("text"))
            .as("toks")), maxHamming = 3, nBands = 4).count()
    }
    stage("simhash")(tSim)

    // the 60-bit wide variant runs at FULL corpus size — 2^60 hash space
    // removes the 16-bit saturation, so candidates stay ~planted dups
    val (nSimW, tSimW) = time {
      Dedup.simhashWidePairs(
        docs.select(col("doc_id"), TextAnalysis.tokens(col("text"))
          .as("toks")), maxHamming = 3, nBands = 4).count()
    }
    stage("simhash-wide")(tSimW)

    val (nJac, tJac) = time {
      Dedup.jaccardPairsPrefix(
        codes.withColumnRenamed("codes", "grams"), 0.8).count()
    }
    stage("jaccard-prefix")(tJac)

    // 3-gram order: the density fix for single-script corpora (run with
    // SPARK_GRAFT_DEDUP_CHARS=52 to see the 2-gram join degenerate while
    // this one keeps pruning)
    val (codes3, tCodes3) = time {
      val c = Dedup.shingleCodeTable(docs, n = 3).cache()
      c.count(); c
    }
    stage("shingle3-prep")(tCodes3)
    val (nJac3, tJac3) = time {
      Dedup.jaccardPairsPrefix(
        codes3.withColumnRenamed("codes", "grams"), 0.8).count()
    }
    stage("jaccard3-prefix")(tJac3)
    codes3.unpersist()

    // dedup-group formation: star-contraction components over the union of
    // the wide-simhash and minhash pair sets (the full pipeline's "pairs →
    // groups → keep flags" tail), measured with rounds-to-convergence
    val (ccStats, tCc) = time {
      val pairs = Dedup.simhashWidePairs(
          docs.select(col("doc_id"), TextAnalysis.tokens(col("text"))
            .as("toks")), maxHamming = 3, nBands = 4)
        .unionByName(Dedup.minhashLshPairs(codes)).distinct()
      val (comps, rounds) =
        graft.operators.Components.connectedComponentsRounds(pairs)
      val nGroups = comps.agg(countDistinct("comp")).head().getLong(0)
      (comps.count(), nGroups, rounds)
    }
    stage("components")(tCc)

    // exact-substring span dedup at full corpus size: window keying +
    // dup-key semi-join + per-doc island merge (the q101 scale path; the
    // planted verbatim copies guarantee whole-doc spans, the near-dup
    // perturbations leave shorter shared runs between edits)
    val (ssStats, tSs) = time {
      val sp = graft.operators.SubstringDedup
        .duplicateSpans(docs, w = 20).cache()
      val nSpans = sp.count()
      val nDocs = sp.select(countDistinct("doc_id")).head().getLong(0)
      sp.unpersist(false)
      (nSpans, nDocs)
    }
    stage("substring-spans")(tSs)

    // hashed window keys: identical span output (xxhash64 collisions are
    // 2^-64 per co-partitioned pair), 8-byte shuffle keys instead of the
    // ~140-byte gram strings
    val (nSpansH, tSsH) = time {
      graft.operators.SubstringDedup
        .duplicateSpans(docs, w = 20, hashKeys = true).count()
    }
    stage("substring-spans-hash")(tSsH)

    val exactDupDocs = n / 17 // sanity floor: planted verbatim copies
    println(s"""{"experiment":"dedup_bench","n_docs":$n,"vocab":$vocab,""" +
      s""""first_chars":$firstChars,""" +
      s""""count_sec":$tWarm,"exact_sec":$tExact,"exact_groups":$nKeys,""" +
      s""""shingle_prep_sec":$tCodes,""" +
      s""""minhash_lsh_sec":$tLsh,"minhash_pairs":$nLsh,""" +
      s""""simhash_n":$simN,"simhash_sec":$tSim,"simhash_pairs":$nSim,""" +
      s""""simhash_wide_sec":$tSimW,"simhash_wide_pairs":$nSimW,""" +
      s""""jaccard_prefix_sec":$tJac,"jaccard_pairs":$nJac,""" +
      s""""shingle3_prep_sec":$tCodes3,""" +
      s""""jaccard3_prefix_sec":$tJac3,"jaccard3_pairs":$nJac3,""" +
      s""""components_sec":$tCc,"dup_nodes":${ccStats._1},""" +
      s""""dup_groups":${ccStats._2},"cc_rounds":${ccStats._3},""" +
      s""""substring_spans_sec":$tSs,"substring_spans":${ssStats._1},""" +
      s""""substring_span_docs":${ssStats._2},""" +
      s""""substring_spans_hash_sec":$tSsH,"substring_spans_hash":$nSpansH,""" +
      s""""planted_exact_dups":$exactDupDocs}""")
    codes.unpersist()
    spark.stop()
  }
}
