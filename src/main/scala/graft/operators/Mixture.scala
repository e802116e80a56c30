package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture control for training corpora: deterministic, replayable
  * sampling that reshapes a corpus toward target per-domain rates or exact
  * per-domain counts (the "data mixture" step of every published pretraining
  * recipe — per-source up/down-weighting before tokenization).
  *
  * Selection is keyed on a two-round Lehmer/MINSTD hash of the document id
  * (`((id mod M)·48271 mod M)·69621 + seed mod M`, M = 2^31−1) so the sample
  * is a pure function of (id, seed): re-running the pipeline, adding columns,
  * or re-partitioning the corpus can never change which documents are kept.
  * The arithmetic stays below 2^48 so it replays exactly in any engine with
  * 64-bit integers — including the DuckDB oracle.
  *
  * Scale shape:
  *  - [[sampleByRate]] is a shuffle-free scan filter (keep iff hash below a
  *    rate threshold) — the 100 TB default. Output size is Binomial(n, rate),
  *    tight at corpus scale.
  *  - [[rebalanceExact]] delivers exact per-domain counts. A naive global
  *    rank per domain funnels each domain through one reducer; instead it
  *    pre-filters with an oversampled hash threshold (the same shuffle-free
  *    scan), then ranks only the ~target·oversample survivors. The window
  *    cost is O(target) per domain, independent of corpus size. Survivors
  *    falling short of the target (hash non-uniformity at tiny domains)
  *    falls back to ranking the whole domain — identical output, since the
  *    rank order is the same hash the threshold pre-filtered on.
  */
object Mixture {

  /** Lehmer modulus 2^31 − 1 (prime). */
  val HashMod: Long = 2147483647L

  /** MINSTD multipliers for the two mixing rounds. TWO rounds are load-
    * bearing: a single `id·a mod M` step maps CONSECUTIVE ids (the common
    * doc_id shape) onto an arithmetic ramp that stays far from
    * equidistributed over realistic windows — a threshold filter would
    * keep near-0% or near-100% of a block instead of `rate`. The second
    * multiply makes adjacent ids jump ~M/2 apart, restoring per-window
    * uniformity (MixtureSpec pins Binomial-range accuracy on sequential
    * ids). All intermediates stay < 2^48 — exact in any 64-bit engine. */
  val HashMul: Long = 48271L
  val HashMul2: Long = 69621L

  /** Deterministic per-row hash in [0, HashMod): two Lehmer rounds over
    * (id, seed). */
  def rowHash(id: Column, seed: Long): Column =
    (((pmod(id, lit(HashMod)) * HashMul % HashMod) * HashMul2
      + (seed % HashMod)) % HashMod).cast("long")

  /** JVM replica of [[rowHash]] — shared by specs and row kernels so every
    * path computes the identical value. */
  def rowHashJvm(id: Long, seed: Long): Long =
    ((Math.floorMod(id, HashMod) * HashMul % HashMod) * HashMul2
      + Math.floorMod(seed, HashMod)) % HashMod

  /** SQL replica of [[rowHash]] for oracle generation. */
  def rowHashSql(idExpr: String, seed: Long): String =
    s"(((($idExpr % $HashMod) * $HashMul % $HashMod) * $HashMul2" +
      s" + ${seed % HashMod}) % $HashMod)"

  /** Threshold for a keep-rate in [0, 1]. */
  def rateThreshold(rate: Double): Long =
    math.min(HashMod, math.max(0L, math.floor(rate * HashMod).toLong))

  /** Shuffle-free Bernoulli-style sampling at a per-row rate: keeps a row
    * iff rowHash(id) < floor(rate·M). `rateCol` may be any deterministic
    * Column (a per-domain lookup, a quality-derived weight, a constant) —
    * evaluated next to the scan, no shuffle, no state. */
  def sampleByRate(df: DataFrame, idCol: Column, rateCol: Column,
      seed: Long = 1L): DataFrame =
    df.filter(rowHash(idCol, seed) <
      floor(rateCol * lit(HashMod.toDouble)).cast("long"))

  /** Per-domain rate lookup Column from a literal map; domains absent from
    * the map fall back to `default`. */
  def domainRates(domainCol: Column, rates: Map[String, Double],
      default: Double): Column =
    rates.foldLeft(lit(default)) { case (acc, (dom, r)) =>
      when(domainCol === lit(dom), lit(r)).otherwise(acc)
    }

  /** Fractional UPsampling: emit each row `floor(factor)` times, plus one
    * more copy iff rowHash clears the fractional-part threshold — so a
    * domain with factor 2.3 contributes each doc twice and a
    * deterministic-hash 30% of docs a third time (expected multiplicity =
    * factor exactly). The up-weighting half of mixture shaping (published
    * recipes repeat high-quality domains per epoch); factors < 1 degrade
    * to [[sampleByRate]]. Output adds a `repeat_idx` column (0-based) so
    * downstream shuffling/packing can spread the copies. Shuffle-free:
    * one explode next to the scan. */
  def upsampleByFactor(df: DataFrame, idCol: Column, factorCol: Column,
      seed: Long = 1L): DataFrame = {
    val whole = floor(factorCol).cast("long")
    val fracThresh = floor((factorCol - whole) * lit(HashMod.toDouble))
      .cast("long")
    val copies = whole +
      when(rowHash(idCol, seed) < fracThresh, 1L).otherwise(0L)
    // sequence(0, -1) would generate a DESCENDING [0, -1] — gate on
    // copies > 0 so factor-0 rows vanish (explode drops empty arrays)
    df.withColumn("repeat_idx",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Exact per-domain counts: within each domain, rank documents by
    * (rowHash, id) ascending and keep rank ≤ target. Equivalent to a
    * deterministic uniform sample without replacement of exactly
    * min(target, |domain|) rows per domain.
    *
    * `oversample` controls the pre-filter threshold: the window ranks only
    * rows with hash < M·(target/|domain|)·oversample. If that cut ever
    * yields fewer than `target` survivors for a domain, that domain is
    * re-ranked in full — output identical, just slower — so the result is
    * exact regardless of hash non-uniformity. */
  def rebalanceExact(df: DataFrame, idCol: Column, domainCol: Column,
      targets: Map[String, Long], seed: Long = 1L,
      oversample: Double = 2.0): DataFrame = {
    def targetOf(c: Column): Column =
      targets.foldLeft(lit(0L)) { case (acc, (dom, t)) =>
        when(c === lit(dom), lit(t)).otherwise(acc)
      }
    val hashed = df
      .withColumn("__dom", domainCol)
      .withColumn("__h", rowHash(idCol, seed))
      .withColumn("__tgt", targetOf(domainCol))
    // Domain sizes: one map-side-combined count, broadcast back.
    val sizes = hashed.groupBy("__dom")
      .agg(count(lit(1)).as("__n"))
    val withSize = hashed.join(broadcast(sizes), Seq("__dom"))
    val cut = least(lit(HashMod),
      ceil(lit(HashMod.toDouble) * col("__tgt") / col("__n") *
        lit(oversample)).cast("long"))
    // Materialize the (small, ~oversample·Σtargets-row) survivor set once:
    // the shortfall check AND the final output both consume it, and
    // without truncation each would re-run the full-corpus hash filter
    // (measured 5× the naive window's cost at 1M docs before this).
    val survivors = withSize.filter(col("__h") < cut)
      .localCheckpoint(true)
    val w = Window.partitionBy(col("__dom"))
      .orderBy(col("__h"), idCol)
    val ranked = survivors.withColumn("__rnk", row_number().over(w))
    // Domains where the oversampled cut fell short of the target (and the
    // domain actually has more rows than survived): re-rank those in full.
    // Left-join from sizes so a domain with ZERO survivors still surfaces.
    val got = ranked.groupBy("__dom").agg(max(col("__rnk")).as("__got"))
    val short = sizes.join(got, Seq("__dom"), "left")
      .filter(coalesce(col("__got"), lit(0L)) <
        least(targetOf(col("__dom")), col("__n")))
      .select("__dom")
    val shortSet = short.collect().map(_.getString(0)).toSet
    val kept =
      if (shortSet.isEmpty) ranked
      else {
        val full = withSize
          .filter(col("__dom").isin(shortSet.toSeq: _*))
          .withColumn("__rnk", row_number().over(w))
        ranked.filter(!col("__dom").isin(shortSet.toSeq: _*))
          .unionByName(full)
      }
    kept.filter(col("__rnk") <= col("__tgt"))
      .drop("__h", "__tgt", "__n")
      .withColumnRenamed("__rnk", "rnk")
      .drop("__dom")
  }

  /** Deterministic global training-order permutation into `nShards`
    * shard files — the last step of corpus shaping (a model must not see
    * documents in crawl/domain order, and the permutation must be
    * REPRODUCIBLE for restarts and data lineage). shard =
    * rowHash % nShards, pos = rank of (rowHash, id) within the shard:
    * one hash-keyed shuffle, then per-shard windows of ~n/nShards rows
    * each — no global sort, no single-partition window, and the same
    * (seed, nShards) always reproduces the same order. Emits
    * (idCol, shard, pos); writers partition by shard and sort by pos. */
  def permuteShards(df: DataFrame, idCol: Column, nShards: Int,
      seed: Long = 1L): DataFrame = {
    require(nShards >= 1, "nShards >= 1")
    val h = rowHash(idCol, seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, idCol.asc)
    df.select(idCol, h.as("__h"))
      .withColumn("shard", col("__h") % nShards)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }
}
