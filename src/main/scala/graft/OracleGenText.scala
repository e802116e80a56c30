package graft

import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}

/** DuckDB oracle SQL for the text-analysis / dedup operators, generated from
  * the same constants (profiles, hash params) as the Spark implementations. */
object OracleGenText {

  private val toksCte =
    "SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents"

  def tokenStats: String =
    s"""WITH t AS ($toksCte)
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
       |FROM t ORDER BY doc_id""".stripMargin

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** The qualityScore arithmetic as a SQL expression over the `t` CTE's
    * (toks, text) — shared by the q14 oracle and the q116 quality-weighted
    * sampling oracle. */
  private def scoreExprSql: String = {
    val stops = inList(TextAnalysis.stopwords)
    s"""CAST(floor(1000.0 * (
       |  0.5 * (1.0 - CAST(len(list_filter(toks, x -> list_contains($stops, x))) AS DOUBLE) / len(toks)) +
       |  0.4 * least(1.0, len(toks) / 100.0) +
       |  0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE) / length(text))
       |)) AS BIGINT)""".stripMargin
  }

  def qualityScore: String =
    s"""WITH t AS ($toksCte)
       |SELECT doc_id, $scoreExprSql AS score
       |FROM t ORDER BY doc_id""".stripMargin

  private def langScoresSql: String =
    TextAnalysis.langProfiles.map { case (lang, words) =>
      s"len(list_filter(toks, x -> list_contains(${inList(words)}, x))) AS s_$lang"
    }.mkString(",\n  ")

  // first-max in alphabetical order == the Spark strict-> fold
  private def langCaseSql: String = {
    val langs = TextAnalysis.langProfiles.map(_._1)
    val cases = langs.init.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n  ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  /** q142: the SQL-function surface — score + lang + token count in one
    * relation, same arithmetic as the q13/q14/q15 oracles. */
  def sqlTextCombo: String =
    s"""WITH t AS ($toksCte),
       |s AS (SELECT doc_id,
       |  $langScoresSql
       |FROM t),
       |t2 AS (SELECT s.doc_id, t.toks AS toks, t.text AS text,
       |  $langCaseSql AS pred_lang
       |  FROM s JOIN t ON s.doc_id = t.doc_id)
       |SELECT doc_id, $scoreExprSql AS score, pred_lang,
       |  CAST(len(toks) AS BIGINT) AS n_tokens
       |FROM t2 ORDER BY doc_id""".stripMargin

  def langId: String =
    s"""WITH t AS ($toksCte),
       |s AS (SELECT doc_id,
       |  $langScoresSql
       |FROM t)
       |SELECT doc_id, $langCaseSql AS pred_lang
       |FROM s ORDER BY doc_id""".stripMargin

  def fingerprint: String =
    s"""WITH t AS ($toksCte),
       |c AS (SELECT doc_id,
       |  list_transform(toks, x -> CAST(ascii(x)*100 + length(x) AS BIGINT)) AS codes
       |FROM t)
       |SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
       |    (acc, x) -> (acc * 131 + x) % ${TextAnalysis.FpMod}) AS fp
       |FROM c ORDER BY doc_id""".stripMargin

  def dedupExactPrefix: String =
    s"""WITH t AS ($toksCte)
       |SELECT toks[1] || ' ' || toks[2] AS key,
       |  min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS cnt
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  private val gramsCte =
    """SELECT doc_id, list_distinct([toks[i] || '_' || toks[i+1]
      |  for i in range(1, len(toks))]) AS gs FROM t""".stripMargin

  /** The q93 oracle: identical pair/verify SQL over 3-gram Horner codes —
    * the dense-vocabulary shingle order (Dedup.shingleCodeTable n=3). */
  def ngramJaccardPairs3(threshold: Double): String =
    s"""WITH t AS ($toksCte),
       |g AS (SELECT doc_id, codes AS gs FROM ($codes3Cte)),
       |sz AS (SELECT doc_id, len(gs) AS sz FROM g),
       |inv AS (SELECT doc_id, unnest(gs) AS gr FROM g),
       |sh AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       |  FROM inv a JOIN inv b ON a.gr = b.gr AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b FROM sh
       |JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
       |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $threshold
       |ORDER BY 1, 2""".stripMargin

  private val codes3Cte =
    """SELECT doc_id, list_distinct([
      |  ((ascii(toks[i])*100 + length(toks[i])) * 100003
      |     + ascii(toks[i+1])*100 + length(toks[i+1])) * 100003
      |    + ascii(toks[i+2])*100 + length(toks[i+2])
      |  for i in range(1, len(toks)-1)]) AS codes FROM t""".stripMargin

  /** The q95 oracle: dedup groups = connected components of the 2-gram
    * Jaccard pair graph (same pair SQL as q18), closed transitively with a
    * recursive CTE, then the keep flag per document. Certifies
    * Components.dedupApply end-to-end: pair generation, star-contraction
    * component ids (≡ min reachable id), and canonical selection. */
  /** Shared CTEs: 2-gram Jaccard pairs (q18's SQL) closed transitively to
    * per-node component ids. */
  private def componentCtes(threshold: Double): String =
    s"""t AS ($toksCte),
       |g AS (SELECT doc_id, codes AS gs FROM ($codesCte)),
       |sz AS (SELECT doc_id, len(gs) AS sz FROM g),
       |inv AS (SELECT doc_id, unnest(gs) AS gr FROM g),
       |sh AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       |  FROM inv a JOIN inv b ON a.gr = b.gr AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (SELECT da AS doc_a, db AS doc_b FROM sh
       |  JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
       |  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $threshold),
       |e AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |r AS (SELECT u AS node, u AS reach FROM e
       |  UNION SELECT r.node, e.v FROM r JOIN e ON r.reach = e.u),
       |cc AS (SELECT node, min(reach) AS comp FROM r GROUP BY node)""".stripMargin

  def dedupGroups(threshold: Double): String =
    s"""WITH RECURSIVE ${componentCtes(threshold)}
       |SELECT d.doc_id, CAST(coalesce(cc.comp, d.doc_id) AS BIGINT) AS comp,
       |  CAST(CASE WHEN coalesce(cc.comp, d.doc_id) = d.doc_id
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q124: quality-aware canonical selection — q95's components, keep =
    * per-group argmax of the quality score (ties → lowest doc_id). */
  def dedupBest(threshold: Double): String =
    s"""WITH RECURSIVE ${componentCtes(threshold)},
       |q AS (SELECT doc_id, $scoreExprSql AS score FROM t),
       |m AS (SELECT d.doc_id, q.score,
       |  CAST(coalesce(cc.comp, d.doc_id) AS BIGINT) AS comp
       |  FROM documents d JOIN q USING (doc_id)
       |  LEFT JOIN cc ON cc.node = d.doc_id)
       |SELECT doc_id, score, comp,
       |  CAST(CASE WHEN row_number() OVER (PARTITION BY comp
       |    ORDER BY score DESC, doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT)
       |    AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  /** The q96 oracle: benchmark decontamination — per-document count of
    * distinct 3-gram codes shared with the deterministic benchmark subset
    * (doc_id % 97 = 0) plus the 0/1 flag, same Horner-code arithmetic as
    * q93. */
  def decontaminationFlags: String =
    s"""WITH t AS ($toksCte),
       |c AS ($codes3Cte),
       |bench AS (SELECT DISTINCT unnest(codes) AS gram FROM c
       |  WHERE doc_id % 97 = 0),
       |inv AS (SELECT doc_id, unnest(codes) AS gram FROM c),
       |h AS (SELECT doc_id, count(*) AS hits FROM inv
       |  JOIN bench USING (gram) GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |  CAST(CASE WHEN coalesce(h.hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
       |    AS contaminated
       |FROM documents d LEFT JOIN h USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** q103: fuzzy (MinHash-LSH) decontamination — q96's scale twin. Same
    * benchmark subset rule and flag shape; hit = band-key collision with
    * any benchmark doc, replaying q20's signature and band arithmetic. */
  def decontaminationFuzzyFlags: String = {
    val sel = sigExprs.mkString(",\n  ")
    val bands = (0 until Dedup.NumBands).map { j =>
      val key = (0 until Dedup.RowsPerBand)
        .map(r => s"sig${j * Dedup.RowsPerBand + r}")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $j AS band, $key AS key FROM s"
    }.mkString("\nUNION ALL ")
    s"""WITH t AS ($toksCte),
       |c AS ($codesCte),
       |s AS (SELECT doc_id,
       |  $sel
       |FROM c),
       |bands AS ($bands),
       |bench AS (SELECT DISTINCT band, key FROM bands WHERE doc_id % 97 = 0),
       |h AS (SELECT b.doc_id, count(*) AS band_hits
       |  FROM bands b JOIN bench USING (band, key) GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(h.band_hits, 0) AS BIGINT) AS band_hits,
       |  CAST(CASE WHEN coalesce(h.band_hits, 0) > 0 THEN 1 ELSE 0 END
       |    AS BIGINT) AS contaminated
       |FROM documents d LEFT JOIN h USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The q97 oracle: Gopher-style repetition metrics — duplicate-token and
    * duplicate-2-gram milli-fractions and the top-2-gram occurrence count
    * (identical double arithmetic: 1000.0 * intDiff / intTotal, floored). */
  def repetitionMetrics: String =
    s"""WITH t AS ($toksCte),
       |g AS (SELECT doc_id, toks,
       |  CASE WHEN len(toks) < 2 THEN [] ELSE
       |    [toks[i] || '_' || toks[i+1] for i in range(1, len(toks))] END
       |    AS gs FROM t),
       |top AS (SELECT doc_id, max(c) AS topc FROM (
       |  SELECT doc_id, gr, count(*) AS c FROM
       |    (SELECT doc_id, unnest(gs) AS gr FROM g)
       |  GROUP BY 1, 2) GROUP BY 1)
       |SELECT g.doc_id,
       |  CAST(floor(1000.0 * (len(toks) - len(list_distinct(toks)))
       |    / len(toks)) AS BIGINT) AS dup_tok_milli,
       |  CAST(CASE WHEN len(gs) = 0 THEN 0 ELSE
       |    floor(1000.0 * (len(gs) - len(list_distinct(gs))) / len(gs)) END
       |    AS BIGINT) AS dup_gram_milli,
       |  CAST(coalesce(topc, 0) AS BIGINT) AS top_gram_cnt
       |FROM g LEFT JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin

  /** The q100 oracle: PII scan over the deterministically PII-enriched
    * corpus (phones on doc_id % 5, emails on % 7, URLs on % 11 — same
    * concat arithmetic Spark-side), counts + redacted text with the same
    * patterns and the same replacement order. DuckDB regexp_replace needs
    * the explicit 'g' flag to match Spark's replace-all. */
  def piiScan: String = {
    // single-quoted DuckDB literals pass backslashes through verbatim, so
    // the Scala pattern strings embed unchanged
    val email = TextAnalysis.EmailPattern
    val phone = TextAnalysis.PhonePattern
    val url = TextAnalysis.UrlPattern
    s"""WITH mixed AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' call ' ||
       |      CAST(10 + doc_id % 90 AS VARCHAR) || '-' ||
       |      CAST(100 + doc_id % 900 AS VARCHAR) || '-' ||
       |      CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0
       |      THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@example.com'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0
       |      THEN ' see https://ex.com/d/' || CAST(doc_id AS VARCHAR)
       |      ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(t, '$url')) AS BIGINT) AS n_url,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$email', '<EMAIL>', 'g'),
       |    '$url', '<URL>', 'g'),
       |    '$phone', '<PHONE>', 'g') AS redacted
       |FROM mixed ORDER BY doc_id""".stripMargin
  }

  def ngramJaccardPairs(threshold: Double): String =
    s"""WITH t AS ($toksCte),
       |g AS (SELECT doc_id, codes AS gs FROM ($codesCte)),
       |sz AS (SELECT doc_id, len(gs) AS sz FROM g),
       |inv AS (SELECT doc_id, unnest(gs) AS gr FROM g),
       |sh AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       |  FROM inv a JOIN inv b ON a.gr = b.gr AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b FROM sh
       |JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
       |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $threshold
       |ORDER BY 1, 2""".stripMargin

  private val codesCte =
    """SELECT doc_id, list_distinct([
      |  (ascii(toks[i])*100 + length(toks[i])) * 100003
      |    + ascii(toks[i+1])*100 + length(toks[i+1])
      |  for i in range(1, len(toks))]) AS codes FROM t""".stripMargin

  private def sigExprs: Seq[String] =
    Dedup.minhashParams.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(codes, x -> ($a * x + $b) % ${Dedup.MinhashP})) AS sig$i"
    }

  def minhashSignatures: String = {
    val sel = sigExprs.mkString(",\n  ")
    val unions = (0 until Dedup.NumHashes)
      .map(i => s"SELECT doc_id, CAST($i AS BIGINT) AS i, sig$i AS sig FROM s")
      .mkString("\nUNION ALL ")
    s"""WITH t AS ($toksCte),
       |c AS ($codesCte),
       |s AS (SELECT doc_id,
       |  $sel
       |FROM c)
       |$unions
       |ORDER BY doc_id, i""".stripMargin
  }

  def minhashLshPairs: String = {
    val sel = sigExprs.mkString(",\n  ")
    val bands = (0 until Dedup.NumBands).map { j =>
      val key = (0 until Dedup.RowsPerBand)
        .map(r => s"sig${j * Dedup.RowsPerBand + r}")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $j AS band, $key AS key FROM s"
    }.mkString("\nUNION ALL ")
    s"""WITH t AS ($toksCte),
       |c AS ($codesCte),
       |s AS (SELECT doc_id,
       |  $sel
       |FROM c),
       |bands AS ($bands)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY 1, 2""".stripMargin
  }

  /** The q98 oracle: multi-probe (leave-one-out band key) MinHash-LSH —
    * same signature arithmetic as q19/q20, keys drop one row per band. */
  def minhashLshPairsMultiProbe: String = {
    val sel = sigExprs.mkString(",\n  ")
    val r = Dedup.RowsPerBand
    val probes = (for { j <- 0 until Dedup.NumBands; l <- 0 until r } yield {
      val key = (0 until r).filter(_ != l)
        .map(i => s"sig${j * r + i}")
        .mkString(" || '_' || ")
      s"SELECT doc_id, ${j * r + l} AS probe, $key AS key FROM s"
    }).mkString("\nUNION ALL ")
    s"""WITH t AS ($toksCte),
       |c AS ($codesCte),
       |s AS (SELECT doc_id,
       |  $sel
       |FROM c),
       |probes AS ($probes)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM probes a JOIN probes b
       |  ON a.probe = b.probe AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY 1, 2""".stripMargin
  }

  def simhash: String = {
    val votes = (0 until Dedup.SimhashBits)
      .map(j => s"sum(CASE WHEN (hv >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n  ")
    val value = (0 until Dedup.SimhashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS ($toksCte),
       |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (SELECT doc_id,
       |  (ascii(tok)*100 + length(tok)) * ${Dedup.SimhashMult} % ${Dedup.SimhashMod} AS hv
       |FROM u),
       |b AS (SELECT doc_id,
       |  $votes
       |FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($value AS BIGINT) AS simhash
       |FROM b ORDER BY doc_id""".stripMargin
  }

  // ---- embedding near-dup ---------------------------------------------------

  private def embCols(p: String): String =
    (0 until Tables.embDims)
      .map(i => s"CAST(embedding[${i + 1}] AS DOUBLE) AS $p$i").mkString(", ")

  private def cosine(p1: String, p2: String): String =
    graft.core.Metric.Cosine.sqlExpr(p1, p2, Tables.embDims)

  def embNearDupExact(threshold: Double): String =
    s"""WITH e AS (SELECT vec_id AS id, ${embCols("v")} FROM embeddings)
       |SELECT a.id AS id_a, b.id AS id_b
       |FROM e a JOIN e b ON a.id < b.id
       |WHERE ${cosine("a.v", "b.v")} >= $threshold
       |ORDER BY 1, 2""".stripMargin

  /** q104: SemDeDup — k-means-blocked semantic dedup. Assignment replays
    * the NearestCentroid arithmetic (L2 ASC, cid ASC tie-break, the q06
    * contract); within a cluster dup_of = min smaller id at cosine ≥ t. */
  def semanticDedup(threshold: Double, every: Int, k: Int): String = {
    val l2 = graft.core.Metric.L2
    s"""WITH e AS (SELECT vec_id AS id, ${embCols("v")} FROM embeddings),
       |cents AS (SELECT CAST(vec_id // $every AS BIGINT) AS cid, ${embCols("c")}
       |  FROM embeddings WHERE vec_id % $every = 0 AND vec_id < ${every * k}),
       |assign AS (SELECT id, cid AS cluster_id FROM (
       |  SELECT e.id, c.cid,
       |    row_number() OVER (PARTITION BY e.id
       |      ORDER BY ${l2.sqlExpr("e.v", "c.c", Tables.embDims)} ASC, c.cid ASC)
       |      AS rn
       |  FROM e CROSS JOIN cents c) WHERE rn = 1),
       |ea AS (SELECT e.*, a.cluster_id FROM e JOIN assign a USING (id)),
       |dup AS (SELECT x.id, min(y.id) AS dup_of
       |  FROM ea x JOIN ea y ON x.cluster_id = y.cluster_id AND y.id < x.id
       |  WHERE ${cosine("x.v", "y.v")} >= $threshold GROUP BY x.id)
       |SELECT a.id, CAST(a.cluster_id AS BIGINT) AS cluster_id,
       |  CAST(coalesce(dup.dup_of, -1) AS BIGINT) AS dup_of,
       |  CAST(CASE WHEN dup.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM assign a LEFT JOIN dup USING (id) ORDER BY a.id""".stripMargin
  }

  /** q105: SemDeDup on TRAINED centroids — the operator's real contract
    * (k-means blocking, reference clustering reuse ivf/kmeans.h:29-130):
    * the Lloyd CTE chain from q12 (6-decimal-rounded means, certified)
    * feeds the same blocked-cosine dedup as q104, certifying the
    * `KMeans.lloyd ∘ Dedup.semanticDedup` composition end-to-end. */
  def semanticDedupTrained(threshold: Double, iters: Int): String = {
    val d = Tables.embDims
    s"""WITH ${OracleGen.lloydCtes(iters)},
       |assign AS (${OracleGen.lloydAssignCte(s"c$iters", d)}),
       |ea AS (SELECT data.*, a.cluster_id FROM data JOIN assign a USING (id)),
       |dup AS (SELECT x.id, min(y.id) AS dup_of
       |  FROM ea x JOIN ea y ON x.cluster_id = y.cluster_id AND y.id < x.id
       |  WHERE ${cosine("x.v", "y.v")} >= $threshold GROUP BY x.id)
       |SELECT a.id, CAST(a.cluster_id AS BIGINT) AS cluster_id,
       |  CAST(coalesce(dup.dup_of, -1) AS BIGINT) AS dup_of,
       |  CAST(CASE WHEN dup.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM assign a LEFT JOIN dup USING (id) ORDER BY a.id""".stripMargin
  }

  def embNearDupLsh(threshold: Double): String = {
    val dot = (0 until Tables.embDims)
      .map(i => s"e.v$i * p.v$i").mkString(" + ")
    s"""WITH e AS (SELECT vec_id AS id, ${embCols("v")} FROM embeddings),
       |p AS (SELECT CAST(pow(2, vec_id/125.0) AS BIGINT) AS pw, ${embCols("v")}
       |  FROM embeddings WHERE vec_id % 125 = 0 AND vec_id < 500),
       |b AS (SELECT e.id,
       |  sum(CASE WHEN $dot > 0 THEN p.pw ELSE 0 END) AS bucket
       |FROM e CROSS JOIN p GROUP BY e.id),
       |eb AS (SELECT e.*, b.bucket FROM e JOIN b ON b.id = e.id)
       |SELECT a.id AS id_a, c.id AS id_b
       |FROM eb a JOIN eb c ON a.bucket = c.bucket AND a.id < c.id
       |WHERE ${cosine("a.v", "c.v")} >= $threshold
       |ORDER BY 1, 2""".stripMargin
  }

  /** Multi-probe LSH pairs (q83): same buckets as [[embNearDupLsh]], pairs
    * whose buckets differ in AT MOST ONE plane bit — the brute-force form
    * of the Spark side's probe-exploded equi-join. */
  def embNearDupLshMultiProbe(threshold: Double): String = {
    val dot = (0 until Tables.embDims)
      .map(i => s"e.v$i * p.v$i").mkString(" + ")
    s"""WITH e AS (SELECT vec_id AS id, ${embCols("v")} FROM embeddings),
       |p AS (SELECT CAST(pow(2, vec_id/125.0) AS BIGINT) AS pw, ${embCols("v")}
       |  FROM embeddings WHERE vec_id % 125 = 0 AND vec_id < 500),
       |b AS (SELECT e.id,
       |  sum(CASE WHEN $dot > 0 THEN p.pw ELSE 0 END) AS bucket
       |FROM e CROSS JOIN p GROUP BY e.id),
       |eb AS (SELECT e.*, b.bucket FROM e JOIN b ON b.id = e.id)
       |SELECT a.id AS id_a, c.id AS id_b
       |FROM eb a JOIN eb c
       |  ON bit_count(xor(a.bucket, c.bucket)) <= 1 AND a.id < c.id
       |WHERE ${cosine("a.v", "c.v")} >= $threshold
       |ORDER BY 1, 2""".stripMargin
  }

  /** Content-hashed train/val/test split (same fold as the fingerprint
    * oracle). */
  def datasetSplit(valPct: Int, testPct: Int): String =
    s"""WITH t AS ($toksCte),
       |c AS (SELECT doc_id,
       |  list_transform(toks, x -> CAST(ascii(x)*100 + length(x) AS BIGINT)) AS codes
       |FROM t),
       |fp AS (SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
       |    (acc, x) -> (acc * 131 + x) % ${TextAnalysis.FpMod}) % 100 AS bucket
       |FROM c)
       |SELECT doc_id,
       |  CASE WHEN bucket < $testPct THEN 'test'
       |       WHEN bucket < ${testPct + valPct} THEN 'val'
       |       ELSE 'train' END AS split
       |FROM fp ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs by exact popcount (naive oracle for the banded
    * Spark path). */
  def simhashPairs(maxHamming: Int): String = {
    val votes = (0 until Dedup.SimhashBits)
      .map(j => s"sum(CASE WHEN (hv >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n  ")
    val value = (0 until Dedup.SimhashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS ($toksCte),
       |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (SELECT doc_id,
       |  (ascii(tok)*100 + length(tok)) * ${Dedup.SimhashMult} % ${Dedup.SimhashMod} AS hv
       |FROM u),
       |b AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $value AS simhash FROM b)
       |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
       |FROM sh a JOIN sh c ON a.doc_id < c.doc_id
       |WHERE bit_count(xor(a.simhash, c.simhash)) <= $maxHamming
       |ORDER BY 1, 2""".stripMargin
  }

  private def simhashWideCtes: String = {
    val hvs = Dedup.SimhashWideMults.zipWithIndex.map { case (m, k) =>
      s"(ascii(tok)*100 + length(tok)) * $m % ${Dedup.SimhashWideSubMod} AS hv$k"
    }.mkString(",\n  ")
    val votes = (0 until Dedup.SimhashWideBits).map { j =>
      val k = j / Dedup.SimhashWideSubBits
      val jj = j % Dedup.SimhashWideSubBits
      s"sum(CASE WHEN (hv$k >> $jj) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n  ")
    val value = (0 until Dedup.SimhashWideBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""t AS ($toksCte),
       |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (SELECT doc_id,
       |  $hvs
       |FROM u),
       |b AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM b)"""
      .stripMargin
  }

  /** 60-bit wide SimHash values (q81): four 15-bit sub-hashes with distinct
    * multipliers — same replayable modular arithmetic as the 16-bit oracle,
    * 60 vote columns. */
  def simhashWide: String =
    s"""WITH $simhashWideCtes
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  /** Wide-SimHash pairs (q82): brute-force hamming filter over the wide
    * hashes — the banded Spark join must find exactly this set (pigeonhole
    * losslessness). */
  def simhashWidePairs(maxHamming: Int): String =
    s"""WITH $simhashWideCtes
       |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
       |FROM sh a JOIN sh c ON a.doc_id < c.doc_id
       |WHERE bit_count(xor(a.simhash, c.simhash)) <= $maxHamming
       |ORDER BY 1, 2""".stripMargin

  /** Composite training-data pipeline (q60): quality + language gate →
    * fingerprint exact-dedup → token count + content-hashed split — the
    * q14/q15/q16/q41 folds composed end-to-end, exactly as the Spark
    * pipeline runs them. */
  def pipeline(qMin: Long, valPct: Int, testPct: Int): String = {
    val stops = inList(TextAnalysis.stopwords)
    val scores = TextAnalysis.langProfiles.map { case (lang, words) =>
      s"len(list_filter(toks, x -> list_contains(${inList(words)}, x))) AS s_$lang"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langProfiles.map(_._1)
    val cases = langs.init.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n  ")
    s"""WITH t AS ($toksCte),
       |f AS (SELECT doc_id, toks, text,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(toks, x -> CAST(ascii(x)*100 + length(x) AS BIGINT))),
       |    (acc, x) -> (acc * 131 + x) % ${TextAnalysis.FpMod}) AS fp
       |FROM t),
       |s AS (SELECT doc_id,
       |  $scores
       |FROM t),
       |lang AS (SELECT doc_id, CASE $cases ELSE '${langs.last}' END AS pred_lang
       |FROM s),
       |q AS (SELECT doc_id, CAST(floor(1000.0 * (
       |  0.5 * (1.0 - CAST(len(list_filter(toks, x -> list_contains($stops, x))) AS DOUBLE) / len(toks)) +
       |  0.4 * least(1.0, len(toks) / 100.0) +
       |  0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE) / length(text))
       |)) AS BIGINT) AS score FROM t),
       |gated AS (
       |  SELECT f.doc_id, f.fp, CAST(len(f.toks) AS BIGINT) AS n_tokens,
       |    q.score
       |  FROM f JOIN lang ON lang.doc_id = f.doc_id
       |  JOIN q ON q.doc_id = f.doc_id
       |  WHERE q.score >= $qMin AND lang.pred_lang = 'en'),
       |keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY fp)
       |SELECT g.doc_id, g.n_tokens, g.score,
       |  CASE WHEN g.fp % 100 < $testPct THEN 'test'
       |       WHEN g.fp % 100 < ${testPct + valPct} THEN 'val'
       |       ELSE 'train' END AS split
       |FROM gated g JOIN keep ON keep.doc_id = g.doc_id
       |ORDER BY g.doc_id""".stripMargin
  }

  /** Hourly tumbling event-time windows (batch twin of the streaming agg). */
  def eventWindows: String =
    s"""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
       |    AS window_start,
       |  event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
       |    AS value_cents
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization. */
  def sessions(gapMinutes: Int): String =
    s"""WITH g AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |      OR CAST(floor(epoch(ts)) AS BIGINT) -
       |         CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) >
       |         ${gapMinutes * 60} THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM g)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(min(floor(epoch(ts))) AS BIGINT) AS start_epoch,
       |  CAST(max(floor(epoch(ts))) AS BIGINT) AS end_epoch
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Bounded per-user event-type paths. */
  def userPaths(maxLen: Int): String =
    s"""WITH r AS (
       |  SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS rn
       |  FROM events)
       |SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
       |  CAST(count(*) AS BIGINT) AS path_len
       |FROM r WHERE rn <= $maxLen GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** Event-time interval self-join: per-event count + value-cents sum of
    * the same user's events in the strictly preceding window. */
  def recentContext(windowMinutes: Int): String =
    s"""SELECT l.event_id, l.user_id,
       |  CAST(count(r.event_id) AS BIGINT) AS n_recent,
       |  CAST(coalesce(sum(CAST(round(r.value * 100) AS BIGINT)), 0)
       |    AS BIGINT) AS recent_value_cents
       |FROM events l LEFT JOIN events r
       |  ON l.user_id = r.user_id
       |  AND floor(epoch(r.ts)) >= floor(epoch(l.ts)) - ${windowMinutes * 60}
       |  AND floor(epoch(r.ts)) < floor(epoch(l.ts))
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Whitespace vs BPE-ish-regex token counts (same pattern in both
    * engines). */
  def bpeTokens: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(text,
       |    '${graft.operators.TextAnalysis.BpePattern}')) AS BIGINT) AS n_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal decode stats: the stub codec's samples are the utf-8 payload
    * bytes, so for ASCII documents the checksum fold equals the per-char
    * ascii fold; width/height derive from the byte length exactly as
    * Multimodal.pack does. */
  def mediaDecode: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(text, ''),
       |      c -> CAST(ascii(c) AS BIGINT))),
       |    (a, x) -> (a * 131 + x) % ${graft.operators.Multimodal.FpMod}
       |  ) AS checksum,
       |  CAST(greatest(1, length(text) % 64) AS BIGINT) AS width,
       |  CAST(greatest(1, length(text) // greatest(1, length(text) % 64))
       |    AS BIGINT) AS height
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Real-container media decode (Multimodal.packReal + RawCodec): DuckDB
    * replays the deterministic sample formulas — WAV samples
    * ((id·31+i·7+13) mod 256) − 128 for even ids, PPM channel values
    * (id·31+j·7+13) mod 256 for odd — and checks the position-weighted
    * sums of what the real WAV/PPM parsers decoded. */
  def mediaReal: String =
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
       |gen AS (
       |  SELECT doc_id, unnest(generate_series(0,
       |    CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id % 64
       |         ELSE (8 + doc_id % 8) * (4 + doc_id % 4) * 3 END - 1)) AS i
       |  FROM d),
       |vals AS (
       |  SELECT doc_id, i,
       |    CASE WHEN doc_id % 2 = 0
       |      THEN (doc_id * 31 + i * 7 + 13) % 256 - 128
       |      ELSE (doc_id * 31 + i * 7 + 13) % 256 END AS v
       |  FROM gen)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(v) AS BIGINT) AS sum1,
       |  CAST(sum((i + 1) * v) AS BIGINT) AS sum2
       |FROM vals GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Compressed-container decode (Multimodal.packPng + ImageIoCodec): PNG
    * is lossless, so DuckDB replays the generator formula
    * `c_j = (id·31 + j·7 + 13) mod 256` over w·h·3 samples (w = 8 + id mod
    * 8, h = 4 + id mod 4) and checks the position-weighted sums of what the
    * JDK ImageIO decoder read back from real PNG bytes. */
  def mediaPng: String =
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
       |gen AS (
       |  SELECT doc_id, unnest(generate_series(0,
       |    (8 + doc_id % 8) * (4 + doc_id % 4) * 3 - 1)) AS i
       |  FROM d),
       |vals AS (
       |  SELECT doc_id, i, (doc_id * 31 + i * 7 + 13) % 256 AS v
       |  FROM gen)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(v) AS BIGINT) AS sum1,
       |  CAST(sum((i + 1) * v) AS BIGINT) AS sum2
       |FROM vals GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** JPEG decode invariants (Multimodal.packJpeg + jpegDecodeFlags): JPEG
    * is lossy, so the oracle asserts the invariant flags — exact decoded
    * sample count (w·h·3 from the generator geometry), geometry round-trip,
    * and bounded per-sample error — all expected 1. */
  def mediaJpegFlags: String =
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST((16 + doc_id % 8) * (8 + doc_id % 4) * 3 AS BIGINT)
       |    AS n_samples,
       |  CAST(1 AS BIGINT) AS dims_ok, CAST(1 AS BIGINT) AS err_ok
       |FROM documents ORDER BY doc_id""".stripMargin

  /** q107: MJPEG-AVI decode invariants — frame count/geometry/sample count
    * replayed from the packAvi formula; dims_ok/err_ok must hold for
    * every row (real RIFF walk + real JPEG decode on the Spark side). */
  def mediaAviFlags: String =
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
       |  CAST((2 + doc_id % 3) * (16 + doc_id % 8) * (8 + doc_id % 4) * 3
       |    AS BIGINT) AS n_samples,
       |  CAST(1 AS BIGINT) AS dims_ok, CAST(1 AS BIGINT) AS err_ok
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Stratified sample (TextAnalysis.stratifiedSample): language strata,
    * per-stratum winners = the n smallest (fingerprint, doc_id) — replayed
    * here as a window rank over the same fold arithmetic as q15 (strata)
    * and q16 (fingerprint). The Spark side computes it with the bounded
    * top-k partial-merge aggregate, so agreement certifies that the
    * distributed heap merge equals the global sort semantics. */
  def stratifiedSample(n: Int): String =
    s"""WITH t AS ($toksCte),
       |s AS (SELECT doc_id, $langScoresSql FROM t),
       |lang AS (SELECT doc_id, $langCaseSql AS stratum FROM s),
       |c AS (SELECT doc_id,
       |  list_transform(toks, x -> CAST(ascii(x)*100 + length(x) AS BIGINT)) AS codes
       |FROM t),
       |f AS (SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
       |    (acc, x) -> (acc * 131 + x) % ${TextAnalysis.FpMod}) AS fp
       |FROM c),
       |r AS (SELECT lang.stratum, f.doc_id,
       |  row_number() OVER (PARTITION BY lang.stratum
       |    ORDER BY f.fp, f.doc_id) AS rnk
       |FROM lang JOIN f ON lang.doc_id = f.doc_id)
       |SELECT stratum, CAST(rnk AS BIGINT) AS rnk, doc_id
       |FROM r WHERE rnk <= $n
       |ORDER BY stratum, rnk""".stripMargin

  /** Video container decode (Multimodal.packY4m + RawCodec.decodeY4m):
    * Y4M is uncompressed, so DuckDB replays the luma formula
    * `v_j = (id·31 + j·7 + 13) mod 256` over f·w·h samples (w = 8 + id mod
    * 8, h = 4 + id mod 4, f = 2 + id mod 3) and checks the per-frame
    * weighted sum `Σ (1 + j / (w·h))·v_j` — which only matches if the
    * Spark-side parser segmented frames at the real FRAME markers. */
  def mediaY4m: String =
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
       |geo AS (
       |  SELECT doc_id, (8 + doc_id % 8) * (4 + doc_id % 4) AS frame_len,
       |         2 + doc_id % 3 AS f
       |  FROM d),
       |gen AS (
       |  SELECT doc_id, frame_len, f,
       |    unnest(generate_series(0, f * frame_len - 1)) AS j
       |  FROM geo),
       |vals AS (
       |  SELECT doc_id, f, j, j // frame_len AS frame_idx,
       |    (doc_id * 31 + j * 7 + 13) % 256 AS v
       |  FROM gen)
       |SELECT doc_id, CAST(max(f) AS BIGINT) AS n_frames,
       |  CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(v) AS BIGINT) AS sum1,
       |  CAST(sum((1 + frame_idx) * v) AS BIGINT) AS sum_frame
       |FROM vals GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared CTE chain for the exact-substring queries: every width-`w`
    * token window keyed by its literal substring, duplicated keys
    * (count ≥ 2 corpus-wide), and the per-doc gaps-and-islands merge into
    * maximal spans — the same window semantics SubstringDedup runs. */
  private def dupSpanCtes(w: Int): String =
    s"""t AS ($toksCte),
       |p AS (SELECT doc_id, toks,
       |  unnest(generate_series(1, len(toks) - ${w - 1})) AS pos FROM t),
       |wn AS (SELECT doc_id, pos,
       |  array_to_string(toks[pos:pos+${w - 1}], ' ') AS gram FROM p),
       |d AS (SELECT gram FROM wn GROUP BY gram HAVING count(*) >= 2),
       |dw AS (SELECT doc_id, pos, pos + ${w - 1} AS e
       |  FROM wn SEMI JOIN d USING (gram)),
       |g AS (SELECT doc_id, pos, e,
       |  CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id
       |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1) + 1 THEN 1 ELSE 0 END AS brk
       |  FROM dw),
       |isl AS (SELECT doc_id, pos, e,
       |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM g),
       |sp AS (SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
       |  FROM isl GROUP BY doc_id, grp)""".stripMargin

  /** q101: maximal duplicated token spans (ExactSubstr relaxation). */
  def dupSpans(w: Int): String =
    s"""WITH ${dupSpanCtes(w)}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(span_start AS BIGINT) AS span_start,
       |  CAST(span_end AS BIGINT) AS span_end,
       |  CAST(span_end - span_start + 1 AS BIGINT) AS span_len
       |FROM sp ORDER BY doc_id, span_start""".stripMargin

  /** q102: span removal — clean text with duplicated runs deleted; every
    * doc appears (fully-removed docs keep an empty string). */
  def dupSpanRemoval(w: Int): String =
    s"""WITH ${dupSpanCtes(w)},
       |tk0 AS (SELECT doc_id, toks,
       |  unnest(generate_series(1, len(toks))) AS pos FROM t),
       |tk AS (SELECT doc_id, pos, toks[pos] AS tok FROM tk0),
       |cov AS (SELECT tk.doc_id, tk.pos, tk.tok,
       |  (s.span_start IS NOT NULL) AS covered
       |  FROM tk LEFT JOIN sp s ON tk.doc_id = s.doc_id
       |    AND tk.pos BETWEEN s.span_start AND s.span_end)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  coalesce(string_agg(CASE WHEN NOT covered THEN tok END, ' '
       |    ORDER BY pos), '') AS clean_text,
       |  CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
       |    AS removed_tokens,
       |  CAST(count(*) AS BIGINT) AS n_tokens
       |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- mixture / packing / quality-gate oracles (q109–q115) -------------

  import graft.operators.Mixture

  /** The q109/q110 row hash replayed in SQL — same Lehmer arithmetic as
    * [[Mixture.rowHash]]. */
  private def hashSql(seed: Long): String =
    Mixture.rowHashSql("doc_id", seed)

  private def rateThresholdCase(rates: Map[String, Double],
      default: Double): String = {
    val whens = rates.toSeq.sortBy(_._1).map { case (dom, r) =>
      s"WHEN '$dom' THEN ${Mixture.rateThreshold(r)}"
    }.mkString(" ")
    s"CASE source $whens ELSE ${Mixture.rateThreshold(default)} END"
  }

  /** q109: shuffle-free per-domain rate sampling. */
  def mixtureRate(rates: Map[String, Double], default: Double,
      seed: Long): String =
    s"""SELECT doc_id, source FROM documents
       |WHERE ${hashSql(seed)} < ${rateThresholdCase(rates, default)}
       |ORDER BY doc_id""".stripMargin

  /** q116: quality-weighted sampling — keep probability proportional to
    * the document's quality score (score/1000 as the rate); the
    * upweight-good-documents recipe composed from two certified pieces. */
  def qualityWeightedSample(seed: Long): String =
    s"""WITH t AS ($toksCte),
       |s AS (SELECT doc_id, $scoreExprSql AS score FROM t)
       |SELECT doc_id, score FROM s
       |WHERE ${hashSql(seed)} <
       |  CAST(floor(score / 1000.0 * ${Mixture.HashMod}.0) AS BIGINT)
       |ORDER BY doc_id""".stripMargin

  /** q117: repeat-factor upsampling — floor(factor) copies plus a
    * hash-deterministic fractional copy, same IEEE double arithmetic for
    * the fractional threshold as Mixture.upsampleByFactor. */
  def upsampleFactors(factors: Map[String, Double], default: Double,
      seed: Long): String = {
    // CAST every factor literal: bare 2.5 is DECIMAL in DuckDB, and the
    // fractional-threshold arithmetic must run in IEEE double like Spark
    val facCase = factors.toSeq.sortBy(_._1).map { case (d, f) =>
      s"WHEN '$d' THEN CAST($f AS DOUBLE)"
    }.mkString("CASE source ", " ",
      s" ELSE CAST($default AS DOUBLE) END")
    s"""WITH f AS (SELECT doc_id, source, $facCase AS fac FROM documents),
       |c AS (SELECT doc_id, source,
       |  CAST(floor(fac) AS BIGINT) + CASE WHEN ${hashSql(seed)} <
       |    CAST(floor((fac - CAST(CAST(floor(fac) AS BIGINT) AS DOUBLE))
       |      * ${Mixture.HashMod}.0) AS BIGINT)
       |    THEN 1 ELSE 0 END AS copies
       |  FROM f)
       |SELECT doc_id, source,
       |  unnest(generate_series(0, copies - 1)) AS repeat_idx
       |FROM c WHERE copies > 0 ORDER BY doc_id, repeat_idx""".stripMargin
  }

  /** q110: exact per-domain rebalance — full rank per domain (the oracle
    * need not replicate the oversampling shortcut; output is identical). */
  def mixtureRebalance(targets: Map[String, Long], seed: Long): String = {
    val doms = targets.keys.toSeq.sorted.map(d => s"'$d'").mkString(", ")
    val tgtCase = targets.toSeq.sortBy(_._1).map { case (d, t) =>
      s"WHEN '$d' THEN $t"
    }.mkString("CASE source ", " ", " ELSE 0 END")
    s"""WITH h AS (SELECT doc_id, source, ${hashSql(seed)} AS hh
       |  FROM documents WHERE source IN ($doms)),
       |r AS (SELECT doc_id, source,
       |  row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rnk
       |  FROM h)
       |SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk FROM r
       |WHERE rnk <= $tgtCase ORDER BY source, rnk""".stripMargin
  }

  /** Shared CTEs for the greedy-packing oracles: per-source doc streams in
    * doc_id order, the greedy first-fit recurrence as a recursive CTE. */
  private def packCtes(capacity: Long): String =
    s"""t AS (SELECT doc_id, source,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS sz
       |  FROM documents),
       |o AS (SELECT *, row_number() OVER (PARTITION BY source
       |  ORDER BY doc_id) AS rn FROM t),
       |r AS (
       |  SELECT source, doc_id, sz, rn, CAST(0 AS BIGINT) AS bin,
       |    sz AS fill FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.source, o.doc_id, o.sz, o.rn,
       |    CASE WHEN r.fill + o.sz > $capacity AND r.fill > 0
       |      THEN r.bin + 1 ELSE r.bin END,
       |    CASE WHEN r.fill + o.sz > $capacity AND r.fill > 0
       |      THEN o.sz ELSE r.fill + o.sz END
       |  FROM o JOIN r ON o.source = r.source AND o.rn = r.rn + 1)""".stripMargin

  /** q111: greedy sequence packing (single-shard streams). */
  def packGreedy(capacity: Long): String =
    s"""WITH RECURSIVE ${packCtes(capacity)}
       |SELECT doc_id, source, CAST(0 AS INTEGER) AS shard,
       |  sz AS n_tokens, bin
       |FROM r ORDER BY source, doc_id""".stripMargin

  /** q112: per-bin fill statistics over the q111 packing. */
  def packBinStats(capacity: Long): String =
    s"""WITH RECURSIVE ${packCtes(capacity)}
       |SELECT source, CAST(0 AS INTEGER) AS shard, bin,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(sz) AS BIGINT) AS bin_sz,
       |  CAST(floor(sum(sz) * 1000.0 / $capacity.0) AS BIGINT)
       |    AS util_permille
       |FROM r GROUP BY source, bin ORDER BY source, bin""".stripMargin

  /** q115: size-targeted output sharding via window cumulative sum. */
  def shardByRunningSize(target: Long): String =
    s"""SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       |  CAST(floor(CAST(sum(n_chars) OVER (PARTITION BY source
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
       |      CURRENT ROW) - n_chars AS DOUBLE) / $target.0) AS BIGINT)
       |    AS out_shard
       |FROM documents ORDER BY source, doc_id""".stripMargin

  /** q113: C4-style heuristic gate — same integer-exact arithmetic as
    * TextAnalysis.c4Filters. */
  def c4Filters: String = {
    val bad = TextAnalysis.badWords.map(w =>
      s"list_contains(toks, '$w')").mkString(" OR ")
    val boiler = TextAnalysis.boilerplatePhrases.map(p =>
      s"contains(lower(text), '$p')").mkString(" OR ")
    s"""WITH t AS ($toksCte),
       |s AS (SELECT doc_id, text, toks,
       |  CAST(len(toks) AS BIGINT) AS n_words,
       |  CAST(length(text) - (len(toks) - 1) AS BIGINT) AS sum_word_len
       |FROM t),
       |f AS (SELECT doc_id, n_words, sum_word_len,
       |  (n_words >= ${TextAnalysis.C4MinWords}
       |    AND n_words <= ${TextAnalysis.C4MaxWords}) AS words_ok,
       |  (sum_word_len >= ${TextAnalysis.C4MeanWordLenMin} * n_words
       |    AND sum_word_len <= ${TextAnalysis.C4MeanWordLenMax} * n_words)
       |    AS mean_len_ok,
       |  ($bad) AS has_bad_word,
       |  ($boiler) AS has_boilerplate,
       |  (contains(text, '{') OR contains(text, '}')) AS has_brace
       |FROM s)
       |SELECT doc_id, n_words, sum_word_len, words_ok, mean_len_ok,
       |  has_bad_word, has_boilerplate, has_brace,
       |  (words_ok AND mean_len_ok AND NOT has_bad_word
       |    AND NOT has_boilerplate AND NOT has_brace) AS kept
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // ---- BPE training oracles (q118/q119) ---------------------------------

  /** Shared CTE chain: word-frequency table, canonical symbol strings
    * (one leading/trailing space, double gaps, `</w>` marker), then `m`
    * unrolled merge rounds — per round, pair counts weighted by word freq,
    * argmax with (cnt DESC, pair ASC) tie-break, and the plain
    * `replace(' x  y ' → ' xy ')` rewrite, exactly the engine's
    * arithmetic. */
  private def bpeCtes(m: Int): String = {
    val init =
      s"""wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE w <> '' GROUP BY w),
         |v0 AS (SELECT w, freq,
         |  ' ' || array_to_string([w[i:i] FOR i IN range(1, length(w)+1)],
         |    '  ') || '  </w> ' AS s FROM wf)""".stripMargin
    val rounds = (1 to m).map { r =>
      s"""p$r AS (SELECT pr, sum(freq) AS cnt FROM (
         |  SELECT freq, unnest([syms[i] || chr(1) || syms[i+1]
         |    FOR i IN range(1, len(syms))]) AS pr
         |  FROM (SELECT freq, string_split(trim(s), '  ') AS syms
         |        FROM v${r - 1})) GROUP BY pr),
         |b$r AS (SELECT pr, cnt FROM p$r ORDER BY cnt DESC, pr ASC
         |  LIMIT 1),
         |v$r AS (SELECT w, freq, replace(s,
         |  ' ' || string_split(pr, chr(1))[1] || '  ' ||
         |    string_split(pr, chr(1))[2] || ' ',
         |  ' ' || replace(pr, chr(1), '') || ' ') AS s
         |  FROM v${r - 1}, b$r)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  /** q118: the learned merge table — full m-round replay. */
  def bpeTrain(m: Int): String = {
    val union = (1 to m)
      .map(r => s"SELECT $r AS round, pr, cnt FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeCtes(m)}
       |SELECT CAST(round AS INTEGER) AS round,
       |  string_split(pr, chr(1))[1] AS lhs,
       |  string_split(pr, chr(1))[2] AS rhs,
       |  CAST(cnt AS BIGINT) AS cnt
       |FROM ($union) ORDER BY round""".stripMargin
  }

  /** q119: per-document token counts under the learned merges. */
  def bpeTokenCounts(m: Int): String =
    s"""WITH ${bpeCtes(m)}
       |SELECT doc_id, CAST(sum(len(string_split(trim(s), '  '))) AS BIGINT)
       |  AS n_bpe_tokens
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents) d
       |JOIN v$m USING (w)
       |WHERE w <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q140: per-document BPE token sequence — the q119 vocab replay, each
    * word's canonical double-gap string collapsed to single spaces and
    * reassembled in word order (training corpus: every word present, so
    * the inner join matches Bpe.encode's left-join-with-fallback). */
  def bpeEncode(m: Int): String =
    s"""WITH ${bpeCtes(m)},
       |t0 AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |d AS (SELECT doc_id, unnest([{'pos': i, 'w': toks[i]}
       |  FOR i IN range(1, len(toks) + 1)]) AS s FROM t0),
       |p AS (SELECT doc_id, s.pos AS pos, s.w AS w FROM d
       |  WHERE s.w <> ''),
       |j AS (SELECT doc_id, pos, replace(trim(s), '  ', ' ') AS tokstr
       |  FROM p JOIN v$m USING (w)),
       |agg AS (SELECT doc_id,
       |  list_sort(list({'pos': pos, 'tokstr': tokstr})) AS ps
       |  FROM j GROUP BY doc_id),
       |outp AS (SELECT doc_id,
       |  array_to_string(list_transform(ps, x -> x.tokstr), ' ')
       |    AS bpe_tokens FROM agg)
       |SELECT doc_id, bpe_tokens,
       |  CAST(len(string_split(bpe_tokens, ' ')) AS BIGINT)
       |    AS n_bpe_tokens
       |FROM outp ORDER BY doc_id""".stripMargin

  /** q120: bigram-LM mean-probability score — bigram/unigram counts from
    * the same corpus, p = c2/c1 per in-doc bigram, ORDERED left fold (the
    * Spark side sorts by position and folds identically), final
    * floor(1e9·mean). Integer counts + exactly-rounded IEEE division,
    * addition, multiplication only — no transcendentals — so the double
    * arithmetic is bit-identical across engines. */
  def lmScore: String =
    s"""WITH t AS ($toksCte),
       |pr AS (SELECT doc_id, unnest([{'pos': i, 'w1': toks[i],
       |    'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS s FROM t),
       |p0 AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2
       |  FROM pr),
       |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM p0
       |  GROUP BY w1, w2),
       |ug AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY w1),
       |probs AS (SELECT doc_id, pos,
       |  coalesce(CAST(c2 AS DOUBLE) / c1, CAST(0 AS DOUBLE)) AS p
       |  FROM p0 LEFT JOIN bg USING (w1, w2) LEFT JOIN ug USING (w1)),
       |agg AS (SELECT doc_id,
       |  list_sort(list({'pos': pos, 'p': p})) AS ps FROM probs
       |  GROUP BY doc_id)
       |SELECT doc_id, CAST(floor(CAST(1000000000 AS DOUBLE) *
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(ps, x -> x.p)), (a, b) -> a + b)
       |    / len(ps)) AS BIGINT) AS lm_score_nano
       |FROM agg ORDER BY doc_id""".stripMargin

  /** q158: CCNet head/middle/tail buckets — exact global rank over the
    * q120 scores (DESC, ties by doc_id), bucket = (n·(rank−1)) div count
    * in pure integer arithmetic. */
  def ccnetBuckets(nBuckets: Int): String =
    s"""SELECT doc_id, lm_score_nano,
       |  CAST(($nBuckets * (rn - 1)) // n AS BIGINT) AS bucket FROM (
       |  SELECT doc_id, lm_score_nano,
       |    row_number() OVER (ORDER BY lm_score_nano DESC, doc_id ASC)
       |      AS rn,
       |    count(*) OVER () AS n
       |  FROM ($lmScore) s0) r
       |ORDER BY doc_id""".stripMargin

  /** q159: DSIR importance weights — target domain = docs with
    * doc_id % targetMod = 0, raw = the full corpus; Laplace-smoothed
    * bigram log-ratio Σ ln((ct+1)/(Nt+V)) − ln((cr+1)/(Nr+V)) folded in
    * position order and nano-floored (ln bitwise ≡ across engines, the
    * q128 BM25 precedent). */
  def dsirWeights(targetMod: Long): String =
    s"""WITH t AS ($toksCte),
       |pr AS (SELECT doc_id, unnest([{'pos': i, 'w1': toks[i],
       |    'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS s FROM t),
       |p0 AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2
       |  FROM pr),
       |rbg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cr FROM p0
       |  GROUP BY w1, w2),
       |tbg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS ct FROM p0
       |  WHERE doc_id % $targetMod = 0 GROUP BY w1, w2),
       |tot AS (SELECT
       |  (SELECT coalesce(sum(ct), 0) FROM tbg) AS nt,
       |  (SELECT sum(cr) FROM rbg) AS nr,
       |  (SELECT count(*) FROM rbg) AS v),
       |terms AS (SELECT p0.doc_id, p0.pos,
       |  ln((CAST(coalesce(tbg.ct, 0) AS DOUBLE) + CAST(1 AS DOUBLE)) /
       |    CAST(tot.nt + tot.v AS DOUBLE)) -
       |  ln((CAST(coalesce(rbg.cr, 0) AS DOUBLE) + CAST(1 AS DOUBLE)) /
       |    CAST(tot.nr + tot.v AS DOUBLE)) AS tm
       |  FROM p0 LEFT JOIN tbg USING (w1, w2)
       |  LEFT JOIN rbg USING (w1, w2) CROSS JOIN tot),
       |agg AS (SELECT doc_id,
       |  list_sort(list({'pos': pos, 'tm': tm})) AS ts FROM terms
       |  GROUP BY doc_id)
       |SELECT doc_id, CAST(floor(CAST(1000000000 AS DOUBLE) *
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(ts, x -> x.tm)), (a, b) -> a + b))
       |  AS BIGINT) AS dsir_nano
       |FROM agg ORDER BY doc_id""".stripMargin

  /** q121: sliding-window chunking — same integer chunk-count formula and
    * 1-based list slicing as Packing.chunkByTokens (the ceil runs through
    * double division in BOTH engines for bit parity). */
  def chunking(maxTokens: Int, overlap: Int): String = {
    val stride = maxTokens - overlap
    s"""WITH t AS ($toksCte),
       |c AS (SELECT doc_id, toks, len(toks) AS n,
       |  CASE WHEN len(toks) <= $maxTokens THEN 1
       |    ELSE 1 + CAST(floor((len(toks) - $maxTokens + ${stride - 1})
       |      / $stride.0) AS INTEGER) END AS k FROM t),
       |e AS (SELECT doc_id, toks, n, unnest(range(k)) AS i FROM c)
       |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       |  CAST(least($maxTokens, n - i * $stride) AS BIGINT)
       |    AS n_chunk_tokens,
       |  array_to_string(toks[i * $stride + 1 :
       |    i * $stride + least($maxTokens, n - i * $stride)], ' ')
       |    AS chunk_text
       |FROM e ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** q123: the corpus-shaping pipeline end-to-end — C4 gate ∘ LM-score
    * floor ∘ deterministic rate sampling ∘ greedy packing, one SQL replay
    * composing the q113/q120/q109/q111 pieces over the SURVIVOR stream. */
  def shapingPipeline(lmFloorNano: Long, rate: Double, seed: Long,
      capacity: Long): String = {
    val bad = TextAnalysis.badWords.map(w =>
      s"list_contains(toks, '$w')").mkString(" OR ")
    val boiler = TextAnalysis.boilerplatePhrases.map(p =>
      s"contains(lower(text), '$p')").mkString(" OR ")
    s"""WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ')
       |    AS toks, text FROM documents),
       |c4 AS (SELECT doc_id FROM t WHERE
       |  len(toks) >= ${TextAnalysis.C4MinWords}
       |  AND len(toks) <= ${TextAnalysis.C4MaxWords}
       |  AND length(text) - (len(toks) - 1) >=
       |    ${TextAnalysis.C4MeanWordLenMin} * len(toks)
       |  AND length(text) - (len(toks) - 1) <=
       |    ${TextAnalysis.C4MeanWordLenMax} * len(toks)
       |  AND NOT ($bad) AND NOT ($boiler)
       |  AND NOT (contains(text, '{') OR contains(text, '}'))),
       |pr AS (SELECT doc_id, unnest([{'pos': i, 'w1': toks[i],
       |    'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS s FROM t),
       |p0 AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2
       |  FROM pr),
       |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM p0
       |  GROUP BY w1, w2),
       |ug AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY w1),
       |probs AS (SELECT doc_id, pos,
       |  coalesce(CAST(c2 AS DOUBLE) / c1, CAST(0 AS DOUBLE)) AS p
       |  FROM p0 LEFT JOIN bg USING (w1, w2) LEFT JOIN ug USING (w1)),
       |lm AS (SELECT doc_id, CAST(floor(CAST(1000000000 AS DOUBLE) *
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(list_sort(list({'pos': pos, 'p': p})),
       |        x -> x.p)), (a, b) -> a + b) / count(*)) AS BIGINT)
       |    AS score FROM probs GROUP BY doc_id),
       |kept AS (SELECT d.doc_id, d.source,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS sz
       |  FROM documents d
       |  SEMI JOIN c4 USING (doc_id)
       |  JOIN lm USING (doc_id)
       |  WHERE lm.score >= $lmFloorNano
       |    AND ${hashSql(seed)} < ${Mixture.rateThreshold(rate)}),
       |o AS (SELECT *, row_number() OVER (PARTITION BY source
       |  ORDER BY doc_id) AS rn FROM kept),
       |r AS (
       |  SELECT source, doc_id, sz, rn, CAST(0 AS BIGINT) AS bin,
       |    sz AS fill FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.source, o.doc_id, o.sz, o.rn,
       |    CASE WHEN r.fill + o.sz > $capacity AND r.fill > 0
       |      THEN r.bin + 1 ELSE r.bin END,
       |    CASE WHEN r.fill + o.sz > $capacity AND r.fill > 0
       |      THEN o.sz ELSE r.fill + o.sz END
       |  FROM o JOIN r ON o.source = r.source AND o.rn = r.rn + 1)
       |SELECT doc_id, source, sz AS n_tokens, bin FROM r
       |ORDER BY source, doc_id""".stripMargin
  }

  /** q122: dataset-card per-domain statistics — reuses the langId CASE. */
  def corpusStats: String =
    s"""WITH t AS ($toksCte),
       |d AS (SELECT doc_id, toks FROM t),
       |s AS (SELECT doc_id,
       |  $langScoresSql
       |FROM t),
       |l AS (SELECT doc_id, $langCaseSql AS pred_lang FROM s),
       |j AS (SELECT doc.source AS domain,
       |  CAST(len(d.toks) AS BIGINT) AS n_toks, l.pred_lang
       |  FROM documents doc JOIN d ON doc.doc_id = d.doc_id
       |  JOIN l ON doc.doc_id = l.doc_id)
       |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(min(n_toks) AS BIGINT) AS min_tokens,
       |  CAST(max(n_toks) AS BIGINT) AS max_tokens,
       |  CAST(floor(sum(n_toks) * 1000.0 / count(*)) AS BIGINT)
       |    AS mean_tokens_milli,
       |  CAST(count(DISTINCT pred_lang) AS BIGINT) AS n_langs
       |FROM j GROUP BY domain ORDER BY domain""".stripMargin

  /** q125: Jelinek–Mercer interpolation — λ·p(w2|w1) + (1−λ)·p_uni(w2)
    * per transition, same ordered fold as q120; λ literals are CAST to
    * DOUBLE so DuckDB doesn't run them as DECIMAL. */
  def lmInterpolated(lambda: Double): String =
    s"""WITH t AS ($toksCte),
       |pr AS (SELECT doc_id, unnest([{'pos': i, 'w1': toks[i],
       |    'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS s FROM t),
       |p0 AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2
       |  FROM pr),
       |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM p0
       |  GROUP BY w1, w2),
       |ug AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY w1),
       |tokw AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM (
       |  SELECT unnest(toks) AS w FROM t) WHERE w <> '' GROUP BY w),
       |tot AS (SELECT sum(cu) AS total FROM tokw),
       |probs AS (SELECT doc_id, pos,
       |  CAST($lambda AS DOUBLE) *
       |    coalesce(CAST(c2 AS DOUBLE) / c1, CAST(0 AS DOUBLE)) +
       |  CAST(${1.0 - lambda} AS DOUBLE) *
       |    coalesce(CAST(cu AS DOUBLE) / total, CAST(0 AS DOUBLE)) AS p
       |  FROM p0 LEFT JOIN bg USING (w1, w2) LEFT JOIN ug USING (w1)
       |  LEFT JOIN tokw ON tokw.w = p0.w2 CROSS JOIN tot),
       |agg AS (SELECT doc_id,
       |  list_sort(list({'pos': pos, 'p': p})) AS ps FROM probs
       |  GROUP BY doc_id)
       |SELECT doc_id, CAST(floor(CAST(1000000000 AS DOUBLE) *
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(ps, x -> x.p)), (a, b) -> a + b)
       |    / len(ps)) AS BIGINT) AS lm_interp_nano
       |FROM agg ORDER BY doc_id""".stripMargin

  /** q114: Bloom decontamination summary — n_docs/n_exact replayed
    * exactly; the two Bloom invariants pinned true (computed from data on
    * the Spark side, the q25/q50 certification pattern). */
  def bloomDecontamination: String =
    s"""WITH t AS ($toksCte),
       |c AS ($codes3Cte),
       |bench AS (SELECT DISTINCT unnest(codes) AS gram FROM c
       |  WHERE doc_id % 97 = 0),
       |inv AS (SELECT doc_id, unnest(codes) AS gram FROM c),
       |h AS (SELECT doc_id, count(*) AS hits FROM inv
       |  JOIN bench USING (gram) GROUP BY doc_id),
       |per AS (SELECT d.doc_id,
       |  CASE WHEN coalesce(h.hits, 0) > 0 THEN 1 ELSE 0 END AS cont
       |  FROM documents d LEFT JOIN h USING (doc_id))
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(cont) AS BIGINT) AS n_exact,
       |  true AS no_false_neg, true AS fp_ok
       |FROM per""".stripMargin

  /** q136: deterministic training-order permutation — shard = Lehmer
    * rowHash % nShards, pos = rank of (hash, id) within the shard; same
    * arithmetic as [[Mixture.permuteShards]]. */
  def corpusShuffle(nShards: Int, seed: Long): String =
    s"""WITH h AS (SELECT doc_id, ${hashSql(seed)} AS h FROM documents)
       |SELECT doc_id, CAST(h % $nShards AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY h % $nShards
       |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
       |FROM h ORDER BY doc_id""".stripMargin

  // ---- full-text retrieval (TextIndex) ----------------------------------

  /** Shared tokenizer CTE for the TextIndex family: whitespace tokens with
    * empties dropped (TextIndex.toksCol semantics — toksCte keeps them). */
  private val ftToksCte =
    "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') " +
      "AS toks FROM documents"

  /** q126: inverted-index vocabulary statistics (term, df, cf). */
  def termStats: String =
    s"""WITH t AS ($ftToksCte),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
       |  GROUP BY term, doc_id)
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |  CAST(sum(tf) AS BIGINT) AS cf
       |FROM tf GROUP BY term ORDER BY term""".stripMargin

  /** q127: minimum-should-match keyword search — docs with >= minMatch
    * distinct terms of the query set, plus the match count. */
  def keywordSearch(terms: Seq[String], minMatch: Int): String = {
    val in = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS ($ftToksCte),
       |m AS (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t),
       |f AS (SELECT doc_id, count(*) AS n_matched FROM m
       |  WHERE term IN ($in) GROUP BY doc_id)
       |SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched
       |FROM f WHERE n_matched >= $minMatch ORDER BY doc_id""".stripMargin
  }

  /** q130: exact-phrase occurrence counts — every start position i with
    * toks[i..i+m) = phrase (1-based list indexing; overlaps count). */
  def phraseSearch(phrase: Seq[String]): String = {
    val m = phrase.size
    val conds = phrase.zipWithIndex
      .map { case (t, j) => s"toks[i + $j] = '$t'" }.mkString(" AND ")
    s"""WITH t AS ($ftToksCte),
       |c AS (SELECT doc_id, len(list_filter(
       |    range(1, len(toks) - ${m - 1} + 1), i -> $conds)) AS n_hits
       |  FROM t)
       |SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
       |FROM c WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
  }

  /** q141: proximity (NEAR) search — co-occurrence pairs of two terms
    * within `slop` positions, replayed with a positions comprehension. */
  def proximitySearch(termA: String, termB: String, slop: Int): String =
    s"""WITH t AS ($ftToksCte),
       |p AS (SELECT doc_id, unnest([{'pos': i, 'w': toks[i]}
       |  FOR i IN range(1, len(toks) + 1)]) AS s FROM t),
       |pa AS (SELECT doc_id, s.pos AS pa FROM p WHERE s.w = '$termA'),
       |pb AS (SELECT doc_id, s.pos AS pb FROM p WHERE s.w = '$termB'),
       |j AS (SELECT pa.doc_id, count(*) AS n_pairs
       |  FROM pa JOIN pb USING (doc_id)
       |  WHERE abs(pa.pa - pb.pb) <= $slop GROUP BY pa.doc_id)
       |SELECT doc_id, CAST(n_pairs AS BIGINT) AS n_pairs FROM j
       |ORDER BY doc_id""".stripMargin

  /** VALUES rows for a literal (query_id, term) batch — duplicate terms
    * within a query collapsed, mirroring TextIndex.bm25TopK. */
  private def queryValues(queries: Seq[(Long, Seq[String])]): String =
    queries.flatMap { case (qid, ts) =>
      ts.distinct.map(t => s"(CAST($qid AS BIGINT), '$t')")
    }.mkString(", ")

  /** The BM25 scoring CTE chain, ending in a `ranked` relation of
    * (query_id, doc_id, rnk, score). Every arithmetic step mirrors
    * TextIndex.bm25TopK's Column tree op-for-op (constants interpolated
    * from the SAME Scala doubles, term-sorted fold, ties by doc_id) so the
    * doubles are bit-identical — ln included, verified bitwise between
    * HotSpot and DuckDB's libm on this stack. */
  private def bm25Ctes(queries: Seq[(Long, Seq[String])], k1: Double,
      b: Double): String = {
    val allTerms = queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    s"""t AS ($ftToksCte),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM t),
       |tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
       |  FROM t),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       |  FROM tok WHERE term IN ($allTerms) GROUP BY doc_id, term),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |  GROUP BY term),
       |q(query_id, term) AS (VALUES ${queryValues(queries)}),
       |wt AS (SELECT q.query_id, tf.doc_id, tf.term,
       |  ln(1.0 + (CAST(stats.n_docs - dft.df AS DOUBLE) + 0.5) /
       |           (CAST(dft.df AS DOUBLE) + 0.5)) *
       |  (CAST(tf.tf AS DOUBLE) * ${k1 + 1.0} /
       |   (CAST(tf.tf AS DOUBLE) + $k1 *
       |    (${1.0 - b} + $b * CAST(tf.dl AS DOUBLE) / stats.avgdl))) AS w
       |  FROM tf JOIN dft USING (term) JOIN q ON q.term = tf.term
       |  CROSS JOIN stats),
       |ws AS (SELECT query_id, doc_id,
       |  list_sort(list({'term': term, 'w': w})) AS ws
       |  FROM wt GROUP BY query_id, doc_id),
       |sc AS (SELECT query_id, doc_id,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(ws, x -> x.w)), (a, b) -> a + b) AS score
       |  FROM ws),
       |ranked AS (SELECT query_id, doc_id, score,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id ASC) AS rnk FROM sc)""".stripMargin
  }

  /** q128: BM25 top-k (query_id, doc_id, rnk, bm25_nano). */
  def bm25TopK(queries: Seq[(Long, Seq[String])], k: Int, k1: Double,
      b: Double): String =
    s"""WITH ${bm25Ctes(queries, k1, b)}
       |SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rnk,
       |  CAST(floor(1000000000.0 * score) AS BIGINT) AS bm25_nano
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin

  /** q129: hybrid retrieval — BM25 ranks fused with embedding-cosine kNN
    * ranks by reciprocal-rank fusion, 1/(k0+rank) each side, missing side
    * 0. The vector CTE replays the q04-certified flat cosine ranking;
    * vec query_id vec_id/50 aligns with the literal text query ids. */
  def hybridRrf(queries: Seq[(Long, Seq[String])], kIn: Int, kOut: Int,
      k0: Int, k1: Double, b: Double): String = {
    val d = Tables.embDims
    val dims = (1 to d)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)")
    val vCols = dims.zipWithIndex
      .map { case (e, i) => s"$e AS v$i" }.mkString(", ")
    val qCols = dims.zipWithIndex
      .map { case (e, i) => s"$e AS q$i" }.mkString(", ")
    val cos = graft.core.Metric.Cosine.sqlExpr("vq.q", "vd.v", d)
    s"""WITH ${bm25Ctes(queries, k1, b)},
       |tr AS (SELECT query_id, doc_id AS id, rnk FROM ranked
       |  WHERE rnk <= $kIn),
       |vd AS (SELECT vec_id AS id, $vCols FROM embeddings),
       |vq AS (SELECT CAST(vec_id // 50 AS BIGINT) AS query_id, $qCols
       |  FROM embeddings
       |  WHERE vec_id % 50 = 0 AND vec_id < ${50 * queries.size}),
       |vpairs AS (SELECT vq.query_id, vd.id, $cos AS dist
       |  FROM vq CROSS JOIN vd),
       |vr AS (SELECT query_id, id, rnk FROM (
       |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY dist DESC, id ASC) AS rnk FROM vpairs) x
       |  WHERE rnk <= $kIn),
       |fused AS (SELECT coalesce(tr.query_id, vr.query_id) AS query_id,
       |  coalesce(tr.id, vr.id) AS id,
       |  coalesce(1.0 / CAST(tr.rnk + $k0 AS DOUBLE), CAST(0 AS DOUBLE)) +
       |  coalesce(1.0 / CAST(vr.rnk + $k0 AS DOUBLE), CAST(0 AS DOUBLE))
       |    AS score
       |  FROM tr FULL JOIN vr
       |    ON tr.query_id = vr.query_id AND tr.id = vr.id),
       |fr AS (SELECT query_id, id, score,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, id ASC) AS rnk FROM fused)
       |SELECT query_id, id, CAST(rnk AS BIGINT) AS rnk,
       |  CAST(floor(1000000000.0 * score) AS BIGINT) AS rrf_nano
       |FROM fr WHERE rnk <= $kOut
       |ORDER BY query_id, rnk""".stripMargin
  }
}
