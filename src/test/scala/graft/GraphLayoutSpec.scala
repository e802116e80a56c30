package graft

import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.operators.{GraphLayout, KMeans, Pq, Vamana}
import graft.operators.VamanaKernel.BuildParams

/** Persisted sharded-Vamana layout: roundtrip fidelity (graph, data,
  * centroids, PQ codebook sidecar), served ≡ in-memory searches, and
  * probe-pruned scans of the stored partitions. */
class GraphLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4
  private val K = 8
  private def dims = Tables.embDims

  private def fixture() = {
    val data = Tables.embeddingVectors(spark, sfDir).select("id", "vec")
    val cents = data.filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val clustered = KMeans.assign(data, cents)
    val graph = Vamana.buildSharded(clustered,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2)
    val rows = data.filter(col("id") % 7 === 0 && col("id") < 7 * K)
      .orderBy("id").collect()
      .map(_.getAs[Seq[Double]]("vec").toArray).toSeq
    val p = Pq.paramsFromRows(rows, M, K, dims)
    (data, cents, clustered, graph, p)
  }

  test("write/open roundtrip: codebooks bit-exact, served searches equal " +
      "in-memory, codes-only probe prunes partitions") {
    val (_, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_spec"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p))
    val layout = GraphLayout.open(spark, path)

    // sidecar round-trips every codebook double bit-exactly
    assert(layout.pq.get.m === p.m && layout.pq.get.k === p.k &&
      layout.pq.get.dims === p.dims)
    for (j <- 0 until p.m; c <- 0 until p.k)
      assert(layout.pq.get.codebooks(j)(c).toSeq ===
        p.codebooks(j)(c).toSeq, s"codebook ($j,$c)")
    assert(layout.centroids === cents)

    // served full-precision walk ≡ in-memory walk, bit-for-bit
    val served = GraphLayout.search(layout, queries, 10, searchWindow = 40,
        nProbes = 2, Metric.L2)
      .orderBy("query_id", "rnk").collect().toSeq
    val mem = Vamana.searchSharded(queries, clustered, graph, cents, 10,
        searchWindow = 40, nProbes = 2, Metric.L2)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(served.map(_.toSeq) === mem.map(_.toSeq))

    // served ADC walk ≡ in-memory ADC walk over freshly-derived codes
    val codes = Pq.encodeClustered(clustered, p)
    val servedAdc = GraphLayout.searchAdc(layout, queries, 10,
        searchWindow = 40, nProbes = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    val memAdc = Vamana.searchShardedAdc(queries, codes, graph, cents, p,
        10, searchWindow = 40, nProbes = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(servedAdc.map(_.toSeq) === memAdc.map(_.toSeq))

    // rerank path from the store ≡ in-memory rerank
    val servedRr = GraphLayout.searchAdc(layout, queries, 10,
        searchWindow = 40, nProbes = 2, kReorder = 4)
      .orderBy("query_id", "rnk").collect().toSeq
    val memRr = Vamana.searchShardedAdcRerank(queries, codes, graph, cents,
        p, clustered, 10, 4, searchWindow = 40, nProbes = 2)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(servedRr.map(_.toSeq) === memRr.map(_.toSeq))

    // probe pruning reaches the stored codes scan: the ADC walk's plan
    // must carry PartitionFilters over cluster_id
    val probe = layout.codes.get
      .filter(col("cluster_id").isin(Seq(0L, 1L): _*))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cluster_id"), plan.take(600))
  }

  test("upsert ≡ from-scratch store of the merged corpus; untouched " +
      "partitions' files are not rewritten; emptied shards vanish") {
    val (data, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val path = "/tmp/graft_graphlayout_spec_upsert"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p))

    // add into cluster of id<4 seed 0's shard only; delete a few ids from
    // shard of seed 1 — shards 2,3 stay untouched
    val addCid = 0L
    val added = data.filter(col("id") % 50 === 7).orderBy("id").limit(20)
      .select((col("id") + 100000L).as("id"), col("vec"),
        lit(addCid).as("cluster_id"))
    val delIds = KMeans.assign(data, cents)
      .filter(col("cluster_id") === 1L).orderBy("id").limit(5).select("id")

    def mtimes(sub: String): Map[String, Long] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub"))
        .filter(_.getPath.getName.startsWith("cluster_id="))
        .flatMap(d => fs.listStatus(d.getPath).map(f =>
          f.getPath.toString -> f.getModificationTime))
        .toMap
    }
    val before = mtimes("data") ++ mtimes("graph") ++ mtimes("codes")
    val up = GraphLayout.upsert(spark, path, added, delIds, params,
      Metric.L2)

    // untouched shards (2, 3): identical file list, identical mtimes
    val after = mtimes("data") ++ mtimes("graph") ++ mtimes("codes")
    val untouchedBefore = before.filter(_._1.contains("cluster_id=2"))
    assert(untouchedBefore.nonEmpty)
    untouchedBefore.foreach { case (f, t) =>
      assert(after.get(f).contains(t), s"untouched file rewritten: $f")
    }

    // equivalence: a from-scratch store of the merged corpus serves the
    // same rows on every path
    val merged = clustered
      .join(delIds.withColumnRenamed("id", "id"), Seq("id"), "left_anti")
      .unionByName(added)
    val graph2 = Vamana.buildSharded(merged, params, Metric.L2)
    val cents2 = up.centroids // probe with the SAME refreshed centroids
    val path2 = "/tmp/graft_graphlayout_spec_upsert_fresh"
    GraphLayout.write(merged, graph2, cents2, path2, pq = Some(p))
    val fresh = GraphLayout.open(spark, path2)
    def rows(l: GraphLayout.Layout) = {
      val a = GraphLayout.search(l, queries, 10, 1 << 14, 4, Metric.L2)
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
      val b = GraphLayout.searchAdc(l, queries, 10, 1 << 14, 4,
        kReorder = 4).orderBy("query_id", "rnk").collect()
        .map(_.toSeq).toSeq
      (a, b)
    }
    assert(rows(up) === rows(fresh))

    // emptying a whole shard drops its partitions and its centroid
    // (membership read from the STORE — the ids the upsert will route)
    val allOf3 = up.clustered.filter(col("cluster_id") === 3L).select("id")
    val up2 = GraphLayout.upsert(spark, path,
      added.limit(0), allOf3, params, Metric.L2)
    assert(!up2.centroids.exists(_._1 == 3L))
    assert(!mtimes("data").keys.exists(_.contains("cluster_id=3")))
    assert(up2.clustered.filter(col("cluster_id") === 3L).count() === 0)
  }

  test("binary layout: thresholds roundtrip bit-exactly, served Hamming " +
      "rerank ≡ in-memory, upsert maintains bincodes partitions") {
    import graft.operators.BinaryQuant
    val (data, cents, clustered, graph, _) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val b = BinaryQuant.train(data)
    val path = "/tmp/graft_graphlayout_spec_bin"
    GraphLayout.write(clustered, graph, cents, path, bin = Some(b))
    val layout = GraphLayout.open(spark, path)
    assert(layout.bin.get.thresholds === b.thresholds)
    // all shards probed + full window ⇒ global Hamming top-R + exact
    // rerank — must equal the flat in-memory two-pass bit-for-bit
    val served = GraphLayout.searchHamming(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = cents.size, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val mem = BinaryQuant.searchHammingRerank(queries,
        BinaryQuant.encode(data, b), b, data, 10, 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(served === mem)
    // the zero-corpus-shuffle local twin ≡ the cogroup path bit-for-bit,
    // exhaustive probes AND a selective probe subset
    val servedLocal = GraphLayout.searchHammingLocal(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = cents.size, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(servedLocal === served)
    val sel = GraphLayout.searchHamming(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = 1, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(GraphLayout.searchHammingLocal(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = 1, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq === sel)
    // a memory-only layout cannot serve locally — loud failure
    val e = intercept[RuntimeException] {
      GraphLayout.searchHammingLocal(layout.copy(path = None), queries,
        10, searchWindow = 1 << 14, nProbes = 1, kReorder = 4)
    }
    assert(e.getMessage.contains("open"))
    // serveHamming(): the one binary entry point — Auto dispatches local
    // (store on disk) with rows ≡ both manual paths at both regimes;
    // an in-memory layout auto-cogroups instead of erroring
    val (hm1, hf1) = GraphLayout.serveHammingDecision(layout, queries,
      nProbes = 1)
    assert(hm1 === "local" && hf1 <= 1.0, s"($hm1, $hf1)")
    val servedH = GraphLayout.serveHamming(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = cents.size, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(servedH === served)
    assert(servedH === GraphLayout.serveHamming(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = cents.size, kReorder = 4,
        mode = GraphLayout.ServeMode.Cogroup)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq)
    val selServed = GraphLayout.serveHamming(layout, queries, 10,
        searchWindow = 1 << 14, nProbes = 1, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(selServed === sel)
    assert(GraphLayout.serveHammingDecision(layout.copy(path = None),
      queries, nProbes = 1)._1 === "cogroup")
    assert(servedH === GraphLayout.serveHamming(layout.copy(path = None),
        queries, 10, searchWindow = 1 << 14, nProbes = cents.size,
        kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq)
    // upsert keeps bincodes in sync: after an add+delete, the served
    // global rerank equals the in-memory two-pass over the survivors
    val added = data.filter(col("id") % 61 === 2).orderBy("id").limit(6)
      .select((col("id") + 70000L).as("id"), col("vec"),
        lit(0L).as("cluster_id"))
    val dels = clustered.filter(col("cluster_id") === 1L)
      .orderBy("id").limit(3).select("id")
    val up = GraphLayout.upsert(spark, path, added, dels,
      BuildParams(maxDegree = 24, buildWindow = 48), Metric.L2)
    assert(up.binCodes.isDefined)
    val survivors = data
      .join(dels, Seq("id"), "left_anti")
      .unionByName(added.drop("cluster_id"))
    val servedUp = GraphLayout.searchHamming(up, queries, 10,
        searchWindow = 1 << 14, nProbes = up.centroids.size, kReorder = 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val memUp = BinaryQuant.searchHammingRerank(queries,
        BinaryQuant.encode(survivors, b), b, survivors, 10, 4)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(servedUp === memUp)
  }

  test("crash safety: a marked graph store refuses open()/upsert; " +
      "repair() re-encodes codes+bincodes from the data rows on disk so " +
      "a kReorder=0 code-only serve cannot emit deleted ids; the " +
      "interrupted batch then replays to the uninterrupted store") {
    import graft.operators.BinaryQuant
    val (data, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val b = BinaryQuant.train(data)
    val path = "/tmp/graft_graphlayout_spec_crash"
    val pathTwin = "/tmp/graft_graphlayout_spec_crash_twin"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
      bin = Some(b))
    GraphLayout.write(clustered, graph, cents, pathTwin, pq = Some(p),
      bin = Some(b))

    // the interrupted batch: adds into shard 0, deletes from shard 1
    val added = data.filter(col("id") % 47 === 3).orderBy("id").limit(6)
      .select((col("id") + 300000L).as("id"), col("vec"),
        lit(0L).as("cluster_id"))
    val delIds = clustered.filter(col("cluster_id") === 1L)
      .orderBy("id").limit(5).select("id")
    val delSeq = delIds.orderBy("id").collect().map(_.getLong(0)).toSeq

    // simulate THE answer-grade crash window: marker present, the DATA
    // write committed (adds in, deletes gone), but codes/bincodes/graph/
    // centroids never rewritten — touched shards' code partitions still
    // describe the deleted rows, so a kReorder=0 pure-ADC/Hamming serve
    // (which never joins data) could emit a deleted id
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/upsert.inprogress"),
      """{"touched":[0,1]}""".getBytes)
    val mergedTouched = clustered
      .join(delIds, Seq("id"), "left_anti").unionByName(added)
      .filter(col("cluster_id").isin(0L, 1L)).localCheckpoint(true)
    mergedTouched.repartition(col("cluster_id")).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cluster_id").parquet(s"$path/data")
    // the hazard is real on disk: stale code partitions list deleted ids
    assert(spark.read.parquet(s"$path/bincodes")
      .filter(col("id").isin(delSeq: _*)).count() > 0)
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("id").isin(delSeq: _*)).count() > 0)

    // a FRESH marker reads as a LIVE writer (heartbeat within the
    // liveness window): open() refuses with the live-writer triage and
    // repair() refuses too — repairing under a live writer is the
    // single-writer hazard the heartbeat mechanizes
    val eLive = intercept[RuntimeException] { GraphLayout.open(spark, path) }
    assert(eLive.getMessage.contains("LIVE") &&
      eLive.getMessage.contains("Do NOT repair"))
    intercept[RuntimeException] { GraphLayout.repair(spark, path) }
    // age the marker past the liveness window: the simulated writer is
    // now CRASHED — open() directs to repair(), upsert refuses as well
    def ageMarker(): Unit = java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$path/upsert.inprogress"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 2 * graft.operators.StoreMarker
          .LiveWindowMs))
    ageMarker()
    val e = intercept[RuntimeException] { GraphLayout.open(spark, path) }
    assert(e.getMessage.contains("repair") &&
      e.getMessage.contains("STALE upsert"))
    intercept[RuntimeException] {
      GraphLayout.upsert(spark, path, added, delIds, params, Metric.L2)
    }

    // repair: codes/bincodes/centroids of the marker's shards re-derived
    // from the data rows on disk, bit-exactly
    val rep = GraphLayout.repair(spark, path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/upsert.inprogress")))
    val touchedNow = rep.clustered.filter(col("cluster_id").isin(0L, 1L))
    val wCols = (0 until b.words64).map(w => col(s"w$w"))
    val expBin = touchedNow.select(col("id") +:
        BinaryQuant.codeColumns64(col("vec"), b).zipWithIndex.map {
          case (c, w) => c.as(s"w$w") }: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val gotBin = rep.binCodes.get.filter(col("cluster_id").isin(0L, 1L))
      .select(col("id") +: wCols: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(gotBin === expBin)
    val cCols = (0 until p.m).map(j => col(s"c$j"))
    val expPq = Pq.encodeClustered(touchedNow, p)
      .select(col("id") +: cCols: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val gotPq = rep.codes.get.filter(col("cluster_id").isin(0L, 1L))
      .select(col("id") +: cCols: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(gotPq === expPq)
    assert(rep.centroids.filter(c => c._1 == 0L || c._1 == 1L) ===
      KMeans.roundedMeans(touchedNow))
    // no deleted id survives in ANY code partition...
    assert(spark.read.parquet(s"$path/bincodes")
      .filter(col("id").isin(delSeq: _*)).count() === 0)
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("id").isin(delSeq: _*)).count() === 0)
    // ...so the kReorder=0 code-only serves cannot emit one
    val hammed = GraphLayout.serveHamming(rep, queries, 10,
        searchWindow = 1 << 14, nProbes = rep.centroids.size, kReorder = 0)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(hammed.intersect(delSeq.toSet).isEmpty)
    val adced = GraphLayout.searchAdc(rep, queries, 10,
        searchWindow = 1 << 14, nProbes = rep.centroids.size, kReorder = 0)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(adced.intersect(delSeq.toSet).isEmpty)

    // content restoration: replaying the interrupted batch converges to
    // the UNINTERRUPTED upsert of the same batch on a pristine twin
    val up = GraphLayout.upsert(spark, path, added, delIds, params,
      Metric.L2)
    val twin = GraphLayout.upsert(spark, pathTwin, added, delIds, params,
      Metric.L2)
    assert(up.centroids === twin.centroids)
    def servedAll(l: GraphLayout.Layout) = Seq(
      GraphLayout.search(l, queries, 10, 1 << 14, l.centroids.size,
        Metric.L2),
      GraphLayout.searchAdc(l, queries, 10, 1 << 14, l.centroids.size,
        kReorder = 4),
      GraphLayout.serveHamming(l, queries, 10, 1 << 14, l.centroids.size,
        kReorder = 4))
      .map(_.orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq)
    assert(servedAll(up) === servedAll(twin))
    // repair without a marker is the identity
    assert(GraphLayout.repair(spark, path).centroids === up.centroids)
    // a full REBUILD onto a crashed path supersedes a STALE marker
    // (write() refuses a LIVE one — single-writer) and lifts it after
    // the last artifact, so open() accepts the now-consistent store
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/upsert.inprogress"),
      """{"touched":[0]}""".getBytes)
    intercept[RuntimeException] {
      GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
        bin = Some(b))
    }
    ageMarker()
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
      bin = Some(b))
    assert(GraphLayout.open(spark, path).centroids === cents)
  }

  test("rebuild crash window: a rebuild-kind marker (crashed write()) " +
      "is refused by open() with the re-run-write() triage and by " +
      "repair(); a completed write() lifts it") {
    val (_, cents, clustered, graph, _) = fixture()
    val path = "/tmp/graft_graphlayout_spec_rebuild_crash"
    GraphLayout.write(clustered, graph, cents, path)
    val mp = java.nio.file.Paths.get(s"$path/upsert.inprogress")
    assert(!java.nio.file.Files.exists(mp))
    java.nio.file.Files.write(mp,
      """{"kind":"rebuild","session":"dead-writer","touched":[]}"""
        .getBytes)
    val eLive = intercept[RuntimeException] { GraphLayout.open(spark, path) }
    assert(eLive.getMessage.contains("LIVE"))
    java.nio.file.Files.setLastModifiedTime(mp,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 2 * graft.operators.StoreMarker
          .LiveWindowMs))
    val e = intercept[RuntimeException] { GraphLayout.open(spark, path) }
    assert(e.getMessage.contains("STALE rebuild") &&
      e.getMessage.contains("re-run"))
    val eR = intercept[RuntimeException] { GraphLayout.repair(spark, path) }
    assert(eR.getMessage.contains("STALE rebuild"))
    GraphLayout.write(clustered, graph, cents, path)
    assert(GraphLayout.open(spark, path).centroids === cents)
  }

  test("delete-only upsert batches apply against a byte-resident store " +
      "even when the adds frame carries a placeholder ARRAY<DOUBLE> vec " +
      "(the CDC delete-only micro-batch shape)") {
    import graft.functions.ByteVecs
    val (data, _, _, _, _) = fixture()
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val bytes = ByteVecs.markUnsigned(data.select(col("id"),
      ByteVecs.quantizeUnsigned(col("vec"), 64.0).as("vec")))
    // seed centroids in the BYTE VALUE SPACE (widened u8) — raw-double
    // seeds would collapse the assignment
    val cents = ByteVecs.widenedForMath(bytes, "vec")
      .filter(col("id") < 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq
    val clustered = KMeans.assign(bytes, cents)
    val graph = Vamana.buildSharded(clustered, params, Metric.L2)
    val path = "/tmp/graft_graphlayout_spec_delonly_u8"
    GraphLayout.write(clustered, graph, cents, path)
    val dels = clustered.filter(col("cluster_id") === 1L)
      .orderBy("id").limit(3).select("id")
    val delSeq = dels.collect().map(_.getLong(0)).toSeq
    assert(delSeq.size === 3, "fixture must have rows to delete")
    // adds frame is EMPTY but typed (id, vec ARRAY<DOUBLE>) — exactly
    // what a CDC stream hands upsert on a delete-only trigger; the byte
    // store's value-space contract must not fire on zero added rows
    val emptyAdds = data.select(col("id"), col("vec")).limit(0)
    val up = GraphLayout.upsert(spark, path, emptyAdds, dels, params,
      Metric.L2)
    assert(up.clustered.filter(col("id").isin(delSeq: _*)).count() === 0)
    assert(up.clustered.count() === clustered.count() - 3)
    assert(ByteVecs.signednessOf(up.clustered.schema, "vec")
      .contains(true))
  }

  test("bincodes layout versions: v2 (default) halves the word columns " +
      "and serves ≡ an explicit v1 store on every path; pre-v2 sidecars " +
      "open as v1; unknown versions fail loudly; upsert keeps each " +
      "store's packing") {
    import graft.operators.BinaryQuant
    val (data, cents, clustered, graph, _) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val b = BinaryQuant.train(data)
    val pathV2 = "/tmp/graft_graphlayout_spec_binv2"
    val pathV1 = "/tmp/graft_graphlayout_spec_binv1"
    GraphLayout.write(clustered, graph, cents, pathV2, bin = Some(b))
    GraphLayout.write(clustered, graph, cents, pathV1, bin = Some(b),
      binVersion = 1)
    val l2 = GraphLayout.open(spark, pathV2)
    val l1 = GraphLayout.open(spark, pathV1)
    assert(l2.binVersion === 2 && l1.binVersion === 1)
    // the 64-d case: 2 half-full BIGINT words → 1 full word, 8 B/row
    assert(l2.binCodes.get.columns.count(_.startsWith("w")) === b.words64)
    assert(l1.binCodes.get.columns.count(_.startsWith("w")) === b.words)
    assert(b.words64 < b.words)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    // bit-parity across versions: cogroup, local, and the dispatcher, at
    // exhaustive AND selective probes (identical neighbor sets on the
    // same grid — Hamming sums are grouping-invariant)
    for (np <- Seq(cents.size, 1)) {
      val expect = rows(GraphLayout.searchHamming(l1, queries, 10,
        searchWindow = 1 << 14, nProbes = np, kReorder = 4))
      assert(rows(GraphLayout.searchHamming(l2, queries, 10,
        searchWindow = 1 << 14, nProbes = np, kReorder = 4)) === expect,
        s"cogroup np=$np")
      assert(rows(GraphLayout.searchHammingLocal(l2, queries, 10,
        searchWindow = 1 << 14, nProbes = np, kReorder = 4)) === expect,
        s"local np=$np")
      assert(rows(GraphLayout.serveHamming(l2, queries, 10,
        searchWindow = 1 << 14, nProbes = np, kReorder = 4)) === expect,
        s"serve np=$np")
    }
    // pre-v2 sidecar (no version field) opens as v1 and still serves.
    // (Drop hadoop's local-FS checksum sibling — these out-of-band edits
    // simulate a sidecar written by an older engine, not by this fs.)
    val scPath = java.nio.file.Paths.get(s"$pathV1/layout.json")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$pathV1/.layout.json.crc"))
    val sc = new String(java.nio.file.Files.readAllBytes(scPath))
    assert(sc.contains("\"version\":1"))
    java.nio.file.Files.write(scPath,
      sc.replace("\"version\":1,", "").getBytes)
    val lOld = GraphLayout.open(spark, pathV1)
    assert(lOld.binVersion === 1)
    assert(rows(GraphLayout.searchHammingLocal(lOld, queries, 10,
      searchWindow = 1 << 14, nProbes = 1, kReorder = 4)) ===
      rows(GraphLayout.searchHammingLocal(l1, queries, 10,
        searchWindow = 1 << 14, nProbes = 1, kReorder = 4)))
    // unknown version refuses to open (fail loudly, never misread words)
    java.nio.file.Files.write(scPath, new String(
      java.nio.file.Files.readAllBytes(scPath))
      .replace("{\"thresholds\"", "{\"version\":3,\"thresholds\"")
      .getBytes)
    val e = intercept[IllegalArgumentException] {
      GraphLayout.open(spark, pathV1)
    }
    assert(e.getMessage.contains("version 3"))
    java.nio.file.Files.write(scPath, sc.getBytes) // restore v1 sidecar
    // upsert re-encodes in the STORE's packing — no mixed word layouts —
    // and the two versions stay bit-identical after the same upsert
    val added = data.orderBy("id").limit(4)
      .select((col("id") + 90000L).as("id"), col("vec"),
        lit(0L).as("cluster_id"))
    val dels = clustered.filter(col("cluster_id") === 1L)
      .orderBy("id").limit(2).select("id")
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val u2 = GraphLayout.upsert(spark, pathV2, added, dels, params,
      Metric.L2)
    val u1 = GraphLayout.upsert(spark, pathV1, added, dels, params,
      Metric.L2)
    assert(u2.binVersion === 2 && u1.binVersion === 1)
    assert(u2.binCodes.get.columns.count(_.startsWith("w")) === b.words64)
    assert(u1.binCodes.get.columns.count(_.startsWith("w")) === b.words)
    assert(rows(GraphLayout.searchHammingLocal(u2, queries, 10,
      searchWindow = 1 << 14, nProbes = u2.centroids.size,
      kReorder = 4)) ===
      rows(GraphLayout.searchHammingLocal(u1, queries, 10,
        searchWindow = 1 << 14, nProbes = u1.centroids.size,
        kReorder = 4)))
  }

  test("upsert batch hygiene: duplicate identical adds collapse, delete " +
      "wins over add for the same id, conflicting payloads fail loudly") {
    val (data, cents, clustered, graph, _) = fixture()
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val path = "/tmp/graft_graphlayout_spec_hygiene"
    GraphLayout.write(clustered, graph, cents, path)
    val one = data.filter(col("id") === 0).orderBy("id")
      .select((col("id") + 90000L).as("id"), col("vec"),
        lit(0L).as("cluster_id"))
    // redelivered identical add + a delete of the same id in one batch
    val added = one.unionByName(one)
    val up = GraphLayout.upsert(spark, path, added,
      one.select("id"), params, Metric.L2)
    assert(up.clustered.filter(col("id") === 90000L).count() === 0,
      "delete must win over a same-batch add")
    // duplicate identical adds collapse to one row
    val up2 = GraphLayout.upsert(spark, path, added,
      added.select("id").limit(0), params, Metric.L2)
    assert(up2.clustered.filter(col("id") === 90000L).count() === 1)
    // conflicting payloads for one id: loud failure, store untouched
    val conflicting = one.unionByName(
      one.withColumn("vec", transform(col("vec"), x => x + 1.0)))
    assertThrows[IllegalArgumentException] {
      GraphLayout.upsert(spark, path, conflicting,
        one.select("id").limit(0), params, Metric.L2)
    }
    assert(GraphLayout.open(spark, path).clustered
      .filter(col("id") === 90000L).count() === 1)
  }

  test("searchAdcLocal (zero-corpus-shuffle DiskANN serve) ≡ searchAdc " +
      "bit-for-bit, pure-ADC and reranked; refuses a memory-only layout") {
    val (_, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_adclocal"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p))
    val layout = GraphLayout.open(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    // pure ADC ranks
    assert(rows(GraphLayout.searchAdcLocal(layout, queries, 5, 32, 3)) ===
      rows(GraphLayout.searchAdc(layout, queries, 5, 32, 3)))
    // exact rerank on top (touches only candidate rows of data)
    assert(
      rows(GraphLayout.searchAdcLocal(layout, queries, 5, 32, 3,
        kReorder = 2)) ===
      rows(GraphLayout.searchAdc(layout, queries, 5, 32, 3, kReorder = 2)))
    // cosine walks L2 and reranks cosine, same as searchAdc's contract
    assert(
      rows(GraphLayout.searchAdcLocal(layout, queries, 5, 32, 3,
        kReorder = 2, metric = Metric.Cosine)) ===
      rows(GraphLayout.searchAdc(layout, queries, 5, 32, 3, kReorder = 2,
        metric = Metric.Cosine)))
    val mem = layout.copy(path = None)
    val e = intercept[RuntimeException] {
      GraphLayout.searchAdcLocal(mem, queries, 5, 32, 3)
    }
    assert(e.getMessage.contains("open"))
    // a layout written WITHOUT routing serves locally through the flat
    // probe sweep — ≡ search bit-for-bit
    assert(rows(GraphLayout.searchLocal(layout, queries, 5, 32, 3,
        Metric.L2)) ===
      rows(GraphLayout.search(layout, queries, 5, 32, 3, Metric.L2)))
  }

  test("keep predicate on the compressed serving paths: searchAdcLocal/" +
      "searchAdc(keep) ≡ searchShardedAdc(keep) bit-for-bit; excluded " +
      "ids never emitted, pure-ADC and reranked") {
    val (_, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_adckeep"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p))
    val layout = GraphLayout.open(spark, path)
    val keep = col("id") % 3 =!= 1
    val codes = Pq.encodeClustered(clustered, p)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    // pure ADC: local ≡ cogroup ≡ in-memory under the same predicate
    val localF = rows(GraphLayout.searchAdcLocal(layout, queries, 5, 32, 3,
      keep = keep))
    assert(localF ===
      rows(Vamana.searchShardedAdc(queries, codes, graph, cents, p, 5, 32,
        3, Metric.L2, keep = keep)))
    assert(localF ===
      rows(GraphLayout.searchAdc(layout, queries, 5, 32, 3, keep = keep)))
    localF.foreach(r =>
      assert(r(2).asInstanceOf[Long] % 3 !== 1, s"filtered id emitted: $r"))
    // the predicate changes the result (it actually filters something)
    assert(localF !== rows(GraphLayout.searchAdcLocal(layout, queries, 5,
      32, 3)))
    // reranked: the rerank sees only kept candidates on both paths
    assert(
      rows(GraphLayout.searchAdcLocal(layout, queries, 5, 32, 3,
        kReorder = 2, keep = keep)) ===
      rows(GraphLayout.searchAdc(layout, queries, 5, 32, 3, kReorder = 2,
        keep = keep)))
  }

  test("serve(): one entry point auto-dispatches local vs cogroup by " +
      "probe-union fraction; rows bit-identical to both manual paths at " +
      "both regimes; override + keep honored") {
    val (_, cents, clustered, graph, _) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_serve"
    GraphLayout.write(clustered, graph, cents, path, routingGroups = 2)
    val layout = GraphLayout.open(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq

    // SELECTIVE regime: one query, one probe → fraction 1/4 → local at
    // the default threshold AND at the conservative 0.5 dial
    val q1 = queries.orderBy("query_id").limit(1)
    val (m1, f1) = GraphLayout.serveDecision(layout, q1, nProbes = 1,
      Metric.L2, l1Probes = 1)
    assert(m1 === "local" && f1 <= 0.5, s"($m1, $f1)")
    assert(GraphLayout.serveDecision(layout, q1, nProbes = 1, Metric.L2,
      l1Probes = 1, localMaxFraction = 0.5)._1 === "local")
    val servedSel = rows(GraphLayout.serve(layout, q1, 5, 32, nProbes = 1,
      Metric.L2, l1Probes = 1))
    assert(servedSel === rows(GraphLayout.searchRoutedLocal(layout, q1, 5,
      32, l1Probes = 1, nProbes = 1, Metric.L2)))
    assert(servedSel === rows(GraphLayout.searchRouted(layout, q1, 5, 32,
      l1Probes = 1, nProbes = 1, Metric.L2)))

    // SATURATING regime: every query, exhaustive probes → fraction 1.
    // Default (post-r12 O(1)-planning measurement): still local — zero
    // corpus shuffle wins both regimes. The localMaxFraction DIAL pins
    // the other outcome: at 0.5 a saturating sweep dispatches cogroup.
    val (m2, f2) = GraphLayout.serveDecision(layout, queries, nProbes = 4,
      Metric.L2, l1Probes = 2)
    assert(m2 === "local" && f2 > 0.5, s"($m2, $f2)")
    assert(GraphLayout.serveDecision(layout, queries, nProbes = 4,
      Metric.L2, l1Probes = 2, localMaxFraction = 0.5)._1 === "cogroup")
    val servedSat = rows(GraphLayout.serve(layout, queries, 5, 32,
      nProbes = 4, Metric.L2, l1Probes = 2))
    assert(servedSat === rows(GraphLayout.searchRouted(layout, queries, 5,
      32, l1Probes = 2, nProbes = 4, Metric.L2)))
    assert(servedSat === rows(GraphLayout.searchRoutedLocal(layout,
      queries, 5, 32, l1Probes = 2, nProbes = 4, Metric.L2)))
    // the dialed-down serve dispatches cogroup — rows unchanged
    assert(servedSat === rows(GraphLayout.serve(layout, queries, 5, 32,
      nProbes = 4, Metric.L2, l1Probes = 2, localMaxFraction = 0.5)))

    // override forces the other path, rows unchanged (pure cost decision)
    assert(servedSat === rows(GraphLayout.serve(layout, queries, 5, 32,
      nProbes = 4, Metric.L2, l1Probes = 2,
      mode = GraphLayout.ServeMode.Local)))
    assert(servedSel === rows(GraphLayout.serve(layout, q1, 5, 32,
      nProbes = 1, Metric.L2, l1Probes = 1,
      mode = GraphLayout.ServeMode.Cogroup)))

    // flat dispatch (l1Probes = 0 ignores routing): ≡ search/searchLocal
    val servedFlat = rows(GraphLayout.serve(layout, q1, 5, 32, nProbes = 1,
      Metric.L2))
    assert(servedFlat === rows(GraphLayout.searchLocal(layout, q1, 5, 32,
      1, Metric.L2)))
    assert(servedFlat === rows(GraphLayout.search(layout, q1, 5, 32, 1,
      Metric.L2)))

    // keep honored on both dispatch outcomes
    val keep = col("id") % 3 =!= 1
    val keptLocal = rows(GraphLayout.serve(layout, q1, 5, 32, nProbes = 1,
      Metric.L2, l1Probes = 1, keep = keep))
    keptLocal.foreach(r => assert(r(2).asInstanceOf[Long] % 3 !== 1))
    val keptCog = rows(GraphLayout.serve(layout, queries, 5, 32,
      nProbes = 4, Metric.L2, l1Probes = 2, keep = keep,
      localMaxFraction = 0.5)) // dialed down ⇒ the cogroup+keep path
    keptCog.foreach(r => assert(r(2).asInstanceOf[Long] % 3 !== 1))
    assert(keptCog === rows(GraphLayout.serve(layout, queries, 5, 32,
      nProbes = 4, Metric.L2, l1Probes = 2, keep = keep,
      mode = GraphLayout.ServeMode.Local)))

    // an in-memory layout (no path) can only cogroup — Auto must not
    // dispatch local into a sys.error
    val mem = layout.copy(path = None)
    val (m3, _) = GraphLayout.serveDecision(mem, q1, nProbes = 1,
      Metric.L2, l1Probes = 1)
    assert(m3 === "cogroup")
    assert(servedSel === rows(GraphLayout.serve(mem, q1, 5, 32,
      nProbes = 1, Metric.L2, l1Probes = 1)))
  }

  test("serveAdc(): one compressed-serving entry point auto-dispatches " +
      "local vs cogroup; rows bit-identical to both manual ADC paths; " +
      "keep + rerank + cosine-walks-L2 + override honored") {
    val (_, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_serveadc"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p))
    val layout = GraphLayout.open(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq

    // SELECTIVE regime: one query, one probe → local at the default dial
    val q1 = queries.orderBy("query_id").limit(1)
    val (m1, f1) = GraphLayout.serveAdcDecision(layout, q1, nProbes = 1)
    assert(m1 === "local" && f1 <= 0.5, s"($m1, $f1)")
    val servedSel = rows(GraphLayout.serveAdc(layout, q1, 5, 32,
      nProbes = 1))
    assert(servedSel === rows(GraphLayout.searchAdcLocal(layout, q1, 5, 32,
      nProbes = 1)))
    assert(servedSel === rows(GraphLayout.searchAdc(layout, q1, 5, 32,
      nProbes = 1)))

    // SATURATING regime: default stays local (zero corpus shuffle wins
    // both regimes post-r12); the dial pins the cogroup outcome
    val (m2, f2) = GraphLayout.serveAdcDecision(layout, queries,
      nProbes = 4)
    assert(m2 === "local" && f2 > 0.5, s"($m2, $f2)")
    assert(GraphLayout.serveAdcDecision(layout, queries, nProbes = 4,
      localMaxFraction = 0.5)._1 === "cogroup")
    val servedSat = rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 4))
    assert(servedSat === rows(GraphLayout.searchAdc(layout, queries, 5, 32,
      nProbes = 4)))
    assert(servedSat === rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 4, localMaxFraction = 0.5))) // dialed ⇒ cogroup, same rows

    // override forces the other path, rows unchanged
    assert(servedSel === rows(GraphLayout.serveAdc(layout, q1, 5, 32,
      nProbes = 1, mode = GraphLayout.ServeMode.Cogroup)))
    assert(servedSat === rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 4, mode = GraphLayout.ServeMode.Local)))

    // rerank + keep on both dispatch outcomes ≡ the manual paths
    val keep = col("id") % 3 =!= 1
    val kept = rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 3, kReorder = 2, keep = keep))
    kept.foreach(r => assert(r(2).asInstanceOf[Long] % 3 !== 1))
    assert(kept === rows(GraphLayout.searchAdc(layout, queries, 5, 32,
      nProbes = 3, kReorder = 2, keep = keep)))
    assert(kept === rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 3, kReorder = 2, keep = keep, localMaxFraction = 0.5)))

    // cosine walks L2 and reranks cosine on BOTH dispatch outcomes —
    // and the probe map (built on the walk metric) matches the manual
    // paths' probing exactly
    val cosServed = rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 3, kReorder = 2, metric = Metric.Cosine))
    assert(cosServed === rows(GraphLayout.searchAdc(layout, queries, 5, 32,
      nProbes = 3, kReorder = 2, metric = Metric.Cosine)))
    assert(cosServed === rows(GraphLayout.serveAdc(layout, queries, 5, 32,
      nProbes = 3, kReorder = 2, metric = Metric.Cosine,
      mode = GraphLayout.ServeMode.Cogroup)))
    // cosine with NO rerank cannot walk ADC — loud failure
    assertThrows[IllegalArgumentException] {
      GraphLayout.serveAdc(layout, queries, 5, 32, nProbes = 3,
        metric = Metric.Cosine)
    }

    // an in-memory layout (no path) can only cogroup — Auto must not
    // dispatch local into a sys.error
    val mem = layout.copy(path = None)
    assert(GraphLayout.serveAdcDecision(mem, q1, nProbes = 1)._1 ===
      "cogroup")
    assert(servedSel === rows(GraphLayout.serveAdc(mem, q1, 5, 32,
      nProbes = 1)))
  }

  test("upsert ↔ local-serve contract: a serve planned pre-upsert fails " +
      "loudly once its probed partitions are overwritten — never a " +
      "silent mixed read; a reopened layout serves the merged corpus") {
    val (data, cents, clustered, graph, _) = fixture()
    val params = BuildParams(maxDegree = 24, buildWindow = 48)
    val path = "/tmp/graft_graphlayout_upsert_serve"
    GraphLayout.write(clustered, graph, cents, path, routingGroups = 2)
    val layout = GraphLayout.open(spark, path)
    val queries = Tables.embeddingQueries(spark, sfDir).limit(2)

    // plan a local serve over EVERY shard pre-upsert (exhaustive probes:
    // the probed set must include the shard the upsert will overwrite);
    // zipServe pins the shard file list at plan time — that is the
    // snapshot the contract is about
    val planned = GraphLayout.searchRoutedLocal(layout, queries, 5, 32,
      l1Probes = 2, nProbes = 4, Metric.L2)
    val preRows = planned.select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(preRows.nonEmpty)

    // upsert: add rows into shard 0, delete a few from shard 1 — their
    // data/graph partitions are dynamically overwritten (new part files,
    // old ones deleted)
    val added = data.filter(col("id") % 50 === 7).orderBy("id").limit(10)
      .select((col("id") + 200000L).as("id"), col("vec"),
        lit(0L).as("cluster_id"))
    val delIds = KMeans.assign(data, cents)
      .filter(col("cluster_id") === 1L).orderBy("id").limit(5).select("id")
    val reopened = GraphLayout.upsert(spark, path, added, delIds, params,
      Metric.L2)

    // the PRE-upsert plan now points at deleted part files: executing it
    // fails loudly (FileNotFound inside the task) — it can never blend
    // old and new partitions into one answer
    val e = intercept[Exception] {
      planned.select("query_id", "rnk", "neighbor_id").collect()
    }
    def hasFnf(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(t.getMessage).contains("FileNotFound") ||
        hasFnf(t.getCause))
    assert(hasFnf(e), s"expected FileNotFound-rooted failure, got $e")

    // the REOPENED layout serves the merged corpus: local ≡ cogroup over
    // the upserted store, added ids reachable, deleted ids gone
    val local = GraphLayout.searchRoutedLocal(reopened, queries, 5, 32,
        l1Probes = 2, nProbes = 4, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val cog = GraphLayout.searchRouted(reopened, queries, 5, 32,
        l1Probes = 2, nProbes = 4, Metric.L2)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(local === cog)
    val delSet = delIds.as[Long].collect().toSet
    local.foreach(r =>
      assert(!delSet.contains(r(2).asInstanceOf[Long]),
        s"deleted id served: $r"))
  }

  test("Auto dispatch deliberately IGNORES cache residency: a cached " +
      "layout frame changes no family's decision (measured — the corpus " +
      "exchange dominates, SCALE.md scale10m_serve_cached); the manual " +
      "Cogroup dial serves the cached store with identical rows") {
    val (data, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val b = graft.operators.BinaryQuant.train(data)
    val path = "/tmp/graft_graphlayout_cached"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
      bin = Some(b))
    val layout = GraphLayout.open(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq

    // on-disk, nothing cached: all three families dispatch local
    assert(GraphLayout.serveDecision(layout, queries, 2, Metric.L2)._1
      === "local")
    assert(GraphLayout.serveAdcDecision(layout, queries, 2)._1 === "local")
    assert(GraphLayout.serveHammingDecision(layout, queries, 2)._1
      === "local")
    val base = rows(GraphLayout.serve(layout, queries, 5, 32, 2,
      Metric.L2))

    // cache every frame the cogroup paths would read. r13 first shipped
    // the obvious rule (cached ⇒ cogroup), then MEASURED it at 10M:
    // cogroup-on-cached 34.8 s / 4.68 GB exchange vs local-on-cached
    // 4.2 s / 174 KB — the exchange dominates regardless of where the
    // input rows live, so the rule was REVERSED and this spec pins the
    // reversal: decisions are cache-blind, the manual dial remains.
    layout.clustered.cache().count()
    layout.graph.cache().count()
    layout.codes.get.cache().count()
    try {
      assert(GraphLayout.serveDecision(layout, queries, 2, Metric.L2)._1
        === "local", "cached frames must NOT flip the data family")
      assert(GraphLayout.serveAdcDecision(layout, queries, 2)._1
        === "local", "cached frames must NOT flip the ADC family")
      assert(GraphLayout.serveHammingDecision(layout, queries, 2)._1
        === "local", "cached frames must NOT flip the binary family")
      // Auto (local) on the cached store: rows unchanged
      assert(rows(GraphLayout.serve(layout, queries, 5, 32, 2,
        Metric.L2)) === base)
      // the manual dial serves THROUGH the cached frames, same rows
      assert(rows(GraphLayout.serve(layout, queries, 5, 32, 2, Metric.L2,
        mode = GraphLayout.ServeMode.Cogroup)) === base)
      assert(rows(GraphLayout.serveAdc(layout, queries, 5, 32,
        nProbes = 2, mode = GraphLayout.ServeMode.Cogroup)) ===
        rows(GraphLayout.serveAdc(layout, queries, 5, 32, nProbes = 2)))
    } finally {
      layout.clustered.unpersist(true)
      layout.graph.unpersist(true)
      layout.codes.get.unpersist(true)
    }
    assert(GraphLayout.serveDecision(layout, queries, 2, Metric.L2)._1
      === "local")
  }

  test("serveDecisionProbed hands serve() its probe map: one routing " +
      "computation end-to-end, rows identical, and the map is HONORED " +
      "(a truncated map serves only its shards)") {
    val (_, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_probed"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
      routingGroups = 2)
    val layout = GraphLayout.open(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq

    // inspect-then-serve: the decision's map, handed back, reproduces
    // the self-probed serve bit-for-bit (routed AND flat)
    val (m1, f1, pmR) = GraphLayout.serveDecisionProbed(layout, queries,
      nProbes = 2, Metric.L2, l1Probes = 2)
    assert(m1 === "local" && f1 > 0 && pmR.nonEmpty)
    assert(rows(GraphLayout.serve(layout, queries, 5, 32, nProbes = 2,
      Metric.L2, l1Probes = 2, prebuiltProbes = Some(pmR))) ===
      rows(GraphLayout.serve(layout, queries, 5, 32, nProbes = 2,
        Metric.L2, l1Probes = 2)))
    val (_, _, pmF) = GraphLayout.serveDecisionProbed(layout, queries,
      nProbes = 2, Metric.L2)
    assert(rows(GraphLayout.serve(layout, queries, 5, 32, nProbes = 2,
      Metric.L2, prebuiltProbes = Some(pmF))) ===
      rows(GraphLayout.serve(layout, queries, 5, 32, nProbes = 2,
        Metric.L2)))

    // the map is authoritative, not advisory: serving a TRUNCATED map
    // equals the manual path given the same truncation — proof the
    // dispatched search probes exactly the decision's shards instead of
    // recomputing its own routing
    val keep = pmF.keySet.min
    val pmCut = pmF.filter { case (cid, _) => cid == keep }
    assert(rows(GraphLayout.serve(layout, queries, 5, 32, nProbes = 2,
      Metric.L2, prebuiltProbes = Some(pmCut))) ===
      rows(GraphLayout.searchLocal(layout, queries, 5, 32, nProbes = 2,
        Metric.L2, prebuiltProbes = Some(pmCut))))

    // the ADC and binary twins honor their maps the same way
    val bPath = "/tmp/graft_graphlayout_probed_bin"
    val (dataB, centsB, clusteredB, graphB, _) = fixture()
    GraphLayout.write(clusteredB, graphB, centsB, bPath, pq = Some(p),
      bin = Some(graft.operators.BinaryQuant.train(dataB)))
    val lb = GraphLayout.open(spark, bPath)
    val (_, _, pmA) = GraphLayout.serveAdcDecisionProbed(lb, queries,
      nProbes = 2)
    assert(rows(GraphLayout.serveAdc(lb, queries, 5, 32, nProbes = 2,
      prebuiltProbes = Some(pmA))) ===
      rows(GraphLayout.serveAdc(lb, queries, 5, 32, nProbes = 2)))
    val (_, _, pmH) = GraphLayout.serveHammingDecisionProbed(lb, queries,
      nProbes = 2)
    assert(rows(GraphLayout.serveHamming(lb, queries, 5, 32, nProbes = 2,
      kReorder = 2, prebuiltProbes = Some(pmH))) ===
      rows(GraphLayout.serveHamming(lb, queries, 5, 32, nProbes = 2,
        kReorder = 2)))
  }

  test("probe-pruned rerank: served rerank paths scan only probed data " +
      "partitions (PartitionFilters on cluster_id) with rows identical " +
      "to the unpruned manual paths") {
    val (data, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val b = graft.operators.BinaryQuant.train(data)
    val path = "/tmp/graft_graphlayout_pruned_rerank"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
      bin = Some(b))
    val layout = GraphLayout.open(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq

    // selective probes so the prune is a strict subset of the shards
    val q1 = queries.orderBy("query_id").limit(2)
    val servedH = GraphLayout.serveHamming(layout, q1, 5, 1 << 12,
      nProbes = 1, kReorder = 2)
    // identical rows to the manual path that scans the full data frame
    assert(rows(servedH) === rows(GraphLayout.searchHammingLocal(layout,
      q1, 5, 1 << 12, nProbes = 1, kReorder = 2)))
    // the rerank's data scan is partition-pruned: the FileSourceScan
    // over the data dir carries a cluster_id MEMBERSHIP partition
    // filter (one probed shard folds isin to an equality; several stay
    // an IN list) — not just isnotnull. Checked on the physical plan
    // tree, not the plan STRING (Spark truncates large plan strings
    // before the scan node).
    def dataScanPruned(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("/data")) => s
      }.exists(_.partitionFilters.exists {
        case _: org.apache.spark.sql.catalyst.expressions.IsNotNull =>
          false
        case e => e.references.exists(_.name == "cluster_id")
      })
    assert(dataScanPruned(servedH),
      "expected a cluster_id membership partition filter on the " +
        "Hamming rerank's data scan")

    // the reranked ADC dispatcher prunes the same way, rows unchanged
    val servedA = GraphLayout.serveAdc(layout, q1, 5, 1 << 12,
      nProbes = 1, kReorder = 2)
    assert(rows(servedA) === rows(GraphLayout.searchAdcLocal(layout, q1,
      5, 1 << 12, nProbes = 1, kReorder = 2)))
    assert(dataScanPruned(servedA),
      "expected a cluster_id membership partition filter on the ADC " +
        "rerank's data scan")
  }

  test("layout without PQ opens with no codes and searchAdc fails loudly") {
    val (_, cents, clustered, graph, _) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val path = "/tmp/graft_graphlayout_spec_nopq"
    GraphLayout.write(clustered, graph, cents, path)
    val layout = GraphLayout.open(spark, path)
    assert(layout.pq.isEmpty && layout.codes.isEmpty)
    // full-precision serving still works
    assert(GraphLayout.search(layout, queries, 10, 40, 2,
      Metric.L2).count() > 0)
    assertThrows[RuntimeException] {
      GraphLayout.searchAdc(layout, queries, 10, 40, 2)
    }
  }

  test("serveCold/serveAdcCold/serveHammingCold (probed-dir cold open) ≡ " +
      "serve*(open(path)) on flat and routed probes; marked store refused") {
    import graft.operators.BinaryQuant
    val (data, cents, clustered, graph, p) = fixture()
    val queries = Tables.embeddingQueries(spark, sfDir)
    val b = BinaryQuant.train(data)
    val path = "/tmp/graft_graphlayout_spec_servecold"
    GraphLayout.write(clustered, graph, cents, path, pq = Some(p),
      bin = Some(b), routingGroups = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val layout = GraphLayout.open(spark, path)

    // full-precision, flat probes
    assert(rows(GraphLayout.serveCold(spark, path, queries, 10, 40, 2,
        Metric.L2)) ===
      rows(GraphLayout.serve(layout, queries, 10, 40, 2, Metric.L2)))
    // full-precision, ROUTED probes: cold must follow the same
    // hierarchical selection
    assert(rows(GraphLayout.serveCold(spark, path, queries, 10, 40, 2,
        Metric.L2, l1Probes = 1)) ===
      rows(GraphLayout.serve(layout, queries, 10, 40, 2, Metric.L2,
        l1Probes = 1)))
    // ADC walk with exact rerank
    assert(rows(GraphLayout.serveAdcCold(spark, path, queries, 10, 40, 2,
        kReorder = 4)) ===
      rows(GraphLayout.serveAdc(layout, queries, 10, 40, 2, kReorder = 4)))
    // binary Hamming walk with exact rerank
    assert(rows(GraphLayout.serveHammingCold(spark, path, queries, 10,
        1 << 14, 2, kReorder = 4)) ===
      rows(GraphLayout.serveHamming(layout, queries, 10, 1 << 14, 2,
        kReorder = 4)))

    // FileIndex regression pin (r16 verdict item 9): every big-dir scan
    // of the cold layout is rooted at probed `cluster_id=` dirs — never
    // the store-wide dir whose listing cost ∝ total shards
    val coldL = GraphLayout.coldLayoutFor(spark, path, queries, 2,
      Metric.L2)
    def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }.flatMap(_.relation.location.rootPaths.map(_.toString))
    for (f <- Seq(coldL.clustered, coldL.graph) ++ coldL.codes ++
        coldL.binCodes) {
      val rs = scanRoots(f)
      assert(rs.nonEmpty && rs.forall(_.contains("cluster_id=")),
        s"cold scan roots must be probed shard dirs, got $rs")
    }

    // a marked store is refused by every cold twin exactly like open()
    val lease = graft.operators.StoreMarker.begin(spark, path, "upsert",
      Seq(0L))
    lease.stop()
    val e = intercept[Exception] {
      GraphLayout.serveCold(spark, path, queries, 10, 40, 2, Metric.L2) }
    assert(e.getMessage.contains("marker"))
    lease.complete()
  }
}
