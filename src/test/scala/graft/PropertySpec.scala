package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.core.Metric
import graft.functions.Binary16
import graft.operators.{LocalTopK, VamanaKernel}
import scala.collection.mutable.ArrayBuffer

/** ScalaCheck properties over the pure kernels (SURVEY §5: prune invariants,
  * codec round trips, buffer ordering) — no SparkSession needed. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic property driver (the scalatest-scalacheck bridge isn't in
    * the offline cache): samples `gen` at 100 fixed seeds. */
  private def forAll[T](gen: Gen[T], cases: Int = 100)(f: T => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(f)
    }


  private val vecGen: Gen[Array[Array[Double]]] = for {
    n <- Gen.choose(2, 40)
    d <- Gen.choose(1, 6)
    seed <- Gen.choose(0L, 1000000L)
  } yield {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rng.nextDouble() * 10 - 5))
  }

  test("robustPrune: subset of pool, unique, bounded, nearest kept") {
    val g = for {
      vecs <- vecGen; alpha <- Gen.choose(1.0, 2.0)
      maxDeg <- Gen.choose(1, 16)
    } yield (vecs, alpha, maxDeg)
    forAll(g) { case (vecs, alpha, maxDeg) =>
        val pool = new ArrayBuffer[(Int, Double)]
        vecs.indices.foreach { s =>
          pool += ((s, Metric.L2.compute(vecs(0), vecs(s)))) }
        val kept = VamanaKernel.robustPrune(0, pool, alpha, maxDeg, vecs,
          Metric.L2)
        assert(kept.length <= maxDeg)
        assert(kept.distinct.length === kept.length)
        assert(!kept.contains(0))
        assert(kept.forall(s => s >= 0 && s < vecs.length))
        if (vecs.length > 1) {
          val nearest = (1 until vecs.length)
            .minBy(s => (Metric.L2.compute(vecs(0), vecs(s)), s))
          assert(kept.head === nearest)
        }
    }
  }

  test("LocalTopK equals sort-take for any stream, both orderings") {
    val streamGen = for {
      n <- Gen.choose(0, 200)
      k <- Gen.choose(1, 20)
      asc <- Gen.oneOf(true, false)
      seed <- Gen.choose(0L, 1000000L)
    } yield (n, k, asc, seed)
    forAll(streamGen) { case (n, k, asc, seed) =>
      val rng = new scala.util.Random(seed)
      // duplicate distances + ids force the tie-break path
      val items = Seq.fill(n)((rng.nextInt(20).toDouble, rng.nextInt(50).toLong))
      val heap = new LocalTopK(k, asc)
      items.foreach { case (d, id) => heap.insert(d, id) }
      val got = (0 until heap.n).map(i => (heap.dists(i), heap.ids(i)))
      val sorted = items.sortWith { case ((d1, i1), (d2, i2)) =>
        if (d1 != d2) { if (asc) d1 < d2 else d1 > d2 } else i1 < i2 }
      // the heap keeps duplicates (same (d,id) twice) exactly like a sorted
      // prefix does
      assert(got === sorted.take(k))
    }
  }

  test("binary16 round trip: |decode(encode(f)) - f| within half-precision " +
      "ulp bounds") {
    forAll(Gen.choose(-65000.0f, 65000.0f), cases = 500) { f =>
      val back = Binary16.halfToFloat(Binary16.floatToHalf(f))
      val mag = math.abs(f)
      if (mag >= math.pow(2, -14).toFloat)
        assert(math.abs(back - f) <= mag * math.pow(2, -10))
      else
        assert(math.abs(back - f) <= math.pow(2, -24))
    }
  }

  test("binary16 encode is monotone (order-preserving) on finite floats") {
    val pairs = for {
      a <- Gen.choose(-60000.0f, 60000.0f)
      b <- Gen.choose(-60000.0f, 60000.0f)
    } yield (a, b)
    forAll(pairs, cases = 500) { case (a, b) =>
        val (da, db) = (Binary16.halfToFloat(Binary16.floatToHalf(a)),
          Binary16.halfToFloat(Binary16.floatToHalf(b)))
        if (a <= b) assert(da <= db) else assert(da >= db)
    }
  }

  test("beam buffer stays sorted with correct tie-breaks under any inserts") {
    val g = for {
      cap <- Gen.choose(1, 16)
      asc <- Gen.oneOf(true, false)
      n <- Gen.choose(0, 100)
      seed <- Gen.choose(0L, 1000000L)
    } yield (cap, asc, n, seed)
    forAll(g) { case (cap, asc, n, seed) =>
      val rng = new scala.util.Random(seed)
      val buf = new VamanaKernel.BeamBuffer(cap, asc)
      (0 until n).foreach { _ =>
        buf.insert(rng.nextInt(10).toDouble, rng.nextInt(30)) }
      val entries = (0 until buf.n).map(i => (buf.dists(i), buf.slots(i)))
      val resorted = entries.sortWith { case ((d1, s1), (d2, s2)) =>
        if (d1 != d2) { if (asc) d1 < d2 else d1 > d2 } else s1 < s2 }
      assert(entries === resorted)
      assert(buf.n <= cap)
    }
  }

  test("greedy search result is a subset of reachable nodes, best-first") {
    forAll(vecGen) { vecs =>
      val (adj, entry) = VamanaKernel.build(vecs,
        VamanaKernel.BuildParams(maxDegree = 8, buildWindow = 16), Metric.L2)
      val q = vecs(0)
      val buf = VamanaKernel.greedySearch(adj, vecs, entry, q, 8, Metric.L2)
      val dists = (0 until buf.n).map(buf.dists)
      assert(dists === dists.sorted)
      assert((0 until buf.n).forall(i =>
        buf.slots(i) >= 0 && buf.slots(i) < vecs.length))
    }
  }

  test("CandidatePool.sortBestFirst equals the stable tupled sort for any " +
      "pool, both orderings") {
    val g = for {
      n <- Gen.choose(0, 400)
      seed <- Gen.choose(0L, 1000000L)
      asc <- Gen.oneOf(true, false)
      // small value range forces many exact distance ties (the id
      // tiebreak path) and duplicate (dist, slot) patterns
      coarse <- Gen.oneOf(true, false)
    } yield (n, seed, asc, coarse)
    forAll(g) { case (n, seed, asc, coarse) =>
      val rng = new scala.util.Random(seed)
      val pool = new VamanaKernel.CandidatePool(4)
      val ref = new ArrayBuffer[(Int, Double)]
      (0 until n).foreach { _ =>
        val s = rng.nextInt(n + 1)
        val d = if (coarse) rng.nextInt(4).toDouble else rng.nextDouble()
        pool.add(s, d)
        ref += ((s, d))
      }
      pool.sortBestFirst(asc)
      val expect = ref.sortBy { case (s, d) => (if (asc) d else -d, s) }
      val got = (0 until pool.n).map(i => (pool.slots(i), pool.dists(i)))
      assert(got === expect.toSeq)
    }
  }

  test("mixed-precision kernels equal compute on widened copies for any " +
      "input (property form)") {
    val g = for {
      d <- Gen.choose(1, 200)
      seed <- Gen.choose(0L, 1000000L)
    } yield (d, seed)
    forAll(g, cases = 50) { case (d, seed) =>
      val rng = new scala.util.Random(seed)
      val af = Array.fill(d)(rng.nextFloat() * 2f - 1f)
      val bf = Array.fill(d)(rng.nextFloat() * 2f - 1f)
      val ad = af.map(_.toDouble)
      val bd = bf.map(_.toDouble)
      for (m <- Metric.all) {
        assert(m.computeFF(af, bf) == m.compute(ad, bd))
        assert(m.computeDF(ad, bf) == m.compute(ad, bd))
      }
    }
  }
}
