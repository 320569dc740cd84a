package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for the q220/q222 audit statistics: the
  * DuckDB oracles prove engine↔oracle parity, but both sides share one
  * formula — this spec pins the CUSUM running-extremum closed form
  * against Page's literal recursion, and the Benford ppm literals
  * against the irrational definition they quantize. */
class AuditStatsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260819)

  test("CUSUM closed form equals Page's recursion on 1000 random series") {
    (0 until 1000).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      // integer mean-centered-ish series, including negative runs
      val y = Array.fill(n)((rnd.nextInt(41) - 20).toLong)
      // direct recursion
      var sp = 0L; var sn = 0L
      val spRec = new Array[Long](n); val snRec = new Array[Long](n)
      var i = 0
      while (i < n) {
        sp = math.max(0L, sp + y(i)); sn = math.max(0L, sn - y(i))
        spRec(i) = sp; snRec(i) = sn; i += 1
      }
      // the q220 closed form: U_t − min(0, min_{s≤t} U_s) and
      // max(0, max_{s≤t} U_s) − U_t
      var u = 0L; var mn = 0L; var mx = 0L
      i = 0
      while (i < n) {
        u += y(i); mn = math.min(mn, u); mx = math.max(mx, u)
        assert(u - math.min(0L, mn) == spRec(i), s"spos at $i")
        assert(math.max(0L, mx) - u == snRec(i), s"sneg at $i")
        i += 1
      }
    }
  }

  test("CUSUM detects a planted sustained shift the pointwise z-test misses") {
    // 200 hours at n=100 with a +10% shift for 100 hours: each hourly
    // deviation is ±5 around the global mean 105 (unflaggable pointwise
    // when half the hours sit on each side), but S⁺ integrates
    // H·(n−mean) = 1000 per shifted hour — total excess 1000 images
    // ≈ 9.5 mean-hours, well past the 4-mean-hour gate
    val h = 200
    val base = Array.fill(h)(100L)
    (50 until 150).foreach(i => base(i) = 110L)
    val s = base.sum
    val y = base.map(n => h * n - s)
    var u = 0L; var mn = 0L; var peak = 0L
    y.foreach { yi => u += yi; mn = math.min(mn, u); peak = math.max(peak, u - math.min(0L, mn)) }
    assert(peak > 4 * s, s"peak $peak vs 4S ${4 * s}")
    // pointwise deviation from the global mean stays at 5 — tiny vs the
    // level shift the integral sees (sanity of the motivation)
    assert(base.max - s / h <= 5)
  }

  test("Mann-Whitney doubled-midrank formula equals brute-force pair counting") {
    (0 until 200).foreach { _ =>
      val na = 1 + rnd.nextInt(30); val nb = 1 + rnd.nextInt(30)
      // small value domain to force plenty of ties
      val a = Array.fill(na)(rnd.nextInt(8).toLong)
      val b = Array.fill(nb)(rnd.nextInt(8).toLong)
      // definition: 2U_A = Σ pairs 2·[x>y] + 1·[x=y]
      var u2Def = 0L
      for (x <- a; y <- b) u2Def += (if (x > y) 2 else if (x == y) 1 else 0)
      // the q225 formulation over per-value counts
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val u2Dec = ca.map { case (v, n) =>
        val below = cb.filter(_._1 < v).values.sum
        n * (2 * below + cb.getOrElse(v, 0L))
      }.sum
      assert(u2Def == u2Dec)
      // complement identity the query ships: 2U_A + 2U_B = 2·n_A·n_B
      var u2b = 0L
      for (y <- b; x <- a) u2b += (if (y > x) 2 else if (y == x) 1 else 0)
      assert(u2Def + u2b == 2L * na * nb)
    }
  }

  test("Otsu sq/den ranking equals the definition-level argmax") {
    (0 until 500).foreach { _ =>
      val hist = Array.fill(16)(rnd.nextInt(60).toLong)
      val npx = hist.sum
      val mTot = hist.zipWithIndex.map { case (v, b) => v * b }.sum
      if (npx > 0) {
        // definition: maximize w0·w1·(μ0−μ1)² over valid splits
        val cand = (1 to 15).flatMap { t =>
          val w0 = hist.take(t).sum; val w1 = npx - w0
          if (w0 > 0 && w1 > 0) {
            val m0 = hist.take(t).zipWithIndex.map { case (v, b) => v * b }.sum
            val m1 = mTot - m0
            val mu0 = m0.toDouble / w0; val mu1 = m1.toDouble / w1
            val sigma = w0.toDouble * w1 * (mu0 - mu1) * (mu0 - mu1)
            val num = m0 * w1 - m1 * w0
            Some((t, sigma, num * num, w0 * w1))
          } else None
        }
        if (cand.nonEmpty) {
          val byDef = cand.minBy { case (t, s, _, _) => (-s, t) }._1
          val byDec = cand.minBy { case (t, _, sq, den) =>
            (-(sq.toDouble / den), t) }._1
          // (m0·w1 − m1·w0)²/(w0·w1) = w0·w1·(μ0−μ1)² exactly: the two
          // rankings may differ only through double rounding of the two
          // algebraically-equal forms — the DECISION both engines share
          // is the sq/den form, so pin the forms against each other
          val defVals = cand.map { case (_, s, _, _) => s }
          val decVals = cand.map { case (_, _, sq, den) => sq.toDouble / den }
          defVals.zip(decVals).foreach { case (s, d) =>
            assert(math.abs(s - d) <= 1e-6 * math.max(1.0, s.abs)) }
          if (byDef != byDec) {
            // only legal on a near-tie of the two float forms
            val s1 = cand.find(_._1 == byDef).get._2
            val s2 = cand.find(_._1 == byDec).get._2
            assert(math.abs(s1 - s2) <= 1e-6 * math.max(1.0, s1.abs))
          }
        }
      }
    }
  }

  test("k-core synchronized rounds equal arbitrary-order sequential peeling") {
    (0 until 50).foreach { _ =>
      // random graph on 40 vertices
      val n = 40; val k = 3
      val adj = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
      (0 until 120).foreach { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        if (a != b) { adj(a) += b; adj(b) += a }
      }
      // synchronized rounds (the q224 shape)
      var act = (0 until n).toSet
      var stable = false
      while (!stable) {
        val next = act.filter(v => adj(v).count(act) >= k)
        stable = next == act; act = next
      }
      // sequential peel in random order
      val seq = scala.collection.mutable.Set((0 until n): _*)
      var changed = true
      while (changed) {
        changed = false
        rnd.shuffle((0 until n).toList).foreach { v =>
          if (seq(v) && adj(v).count(seq) < k) { seq -= v; changed = true }
        }
      }
      assert(act == seq.toSet, "k-core must be order-independent")
    }
  }

  test("Spearman doubled midranks: tie-free case equals the 1 - 6*sum(d^2) form") {
    (0 until 100).foreach { _ =>
      val n = 3 + rnd.nextInt(40)
      // tie-free series: distinct values via a shuffled permutation
      val xs = rnd.shuffle((1 to n).toList).map(_.toLong)
      val ys = rnd.shuffle((1 to n).toList).map(_.toLong)
      def rank2(v: Seq[Long]): Seq[Long] = {
        val sorted = v.sorted
        v.map { x =>
          val below = sorted.count(_ < x); val at = sorted.count(_ == x)
          2L * (below + 1) + at - 1
        }
      }
      val rx = rank2(xs); val ry = rank2(ys)
      val hh = n.toLong
      val sx = rx.sum; val sy = ry.sum
      val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val rhoDec = (hh.toDouble * sxy - sx.toDouble * sy) /
        (math.sqrt(hh.toDouble * sxx - sx.toDouble * sx) *
         math.sqrt(hh.toDouble * syy - sy.toDouble * sy))
      // classic tie-free formula over SINGLE ranks (the doubled ranks are
      // an affine transform, so Pearson is unchanged)
      val d2 = rx.zip(ry).map { case (a, b) => ((a - b) / 2.0) * ((a - b) / 2.0) }.sum
      val rhoDef = 1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n - 1))
      assert(math.abs(rhoDec - rhoDef) <= 1e-9, s"$rhoDec vs $rhoDef")
    }
  }

  test("Spearman doubled midranks are integers equal to 2x the average tied rank") {
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(30)
      val v = Array.fill(n)(rnd.nextInt(6).toLong) // heavy ties
      val sorted = v.sorted
      v.foreach { x =>
        val below = sorted.count(_ < x); val at = sorted.count(_ == x)
        // positions below+1 .. below+at share the average (2·below+at+1)/2
        val avg2 = 2.0 * (below + 1 + below + at) / 2.0
        val r2 = 2L * (below + 1) + at - 1
        assert(r2.toDouble == avg2)
      }
    }
  }

  test("Benford ppm literals equal floor(log10(1 + 1/d) * 1e6)") {
    val sql = SparkEntry.oracleSql("q222_benford")
    (1 to 9).foreach { d =>
      val exp = math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
      assert(sql.contains(s"($d, $exp)"),
        s"oracle VALUES must carry ($d, $exp)")
    }
  }
}
