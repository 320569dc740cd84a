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

  test("Benford ppm literals equal floor(log10(1 + 1/d) * 1e6)") {
    val sql = SparkEntry.oracleSql("q222_benford")
    (1 to 9).foreach { d =>
      val exp = math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
      assert(sql.contains(s"($d, $exp)"),
        s"oracle VALUES must carry ($d, $exp)")
    }
  }
}
