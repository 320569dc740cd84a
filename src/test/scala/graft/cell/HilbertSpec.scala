package graft.cell

import org.scalatest.funsuite.AnyFunSuite

/** Cells.hilbert: pinned first-quadrant values, exhaustive bijectivity +
  * round-trip at order 6, the defining unit-step continuity property
  * (consecutive indices are ALWAYS grid-adjacent — Morton is not), and
  * the measured locality win over Morton. */
class HilbertSpec extends AnyFunSuite {

  test("pinned small-order values") {
    // order 1: U-shape (0,0)→(0,1)→(1,1)→(1,0)
    assert(Cells.hilbert(0, 0, 1) == 0L)
    assert(Cells.hilbert(0, 1, 1) == 1L)
    assert(Cells.hilbert(1, 1, 1) == 2L)
    assert(Cells.hilbert(1, 0, 1) == 3L)
    // order 2: curve start walks the lower-left quadrant first
    assert(Cells.hilbert(0, 0, 2) == 0L)
    assert(Cells.hilbert(1, 0, 2) == 1L)
    assert(Cells.hilbert(1, 1, 2) == 2L)
    assert(Cells.hilbert(0, 1, 2) == 3L)
  }

  test("order-6 grid: bijective, round-trips, and every step is unit-adjacent") {
    val order = 6
    val n = 1 << order
    val idx = Array.fill(n * n)(-1L)
    for (x <- 0 until n; y <- 0 until n) {
      val d = Cells.hilbert(x, y, order)
      assert(d >= 0 && d < n * n, s"($x,$y) -> $d out of range")
      assert(idx(d.toInt) == -1L, s"collision at d=$d")
      idx(d.toInt) = x.toLong << 32 | y.toLong
      val (ix, iy) = Cells.hilbertXY(d, order)
      assert(ix == x && iy == y, s"round-trip ($x,$y) -> $d -> ($ix,$iy)")
    }
    // THE Hilbert property: d and d+1 are Manhattan-distance-1 apart
    (0 until n * n - 1).foreach { d =>
      val (ax, ay) = ((idx(d) >> 32).toInt, idx(d).toInt)
      val (bx, by) = ((idx(d + 1) >> 32).toInt, idx(d + 1).toInt)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"non-adjacent step d=$d: ($ax,$ay) -> ($bx,$by)")
    }
  }

  test("locality beats Morton: fewer contiguous index runs per query window") {
    // The layout metric that matters for range scans (Moon et al.,
    // "Clustering properties of the Hilbert space-filling curve"): a k×k
    // query window maps to some set of index values; each CONTIGUOUS run
    // is one sequential-read cluster. Fewer runs = fewer seeks / fewer
    // row-group touches. (Mean |Δindex| between neighbors is NOT the
    // right metric — Morton wins that one while losing real scans.)
    val order = 6
    val n = 1 << order
    val k = 8
    def meanRuns(f: (Long, Long) => Long): Double = {
      var total = 0L; var windows = 0L
      for (x0 <- 0 until n - k; y0 <- 0 until n - k) {
        val ds = (for (x <- x0 until x0 + k; y <- y0 until y0 + k)
          yield f(x, y)).sorted
        total += 1 + ds.sliding(2).count(p => p(1) != p(0) + 1)
        windows += 1
      }
      total.toDouble / windows
    }
    val h = meanRuns((x, y) => Cells.hilbert(x, y, order))
    val m = meanRuns((x, y) => Cells.morton(x, y))
    assert(h < m, s"hilbert mean runs/window $h !< morton $m")
  }

  test("bounds are enforced loudly") {
    intercept[IllegalArgumentException](Cells.hilbert(4, 0, 2))
    intercept[IllegalArgumentException](Cells.hilbert(0, -1, 2))
    intercept[IllegalArgumentException](Cells.hilbert(0, 0, 0))
    intercept[IllegalArgumentException](Cells.hilbert(0, 0, 32))
  }
}
