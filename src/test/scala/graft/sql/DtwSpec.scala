package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Independent pins for the q292 DTW kernel: a full-table textbook DP
  * (different algorithmic shape from K.seqDtw's rolling row), closed
  * forms, symmetry, and the warp-beats-diagonal case. */
class DtwSpec extends AnyFunSuite {

  /** Textbook O(n·m) full-table reference. */
  private def ref(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return -1L
    val INF = Long.MaxValue / 4
    val d = Array.fill(n + 1, m + 1)(INF)
    d(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(math.min(d(i - 1)(j), d(i)(j - 1)), d(i - 1)(j - 1))
    d(n)(m)
  }

  test("closed forms") {
    assert(K.seqDtw(Array(7L), Array(3L)) == 4L)
    assert(K.seqDtw(Array(1L, 2L, 3L), Array(1L, 2L, 3L)) == 0L)
    // constant vs constant: the diagonal is optimal → n·|ca − cb|
    assert(K.seqDtw(Array.fill(5)(3L), Array.fill(5)(8L)) == 25L)
    assert(K.seqDtw(Array.empty[Long], Array(1L)) == -1L)
  }

  test("warping absorbs a one-step phase shift") {
    // a leads b by one hour: warp path aligns the step edges exactly
    assert(K.seqDtw(Array(0L, 0L, 1L, 1L), Array(0L, 1L, 1L, 1L)) == 0L)
    // Euclidean (lockstep) distance would be 1 — DTW must beat it
  }

  test("symmetry and rectangular inputs match the full-table reference") {
    val rnd = new scala.util.Random(123)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(12); val m = 1 + rnd.nextInt(12)
      val a = Array.fill(n)(rnd.nextInt(50).toLong)
      val b = Array.fill(m)(rnd.nextInt(50).toLong)
      assert(K.seqDtw(a, b) == ref(a, b))
      assert(K.seqDtw(a, b) == K.seqDtw(b, a))
    }
  }

  test("longer series against the reference (spine-scale)") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(200)(rnd.nextInt(1000).toLong)
    val b = Array.fill(200)(rnd.nextInt(1000).toLong)
    assert(K.seqDtw(a, b) == ref(a, b))
  }
}
