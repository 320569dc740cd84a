package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the 8×8 symmetric horizontal GLCM: flat image →
  * all mass on one diagonal bin, alternating vertical stripes → two
  * mirrored off-diagonal bins, a horizontal gradient → the adjacent-level
  * band; plus the structural invariants (transpose symmetry, total
  * = 2·h·(w−1)) on a pseudo-random image and the degenerate guards. */
class GlcmSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y).toByte
      val k = (y * w + x) * 3
      out(k) = v; out(k + 1) = v; out(k + 2) = v
    }
    out
  }

  // the kernel's own quantizer: luma(v,v,v) = (77+150+29)·v >> 8 = v, >> 5
  private def lvl(v: Int): Int = v >> 5

  test("flat image: all pairs on the (l,l) diagonal") {
    val w = 16; val h = 12; val v = 200
    val g = Images.glcm8(w, h, gray(w, h)((_, _) => v))
    val l = lvl(v)
    val expect = 2L * h * (w - 1)
    assert(g(l * 8 + l) == expect)
    assert(g.sum == expect)
  }

  test("alternating 0/255 columns: two mirrored off-diagonal bins") {
    val w = 10; val h = 7
    val g = Images.glcm8(w, h, gray(w, h)((x, _) => if (x % 2 == 0) 0 else 255))
    val pairs = 1L * h * (w - 1) // every horizontal pair crosses the stripe
    assert(g(0 * 8 + 7) == pairs)
    assert(g(7 * 8 + 0) == pairs)
    assert(g.sum == 2 * pairs)
  }

  test("horizontal 8-step gradient: only (k, k) and (k, k+1) bands") {
    val w = 16; val h = 4 // two columns per level: x div 2 = level
    val g = Images.glcm8(w, h, gray(w, h)((x, _) => (x / 2) * 32))
    // per row: 8 same-level pairs (within the 2-col bands)… rather, each
    // row has 15 adjacent pairs: 8 within-level, 7 between consecutive
    for (k <- 0 until 8) assert(g(k * 8 + k) == 2L * h * 1) // 1 within-level pair per band
    for (k <- 0 until 7) {
      assert(g(k * 8 + k + 1) == 1L * h)
      assert(g((k + 1) * 8 + k) == 1L * h)
    }
    assert(g.sum == 2L * h * (w - 1))
  }

  test("pseudo-random image: transpose symmetry and exact total") {
    val w = 23; val h = 17
    var seed = 12345L
    val rgb = gray(w, h) { (x, y) =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toInt
    }
    val g = Images.glcm8(w, h, rgb)
    for (i <- 0 until 8; j <- 0 until 8)
      assert(g(i * 8 + j) == g(j * 8 + i), s"asymmetry at ($i,$j)")
    assert(g.sum == 2L * h * (w - 1))
  }

  test("degenerate inputs: zeros, never throw") {
    assert(Images.glcm8(1, 5, gray(1, 5)((_, _) => 9)).forall(_ == 0L))
    assert(Images.glcm8(4, 4, new Array[Byte](7)).forall(_ == 0L))
  }
}
