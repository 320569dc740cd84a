package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form SSIM pins: identity, flat-vs-flat luminance term,
  * symmetry, range, and sensitivity ordering (more distortion → lower). */
class SsimSpec extends AnyFunSuite {

  private def flat(w: Int, h: Int, v: Int): Array[Byte] =
    Array.fill(w * h * 3)(v.toByte)

  test("self-SSIM is exactly 1e6 for arbitrary images") {
    for (i <- 0L until 20L) {
      val rgb = Images.synthRgb(i, 16, 16)
      assert(Images.ssimQ(16, 16, rgb, rgb) == 1000000L)
    }
  }

  test("flat vs flat: pure luminance term (2ab+C1)/(a²+b²+C1), zero-variance blocks") {
    // gray(50,50,50) → luma 50; gray(100,...) → luma 100 (luma(v,v,v)=v·256/256)
    val a = flat(8, 8, 50)
    val b = flat(8, 8, 100)
    val c1 = 6.5025
    val want = math.floor((2.0 * 50 * 100 + c1) / (50.0 * 50 + 100.0 * 100 + c1) * 1e6).toLong
    assert(Images.ssimQ(8, 8, a, b) == want)
  }

  test("symmetry and [−1e6, 1e6] range on random pairs") {
    for (i <- 0L until 10L) {
      val a = Images.synthRgb(i, 24, 16)
      val b = Images.synthRgb(i + 100, 24, 16)
      val ab = Images.ssimQ(24, 16, a, b)
      val ba = Images.ssimQ(24, 16, b, a)
      assert(ab == ba)
      assert(ab >= -1000000L && ab <= 1000000L)
    }
  }

  test("monotone in aggregate under growing distortion (one vs two box blurs)") {
    // SSIM is NOT strictly per-image monotone under repeated blur (smooth
    // gradients can re-align structure by a few ppm — seed 3 here), but
    // the distortion ordering must hold on average and each value stays ≤ 1.
    var t1 = 0L; var t2 = 0L
    for (i <- 0L until 10L) {
      val rgb = Images.synthRgb(i, 32, 32)
      val b1 = Images.boxBlur3Rgb(32, 32, rgb)
      val b2 = Images.boxBlur3Rgb(32, 32, b1)
      val s1 = Images.ssimQ(32, 32, rgb, b1)
      val s2 = Images.ssimQ(32, 32, rgb, b2)
      assert(s1 <= 1000000L && s2 <= 1000000L)
      t1 += s1; t2 += s2
    }
    assert(t2 < t1, s"t1=$t1 t2=$t2")
  }

  test("partial edge blocks: non-multiple-of-8 dims work and self-pin holds") {
    val rgb = Images.synthRgb(7L, 13, 11)
    assert(Images.ssimQ(13, 11, rgb, rgb) == 1000000L)
  }
}
