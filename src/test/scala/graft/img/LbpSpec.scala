package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the LBP₈,₁ histogram: flat → all pattern 255,
  * strict horizontal gradient → all pattern 62 (T,TR,R,BR,B set),
  * strict vertical gradient → all pattern 248 (R,BR,B,BL,L set), a
  * bright impulse → exactly one pattern-0 cell; plus mass conservation
  * on a pseudo-random image and the degenerate guards. */
class LbpSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y).toByte
      val k = (y * w + x) * 3
      out(k) = v; out(k + 1) = v; out(k + 2) = v
    }
    out
  }

  test("flat image: every interior pixel is pattern 255") {
    val w = 12; val h = 9
    val lh = Images.lbpHist(w, h, gray(w, h)((_, _) => 100))
    assert(lh(255) == 1L * (w - 2) * (h - 2))
    assert(lh.sum == 1L * (w - 2) * (h - 2))
  }

  test("strict horizontal gradient: pattern {T,TR,R,BR,B} = 62 everywhere") {
    val w = 16; val h = 8
    val lh = Images.lbpHist(w, h, gray(w, h)((x, _) => x * 8))
    assert(lh(62) == 1L * (w - 2) * (h - 2))
  }

  test("strict vertical gradient: pattern {R,BR,B,BL,L} = 248 everywhere") {
    val w = 8; val h = 16
    val lh = Images.lbpHist(w, h, gray(w, h)((_, y) => y * 8))
    assert(lh(248) == 1L * (w - 2) * (h - 2))
  }

  test("bright impulse: exactly one pattern-0 cell at the impulse") {
    val w = 9; val h = 9
    val lh = Images.lbpHist(w, h, gray(w, h)((x, y) => if (x == 4 && y == 4) 200 else 10))
    assert(lh(0) == 1L) // the impulse itself: all neighbours below centre
    assert(lh.sum == 1L * (w - 2) * (h - 2))
  }

  test("mass conservation + guards") {
    val w = 13; val h = 11
    val lh = Images.lbpHist(w, h, gray(w, h)((x, y) => (x * 31 + y * 17) % 256))
    assert(lh.sum == 1L * (w - 2) * (h - 2))
    assert(Images.lbpHist(2, 5, gray(2, 5)((_, _) => 7)).forall(_ == 0L))
    assert(Images.lbpHist(4, 4, new Array[Byte](5)).forall(_ == 0L))
  }
}
