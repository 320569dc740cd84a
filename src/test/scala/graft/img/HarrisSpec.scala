package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Harris response pins: flat → R ≡ 0 (count, max, and first-scan
  * arg-max all deterministic), a pure step edge → NO positive response
  * (det = 0 ⇒ R = −tr² ≤ 0), a quadrant corner → positive response,
  * and the rot90 transport law (corner count and max response are
  * rotation-invariant because the structure tensor just swaps/negates
  * axes). */
class HarrisSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y).toByte
      val k = (y * w + x) * 3
      out(k) = v; out(k + 1) = v; out(k + 2) = v
    }
    out
  }

  test("flat image: zero response, deterministic arg-max at (2,2)") {
    val w = 10; val h = 8
    val r = Images.harris(w, h, gray(w, h)((_, _) => 77))
    assert(r(0) == 1L * (w - 4) * (h - 4))
    assert(r(1) == 0L) // no positive response
    assert(r(2) == 0L && r(3) == 2L && r(4) == 2L)
  }

  test("vertical step edge: det = 0 so response is never positive") {
    val w = 16; val h = 12
    val r = Images.harris(w, h, gray(w, h)((x, _) => if (x < w / 2) 0 else 255))
    assert(r(1) == 0L)
    assert(r(2) <= 0L)
  }

  test("quadrant corner: positive response exists and beats the edge max") {
    val w = 16; val h = 16
    val r = Images.harris(w, h, gray(w, h)((x, y) => if (x >= 8 && y >= 8) 255 else 0))
    assert(r(1) > 0L)
    assert(r(2) > 0L)
  }

  test("rot90 transport: corner count and max response invariant") {
    val w = 20; val h = 12
    val img = gray(w, h)((x, y) => ((x / 4) * 53 + (y / 3) * 97) % 256)
    val a = Images.harris(w, h, img)
    val b = Images.harris(h, w, Images.rotate90Rgb(w, h, img))
    assert(a(0) == b(0) && a(1) == b(1) && a(2) == b(2))
  }

  test("degenerate guard: too small for a full window") {
    assert(Images.harris(4, 9, gray(4, 9)((_, _) => 1)).forall(_ == 0L))
  }
}
