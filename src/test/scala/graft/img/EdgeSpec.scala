package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the Sobel edge profile and the 16-bin luma
  * histogram: flat → zero edges, axis steps → pure E/S octants with
  * exact counts and magnitudes, a 45° ramp → pure diagonal octant, and
  * the conservation invariants (Σocts == edge_count, Σhist == pixels)
  * on random images. */
class EdgeSpec extends AnyFunSuite {

  private def flat(w: Int, h: Int, v: Int): Array[Byte] =
    Array.fill(w * h * 3)(v.toByte)

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y).toByte
      val k = (y * w + x) * 3
      out(k) = v; out(k + 1) = v; out(k + 2) = v
    }
    out
  }

  test("flat image: zero edges, all octants zero") {
    val es = Images.sobelStats(16, 16, flat(16, 16, 128))
    assert(es.toSeq == Seq.fill(10)(0L))
  }

  test("vertical step: 2(h-2) east edges of magnitude 1020") {
    val w = 16; val h = 12
    val rgb = gray(w, h)((x, _) => if (x < w / 2) 0 else 255)
    val es = Images.sobelStats(w, h, rgb)
    val expect = 2L * (h - 2)
    assert(es(0) == expect)           // edge count: both step-adjacent columns
    assert(es(1) == 1020L * expect)   // |gx| = 4·255, gy = 0
    assert(es(2) == expect)           // all east (gx > 0, luma rises along +x)
    assert(es.drop(3).forall(_ == 0L))
  }

  test("horizontal step (dark top): 2(w-2) south edges") {
    val w = 12; val h = 16
    val rgb = gray(w, h)((_, y) => if (y < h / 2) 0 else 255)
    val es = Images.sobelStats(w, h, rgb)
    val expect = 2L * (w - 2)
    assert(es(0) == expect)
    assert(es(1) == 1020L * expect)
    assert(es(2 + 6) == expect)       // gy = north − south < 0 → S (octant 6)
    // every OTHER octant must be zero (indices 2..9 except 2+6)
    assert(es.indices.drop(2).filter(_ != 2 + 6).forall(es(_) == 0L))
  }

  test("45° ramp: every interior pixel is an SE edge (gx=128, gy=-128)") {
    val w = 8; val h = 8
    val rgb = gray(w, h)((x, y) => 16 * (x + y)) // max 224, no clamping
    val es = Images.sobelStats(w, h, rgb)
    val interior = (w - 2L) * (h - 2L)
    assert(es(0) == interior)
    assert(es(1) == 256L * interior)
    assert(es(2 + 7) == interior)     // diagonal tie: gx > 0, gy < 0 → SE
  }

  test("conservation on random images: Σocts == edge_count, grad_sum ≥ 128·edges") {
    for (i <- 0L until 20L) {
      val es = Images.sobelStats(32, 24, Images.synthRgb(i, 32, 24))
      assert(es.drop(2).sum == es(0))
      assert(es(1) >= 128L * es(0))
    }
  }

  test("degenerate shapes return zeros (thinner than 3px, bad buffer)") {
    assert(Images.sobelStats(2, 16, flat(2, 16, 9)).toSeq == Seq.fill(10)(0L))
    assert(Images.sobelStats(16, 16, new Array[Byte](7)).toSeq == Seq.fill(10)(0L))
  }

  test("lumaHist16: flat image lands w·h in bin v>>4; random images conserve") {
    val hist = Images.lumaHist16(flat(16, 16, 200))
    assert(hist(200 >> 4) == 256L && hist.sum == 256L)
    for (i <- 0L until 20L) {
      val rgb = Images.synthRgb(i, 32, 24)
      assert(Images.lumaHist16(rgb).sum == 32L * 24L)
    }
  }
}
