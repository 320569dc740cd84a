package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Pins Images.rotate90Rgb against a hand-computed fixture and the
  * dihedral-group algebra the q228 query re-proves on decoded buffers. */
class RotateSpec extends AnyFunSuite {

  private def px(rgb: Array[Byte], w: Int, x: Int, y: Int): (Int, Int, Int) = {
    val i = (y * w + x) * 3
    ((rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF))
  }

  test("hand-computed 3x2 clockwise rotation") {
    // 3 wide, 2 tall; pixel value encodes its (x, y)
    val w = 3; val h = 2
    val src = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      src(i) = (10 * x).toByte; src(i + 1) = (10 * y).toByte; src(i + 2) = 7
    }
    val out = Images.rotate90Rgb(w, h, src) // now 2 wide, 3 tall
    // clockwise: src top-left (0,0) → dst top-right (ow−1, 0)
    assert(px(out, h, 1, 0) == ((0, 0, 7)))
    // src bottom-left (0,1) → dst top-left (0,0)
    assert(px(out, h, 0, 0) == ((0, 10, 7)))
    // src top-right (2,0) → dst bottom-right (1,2)
    assert(px(out, h, 1, 2) == ((20, 0, 7)))
    // src bottom-right (2,1) → dst bottom-left (0,2)
    assert(px(out, h, 0, 2) == ((20, 10, 7)))
  }

  test("dihedral algebra on random buffers: rot90^4 = id, rot90^2 = rot180") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { _ =>
      val w = 1 + rnd.nextInt(17); val h = 1 + rnd.nextInt(13)
      val src = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val r1 = Images.rotate90Rgb(w, h, src)
      val r2 = Images.rotate90Rgb(h, w, r1)
      val r3 = Images.rotate90Rgb(w, h, r2)
      val r4 = Images.rotate90Rgb(h, w, r3)
      assert(java.util.Arrays.equals(r4, src), "rot90^4 must be identity")
      val rot180 = Images.flipRgb(w, h, Images.flipRgb(w, h, src, horizontal = true),
        horizontal = false)
      assert(java.util.Arrays.equals(r2, rot180), "rot90^2 must equal rot180")
      // pixel permutation: color histogram conserved
      assert(Images.colorHist64(r1).toSeq == Images.colorHist64(src).toSeq)
    }
  }

  test("rejects a mis-sized buffer") {
    intercept[IllegalArgumentException] {
      Images.rotate90Rgb(4, 4, new Array[Byte](10))
    }
  }
}
