package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** boxBlur3Rgb / sharpness closed-form cases (q126's kernels): constant
  * images are blur fixpoints with sharpness 0, a single bright center has
  * a hand-computed Laplacian, degenerate shapes return the documented
  * zeros, and blur monotonically reduces sharpness on synthetic images. */
class BlurSpec extends AnyFunSuite {

  private def const(w: Int, h: Int, v: Int): Array[Byte] =
    Array.fill(w * h * 3)(v.toByte)

  test("constant image: blur is identity, sharpness 0") {
    for (v <- Seq(0, 28, 127, 200, 255)) {
      val img = const(5, 4, v)
      assert(Images.boxBlur3Rgb(5, 4, img).toSeq == img.toSeq)
      assert(Images.sharpness(5, 4, img) == 0L)
    }
  }

  test("3×3 white center on black: hand-computed Laplacian and blur") {
    val img = const(3, 3, 0)
    img(4 * 3) = 255.toByte; img(4 * 3 + 1) = 255.toByte; img(4 * 3 + 2) = 255.toByte
    // luma(255,255,255) = (77+150+29)*255 >> 8 = 255; only interior pixel
    // is the center: lap = 4*255 - 0 = 1020 → 1020² = 1040400
    assert(Images.sharpness(3, 3, img) == 1040400L)
    // every replicate-border 3×3 window contains the center exactly once
    // → every blurred channel is 255/9 = 28; the result is constant
    val blurred = Images.boxBlur3Rgb(3, 3, img)
    assert(blurred.toSeq == const(3, 3, 28).toSeq)
    assert(Images.sharpness(3, 3, blurred) == 0L)
  }

  test("degenerate shapes: thin images and length mismatches are safe zeros") {
    assert(Images.sharpness(2, 8, const(2, 8, 100)) == 0L)
    assert(Images.sharpness(8, 2, const(8, 2, 100)) == 0L)
    val wrong = new Array[Byte](10)
    assert(Images.sharpness(4, 4, wrong) == 0L) // 4*4*3 != 10
    assert(Images.boxBlur3Rgb(4, 4, wrong).toSeq == wrong.toSeq)
  }

  test("blur never increases sharpness on 200 synthetic images") {
    (0L until 200L).foreach { i =>
      val w = 16 + (i % 3).toInt * 8
      val h = 16 + (i % 5).toInt * 4
      val rgb = Images.synthRgb(i, w, h)
      val s0 = Images.sharpness(w, h, rgb)
      val s1 = Images.sharpness(w, h, Images.boxBlur3Rgb(w, h, rgb))
      assert(s1 <= s0, s"image $i: blur raised sharpness $s0 -> $s1")
    }
  }
}
