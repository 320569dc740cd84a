package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Independent pins for the median-cut palette kernel (q312): constant
  * and two-color closed forms, the widest-channel/tie rules, pixel-order
  * invariance (the algorithm sees only value predicates), count
  * conservation, and adaptive-beats-grid on a 8-color image where the
  * 3-3-2 grid collapses codes. */
class MedianCutSpec extends AnyFunSuite {

  private def px(colors: (Int, Int, Int)*): Array[Byte] = {
    val a = new Array[Byte](colors.size * 3)
    colors.zipWithIndex.foreach { case ((r, g, b), i) =>
      a(i * 3) = r.toByte; a(i * 3 + 1) = g.toByte; a(i * 3 + 2) = b.toByte
    }
    a
  }

  test("constant image: one box, zero error, exact mean") {
    val m = Images.medianCut8(px(Seq.fill(9)((40, 200, 120)): _*))
    assert(m.toSeq == Seq(1L, 9L, 40L, 200L, 120L, 0L))
  }

  test("two colors split once then stay leaves; dominance exact") {
    // 5 black + 3 white: round 1 splits on the widest channel (tie → R)
    // at t = min(median, max−1); blacks left, whites right; both
    // constant afterwards → exactly 2 colors, zero error
    val m = Images.medianCut8(px(
      Seq.fill(5)((0, 0, 0)) ++ Seq.fill(3)((255, 255, 255)): _*))
    assert(m.toSeq == Seq(2L, 5L, 0L, 0L, 0L, 0L))
  }

  test("pixel order invariance") {
    val rnd = new scala.util.Random(99)
    val colors = Seq.fill(64)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val a = Images.medianCut8(px(colors: _*))
    val b = Images.medianCut8(px(rnd.shuffle(colors): _*))
    assert(a.toSeq == b.toSeq)
  }

  test("≤8 colors and a ≥9-color image saturates at 8") {
    // 9 well-separated grays → must pool at least two into one box
    val grays = (0 until 9).map(k => (k * 28, k * 28, k * 28))
    val m = Images.medianCut8(px(grays.flatMap(c => Seq.fill(3)(c)): _*))
    assert(m(0) == 8L)
    assert(m(5) > 0L) // pooling forces nonzero L1 error
  }

  test("median split is the LOWER median: 3 values go 2-left 1-right") {
    // single channel varies: values 10, 10, 30 → t = 10, left {10,10}
    val m = Images.medianCut8(px((10, 0, 0), (10, 0, 0), (30, 0, 0)))
    assert(m(0) == 2L)
    assert(m(1) == 2L && m(2) == 10L) // dominant = the left pair
    assert(m(5) == 0L)
  }

  test("adaptive palette beats the fixed 3-3-2 grid on grid-colliding colors") {
    // two colors inside the SAME 3-3-2 cell (r in [0,31]): grid cannot
    // separate them, median cut can
    val img = px(Seq.fill(4)((0, 0, 0)) ++ Seq.fill(4)((31, 0, 0)): _*)
    val mc = Images.medianCut8(img)
    val grid = Images.pal332(img)
    assert(mc(5) == 0L)       // adaptive: exact
    assert(grid(3) > 0L)      // grid: collapsed, nonzero error
  }

  test("dominant-box count conservation on random images") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(200)
      val img = px(Seq.fill(n)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))): _*)
      val m = Images.medianCut8(img)
      assert(m(0) >= 1L && m(0) <= 8L)
      assert(m(1) >= (n + 7) / 8 && m(1) <= n) // dominant ≥ ceil(n/8)
    }
  }
}
