package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Independent pins for the 3-3-2 palette kernel (q291): closed-form
  * constant/two-color images, the exact L1 error constants, rot90
  * (pixel-order) invariance, and a seeded-random image replayed through
  * a DIFFERENT code path (Scala groupBy over (r,g,b) triples). */
class PaletteSpec extends AnyFunSuite {

  private def const(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val a = new Array[Byte](w * h * 3)
    var i = 0
    while (i < a.length) {
      a(i) = r.toByte; a(i + 1) = g.toByte; a(i + 2) = b.toByte; i += 3
    }
    a
  }

  private def code(r: Int, g: Int, b: Int): Long =
    (((r >> 5) << 5) | ((g >> 5) << 2) | (b >> 6)).toLong

  private def l1(r: Int, g: Int, b: Int): Long =
    (math.abs(r - ((r >> 5) * 32 + 16)) + math.abs(g - ((g >> 5) * 32 + 16)) +
      math.abs(b - ((b >> 6) * 64 + 32))).toLong

  test("constant image: one code, exact closed-form L1 error") {
    val p = Images.pal332(const(7, 5, 200, 100, 30))
    assert(p.toSeq == Seq(1L, code(200, 100, 30), 35L, 35L * l1(200, 100, 30)))
    assert(code(200, 100, 30) == 204L) // (6<<5)|(3<<2)|0
    assert(l1(200, 100, 30) == 8L + 12L + 2L)
  }

  test("two colors: dominance count and smallest-code tie-break") {
    // 4 px of (0,0,0) = code 0, 3 px of (255,255,255) = code 255
    val a = const(7, 1, 0, 0, 0)
    var i = 4 * 3
    while (i < a.length) { a(i) = -1; a(i + 1) = -1; a(i + 2) = -1; i += 3 }
    val p = Images.pal332(a)
    assert(p(0) == 2L && p(1) == 0L && p(2) == 4L)
    // tie: 3 of each → smallest code wins
    val b = const(6, 1, 0, 0, 0)
    i = 3 * 3
    while (i < b.length) { b(i) = -1; b(i + 1) = -1; b(i + 2) = -1; i += 3 }
    val q = Images.pal332(b)
    assert(q(1) == 0L && q(2) == 3L)
  }

  test("pixel-order independence: rot90 leaves the audit unchanged") {
    val rnd = new scala.util.Random(42)
    val w = 12; val h = 9
    val a = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
    val r = Images.rotate90Rgb(w, h, a)
    assert(Images.pal332(a).toSeq == Images.pal332(r).toSeq)
  }

  test("seeded-random image matches an independent groupBy reference") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill[Byte](300 * 3)(rnd.nextInt(256).toByte)
    val px = a.grouped(3).map(t =>
      (t(0) & 0xFF, t(1) & 0xFF, t(2) & 0xFF)).toSeq
    val hist = px.groupBy { case (r, g, b) => code(r, g, b) }
      .map { case (c, v) => c -> v.size.toLong }
    val top = hist.toSeq.sortBy { case (c, n) => (-n, c) }.head
    val qerr = px.map { case (r, g, b) => l1(r, g, b) }.sum
    assert(Images.pal332(a).toSeq ==
      Seq(hist.size.toLong, top._1, top._2, qerr))
  }

  test("channel centers bound the per-pixel error by 16+16+32") {
    (0 to 255).foreach { v =>
      assert(math.abs(v - ((v >> 5) * 32 + 16)) <= 16)
      assert(math.abs(v - ((v >> 6) * 64 + 32)) <= 32)
    }
  }
}
