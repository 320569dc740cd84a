package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Independent pins for the Haar subband-energy kernel (q304): a
  * per-2×2-block closed-form reference (a DIFFERENT shape from the
  * kernel's separable row/column passes), constant-image closed forms,
  * the unnormalized-Haar Parseval cascade (Σcoef² = 4·Σinput² per
  * level), flip invariance and the rot90 LH↔HL band transport. */
class HaarSpec extends AnyFunSuite {

  private def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  private def lumaOf(rgb: Array[Byte]): Array[Int] = {
    val g = new Array[Int](256)
    var p = 0
    while (p < 256) {
      g(p) = luma(rgb(p * 3) & 0xFF, rgb(p * 3 + 1) & 0xFF, rgb(p * 3 + 2) & 0xFF)
      p += 1
    }
    g
  }

  /** Block closed form: each level-1 coefficient quartet of a 2×2 block
    * [a b; c d] is (a+b+c+d, (a−b)+(c−d), (a+b)−(c+d), (a−b)−(c−d));
    * level 2 repeats over the 8×8 LL grid. Returns (energies, Σll1²). */
  private def ref(g: Array[Int]): (Array[Long], Long) = {
    val ll1 = new Array[Int](64)
    var lh1 = 0L; var hl1 = 0L; var hh1 = 0L
    for (by <- 0 until 8; bx <- 0 until 8) {
      val a = g(2 * by * 16 + 2 * bx); val b = g(2 * by * 16 + 2 * bx + 1)
      val c = g((2 * by + 1) * 16 + 2 * bx); val d = g((2 * by + 1) * 16 + 2 * bx + 1)
      val lh = (a - b) + (c - d); val hl = (a + b) - (c + d); val hh = (a - b) - (c - d)
      ll1(by * 8 + bx) = a + b + c + d
      lh1 += lh.toLong * lh; hl1 += hl.toLong * hl; hh1 += hh.toLong * hh
    }
    var ll2 = 0L; var lh2 = 0L; var hl2 = 0L; var hh2 = 0L; var sll1 = 0L
    ll1.foreach(v => sll1 += v.toLong * v)
    for (by <- 0 until 4; bx <- 0 until 4) {
      val a = ll1(2 * by * 8 + 2 * bx); val b = ll1(2 * by * 8 + 2 * bx + 1)
      val c = ll1((2 * by + 1) * 8 + 2 * bx); val d = ll1((2 * by + 1) * 8 + 2 * bx + 1)
      val ll = a + b + c + d; val lh = (a - b) + (c - d)
      val hl = (a + b) - (c + d); val hh = (a - b) - (c - d)
      ll2 += ll.toLong * ll; lh2 += lh.toLong * lh
      hl2 += hl.toLong * hl; hh2 += hh.toLong * hh
    }
    (Array(ll2, lh2, hl2, hh2, lh1, hl1, hh1), sll1)
  }

  private def rnd16(seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](16 * 16 * 3)
    r.nextBytes(a)
    a
  }

  test("constant image: zero detail, ll2 = 4096·luma² closed form") {
    val a = new Array[Byte](16 * 16 * 3)
    var i = 0
    while (i < a.length) { a(i) = -56; a(i + 1) = 100; a(i + 2) = 30; i += 3 }
    val l = luma(200, 100, 30).toLong
    val e = Images.haarEnergy(16, 16, a)
    assert(e.toSeq == Seq(4096L * l * l, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("random 16×16: kernel equals the block closed-form reference") {
    for (seed <- 1 to 5) {
      val a = rnd16(seed)
      val (want, _) = ref(lumaOf(a))
      assert(Images.haarEnergy(16, 16, a).toSeq == want.toSeq, s"seed $seed")
    }
  }

  test("Parseval cascade: Σlevel-k coef² = 4·Σinput² at both levels") {
    val a = rnd16(7)
    val g = lumaOf(a)
    val (e, sll1) = ref(g)
    val sg = g.map(v => v.toLong * v).sum
    assert(e(4) + e(5) + e(6) + sll1 == 4L * sg)
    assert(e(0) + e(1) + e(2) + e(3) == 4L * sll1)
    assert(Images.haarEnergy(16, 16, a).toSeq == e.toSeq)
  }

  test("horizontal flip: all band energies invariant") {
    val a = rnd16(11)
    val f = Images.flipRgb(16, 16, a, horizontal = true)
    assert(Images.haarEnergy(16, 16, a).toSeq == Images.haarEnergy(16, 16, f).toSeq)
  }

  test("rot90: LH ↔ HL transport at both levels; LL/HH invariant") {
    val a = rnd16(13)
    val r = Images.rotate90Rgb(16, 16, a)
    val e = Images.haarEnergy(16, 16, a)
    val er = Images.haarEnergy(16, 16, r)
    assert(er(0) == e(0) && er(3) == e(3) && er(6) == e(6))
    assert(er(1) == e(2) && er(2) == e(1))
    assert(er(4) == e(5) && er(5) == e(4))
  }

  test("larger image rides the 16×16 thumbnail; bad buffer → zeros") {
    val w = 48; val h = 32
    val big = new Array[Byte](w * h * 3)
    new scala.util.Random(17).nextBytes(big)
    val th = Images.resizeRgb(w, h, big, 16, 16)
    val (want, _) = ref(lumaOf(th))
    assert(Images.haarEnergy(w, h, big).toSeq == want.toSeq)
    assert(Images.haarEnergy(4, 4, new Array[Byte](5)).toSeq == Seq.fill(7)(0L))
  }
}
