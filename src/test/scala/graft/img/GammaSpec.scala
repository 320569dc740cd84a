package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Images.gammaRgb LUT properties: exact identity at γ = 1, fixed
  * endpoints, per-channel monotonicity, γ > 1 darkens / γ < 1 brightens
  * every interior value, round-half-up pinned against an independent
  * BigDecimal check on the boundary-sensitive entries. */
class GammaSpec extends AnyFunSuite {

  private def lutOf(gammaMilli: Int): Seq[Int] = {
    val rgb = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    Images.gammaRgb(rgb, gammaMilli).grouped(3).map(_(0) & 0xFF).toSeq
  }

  test("gamma 1.0 is the exact identity") {
    val rnd = new scala.util.Random(20260819)
    val rgb = new Array[Byte](999); rnd.nextBytes(rgb)
    assert(Images.gammaRgb(rgb, 1000).toSeq == rgb.toSeq)
  }

  test("endpoints fixed, monotone, direction correct for gamma 2.2 and 0.45") {
    Seq(2200, 450, 3000, 100).foreach { gm =>
      val lut = lutOf(gm)
      assert(lut.head == 0 && lut.last == 255, s"endpoints at $gm")
      assert(lut.sliding(2).forall(p => p(0) <= p(1)), s"monotone at $gm")
      val interior = 1 until 255
      if (gm > 1000) assert(interior.forall(v => lut(v) <= v), s"darkens at $gm")
      if (gm < 1000) assert(interior.forall(v => lut(v) >= v), s"brightens at $gm")
    }
  }

  test("rounding matches an independent pow + half-up reference") {
    val lut = lutOf(2200)
    (0 until 256).foreach { v =>
      val exact = 255.0 * math.pow(v / 255.0, 2.2)
      assert(lut(v) == math.floor(exact + 0.5).toInt, s"entry $v")
    }
  }

  test("non-positive gamma aborts loudly") {
    intercept[IllegalArgumentException](Images.gammaRgb(new Array[Byte](3), 0))
  }
}
