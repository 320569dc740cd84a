package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Images.moments vs an independent double-loop reference (own luma
  * copy), plus the rot90 transport law the q251 scaladoc claims:
  * s-scaled central moments obey μ20 ↔ μ02 and μ11 → −μ11 under the
  * pure pixel permutation rotate90Rgb (s, n invariant). */
class MomentsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260819)

  private def reference(rgb: Array[Byte], w: Int, h: Int): Array[Long] = {
    // independent machinery: per-pixel getter + BigInt accumulation
    def lum(x: Int, y: Int): Long = {
      val i = (y * w + x) * 3
      ((77 * (rgb(i) & 0xFF) + 150 * (rgb(i + 1) & 0xFF) + 29 * (rgb(i + 2) & 0xFF)) >> 8).toLong
    }
    var s, sx, sy, sxx, syy, sxy = BigInt(0)
    for (y <- 0 until h; x <- 0 until w) {
      val l = BigInt(lum(x, y))
      s += l; sx += l * x; sy += l * y
      sxx += l * x * x; syy += l * y * y; sxy += l * x * y
    }
    Array(w.toLong * h, s.toLong, sx.toLong, sy.toLong,
      sxx.toLong, syy.toLong, sxy.toLong)
  }

  private def randImg(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](w * h * 3); rnd.nextBytes(b); b
  }

  test("moments equal the independent reference on 50 random images") {
    (0 until 50).foreach { _ =>
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val rgb = randImg(w, h)
      assert(Images.moments(rgb, w, h).toSeq == reference(rgb, w, h).toSeq)
    }
  }

  test("rot90 transport: mu20s <-> mu02s, mu11s -> -mu11s; s, n invariant") {
    (0 until 30).foreach { _ =>
      val w = 2 + rnd.nextInt(30); val h = 2 + rnd.nextInt(30)
      val rgb = randImg(w, h)
      val m = Images.moments(rgb, w, h)
      val r = Images.moments(Images.rotate90Rgb(w, h, rgb), h, w)
      def central(a: Array[Long]): (Long, Long, Long) =
        (a(1) * a(4) - a(2) * a(2), a(1) * a(5) - a(3) * a(3),
          a(1) * a(6) - a(2) * a(3))
      val (mu20, mu02, mu11) = central(m)
      val (ru20, ru02, ru11) = central(r)
      assert(r(0) == m(0) && r(1) == m(1), "pixel count and mass invariant")
      assert(ru20 == mu02 && ru02 == mu20 && ru11 == -mu11,
        s"transport law broken: ($mu20,$mu02,$mu11) -> ($ru20,$ru02,$ru11)")
    }
  }

  test("uniform image: central moments are intensity * rect moments") {
    // constant luma L: s*sxx - sx^2 = L^2 * (n*Sxx - Sx^2) with S over
    // the bare grid — checked against the closed forms for a rect grid
    val w = 8; val h = 5
    val rgb = Array.fill(w * h * 3)(100.toByte)
    val l = (77 * 100 + 150 * 100 + 29 * 100) >> 8
    val m = Images.moments(rgb, w, h)
    val n = w.toLong * h
    def sumI(k: Int) = (0 until k).map(_.toLong).sum
    def sumII(k: Int) = (0 until k).map(i => i.toLong * i).sum
    val sx = h * sumI(w); val sxx = h * sumII(w)
    assert(m(1) == n * l)
    assert(m(1) * m(4) - m(2) * m(2) == l.toLong * l * (n * sxx - sx * sx))
  }

  test("moments reject a mis-sized buffer loudly") {
    intercept[IllegalArgumentException](Images.moments(new Array[Byte](30), 4, 4))
  }
}
