package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Hue-sector pins: the six pure primaries/secondaries land in their
  * documented bins (boundary ties resolved by the r>g>b max priority:
  * yellow → 0, cyan → 2, magenta → 5), achromatic pixels land in the
  * gray bin, interior hues floor to ⌊hue/60°⌋, and counts conserve. */
class HueSpec extends AnyFunSuite {

  private def solid(n: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val out = new Array[Byte](n * 3)
    var i = 0
    while (i < n) {
      out(i * 3) = r.toByte; out(i * 3 + 1) = g.toByte; out(i * 3 + 2) = b.toByte
      i += 1
    }
    out
  }

  private def binOf(r: Int, g: Int, b: Int): Int = {
    val h = Images.hueHist(solid(1, r, g, b))
    h.indexWhere(_ == 1L)
  }

  test("pure primaries and secondaries") {
    assert(binOf(255, 0, 0) == 0)   // red 0°
    assert(binOf(255, 255, 0) == 0) // yellow 60° boundary, r-priority
    assert(binOf(0, 255, 0) == 2)   // green 120° boundary, g ≥ b tie rule
    assert(binOf(0, 255, 255) == 2) // cyan 180° boundary, g-priority
    assert(binOf(0, 0, 255) == 4)   // blue 240° boundary, r ≥ g tie rule
    assert(binOf(255, 0, 255) == 5) // magenta 300° boundary, r-priority
  }

  test("interior hues floor to sector") {
    assert(binOf(255, 128, 0) == 0)  // orange ~30°
    assert(binOf(128, 255, 0) == 1)  // chartreuse ~90°
    assert(binOf(0, 255, 128) == 2)  // spring ~150°
    assert(binOf(0, 128, 255) == 3)  // azure ~210°
    assert(binOf(128, 0, 255) == 4)  // violet ~270°
    assert(binOf(255, 0, 128) == 5)  // rose ~330°
  }

  test("achromatic pixels: gray bin") {
    assert(binOf(0, 0, 0) == 6)
    assert(binOf(255, 255, 255) == 6)
    assert(binOf(128, 128, 128) == 6)
  }

  test("counts conserve on a mixed buffer") {
    val n = 300
    val buf = new Array[Byte](n * 3)
    for (i <- 0 until n) {
      buf(i * 3) = ((i * 7) % 256).toByte
      buf(i * 3 + 1) = ((i * 13) % 256).toByte
      buf(i * 3 + 2) = ((i * 29) % 256).toByte
    }
    assert(Images.hueHist(buf).sum == n.toLong)
  }
}
