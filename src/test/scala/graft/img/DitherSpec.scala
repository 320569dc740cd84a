package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Images.ditherFsRgb vs an independent reference (row-carry buffers
  * instead of the kernel's full-image accumulator — same definition,
  * different machinery) plus closed forms: binary output alphabet,
  * extreme-constant fixed points, approximate mean preservation, and
  * exact L1 distortion bookkeeping through Images.sad. */
class DitherSpec extends AnyFunSuite {

  /** Reference: classic two-row error buffers. Shares must replicate the
    * kernel's conserving split exactly (trunc-toward-zero thirds + the
    * right-neighbor residue) — that split IS the pinned semantics. */
  private def reference(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](rgb.length)
    for (c <- 0 until 3) {
      var cur = new Array[Int](w)
      var nxt = new Array[Int](w)
      for (y <- 0 until h) {
        java.util.Arrays.fill(nxt, 0)
        for (x <- 0 until w) {
          val v = (rgb((y * w + x) * 3 + c) & 0xFF) + cur(x)
          val o = if (v < 128) 0 else 255
          out((y * w + x) * 3 + c) = o.toByte
          val e = v - o
          val e3 = e * 3 / 16; val e5 = e * 5 / 16; val e1 = e / 16
          val e7 = e - e3 - e5 - e1
          if (x + 1 < w) cur(x + 1) += e7
          if (y + 1 < h) {
            if (x > 0) nxt(x - 1) += e3
            nxt(x) += e5
            if (x + 1 < w) nxt(x + 1) += e1
          }
        }
        val t = cur; cur = nxt; nxt = t
      }
    }
    out
  }

  var state = 0xD17BE5L
  private def next(): Long = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
  }

  test("matches the row-buffer reference on random images") {
    (0 until 40).foreach { _ =>
      val w = 1 + (next() & 31).toInt
      val h = 1 + (next() & 31).toInt
      val rgb = Array.fill(w * h * 3)(((next() >>> 17) & 0xFF).toByte)
      assert(java.util.Arrays.equals(
        Images.ditherFsRgb(w, h, rgb), reference(w, h, rgb)), s"w=$w h=$h")
    }
  }

  test("output alphabet is exactly {0, 255}") {
    val w = 17; val h = 13
    val rgb = Array.fill(w * h * 3)(((next() >>> 17) & 0xFF).toByte)
    assert(Images.ditherFsRgb(w, h, rgb).forall(b => b == 0.toByte || b == -1.toByte))
  }

  test("extreme constants are fixed points (zero error everywhere)") {
    val z = Array.fill(5 * 4 * 3)(0.toByte)
    assert(java.util.Arrays.equals(Images.ditherFsRgb(5, 4, z), z))
    val f = Array.fill(5 * 4 * 3)(255.toByte)
    assert(java.util.Arrays.equals(Images.ditherFsRgb(5, 4, f), f))
  }

  test("mean is approximately preserved on a mid-gray field") {
    val w = 64; val h = 64
    val rgb = Array.fill(w * h * 3)(100.toByte)
    val out = Images.ditherFsRgb(w, h, rgb)
    val mean = out.map(_ & 0xFF).map(_.toLong).sum.toDouble / out.length
    // error diffusion tracks the input mean to within a few levels
    // (boundary pixels drop out-of-image shares)
    assert(math.abs(mean - 100.0) < 8.0, s"mean=$mean")
  }

  test("sad: exact L1, zero on identity, symmetric, -1 on length mismatch") {
    val a = Array[Byte](0, 10, -1)           // -1 = 255 unsigned
    val b = Array[Byte](5, 0, 0)
    assert(Images.sad(a, a) == 0L)
    assert(Images.sad(a, b) == 5L + 10L + 255L)
    assert(Images.sad(a, b) == Images.sad(b, a))
    assert(Images.sad(a, Array[Byte](1, 2)) == -1L)
  }
}
