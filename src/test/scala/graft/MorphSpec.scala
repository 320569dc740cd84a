package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.K

/** Mask morphology: separable kernel vs an O(n²r²) brute-force reference,
  * plus rectangle closed forms (the q183 oracle's shape). */
class MorphSpec extends AnyFunSuite {

  private def get(m: Array[Byte], bit: Int): Boolean = (m(bit >> 3) & (1 << (bit & 7))) != 0
  private def set(m: Array[Byte], bit: Int): Unit =
    m(bit >> 3) = (m(bit >> 3) | (1 << (bit & 7))).toByte

  /** Brute-force Chebyshev morphology with zero padding. */
  private def brute(mask: Array[Byte], size: Int, r: Int, erode: Boolean): Array[Byte] = {
    val out = new Array[Byte](mask.length)
    for (j <- 0 until size; i <- 0 until size) {
      var acc = erode
      for (dj <- -r to r; di <- -r to r) {
        val y = j + dj; val x = i + di
        val in = y >= 0 && y < size && x >= 0 && x < size && get(mask, y * size + x)
        acc = if (erode) acc && in else acc || in
      }
      if (acc) set(out, j * size + i)
    }
    out
  }

  private def randMask(size: Int, seed: Long, density: Int): Array[Byte] = {
    val m = new Array[Byte]((size * size + 7) / 8)
    var h = seed
    for (b <- 0 until size * size) {
      h = graft.img.Images.splitmix64(h)
      if ((h & 0xFF) < density) set(m, b)
    }
    m
  }

  test("separable dilate/erode equal brute force on random masks (sizes 8/16/33, r 0..3)") {
    for (size <- Seq(8, 16, 33); r <- 0 to 3; seed <- 1L to 4L) {
      val m = randMask(size, seed * 7919 + size * 131 + r, 40)
      assert(K.maskDilate(m, size, r).toSeq == brute(m, size, r, erode = false).toSeq,
        s"dilate size=$size r=$r seed=$seed")
      assert(K.maskErode(m, size, r).toSeq == brute(m, size, r, erode = true).toSeq,
        s"erode size=$size r=$r seed=$seed")
    }
  }

  test("rectangle closed forms: clipped-run products; open/close recover interior rects") {
    val size = 16
    val m = new Array[Byte]((size * size + 7) / 8)
    val (x0, x1, y0, y1) = (3, 9, 5, 12)
    for (j <- y0 to y1; i <- x0 to x1) set(m, j * size + i)
    val r = 2
    val dil = K.maskDilate(m, size, r)
    val ero = K.maskErode(m, size, r)
    assert(K.maskPopcount(dil) ==
      (math.min(15, x1 + r) - math.max(0, x0 - r) + 1) *
      (math.min(15, y1 + r) - math.max(0, y0 - r) + 1))
    assert(K.maskPopcount(ero) == (x1 - x0 + 1 - 2 * r) * (y1 - y0 + 1 - 2 * r))
    // interior rect (≥r from every border): erode∘dilate is the identity
    assert(K.maskErode(dil, size, r).toSeq == m.toSeq)
    assert(K.maskDilate(ero, size, r).toSeq == m.toSeq)
  }

  test("mask set algebra: bit-exact vs per-bit brute; inclusion-exclusion holds") {
    val size = 16
    for (seed <- 1L to 5L) {
      val a = randMask(size, seed, 70)
      val b = randMask(size, seed + 100, 70)
      val and = K.maskAnd(a, b); val or = K.maskOr(a, b); val xor = K.maskXor(a, b)
      for (bit <- 0 until size * size) {
        assert(get(and, bit) == (get(a, bit) && get(b, bit)))
        assert(get(or, bit) == (get(a, bit) || get(b, bit)))
        assert(get(xor, bit) == (get(a, bit) ^ get(b, bit)))
      }
      assert(K.maskPopcount(or) == K.maskPopcount(and) + K.maskPopcount(xor))
      assert(K.maskPopcount(and) + K.maskPopcount(or) ==
        K.maskPopcount(a) + K.maskPopcount(b))
    }
    intercept[IllegalArgumentException](K.maskAnd(new Array[Byte](32), new Array[Byte](8)))
  }

  test("edge cases: r=0 identity, empty mask fixed point, full dilation saturates") {
    val size = 16
    val m = randMask(size, 42L, 60)
    assert(K.maskDilate(m, size, 0).toSeq == m.toSeq)
    assert(K.maskErode(m, size, 0).toSeq == m.toSeq)
    val empty = new Array[Byte]((size * size + 7) / 8)
    assert(K.maskDilate(empty, size, 3).toSeq == empty.toSeq)
    assert(K.maskErode(empty, size, 3).toSeq == empty.toSeq)
    // one center pixel dilated by 15 floods the 16×16 tile
    val one = new Array[Byte](32); set(one, 8 * 16 + 8)
    assert(K.maskPopcount(K.maskDilate(one, 16, 15)) == 256)
    // any finite mask erodes to nothing once r reaches the tile size
    assert(K.maskPopcount(K.maskErode(m, size, size)) == 0)
    intercept[IllegalArgumentException](K.maskDilate(m, 15, 1))
  }
}
