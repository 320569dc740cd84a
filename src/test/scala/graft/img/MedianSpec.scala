package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Images.median3Rgb vs an independent reference (sort the 9-window via
  * Scala's sorted instead of the kernel's insertion sort) plus closed
  * forms: constant-image identity, single-impulse removal,
  * permutation-invariance of the window, and the idempotence-on-steps
  * property that makes the median the edge-preserving denoiser. */
class MedianSpec extends AnyFunSuite {

  private def reference(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](rgb.length)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val win = for (dy <- -1 to 1; dx <- -1 to 1) yield {
        val sy = math.max(0, math.min(h - 1, y + dy))
        val sx = math.max(0, math.min(w - 1, x + dx))
        rgb((sy * w + sx) * 3 + c) & 0xFF
      }
      out((y * w + x) * 3 + c) = win.sorted.apply(4).toByte
    }
    out
  }

  var state = 0xC0FFEEL
  private def next(): Long = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
  }

  test("matches the sorted-window reference on random images") {
    (0 until 40).foreach { _ =>
      val w = 1 + (next() & 15).toInt
      val h = 1 + (next() & 15).toInt
      val rgb = Array.fill(w * h * 3)(((next() >>> 17) & 0xFF).toByte)
      assert(java.util.Arrays.equals(
        Images.median3Rgb(w, h, rgb), reference(w, h, rgb)), s"w=$w h=$h")
    }
  }

  test("constant image is a fixed point") {
    val rgb = Array.fill(7 * 5 * 3)(77.toByte)
    assert(java.util.Arrays.equals(Images.median3Rgb(7, 5, rgb), rgb))
  }

  test("a single interior impulse vanishes") {
    val w = 9; val h = 9
    val rgb = Array.fill(w * h * 3)(10.toByte)
    rgb((4 * w + 4) * 3 + 1) = 250.toByte // green impulse dead-center
    val out = Images.median3Rgb(w, h, rgb)
    assert(out.forall(_ == 10.toByte))
  }

  test("vertical step edge survives exactly (edge preservation)") {
    val w = 8; val h = 6
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) = (if (x < 4) 20 else 200).toByte
    val out = Images.median3Rgb(w, h, rgb)
    // each 3x3 window contains >=6 pixels of the side the center is on
    // (replicate border), so every pixel keeps its side's value
    assert(java.util.Arrays.equals(out, rgb))
  }

  test("length-mismatch input is returned unchanged (defensive clone)") {
    val bad = Array[Byte](1, 2, 3, 4)
    val out = Images.median3Rgb(3, 3, bad)
    assert(java.util.Arrays.equals(out, bad) && !(out eq bad))
  }
}
