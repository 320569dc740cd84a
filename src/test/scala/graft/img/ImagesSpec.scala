package graft.img

import graft.data.GeoTables
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §F2/§F5: per-row image invariants of the synthesized table. */
class ImagesSpec extends AnyFunSuite {

  test("PNG round-trip exact; JPEG PSNR >= 40 dB (binding invariant)") {
    (0 until 40).foreach { i =>
      val w = Array(16, 32, 64)(i % 3)
      val h = Array(16, 32, 64)((i / 3) % 3)
      val rgb = Images.synthRgb(i.toLong, w, h)
      val png = Images.encode(w, h, rgb, "png")
      val (pw, ph, prgb) = Images.decode(png)
      assert(pw == w && ph == h)
      assert(java.util.Arrays.equals(prgb, rgb), s"png decode not exact for i=$i")
      val jpg = Images.encode(w, h, rgb, "jpg")
      val (_, _, jrgb) = Images.decode(jpg)
      val psnr = Images.psnr(rgb, jrgb)
      assert(psnr >= 40.0, s"jpg psnr $psnr < 40 for i=$i ${w}x$h")
    }
  }

  test("phash: deterministic, robust to re-encode, sensitive to content") {
    val a = Images.synthRgb(1L, 32, 32)
    val png = Images.encode(32, 32, a, "png")
    assert(Images.phash(png) == Images.phash(png))
    val jpg = Images.encode(32, 32, a, "jpg")
    assert(Images.hamming(Images.phash(png), Images.phash(jpg)) <= 10)
    val other = Images.encode(32, 32, Images.synthRgb(999L, 32, 32), "png")
    assert(Images.hamming(Images.phash(png), Images.phash(other)) > 10)
  }

  test("resize produces exact target shape and stable values") {
    val rgb = Images.synthRgb(5L, 64, 64)
    val out = Images.resizeRgb(64, 64, rgb, 16, 16)
    assert(out.length == 16 * 16 * 3)
    assert(java.util.Arrays.equals(out, Images.resizeRgb(64, 64, rgb, 16, 16)))
  }

  test("colorHist64: pixel conservation, solid-color single bin, bin math") {
    // solid mid-gray (128,128,128) → every pixel in bin (2,2,2) = 42
    val solid = Array.fill(10 * 7 * 3)(128.toByte)
    val hs = Images.colorHist64(solid)
    assert(hs(42) == 70L && hs.sum == 70L)
    // pure channel extremes hit the corner bins
    assert(Images.colorHist64(Array(255.toByte, 0.toByte, 0.toByte))(48) == 1L) // r=3 → 3<<4
    assert(Images.colorHist64(Array(0.toByte, 255.toByte, 0.toByte))(12) == 1L) // g=3 → 3<<2
    assert(Images.colorHist64(Array(0.toByte, 0.toByte, 255.toByte))(3) == 1L)
    // synthetic image: conservation + determinism
    val rgb = Images.synthRgb(7L, 32, 32)
    val h1 = Images.colorHist64(rgb)
    assert(h1.sum == 32L * 32L)
    assert(java.util.Arrays.equals(h1, Images.colorHist64(rgb)))
  }

  test("geo table positions re-derive from image index (engine-side assert)") {
    // FIXTURES §F2: lon/lat are materialized for the oracle; the engine must
    // recompute them identically from the id-derived index
    (0L until 500L).foreach { i =>
      val r = GeoTables.imageRow(i)
      assert(r.lon == GeoTables.lonOf(i) && r.lat == GeoTables.latOf(i))
      assert(r.nx == graft.cell.Cells.normX(r.lon) && r.ny == graft.cell.Cells.normY(r.lat))
      assert(r.lon >= -180 && r.lon <= 180 && r.lat >= -85.1 && r.lat <= 85.1)
    }
    // hot-cell skew fixture: ~20% of rows in the 0.1° hot box
    val hot = (0L until 2000L).count { i =>
      val lon = GeoTables.lonOf(i)
      lon >= GeoTables.HOT_LON && lon <= GeoTables.HOT_LON + GeoTables.HOT_SPAN
    }
    assert(hot > 300 && hot < 500, s"hot fraction $hot/2000")
  }
}
