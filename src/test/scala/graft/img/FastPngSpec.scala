package graft.img

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** FastPng must be bit-identical to ImageIO on its subset and must punt
  * (null) — never mis-decode — on everything else. */
class FastPngSpec extends AnyFunSuite {

  private def imageIoRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      rgb(3 * i) = ((px(i) >> 16) & 0xFF).toByte
      rgb(3 * i + 1) = ((px(i) >> 8) & 0xFF).toByte
      rgb(3 * i + 2) = (px(i) & 0xFF).toByte
      i += 1
    }
    (w, h, rgb)
  }

  test("bit-exact vs ImageIO: synthetic gradients, all fixture sizes") {
    for (i <- 0 until 30; (w, h) <- Seq((16, 16), (32, 64), (64, 64), (1, 1), (1, 9), (9, 1), (33, 17), (70, 3))) {
      val rgb = Images.synthRgb(i.toLong * 31 + w, w, h)
      val png = Images.encode(w, h, rgb, "png")
      val fast = FastPng.decodeRgb(png)
      assert(fast != null, s"fast path rejected fixture png ${w}x$h")
      val (iw, ih, iorgb) = imageIoRgb(png)
      assert(iw == w && ih == h)
      assert(java.util.Arrays.equals(fast, iorgb), s"mismatch vs ImageIO at i=$i ${w}x$h")
    }
  }

  test("bit-exact vs ImageIO: random content (exercises all row filters)") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 40) {
      val w = 1 + rnd.nextInt(80); val h = 1 + rnd.nextInt(80)
      val rgb = new Array[Byte](w * h * 3)
      // mix of pure noise, flat runs, and vertical bands — steers the
      // encoder's adaptive per-row filter choice across None/Sub/Up/Avg/Paeth
      trial % 3 match {
        case 0 => rnd.nextBytes(rgb)
        case 1 => java.util.Arrays.fill(rgb, (trial * 7).toByte)
        case 2 =>
          var i = 0
          while (i < rgb.length) { rgb(i) = ((i / 3 % w) * 255 / math.max(1, w - 1)).toByte; i += 1 }
      }
      val png = Images.encode(w, h, rgb, "png")
      val fast = FastPng.decodeRgb(png)
      assert(fast != null)
      assert(java.util.Arrays.equals(fast, imageIoRgb(png)._3), s"mismatch trial=$trial ${w}x$h")
    }
  }

  test("multi-IDAT stream decodes identically") {
    val rgb = Images.synthRgb(77L, 64, 64)
    val png = Images.encode(64, 64, rgb, "png")
    // split the (single) IDAT chunk into two valid chunks
    def i32(b: Array[Byte], p: Int): Int =
      ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) | ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
    var p = 8
    var idatAt = -1
    while (idatAt < 0 && p + 8 < png.length) {
      if (png(p + 4) == 'I' && png(p + 5) == 'D' && png(p + 6) == 'A' && png(p + 7) == 'T') idatAt = p
      else p += 12 + i32(png, p)
    }
    assert(idatAt > 0)
    val len = i32(png, idatAt)
    assert(len > 8, "fixture IDAT too small to split")
    val half = len / 2
    val out = new ByteArrayOutputStream()
    out.write(png, 0, idatAt)
    def writeChunk(data: Array[Byte], off: Int, n: Int): Unit = {
      val hdr = Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte, 'I', 'D', 'A', 'T')
      out.write(hdr)
      out.write(data, off, n)
      val crc = new java.util.zip.CRC32()
      crc.update(hdr, 4, 4); crc.update(data, off, n)
      val c = crc.getValue.toInt
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    }
    writeChunk(png, idatAt + 8, half)
    writeChunk(png, idatAt + 8 + half, len - half)
    out.write(png, idatAt + 12 + len, png.length - (idatAt + 12 + len)) // IEND etc.
    val split = out.toByteArray
    val fast = FastPng.decodeRgb(split)
    assert(fast != null, "multi-IDAT rejected")
    assert(java.util.Arrays.equals(fast, rgb))
  }

  test("fused gray tiles == unfused decode→gray32 (both hash widths, r5)") {
    for (i <- 0 until 20; (w, h) <- Seq((16, 16), (32, 64), (64, 64), (1, 1), (33, 17), (70, 3), (64, 48))) {
      val rgb = Images.synthRgb(i.toLong * 97 + h, w, h)
      val png = Images.encode(w, h, rgb, "png")
      // phash(bytes) rides gray32FromPng; phashOfRgb rides the RGB plane —
      // the accumulation order is identical by construction, so the HASH
      // (not just the tiles) must be bit-equal
      assert(Images.phash(png) == Images.phashOfRgb(w, h, rgb), s"64-bit fused mismatch i=$i ${w}x$h")
      assert(java.util.Arrays.equals(Images.phash256(png), Images.phash256OfRgb(w, h, rgb)),
        s"256-bit fused mismatch i=$i ${w}x$h")
    }
    // JPEG bytes hash via the FastJpeg Y plane (r5), while phashOfRgb over
    // the ImageIO decode rides RGB-weighted luma — same Y modulo chroma
    // clamp rounding, so the hashes agree within a few bits but are NOT
    // bit-equal by contract (FastJpegSpec pins the tile-mean bound)
    val jpg = Images.encode(32, 32, Images.synthRgb(5L, 32, 32), "jpg")
    val (jw, jh, jrgb) = Images.decode(jpg)
    assert(Images.hamming(Images.phash(jpg), Images.phashOfRgb(jw, jh, jrgb)) <= 6)
  }

  test("non-subset inputs punt to null (ARGB png, jpeg, garbage)") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(2, 2, 0x80FF00FF)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    assert(FastPng.decodeRgb(out.toByteArray) == null, "color type 6 must fall back")
    val jpg = Images.encode(16, 16, Images.synthRgb(3L, 16, 16), "jpg")
    assert(FastPng.decodeRgb(jpg) == null)
    assert(FastPng.decodeRgb(Array.fill[Byte](64)(0x7F)) == null)
    val truncated = Images.encode(16, 16, Images.synthRgb(4L, 16, 16), "png").take(40)
    assert(FastPng.decodeRgb(truncated) == null)
    // Images.decode must still decode the ARGB png via the ImageIO fallback
    val (w, h, rgb) = Images.decode(out.toByteArray)
    assert(w == 8 && h == 8 && rgb.length == 192)
    assert((rgb(3 * (2 * 8 + 2)) & 0xFF) == 0xFF && (rgb(3 * (2 * 8 + 2) + 1) & 0xFF) == 0x00)
  }
}
