package graft.img

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/**
 * FastJpeg vs the ImageIO reference path.
 *
 * Contract under test: for every baseline JPEG the fixture encoder can
 * produce (ImageIO writer, 4:2:0, varying size/quality), the Y-plane tile
 * means agree with the ImageIO RGB→weighted-luma tile means within the
 * chroma-clamp rounding bound (|Δ| ≤ 1.5 gray levels per tile), and the
 * resulting pHash is within a few bits — the same robustness envelope
 * JPEG re-encoding itself moves hashes by. Unsupported streams
 * (progressive) must return null so the ImageIO fallback decides.
 */
class FastJpegSpec extends AnyFunSuite {

  /** ImageIO-reference tile means: decode to RGB, weighted luma, area avg. */
  private def refTiles(bytes: Array[Byte], n: Int): Array[Double] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val g = new Array[Double](n * n)
    for (ty <- 0 until n; tx <- 0 until n) {
      val y0 = ty * h / n; val y1 = math.max(y0 + 1, (ty + 1) * h / n)
      val x0 = tx * w / n; val x1 = math.max(x0 + 1, (tx + 1) * w / n)
      var s = 0.0
      for (y <- y0 until y1; x <- x0 until x1) {
        val p = px(y * w + x)
        s += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
      }
      g(ty * n + tx) = s / ((y1 - y0) * (x1 - x0))
    }
    g
  }

  test("fast path decodes every fixture-shaped JPEG; tiles track ImageIO luma") {
    var checked = 0
    for (i <- 0 until 60; q <- Seq(0.85f, 0.92f, 0.97f)) {
      val w = 16 + (i * 7) % 49
      val h = 16 + (i * 11) % 49
      val rgb = Images.synthRgb(i.toLong * 31 + q.toInt, w, h)
      val jpg = Images.encode(w, h, rgb, "jpg", q)
      val fast = FastJpeg.gray32FromJpeg(jpg, 32)
      assert(fast != null, s"fast path rejected baseline JPEG ${w}x$h q=$q")
      val ref = refTiles(jpg, 32)
      var maxD = 0.0
      for (k <- fast.indices) maxD = math.max(maxD, math.abs(fast(k) - ref(k)))
      assert(maxD <= 1.5, s"tile-mean divergence $maxD > 1.5 at ${w}x$h q=$q")
      checked += 1
    }
    assert(checked == 180)
  }

  test("phash over the Y-plane path stays within the JPEG robustness envelope") {
    for (i <- 0 until 40) {
      val w = 24 + (i * 5) % 41; val h = 24 + (i * 13) % 41
      val rgb = Images.synthRgb(1000L + i, w, h)
      val png = Images.encode(w, h, rgb, "png")
      val jpg = Images.encode(w, h, rgb, "jpg", 0.95f)
      // the cross-format envelope ImagesSpec already pins, now via FastJpeg
      assert(Images.hamming(Images.phash(png), Images.phash(jpg)) <= 10)
      // determinism
      assert(Images.phash(jpg) == Images.phash(jpg))
    }
  }

  test("grayscale (1-component) JPEG decodes on the fast path") {
    val w = 40; val h = 28
    val rgb = Images.grayRgb(Images.synthRgb(7L, w, h))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, rgb((y * w + x) * 3) & 0xFF)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    val jpg = out.toByteArray
    val fast = FastJpeg.gray32FromJpeg(jpg, 32)
    assert(fast != null, "1-component JPEG must take the fast path")
    // reference = RAW raster samples (getRaster.getSample), NOT getRGB:
    // Java treats TYPE_BYTE_GRAY as LINEAR gray and getRGB gamma-lifts it
    // into sRGB (stored Y 14 → RGB 66). pHash wants the stored sample.
    val dimg = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val ref = new Array[Double](32 * 32)
    for (ty <- 0 until 32; tx <- 0 until 32) {
      val y0 = ty * h / 32; val y1 = math.max(y0 + 1, (ty + 1) * h / 32)
      val x0 = tx * w / 32; val x1 = math.max(x0 + 1, (tx + 1) * w / 32)
      var s = 0.0
      for (y <- y0 until y1; x <- x0 until x1) s += dimg.getRaster.getSample(x, y, 0)
      ref(ty * 32 + tx) = s / ((y1 - y0) * (x1 - x0))
    }
    var maxD = 0.0
    for (k <- fast.indices) maxD = math.max(maxD, math.abs(fast(k) - ref(k)))
    assert(maxD <= 1.0, s"grayscale divergence $maxD")
  }

  test("progressive JPEG returns null and the grayTiles fallback still hashes") {
    val w = 48; val h = 32
    val rgb = Images.synthRgb(99L, w, h)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xFF) << 16) | ((rgb(p + 1) & 0xFF) << 8) | (rgb(p + 2) & 0xFF))
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val jpg = out.toByteArray
    assert(FastJpeg.gray32FromJpeg(jpg, 32) == null, "progressive must fall back")
    // the public hash surface still works via ImageIO
    val pngHash = Images.phash(Images.encode(w, h, rgb, "png"))
    assert(Images.hamming(Images.phash(jpg), pngHash) <= 10)
  }

  test("extreme dimensions stay on the fast path and track the reference") {
    // bound is looser than the fixture-shaped test: Y == 0.299R+0.587G+0.114B
    // exactly only while reconstructed RGB stays in gamut; where a channel
    // clips at 0/255 the identity breaks by a few levels per pixel, and a
    // 1–2-pixel tile (w or h ≤ 3) has no averaging to damp it. Hash-grade
    // agreement, not pixel-grade, is the contract here.
    for ((w, h) <- Seq((1, 1), (1, 40), (40, 1), (7, 7), (8, 8), (9, 17), (128, 3), (3, 128))) {
      val rgb = Images.synthRgb(w * 1000L + h, w, h)
      val jpg = Images.encode(w, h, rgb, "jpg", 0.9f)
      val fast = FastJpeg.gray32FromJpeg(jpg, 32)
      assert(fast != null, s"rejected ${w}x$h")
      val ref = refTiles(jpg, 32)
      var maxD = 0.0
      for (k <- fast.indices) maxD = math.max(maxD, math.abs(fast(k) - ref(k)))
      val bound = if (math.min(w, h) <= 3) 4.0 else 1.5
      assert(maxD <= bound, s"divergence $maxD at ${w}x$h")
    }
  }

  test("adversarial fuzz: random bit flips and truncations never throw") {
    val rnd = new scala.util.Random(20260817L)
    var nullCount = 0
    for (trial <- 0 until 2000) {
      val w = 8 + rnd.nextInt(56); val h = 8 + rnd.nextInt(56)
      val rgb = Images.synthRgb(trial.toLong, w, h)
      val jpg = Images.encode(w, h, rgb, "jpg", 0.85f + rnd.nextFloat() * 0.14f)
      val mutated = jpg.clone()
      if (rnd.nextBoolean()) { // single bit flip anywhere
        val p = rnd.nextInt(mutated.length)
        mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
      } else { // byte-range scramble
        val p = rnd.nextInt(mutated.length)
        val n = math.min(1 + rnd.nextInt(32), mutated.length - p)
        for (k <- p until p + n) mutated(k) = rnd.nextInt(256).toByte
      }
      val cut = if (rnd.nextInt(3) == 2) 1 + rnd.nextInt(mutated.length) else mutated.length
      val input = java.util.Arrays.copyOf(mutated, cut)
      // the ONLY acceptable outcomes: a 1024-tile array or null — a bad
      // stream must never escape as an exception or an OOB access
      val r = try FastJpeg.gray32FromJpeg(input, 32) catch {
        case e: Throwable =>
          fail(s"trial $trial (${w}x$h cut=$cut/${mutated.length}) threw ${e.getClass.getName}: ${e.getMessage}")
      }
      if (r == null) nullCount += 1 else assert(r.length == 1024)
    }
    // sanity: the fuzz actually produced rejects (and some survivors whose
    // mutation hit a comment/metadata byte)
    assert(nullCount > 200, s"fuzz too weak: only $nullCount rejects")
  }
  test("header segments truncated AT the array end return null (review r5)") {
    // each is a stream whose declared segment length passes the coarse
    // p+2+len bound but whose field reads would run off the array
    val cases = Seq(
      Array(0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x03, 0x00),       // DHT: counts truncated
      Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x02),             // SOF0: fields truncated
      Array(0xFF, 0xD8, 0xFF, 0xDD, 0x00, 0x02),             // DRI: interval truncated
      Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08, 0x01, // SOF 1 comp
            0x01, 0x11, 0x00, 0xFF, 0xDA, 0x00, 0x02)        // SOS: selectors truncated
    ).map(_.map(_.toByte))
    cases.zipWithIndex.foreach { case (bs, k) =>
      val r = try FastJpeg.gray32FromJpeg(bs, 32) catch {
        case e: Throwable => fail(s"case $k threw ${e.getClass.getSimpleName}")
      }
      assert(r == null, s"case $k must reject")
    }
  }

  test("missing DQT rejects — tables never leak across decodes on a thread (review r5)") {
    val rgb = Images.synthRgb(3L, 32, 32)
    val jpg = Images.encode(32, 32, rgb, "jpg", 0.9f)
    // decode once so this thread's scratch holds valid tables
    assert(FastJpeg.gray32FromJpeg(jpg, 32) != null)
    // retag every DQT marker as APP11 (skipped): quant tables now undefined
    val noDqt = jpg.clone()
    var p = 2
    while (p + 4 <= noDqt.length && (noDqt(p + 1) & 0xFF) != 0xDA) {
      val m = noDqt(p + 1) & 0xFF
      val len = ((noDqt(p + 2) & 0xFF) << 8) | (noDqt(p + 3) & 0xFF)
      if (m == 0xDB) noDqt(p + 1) = 0xEB.toByte
      p += 2 + len
    }
    // must REJECT (fall back), not silently decode with the previous
    // image's tables still sitting in the thread-local scratch
    assert(FastJpeg.gray32FromJpeg(noDqt, 32) == null, "missing DQT must reject")
  }

  test("truncated / corrupt streams return null, never throw") {
    val rgb = Images.synthRgb(5L, 32, 32)
    val jpg = Images.encode(32, 32, rgb, "jpg", 0.9f)
    for (cut <- Seq(2, 10, 50, jpg.length / 2, jpg.length - 3)) {
      val t = java.util.Arrays.copyOf(jpg, cut)
      // must not throw; null (reject) is the only acceptable failure mode
      val r = FastJpeg.gray32FromJpeg(t, 32)
      assert(r == null || r.length == 1024)
    }
    val garbled = jpg.clone()
    for (k <- 100 until math.min(140, garbled.length)) garbled(k) = 0x55
    val r2 = try FastJpeg.gray32FromJpeg(garbled, 32) catch {
      case e: Throwable => fail(s"corrupt stream threw ${e.getClass.getSimpleName}")
    }
    assert(r2 == null || r2.length == 1024)
  }
}
