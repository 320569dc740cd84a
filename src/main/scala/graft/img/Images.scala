package graft.img

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/**
 * Image kernels (SURVEY.md §2.6 #49): decode / PSNR / perceptual hash,
 * all on JDK-built-in `javax.imageio` (PNG/JPEG/BMP/GIF — verified
 * offline-available), plus the deterministic synthetic image generator
 * used by FIXTURES.md §F2.
 *
 * The binding per-row invariant (BASELINE.json input_hint): decoded-pixel
 * allclose vs an independent decode — PSNR ≥ 40 dB for lossy (JPEG),
 * exact for PNG — and `img_phash(bytes) == phash` column consistency.
 */
object Images {

  // ImageIO's default stream cache writes temp FILES under a lock — with 32
  // decode threads that serializes the whole executor (measured: 8→32 core
  // scaling efficiency 0.31 before, ~linear after). Keep everything in memory.
  ImageIO.setUseCache(false)

  // Reader-instance reuse: ImageIO.read scans the provider registry and
  // builds a fresh reader per call; under 32 decode threads that path
  // serializes. Keep one PNG and one JPEG reader per thread, dispatched on
  // the magic bytes.
  private val pngReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("png").next())
  private val jpgReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("jpeg").next())

  /** Decode via per-thread cached reader (magic-byte dispatch). */
  def decodeImage(bytes: Array[Byte]): BufferedImage = {
    val isPng = bytes.length > 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'
    val isJpg = bytes.length > 3 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
    if (isPng || isJpg) {
      val reader = if (isPng) pngReaderTL.get() else jpgReaderTL.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } finally {
        reader.setInput(null)
        iis.close()
      }
    } else {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) throw new IllegalArgumentException("undecodable image bytes")
      img
    }
  }

  /** Decode to packed RGB bytes (3 bytes/pixel, row-major). Returns (w, h, rgb).
    * 8-bit RGB non-interlaced PNG takes the allocation-lean [[FastPng]] path
    * (bit-identical — PNG is lossless, FastPngSpec pins ImageIO equality);
    * everything else decodes through ImageIO. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (bytes.length > 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P') {
      val d = FastPng.dims(bytes)
      if (d != null) {
        val fast = FastPng.decodeRgb(bytes)
        if (fast != null) return (d(0), d(1), fast)
      }
    }
    val img = decodeImage(bytes)
    if (img == null) throw new IllegalArgumentException("undecodable image bytes")
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk: one color-model pass
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      rgb(3 * i) = ((p >> 16) & 0xFF).toByte
      rgb(3 * i + 1) = ((p >> 8) & 0xFF).toByte
      rgb(3 * i + 2) = (p & 0xFF).toByte
      i += 1
    }
    (w, h, rgb)
  }

  /** PSNR in dB between two same-shape RGB buffers; 99.0 if identical. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"shape mismatch ${a.length} vs ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) 99.0
    else {
      val mse = se / a.length
      10.0 * math.log10(255.0 * 255.0 / mse)
    }
  }

  // ---------------- perceptual hash (32x32 DCT pHash) ----------------

  private val PHASH_N = 32
  private lazy val dctTable: Array[Double] = {
    val t = new Array[Double](PHASH_N * PHASH_N)
    var k = 0
    while (k < PHASH_N) {
      var n = 0
      while (n < PHASH_N) {
        t(k * PHASH_N + n) = math.cos(math.Pi / PHASH_N * (n + 0.5) * k)
        n += 1
      }
      k += 1
    }
    t
  }

  /** 64-bit DCT pHash of encoded image bytes. */
  def phash(bytes: Array[Byte]): Long = phashOfGray(grayTiles(bytes))

  /** The 32×32 gray-tile front end shared by both hash widths. Fast-path
    * PNGs skip the packed-RGB plane entirely ([[FastPng.gray32FromPng]]
    * reads tile means straight off the unfiltered rows — bit-identical
    * accumulation order, pinned by FastPngSpec); baseline JPEGs read tile
    * means straight off the decoded Y plane ([[FastJpeg.gray32FromJpeg]]
    * — gray := luma channel, which ImageIO's YCbCr→RGB→weighted-luma
    * round-trip re-derives modulo chroma-clamp rounding, |Δ| ≤ ~1 gray
    * level; FastJpegSpec pins the agreement and every fixture
    * materializes hashes with this same code). Everything else decodes
    * through ImageIO and area-averages. */
  private def grayTiles(bytes: Array[Byte]): Array[Double] = {
    if (bytes.length > 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P') {
      val g = FastPng.gray32FromPng(bytes, PHASH_N)
      if (g != null) return g
    } else if (FastJpeg.looksJpeg(bytes)) {
      val g = FastJpeg.gray32FromJpeg(bytes, PHASH_N)
      if (g != null) return g
    }
    val (w, h, rgb) = decode(bytes)
    gray32(w, h, rgb)
  }

  /** Area-average resize to 32×32 grayscale. */
  private def gray32(w: Int, h: Int, rgb: Array[Byte]): Array[Double] = {
    val g = new Array[Double](PHASH_N * PHASH_N)
    var ty = 0
    while (ty < PHASH_N) {
      val y0 = ty * h / PHASH_N; val y1 = math.max(y0 + 1, (ty + 1) * h / PHASH_N)
      var tx = 0
      while (tx < PHASH_N) {
        val x0 = tx * w / PHASH_N; val x1 = math.max(x0 + 1, (tx + 1) * w / PHASH_N)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * 3
            s += 0.299 * (rgb(i) & 0xFF) + 0.587 * (rgb(i + 1) & 0xFF) + 0.114 * (rgb(i + 2) & 0xFF)
            x += 1
          }
          y += 1
        }
        g(ty * PHASH_N + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    g
  }

  /** Top-left K×K block of the 2D DCT-II of the 32×32 gray image.
    * Separable two-pass form — k·N² + k²·N multiply-adds instead of the
    * naive k²·N² (6× fewer for k=8, 10× for k=16; the naive form was 45%
    * of the whole decode+hash budget). The summation order differs from
    * the naive double loop by O(1e-13) relative — hash bits only move on
    * exact coefficient-vs-median ties, which the AC median (average of
    * two order statistics of irrational-weighted sums) doesn't produce
    * on real images; the fixture corpus is regenerated with the hash
    * implementation in lockstep either way. */
  private def dctBlock(g: Array[Double], k: Int): Array[Double] = {
    // pass 1: rows[u][x] = Σ_y c(u,y) · g(y,x)
    val rows = new Array[Double](k * PHASH_N)
    var u = 0
    while (u < k) {
      var x = 0
      while (x < PHASH_N) {
        var s = 0.0
        var y = 0
        while (y < PHASH_N) {
          s += dctTable(u * PHASH_N + y) * g(y * PHASH_N + x)
          y += 1
        }
        rows(u * PHASH_N + x) = s
        x += 1
      }
      u += 1
    }
    // pass 2: coef[u][v] = Σ_x rows[u][x] · c(v,x)
    val coef = new Array[Double](k * k)
    u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        var s = 0.0
        var x = 0
        while (x < PHASH_N) {
          s += rows(u * PHASH_N + x) * dctTable(v * PHASH_N + x)
          x += 1
        }
        coef(u * k + v) = s
        v += 1
      }
      u += 1
    }
    coef
  }

  def phashOfRgb(w: Int, h: Int, rgb: Array[Byte]): Long =
    phashOfGray(gray32(w, h, rgb))

  private def phashOfGray(g: Array[Double]): Long = {
    val coef = dctBlock(g, 8)
    // median of AC coefficients (exclude DC)
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val median = (ac(31) + ac(32)) / 2
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (coef(i) > median) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** 256-bit DCT pHash (16×16 low block, AC-median threshold) — the
    * wide-fingerprint scale path for frame/image near-dup: at a matched
    * detection level, random pairs concentrate near 128 bits apart
    * (vs ~32 of 64-bit), so pigeonhole chunks prune far more candidates.
    * Word i holds coefficient bits [64·i, 64·i+64) in row-major order. */
  def phash256OfRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Long] =
    phash256OfGray(gray32(w, h, rgb))

  private def phash256OfGray(g: Array[Double]): Array[Long] = {
    val coef = dctBlock(g, 16)
    val ac = java.util.Arrays.copyOfRange(coef, 1, 256)
    java.util.Arrays.sort(ac)
    val median = (ac(126) + ac(127)) / 2 // 255 AC coefficients
    val words = new Array[Long](4)
    var i = 0
    while (i < 256) {
      if (coef(i) > median) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  def phash256(bytes: Array[Byte]): Array[Long] = phash256OfGray(grayTiles(bytes))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---------------- deterministic synthetic images (FIXTURES §F2) ----------------

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /**
   * Deterministic gradient+noise RGB pixels for image index i.
   * Noise amplitude is kept small (±3) and clamped (not wrapped) so the
   * JPEG round-trip satisfies the binding PSNR ≥ 40 dB invariant
   * (wrap-around 255→0 jumps and strong noise would put q0.92 JPEG at
   * ~18 dB — measured during verification).
   */
  def synthRgb(i: Long, w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var state = splitmix64(42L ^ i)
    val phase = (i % 251).toInt
    @inline def clamp(v: Int): Byte = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        state ^= state << 13; state ^= state >>> 7; state ^= state << 17
        val noise = (state & 0x7).toInt - 4 // -4..3
        val p = (y * w + x) * 3
        val gx = 16 + x * 223 / math.max(1, w - 1)
        val gy = 16 + y * 223 / math.max(1, h - 1)
        val gd = 16 + ((x + y) * 223 / math.max(1, w + h - 2)) + phase % 32
        rgb(p) = clamp(gx + noise)
        rgb(p + 1) = clamp(gy + noise)
        rgb(p + 2) = clamp(gd + noise)
        x += 1
      }
      y += 1
    }
    rgb
  }

  def encode(w: Int, h: Int, rgb: Array[Byte], fmt: String): Array[Byte] =
    encode(w, h, rgb, fmt, 0.97f)

  def encode(w: Int, h: Int, rgb: Array[Byte], fmt: String, quality: Float): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((rgb(3 * i) & 0xFF) << 16) | ((rgb(3 * i + 1) & 0xFF) << 8) | (rgb(3 * i + 2) & 0xFF)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new ByteArrayOutputStream()
    fmt match {
      case "png" => ImageIO.write(img, "png", out)
      case "jpg" | "jpeg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(quality)
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
        writer.dispose(); ios.close()
      case other => throw new IllegalArgumentException(s"unsupported fmt $other")
    }
    out.toByteArray
  }

  /** Resize RGB to (tw, th) by area averaging — the feature-extract kernel. */
  // ---------------- compositional RGB ops (r3 training-pipeline surface) ----------------

  /** Rec.601 integer luma, weights summing to 256 so gray∘gray = gray and
    * luma(gray(x)) = luma(x) EXACTLY (the q56 invariants). */
  @inline private def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  /** Grayscale: per-pixel luma replicated to all three channels. */
  def grayRgb(rgb: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](rgb.length)
    var i = 0
    while (i + 2 < rgb.length) {
      val l = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF).toByte
      out(i) = l; out(i + 1) = l; out(i + 2) = l
      i += 3
    }
    out
  }

  /** Horizontal (mirror) or vertical flip. An involution: flip∘flip = id. */
  def flipRgb(w: Int, h: Int, rgb: Array[Byte], horizontal: Boolean): Array[Byte] = {
    val out = new Array[Byte](rgb.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = if (horizontal) w - 1 - x else x
        val sy = if (horizontal) y else h - 1 - y
        val si = (sy * w + sx) * 3
        val di = (y * w + x) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Clockwise 90° rotation of a row-major RGB buffer: output is h-wide,
    * w-tall (dims swap); dst(x', y') = src(y', h − 1 − x') — a pure pixel
    * permutation (every histogram conserved), with rot90⁴ = identity and
    * rot90² = rot180 = hflip∘vflip (pinned in AugmentSpec + q228). */
  def rotate90Rgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"bad rgb buffer ${rgb.length} for ${w}x$h")
    val out = new Array[Byte](rgb.length)
    val ow = h // output width
    var yn = 0
    while (yn < w) { // output height = w
      var xn = 0
      while (xn < ow) {
        val si = ((h - 1 - xn) * w + yn) * 3
        val di = (yn * ow + xn) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        xn += 1
      }
      yn += 1
    }
    out
  }

  /** Axis-aligned crop, clamped to the image bounds. */
  def cropRgb(w: Int, h: Int, rgb: Array[Byte],
              x0: Int, y0: Int, cw: Int, ch: Int): Array[Byte] = {
    val cx = math.max(0, math.min(x0, w))
    val cy = math.max(0, math.min(y0, h))
    val ow = math.max(0, math.min(cw, w - cx))
    val oh = math.max(0, math.min(ch, h - cy))
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      System.arraycopy(rgb, ((cy + y) * w + cx) * 3, out, y * ow * 3, ow * 3)
      y += 1
    }
    out
  }

  /** Raw luma moment sums [n, s, sx, sy, sxx, syy, sxy] over a decoded
    * RGB buffer (x = column, y = row, integer Rec.601 luma) — the exact
    * integer inputs of image central moments / orientation (Hu 1962,
    * public). Long-safe while n·255·max(w,h)² ≤ 9.2e18, i.e. any image
    * up to ~4096² px at full luma. */
  def moments(rgb: Array[Byte], w: Int, h: Int): Array[Long] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w*$h*3")
    var s = 0L; var sx = 0L; var sy = 0L
    var sxx = 0L; var syy = 0L; var sxy = 0L
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF).toLong
        s += l; sx += x * l; sy += y * l
        sxx += x.toLong * x * l; syy += y.toLong * y * l; sxy += x.toLong * y * l
        x += 1; i += 3
      }
      y += 1
    }
    Array(w.toLong * h, s, sx, sy, sxx, syy, sxy)
  }

  /** Mean integer luma over all pixels (quality-filter feature). */
  def lumaMean(rgb: Array[Byte]): Double = {
    val n = rgb.length / 3
    if (n == 0) return 0.0
    var s = 0L
    var i = 0
    while (i + 2 < rgb.length) {
      s += luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
      i += 3
    }
    s.toDouble / n
  }

  def resizeRgb(w: Int, h: Int, rgb: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var r = 0.0; var g = 0.0; var b = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * 3
            r += rgb(i) & 0xFF; g += rgb(i + 1) & 0xFF; b += rgb(i + 2) & 0xFF
            x += 1
          }
          y += 1
        }
        val area = (y1 - y0) * (x1 - x0)
        val o = (ty * tw + tx) * 3
        out(o) = math.round(r / area).toByte
        out(o + 1) = math.round(g / area).toByte
        out(o + 2) = math.round(b / area).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 3×3 box blur per channel, replicate border, floor division by 9 —
    * the low-pass half of the blur/sharpness quality filter (LAION-style
    * training-data curation, public). Pure integer: deterministic across
    * JVMs and shuffle orders. */
  def boxBlur3Rgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    if (w * h * 3 != rgb.length) return rgb.clone()
    val out = new Array[Byte](rgb.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          var s = 0
          var dy = -1
          while (dy <= 1) {
            val sy = math.max(0, math.min(h - 1, y + dy))
            var dx = -1
            while (dx <= 1) {
              val sx = math.max(0, math.min(w - 1, x + dx))
              s += rgb((sy * w + sx) * 3 + c) & 0xFF
              dx += 1
            }
            dy += 1
          }
          out((y * w + x) * 3 + c) = (s / 9).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** 3×3 median filter per channel, replicate border (the boxBlur3
    * clamp convention) — the salt-and-pepper denoiser of the classic
    * image-quality toolchain (Tukey's median smoothing, public): impulse
    * noise vanishes while step edges survive, so sharpness drops far
    * less than under the box blur on clean images. Pure integer
    * (insertion sort over the 9-neighborhood, lower median = element 4
    * of the sorted run): deterministic across JVMs and shuffle orders. */
  def median3Rgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    if (w * h * 3 != rgb.length) return rgb.clone()
    val out = new Array[Byte](rgb.length)
    val win = new Array[Int](9)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          var k = 0
          var dy = -1
          while (dy <= 1) {
            val sy = math.max(0, math.min(h - 1, y + dy))
            var dx = -1
            while (dx <= 1) {
              val sx = math.max(0, math.min(w - 1, x + dx))
              win(k) = rgb((sy * w + sx) * 3 + c) & 0xFF
              k += 1
              dx += 1
            }
            dy += 1
          }
          // insertion sort, 9 elements; median = win(4)
          var i = 1
          while (i < 9) {
            val v = win(i)
            var j = i - 1
            while (j >= 0 && win(j) > v) { win(j + 1) = win(j); j -= 1 }
            win(j + 1) = v
            i += 1
          }
          out((y * w + x) * 3 + c) = win(4).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Floyd–Steinberg error-diffusion dither per channel to the 1-bit
    * palette {0, 255} (the classic 1976 kernel, public): raster order
    * (top→bottom, left→right), threshold at 128, quantization error e
    * pushed right 7/16, down-left 3/16, down 5/16, down-right 1/16 —
    * each share as Java integer division e·k/16 (truncation toward
    * zero, so negative errors round symmetrically) with the final
    * residue e − Σshares added to the right neighbor so the diffusion
    * conserves total error exactly. Pure integers end to end:
    * deterministic across JVMs and shuffle orders. Serial per image
    * (error diffusion is inherently sequential) — row-parallel across
    * the corpus like every decode kernel. */
  def ditherFsRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    if (w * h * 3 != rgb.length) return rgb.clone()
    val out = new Array[Byte](rgb.length)
    val acc = new Array[Int](rgb.length) // accumulated diffused error
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          val i = (y * w + x) * 3 + c
          val v = (rgb(i) & 0xFF) + acc(i)
          val o = if (v < 128) 0 else 255
          out(i) = o.toByte
          val e = v - o
          val e3 = e * 3 / 16; val e5 = e * 5 / 16; val e1 = e / 16
          val e7 = e - e3 - e5 - e1 // conserve: right gets the residue
          if (x + 1 < w) acc(i + 3) += e7
          if (y + 1 < h) {
            val d = ((y + 1) * w + x) * 3 + c
            if (x > 0) acc(d - 3) += e3
            acc(d) += e5
            if (x + 1 < w) acc(d + 3) += e1
          }
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Sum of absolute byte differences Σ|a_i − b_i| (exact BIGINT; −1 on
    * length mismatch) — the L1 distortion a dither/denoise audit pairs
    * with PSNR's L2. */
  def sad(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length) return -1L
    var s = 0L
    var i = 0
    while (i < a.length) {
      s += math.abs((a(i) & 0xFF) - (b(i) & 0xFF))
      i += 1
    }
    s
  }

  /** Laplacian sharpness: Σ over interior pixels of
    * (4·center − up − down − left − right)² on integer luma. Exact BIGINT
    * (|lap| ≤ 2040 so lap² ≤ ~4.2e6/pixel — overflow needs ~2e12 pixels
    * in ONE image). 0 for constant images and for images thinner than
    * 3 px (no interior). The standard blur-detection feature: a blurred
    * copy scores strictly lower on any non-constant interior. */
  /** 64-bin RGB color histogram (4×4×4 — top 2 bits of each channel):
    * bin = (r>>6)<<4 | (g>>6)<<2 | (b>>6). Counts sum to the pixel count;
    * exact integers, so cross-engine comparison needs no tolerance. The
    * curation signal behind dominant-color dedup/diversity balancing. */
  def colorHist64(rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](64)
    var i = 0
    while (i + 2 < rgb.length) {
      val bin = (((rgb(i) & 0xFF) >> 6) << 4) | (((rgb(i + 1) & 0xFF) >> 6) << 2) |
        ((rgb(i + 2) & 0xFF) >> 6)
      out(bin) += 1L
      i += 3
    }
    out
  }

  /** Mean 8×8-block SSIM over the luma channel, quantized ×1e6 (floor).
    * Wang et al.'s structural-similarity formula per non-overlapping
    * block (partial edge blocks included; K1=0.01, K2=0.03, L=255),
    * averaged in raster block order — a deterministic scan, so the
    * fixture loop and the SQL expression agree bit-for-bit. Identical
    * inputs give EXACTLY 1.0 per block (numerator and denominator are
    * the same double expression), hence exactly 1_000_000. */
  def ssimQ(w: Int, h: Int, a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == w * h * 3 && b.length == w * h * 3,
      s"ssim over mismatched buffers: ${a.length}/${b.length} vs ${w}x$h")
    val C1 = 6.5025 // (0.01*255)^2
    val C2 = 58.5225 // (0.03*255)^2
    var total = 0.0
    var nb = 0
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        val bw = math.min(8, w - bx)
        val bh = math.min(8, h - by)
        var sa = 0.0; var sb = 0.0; var saa = 0.0; var sbb = 0.0; var sab = 0.0
        var y = by
        while (y < by + bh) {
          var x = bx
          while (x < bx + bw) {
            val k = (y * w + x) * 3
            val la = luma(a(k) & 0xFF, a(k + 1) & 0xFF, a(k + 2) & 0xFF).toDouble
            val lb = luma(b(k) & 0xFF, b(k + 1) & 0xFF, b(k + 2) & 0xFF).toDouble
            sa += la; sb += lb; saa += la * la; sbb += lb * lb; sab += la * lb
            x += 1
          }
          y += 1
        }
        val n = (bw * bh).toDouble
        val ma = sa / n; val mb = sb / n
        val va = saa / n - ma * ma; val vb = sbb / n - mb * mb
        val cab = sab / n - ma * mb
        total += ((2 * ma * mb + C1) * (2 * cab + C2)) /
          ((ma * ma + mb * mb + C1) * (va + vb + C2))
        nb += 1
        bx += 8
      }
      by += 8
    }
    math.floor(total / nb * 1e6).toLong
  }

  /** Sobel edge profile on integer luma — the HOG-flavored curation
    * signal (edge density + orientation mix) that separates texture-rich
    * from flat/synthetic images. For every interior pixel: 3×3 Sobel
    * gx/gy; a pixel is an edge when its L1 magnitude |gx|+|gy| ≥ 128.
    * Returns [edge_count, grad_sum, oct0..oct7]: grad_sum = Σ magnitude
    * over edge pixels, octk = edge pixels whose direction lies in octant
    * k (0=E,1=NE,2=N,3=NW,4=W,5=SW,6=S,7=SE). Octant boundaries at 22.5°
    * use the exact integer test 29·|minor| ≤ 12·|major| (12/29 ≈
    * tan 22.5°), so the whole feature is pure integer math —
    * bit-identical across JVMs and shuffle orders, and Σ octk ==
    * edge_count by construction. */
  def sobelStats(w: Int, h: Int, rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](10)
    if (w < 3 || h < 3 || w * h * 3 != rgb.length) return out
    val lum = new Array[Int](w * h)
    var i = 0
    var p = 0
    while (p < w * h) {
      lum(p) = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
      i += 3; p += 1
    }
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c = y * w + x
        val gx = (lum(c - w + 1) + 2 * lum(c + 1) + lum(c + w + 1)) -
          (lum(c - w - 1) + 2 * lum(c - 1) + lum(c + w - 1))
        // positive gy points UP (toward row 0 = north), matching the
        // raster-gradient octant convention in q140
        val gy = (lum(c - w - 1) + 2 * lum(c - w) + lum(c - w + 1)) -
          (lum(c + w - 1) + 2 * lum(c + w) + lum(c + w + 1))
        val ax = math.abs(gx); val ay = math.abs(gy)
        val mag = ax + ay
        if (mag >= 128) {
          out(0) += 1L
          out(1) += mag.toLong
          val oct =
            if (29 * ay <= 12 * ax) { if (gx > 0) 0 else 4 }          // within 22.5° of x-axis
            else if (29 * ax <= 12 * ay) { if (gy > 0) 2 else 6 }     // within 22.5° of y-axis
            else if (gx > 0) { if (gy > 0) 1 else 7 }                 // diagonals by sign
            else { if (gy > 0) 3 else 5 }
          out(2 + oct) += 1L
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-channel histogram equalization — the classic integer formula
    * out = ⌊(cdf(v) − cdf_min)·255 / (n − cdf_min)⌋ with cdf_min the cdf
    * at the channel's first occupied level (Gonzalez–Woods convention).
    * A CONSTANT channel maps to itself (the formula's 0/0 case —
    * identity keeps flat images flat instead of blackening them).
    * Deterministic pure-integer map → byte-exact across engines/runs. */
  /** Gamma tone curve v′ = round(255·(v/255)^γ), γ = gammaMilli/1000 —
    * LUT-driven (256 pow calls per invocation, not per pixel), the
    * display-calibration / augmentation kernel beside equalize/dither.
    * γ = 1 is the exact identity; 0 and 255 are fixed points for any γ. */
  def gammaRgb(rgb: Array[Byte], gammaMilli: Int): Array[Byte] = {
    require(gammaMilli > 0, s"gamma must be positive, got $gammaMilli")
    val g = gammaMilli / 1000.0
    val lut = new Array[Byte](256)
    var v = 0
    while (v < 256) {
      lut(v) = math.min(255L, math.floor(255.0 * math.pow(v / 255.0, g) + 0.5).toLong).toByte
      v += 1
    }
    val out = new Array[Byte](rgb.length)
    var i = 0
    while (i < rgb.length) { out(i) = lut(rgb(i) & 0xFF); i += 1 }
    out
  }

  def equalizeRgb(rgb: Array[Byte]): Array[Byte] = {
    val n = rgb.length / 3
    if (n == 0) return rgb.clone()
    val out = new Array[Byte](rgb.length)
    var c = 0
    while (c < 3) {
      val hist = new Array[Long](256)
      var i = c
      while (i < rgb.length) { hist(rgb(i) & 0xFF) += 1; i += 3 }
      val map = new Array[Int](256)
      var cdf = 0L
      var cdfMin = -1L
      var v = 0
      while (v < 256) {
        cdf += hist(v)
        if (cdfMin < 0 && hist(v) > 0) cdfMin = cdf
        // cdfMin < 0: below the first occupied level (value never occurs);
        // n == cdfMin: constant channel — both map to identity
        map(v) =
          if (cdfMin < 0 || n == cdfMin) v
          else (((cdf - cdfMin) * 255L) / (n - cdfMin)).toInt
        v += 1
      }
      i = c
      while (i < rgb.length) { out(i) = map(rgb(i) & 0xFF).toByte; i += 3 }
      c += 1
    }
    out
  }

  /** Per-channel byte sums [Σr, Σg, Σb, n_px] — the gray-world
    * white-balance statistic (exact integers; a cast-free image has
    * near-equal channel means). */
  def channelSums(rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](4)
    var i = 0
    while (i + 2 < rgb.length) {
      out(0) += rgb(i) & 0xFF
      out(1) += rgb(i + 1) & 0xFF
      out(2) += rgb(i + 2) & 0xFF
      out(3) += 1
      i += 3
    }
    out
  }

  /** 8×8 gray-level co-occurrence matrix (Haralick texture): luma
    * quantized to 8 levels (>> 5), each horizontal pixel pair (x, x+1)
    * counted SYMMETRICALLY (both (a,b) and (b,a) — bin index a·8 + b),
    * so the matrix is its own transpose and Σ = 2·h·(w−1). Exact
    * integers; texture payloads (contrast, energy, homogeneity) derive
    * from the counts downstream. Degenerate inputs (w < 2, length
    * mismatch) return all zeros, never throw. */
  def glcm8(w: Int, h: Int, rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](64)
    if (w < 2 || h < 1 || w * h * 3 != rgb.length) return out
    var y = 0
    while (y < h) {
      var x = 0
      var prev = -1
      while (x < w) {
        val i = (y * w + x) * 3
        val v = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF) >> 5
        if (prev >= 0) { out(prev * 8 + v) += 1L; out(v * 8 + prev) += 1L }
        prev = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-bin luma histogram (bin = luma >> 4) — the exposure profile
    * behind over/under-exposure curation gates. Counts sum to the pixel
    * count; exact integers, no cross-engine tolerance needed. */
  def lumaHist16(rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](16)
    var i = 0
    while (i + 2 < rgb.length) {
      out(luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF) >> 4) += 1L
      i += 3
    }
    out
  }

  /** 256-bin local-binary-pattern histogram (Ojala et al. 2002, public) —
    * the rotation-variant LBP₈,₁ texture descriptor that complements
    * glcm8's co-occurrence view. Per INTERIOR pixel the 8 neighbours are
    * read clockwise from the top-left (TL,T,TR,R,BR,B,BL,L → bits 0..7);
    * a bit is set when neighbour luma ≥ centre luma, so a flat image is
    * all pattern 255 (every comparison ties high). Pure integer counts;
    * histogram total = (w−2)·(h−2). */
  def lbpHist(w: Int, h: Int, rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](256)
    if (w < 3 || h < 3 || w * h * 3 != rgb.length) return out
    val lum = new Array[Int](w * h)
    var i = 0; var p = 0
    while (p < w * h) {
      lum(p) = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
      i += 3; p += 1
    }
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c = y * w + x
        val cv = lum(c)
        var pat = 0
        if (lum(c - w - 1) >= cv) pat |= 1
        if (lum(c - w) >= cv) pat |= 2
        if (lum(c - w + 1) >= cv) pat |= 4
        if (lum(c + 1) >= cv) pat |= 8
        if (lum(c + w + 1) >= cv) pat |= 16
        if (lum(c + w) >= cv) pat |= 32
        if (lum(c + w - 1) >= cv) pat |= 64
        if (lum(c - 1) >= cv) pat |= 128
        out(pat) += 1L
        x += 1
      }
      y += 1
    }
    out
  }

  /** Harris corner response (Harris & Stephens 1988, public), exact
    * integer variant: Sobel gradients on the luma plane, structure
    * tensor summed over the 3×3 window, and k = 1/16 cleared of the
    * division — R = 16·(Sxx·Syy − Sxy²) − (Sxx+Syy)², so corners are
    * R > 0, edges strongly negative, flat exactly 0. Evaluated where
    * the full window of Sobel values exists (x,y ∈ 2..w−3/2..h−3).
    * Returns [n_eval, n_pos, r_max, x_max, y_max] with the arg-max the
    * FIRST maximum in row-major scan order (deterministic ties); all
    * zeros when no pixel qualifies. Magnitude proof: |g| ≤ 1020 ⇒
    * window sums < 2²⁴ ⇒ |R| < 2⁵³ — no Long overflow. */
  def harris(w: Int, h: Int, rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](5)
    if (w < 5 || h < 5 || w * h * 3 != rgb.length) return out
    val lum = new Array[Int](w * h)
    var i = 0; var p = 0
    while (p < w * h) {
      lum(p) = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
      i += 3; p += 1
    }
    // Sobel per interior pixel (same stencil + sign convention as sobelStats)
    val gxA = new Array[Int](w * h); val gyA = new Array[Int](w * h)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c = y * w + x
        gxA(c) = (lum(c - w + 1) + 2 * lum(c + 1) + lum(c + w + 1)) -
          (lum(c - w - 1) + 2 * lum(c - 1) + lum(c + w - 1))
        gyA(c) = (lum(c - w - 1) + 2 * lum(c - w) + lum(c - w + 1)) -
          (lum(c + w - 1) + 2 * lum(c + w) + lum(c + w + 1))
        x += 1
      }
      y += 1
    }
    var rMax = Long.MinValue; var xm = 0L; var ym = 0L
    var nEval = 0L; var nPos = 0L
    y = 2
    while (y < h - 2) {
      var x = 2
      while (x < w - 2) {
        var sxx = 0L; var syy = 0L; var sxy = 0L
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val c = (y + dy) * w + (x + dx)
            val gx = gxA(c).toLong; val gy = gyA(c).toLong
            sxx += gx * gx; syy += gy * gy; sxy += gx * gy
            dx += 1
          }
          dy += 1
        }
        val tr = sxx + syy
        val r = 16L * (sxx * syy - sxy * sxy) - tr * tr
        nEval += 1L
        if (r > 0L) nPos += 1L
        if (r > rMax) { rMax = r; xm = x; ym = y }
        x += 1
      }
      y += 1
    }
    if (nEval == 0L) return out
    out(0) = nEval; out(1) = nPos; out(2) = rMax; out(3) = xm; out(4) = ym
    out
  }

  /** 6-sector hue histogram + achromatic bin, exact integer HSV sector
    * decomposition: M = max(r,g,b) with tie priority r > g > b, C = M−m;
    * C = 0 → bin 6 (gray). Otherwise the sector index falls out of pure
    * comparisons (no division): M=r → bin 0 if g ≥ b else 5; M=g →
    * bin 2 if b ≥ r else 1; M=b → bin 4 if r ≥ g else 3 — i.e. bin =
    * ⌊hue/60°⌋ for interior hues; the three two-channel-tie boundary
    * hues resolve via the comparisons above (yellow 60° → 0,
    * cyan 180° → 2, magenta 300° → 5). Counts sum to the pixel count. */
  def hueHist(rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](7)
    var i = 0
    while (i + 2 < rgb.length) {
      val r = rgb(i) & 0xFF; val g = rgb(i + 1) & 0xFF; val b = rgb(i + 2) & 0xFF
      val m = math.min(r, math.min(g, b))
      val bin =
        if (r >= g && r >= b) { if (r == m) 6 else if (g >= b) 0 else 5 }
        else if (g >= b) { if (b >= r) 2 else 1 }
        else { if (r >= g) 4 else 3 }
      out(bin) += 1L
      i += 3
    }
    out
  }

  /** 3-3-2 palette audit of a decoded RGB buffer: [distinct palette
    * codes used, dominant code (ties → smallest code), its count,
    * Σ per-pixel |r−rc|+|g−gc|+|b−bc| against the bin centers
    * rc = (r>>5)·32+16, gc = (g>>5)·32+16, bc = (b>>6)·64+32] — the
    * exact L1 error an 8-bit palette export would incur. Pixel-order
    * independent by construction (pure histogram). */
  def pal332(rgb: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](256)
    var qerr = 0L
    var i = 0
    while (i + 2 < rgb.length) {
      val r = rgb(i) & 0xFF; val g = rgb(i + 1) & 0xFF; val b = rgb(i + 2) & 0xFF
      hist(((r >> 5) << 5) | ((g >> 5) << 2) | (b >> 6)) += 1L
      qerr += math.abs(r - ((r >> 5) * 32 + 16)) +
        math.abs(g - ((g >> 5) * 32 + 16)) +
        math.abs(b - ((b >> 6) * 64 + 32))
      i += 3
    }
    var nd = 0L; var top = 0L; var topc = -1L
    var c = 0
    while (c < 256) {
      if (hist(c) > 0) nd += 1
      if (hist(c) > topc) { topc = hist(c); top = c }
      c += 1
    }
    Array(nd, top, topc, qerr)
  }

  /** Deterministic median-cut palette quantization to ≤8 colors
    * (Heckbert 1982, public): three split rounds; each box splits on
    * its widest channel (tie order R, G, B) at the value-threshold
    * lower median t = min(median, max−1), members c ≤ t left —
    * decisions depend only on VALUES, so the result is pixel-order
    * invariant; constant boxes stay leaves. Returns [n_colors,
    * dom_count, dom_r, dom_g, dom_b, l1_qerr] with box means floor-
    * divided and the exact integer L1 error to the assigned mean. */
  def medianCut8(rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](6)
    val n = rgb.length / 3
    if (n == 0 || rgb.length % 3 != 0) return out
    def ch(i: Int, c: Int): Int = rgb(i * 3 + c) & 0xFF
    var boxes: Vector[Array[Int]] = Vector(Array.tabulate(n)(identity))
    var round = 0
    while (round < 3) {
      boxes = boxes.flatMap { b =>
        val mn = Array(255, 255, 255); val mx = Array(0, 0, 0)
        b.foreach { i =>
          var c = 0
          while (c < 3) {
            val v = ch(i, c)
            if (v < mn(c)) mn(c) = v
            if (v > mx(c)) mx(c) = v
            c += 1
          }
        }
        val ranges = Array(mx(0) - mn(0), mx(1) - mn(1), mx(2) - mn(2))
        val wc = if (ranges(0) >= ranges(1) && ranges(0) >= ranges(2)) 0
          else if (ranges(1) >= ranges(2)) 1 else 2
        if (ranges(wc) == 0) Vector(b) // constant box: leaf
        else {
          val hist = new Array[Int](256)
          b.foreach(i => hist(ch(i, wc)) += 1)
          val half = (b.length + 1) / 2
          var t = 0; var cum = 0
          while (cum < half) { cum += hist(t); t += 1 }
          t -= 1
          if (t >= mx(wc)) t = mx(wc) - 1
          Vector(b.filter(i => ch(i, wc) <= t), b.filter(i => ch(i, wc) > t))
        }
      }
      round += 1
    }
    out(0) = boxes.size.toLong
    var qerr = 0L
    var domCount = -1L; var domR = 0L; var domG = 0L; var domB = 0L
    boxes.foreach { b =>
      var sr = 0L; var sg = 0L; var sb = 0L
      b.foreach { i => sr += ch(i, 0); sg += ch(i, 1); sb += ch(i, 2) }
      val mr = sr / b.length; val mg = sg / b.length; val mb = sb / b.length
      b.foreach { i =>
        qerr += math.abs(ch(i, 0) - mr) + math.abs(ch(i, 1) - mg) +
          math.abs(ch(i, 2) - mb)
      }
      if (b.length > domCount) {
        domCount = b.length.toLong; domR = mr; domG = mg; domB = mb
      }
    }
    out(1) = domCount; out(2) = domR; out(3) = domG; out(4) = domB
    out(5) = qerr
    out
  }

  /** Two-level unnormalized 2D Haar transform energies over the 16×16
    * area-averaged luma thumbnail: [e_ll2, e_lh2, e_hl2, e_hh2, e_lh1,
    * e_hl1, e_hh1], each the exact integer Σcoef² of its subband
    * (Haar 1910 / Mallat 1989, public). Unnormalized sums/diffs keep
    * every coefficient an integer: |level-1| ≤ 4·255, |level-2| ≤
    * 16·255, so Σcoef² < 2³² — long arithmetic can't wrap. The texture
    * fingerprint behind band-energy curation (flat renders concentrate
    * in LL; photographs carry detail-band mass). */
  def haarEnergy(w: Int, h: Int, rgb: Array[Byte]): Array[Long] = {
    val out = new Array[Long](7)
    if (w < 1 || h < 1 || w * h * 3 != rgb.length) return out
    val th = resizeRgb(w, h, rgb, 16, 16)
    val a = new Array[Int](256)
    var p = 0
    while (p < 256) {
      a(p) = luma(th(p * 3) & 0xFF, th(p * 3 + 1) & 0xFF, th(p * 3 + 2) & 0xFF)
      p += 1
    }
    // one separable level on the n×n top-left block of the 16-stride
    // buffer: rows (sum|diff) then columns; subbands land in quadrants
    def level(src: Array[Int], n: Int): Array[Int] = {
      val t = new Array[Int](256)
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n / 2) {
          val u = src(y * 16 + 2 * x); val v = src(y * 16 + 2 * x + 1)
          t(y * 16 + x) = u + v
          t(y * 16 + n / 2 + x) = u - v
          x += 1
        }
        y += 1
      }
      val o = new Array[Int](256)
      var x = 0
      while (x < n) {
        var yy = 0
        while (yy < n / 2) {
          val u = t(2 * yy * 16 + x); val v = t((2 * yy + 1) * 16 + x)
          o(yy * 16 + x) = u + v
          o((n / 2 + yy) * 16 + x) = u - v
          yy += 1
        }
        x += 1
      }
      o
    }
    def bandE(b: Array[Int], x0: Int, y0: Int, n: Int): Long = {
      var s = 0L
      var y = y0
      while (y < y0 + n) {
        var x = x0
        while (x < x0 + n) { val c = b(y * 16 + x); s += c.toLong * c; x += 1 }
        y += 1
      }
      s
    }
    val l1 = level(a, 16)
    out(4) = bandE(l1, 8, 0, 8) // LH1: row-diff quadrant
    out(5) = bandE(l1, 0, 8, 8) // HL1: col-diff quadrant
    out(6) = bandE(l1, 8, 8, 8) // HH1
    val l2 = level(l1, 8)
    out(0) = bandE(l2, 0, 0, 4)
    out(1) = bandE(l2, 4, 0, 4)
    out(2) = bandE(l2, 0, 4, 4)
    out(3) = bandE(l2, 4, 4, 4)
    out
  }

  def sharpness(w: Int, h: Int, rgb: Array[Byte]): Long = {
    if (w < 3 || h < 3 || w * h * 3 != rgb.length) return 0L
    val lum = new Array[Int](w * h)
    var i = 0
    var p = 0
    while (p < w * h) {
      lum(p) = luma(rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF)
      i += 3; p += 1
    }
    var s = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c = lum(y * w + x)
        val lap = 4 * c - lum((y - 1) * w + x) - lum((y + 1) * w + x) -
          lum(y * w + x - 1) - lum(y * w + x + 1)
        s += lap.toLong * lap
        x += 1
      }
      y += 1
    }
    s
  }
}
