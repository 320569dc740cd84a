package graft.img

import java.util.zip.Inflater

/**
 * Allocation-lean PNG decoder for the corpus fast path: 8-bit truecolor
 * RGB (color type 2), non-interlaced — exactly what the fixture encoder
 * (`Images.encode(_, _, _, "png")`, an ImageIO `TYPE_INT_RGB` write)
 * produces, and the dominant shape of web image corpora after transcode.
 *
 * PNG is lossless, so for the supported subset the output is bit-identical
 * to ImageIO's decode BY CONSTRUCTION (inflate + the five standard row
 * filters, RFC 2083 §6); FastPngSpec pins equality against ImageIO across
 * fuzzed sizes/contents anyway. Anything else (other color types, bit
 * depths, interlace) returns null and the caller falls back to ImageIO —
 * correctness never depends on this class recognizing an input.
 *
 * Why it exists (measured, round 5): ImageIO's reader path costs ~200 µs
 * per 64×64 PNG and ~100 KB of garbage (registry stream, BufferedImage +
 * raster + color-model conversion, int[] from getRGB); at 32 decode
 * threads the allocation rate makes the collector the scaling bottleneck
 * (8→32 efficiency 0.35 in-plan vs 0.9 spin ceiling). This path holds one
 * reusable Inflater + scratch buffer per thread and writes the packed RGB
 * result directly.
 */
object FastPng {

  private final class Scratch {
    val inflater = new Inflater()
    var raw: Array[Byte] = new Array[Byte](1 << 14)
    def rawFor(n: Int): Array[Byte] = {
      if (raw.length < n) raw = new Array[Byte](Integer.highestOneBit(n - 1) << 1)
      raw
    }
  }
  private val scratchTL = ThreadLocal.withInitial[Scratch](() => new Scratch)

  @inline private def i32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) | ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)

  /** Decode 8-bit RGB non-interlaced PNG to (w, h, packed rgb). Returns
    * null for any input outside the fast-path subset (caller falls back). */
  def decodeRgb(bytes: Array[Byte]): Array[Byte] = {
    val wh = unfilterToScratch(bytes)
    if (wh < 0) return null
    val w = (wh >>> 32).toInt; val h = (wh & 0xFFFFFFFFL).toInt
    val stride = w * 3
    val raw = scratchTL.get().raw
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      System.arraycopy(raw, y * (stride + 1) + 1, out, y * stride, stride)
      y += 1
    }
    out
  }

  /**
   * 32×32 grayscale tile means straight off the unfiltered rows — the
   * fused pHash front end. Bit-identical to `Images.gray32` over
   * `decodeRgb` output: the tile loops below visit pixels in the same
   * row-major-within-tile order and accumulate the same doubles in the
   * same order, they just index the scratch rows (stride+1 filter-byte
   * layout) instead of a materialized RGB plane. Skipping that plane
   * saves ~2/3 of the per-image memory traffic (write + re-read of
   * w·h·3 bytes), which is the binding resource at 32 decode threads
   * (ScalingBench memprobe: the host's 8→32 memory-bandwidth scaling is
   * ~0.5 while its CPU spin scaling is ~0.9). Returns null outside the
   * fast-path subset.
   */
  def gray32FromPng(bytes: Array[Byte], n: Int): Array[Double] = {
    val wh = unfilterToScratch(bytes)
    if (wh < 0) return null
    val w = (wh >>> 32).toInt; val h = (wh & 0xFFFFFFFFL).toInt
    val stride = w * 3
    val raw = scratchTL.get().raw
    val g = new Array[Double](n * n)
    var ty = 0
    while (ty < n) {
      val y0 = ty * h / n; val y1 = math.max(y0 + 1, (ty + 1) * h / n)
      var tx = 0
      while (tx < n) {
        val x0 = tx * w / n; val x1 = math.max(x0 + 1, (tx + 1) * w / n)
        var s = 0.0
        var y = y0
        while (y < y1) {
          val rowBase = y * (stride + 1) + 1
          var x = x0
          while (x < x1) {
            val i = rowBase + x * 3
            s += 0.299 * (raw(i) & 0xFF) + 0.587 * (raw(i + 1) & 0xFF) + 0.114 * (raw(i + 2) & 0xFF)
            x += 1
          }
          y += 1
        }
        g(ty * n + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    g
  }

  /** Inflate + unfilter into the thread-local scratch. Returns packed
    * (w << 32) | h, or -1 outside the fast-path subset. Row y's pixels
    * live at raw(y*(w*3+1)+1 ..) until the next call on this thread. */
  private def unfilterToScratch(bytes: Array[Byte]): Long = {
    if (bytes.length < 45) return -1L // sig(8) + IHDR(25) + shortest IDAT/IEND
    // signature
    if ((bytes(0) & 0xFF) != 0x89 || bytes(1) != 'P' || bytes(2) != 'N' || bytes(3) != 'G') return -1L
    // IHDR must be first chunk
    if (i32(bytes, 8) != 13 || bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R') return -1L
    val w = i32(bytes, 16)
    val h = i32(bytes, 20)
    val bitDepth = bytes(24)
    val colorType = bytes(25)
    val interlace = bytes(28)
    if (bitDepth != 8 || colorType != 2 || bytes(26) != 0 || bytes(27) != 0 || interlace != 0) return -1L
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue - 16) return -1L

    val stride = w * 3
    val rawLen = h * (stride + 1)
    val sc = scratchTL.get()
    val raw = sc.rawFor(rawLen)
    val inf = sc.inflater
    inf.reset()

    // walk chunks, feeding every IDAT payload straight from `bytes`
    var p = 33 // 8 sig + 25 IHDR
    var produced = 0
    var sawEnd = false
    while (!sawEnd && p + 8 <= bytes.length) {
      val len = i32(bytes, p)
      if (len < 0 || p + 12 + len > bytes.length) return -1L
      val t0 = bytes(p + 4); val t1 = bytes(p + 5); val t2 = bytes(p + 6); val t3 = bytes(p + 7)
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        inf.setInput(bytes, p + 8, len)
        while (!inf.needsInput() && !inf.finished() && produced < rawLen) {
          val n = inf.inflate(raw, produced, rawLen - produced)
          produced += n
          if (n == 0 && !inf.needsInput() && !inf.finished()) return -1L // dictionary or stall
        }
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        sawEnd = true
      }
      p += 12 + len
    }
    if (produced < rawLen) return -1L

    // unfilter in place (RFC 2083 §6.3-6.9); rows stay in the scratch
    val bpp = 3
    var y = 0
    while (y < h) {
      val rp = y * (stride + 1)
      val filter = raw(rp) & 0xFF
      val row = rp + 1
      val prev = row - (stride + 1) // valid only when y > 0
      filter match {
        case 0 => // None
        case 1 => // Sub
          var i = bpp
          while (i < stride) { raw(row + i) = (raw(row + i) + raw(row + i - bpp)).toByte; i += 1 }
        case 2 => // Up
          if (y > 0) {
            var i = 0
            while (i < stride) { raw(row + i) = (raw(row + i) + raw(prev + i)).toByte; i += 1 }
          }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) raw(row + i - bpp) & 0xFF else 0
            val b = if (y > 0) raw(prev + i) & 0xFF else 0
            raw(row + i) = (raw(row + i) + ((a + b) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) raw(row + i - bpp) & 0xFF else 0
            val b = if (y > 0) raw(prev + i) & 0xFF else 0
            val c = if (i >= bpp && y > 0) raw(prev + i - bpp) & 0xFF else 0
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(row + i) = (raw(row + i) + pred).toByte
            i += 1
          }
        case _ => return -1L
      }
      y += 1
    }
    (w.toLong << 32) | (h.toLong & 0xFFFFFFFFL)
  }

  /** Header sniff: (w, h) for a PNG the fast path would accept, else null. */
  def dims(bytes: Array[Byte]): Array[Int] = {
    if (bytes.length < 33 || (bytes(0) & 0xFF) != 0x89 || bytes(1) != 'P') return null
    if (i32(bytes, 8) != 13 || bytes(12) != 'I' || bytes(13) != 'H') return null
    Array(i32(bytes, 16), i32(bytes, 20))
  }
}
