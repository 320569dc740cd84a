package graft.img

/**
 * Allocation-lean luma-only JPEG decoder for the pHash fast path: baseline
 * sequential DCT (SOF0), 8-bit, up to 4 components, standard Huffman
 * tables, optional restart markers — the shape every JFIF encoder
 * (including `javax.imageio`'s writer, which produces 4:2:0 YCbCr with
 * two DQT and four DHT segments) emits for web corpora.
 *
 * Why it exists (measured, round 5): the 20% JPEG share of the bench
 * corpus was the last ImageIO user on the decode hot path. ImageIO's
 * reader costs ~100 KB of garbage per image (stream wrappers,
 * BufferedImage + raster, the `getRGB` int[] pass); at 32 decode threads
 * that allocation rate turns into DRAM write traffic on a host whose
 * memory system stops scaling at ~1.7× from 8→32 threads (ScalingBench
 * memprobe), so the collector's churn — not CPU — caps the N→4N scaling
 * datum. This path holds one scratch per thread and allocates only the
 * 32×32 tile array per image.
 *
 * Semantics: pHash's gray tile for a JPEG is defined as the decoder's Y
 * (luma) channel directly — NOT ImageIO's YCbCr→RGB→weighted-luma
 * round-trip, which re-derives the same Y modulo chroma-clamp rounding
 * (|Δ| ≤ 1 gray level; FastJpegSpec pins the tile-mean agreement). pHash
 * is a perceptual hash with no bit-exactness contract across decoders;
 * every fixture materializes its hash columns with this same code
 * (GeoTables GEN bump), so engine/oracle comparisons stay exact. The
 * pixel-exact decode surface (`img_decode`, PSNR, the per-row
 * input_hint invariant) still goes through ImageIO — only the hash
 * front end takes this path.
 *
 * Anything outside the supported subset (progressive SOF2, arithmetic
 * coding, 12-bit, DNL) returns null and the caller falls back to the
 * ImageIO path — correctness never depends on this class recognizing an
 * input.
 */
object FastJpeg {

  /** Per-thread reusable state: quant/huffman tables, component metadata,
    * the Y plane, and the bit reader — zero per-image allocation. */
  private final class Scratch {
    val quant = Array.ofDim[Int](4, 64)
    val quantSet = new Array[Boolean](4)
    // huffman tables [class 0=DC|1=AC][id 0..3]; built canonically per spec
    // F.2.2.3 plus an 8-bit lookahead (value | length<<8, -1 = slow path)
    val huffLook = Array.ofDim[Int](2, 4, 256)
    val huffMax = Array.ofDim[Int](2, 4, 17) // maxcode per length (exclusive compare)
    val huffValPtr = Array.ofDim[Int](2, 4, 17)
    val huffMin = Array.ofDim[Int](2, 4, 17)
    val huffVals = Array.ofDim[Int](2, 4, 256)
    val huffSet = Array.ofDim[Boolean](2, 4)
    // per-component SOF/SOS metadata (≤ 4 components)
    val compH = new Array[Int](4); val compV = new Array[Int](4)
    val compQ = new Array[Int](4)
    val compDcTab = new Array[Int](4); val compAcTab = new Array[Int](4)
    val dcPred = new Array[Int](4)
    // block workspace
    val coef = new Array[Int](64)
    val blk = new Array[Double](64)
    val tmp = new Array[Double](64)
    var yPlane: Array[Byte] = new Array[Byte](64 * 64)
    var yStride: Int = 0
    def yFor(nPx: Int): Array[Byte] = {
      if (yPlane.length < nPx) yPlane = new Array[Byte](Integer.highestOneBit(nPx - 1) << 1)
      yPlane
    }
    // bit reader state
    var data: Array[Byte] = null
    var pos = 0
    var bitBuf = 0L
    var bitCnt = 0
  }
  private val scratchTL = ThreadLocal.withInitial[Scratch](() => new Scratch)

  // zig-zag order: zigzag(k) = natural index of the k-th coefficient
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: idctTab(x*8+u) = c(u)/2 · cos((2x+1)uπ/16)
  private val idctTab: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val cu = if (u == 0) math.sqrt(0.5) else 1.0
        t(x * 8 + u) = cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  @inline private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)

  /** 32×32 (n×n) grayscale tile means of the Y channel, or null outside
    * the fast-path subset. Mirrors the accumulation shape of
    * `Images.gray32` with gray := Y. */
  def gray32FromJpeg(bytes: Array[Byte], n: Int): Array[Double] = {
    val sc = scratchTL.get()
    val wh = decodeY(bytes, sc)
    if (wh < 0) return null
    val w = (wh >>> 32).toInt; val h = (wh & 0xFFFFFFFFL).toInt
    // Y plane stride: MCU-padded width recorded by decodeY
    val stride = sc.yStride
    val y0p = sc.yPlane
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
          val base = y * stride
          var x = x0
          while (x < x1) { s += (y0p(base + x) & 0xFF); x += 1 }
          y += 1
        }
        g(ty * n + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    g
  }

  /** Decode the Y channel into sc.yPlane (MCU-padded stride sc.yStride).
    * Returns (w << 32 | h) or -1 when unsupported/corrupt. */
  private def decodeY(bytes: Array[Byte], sc: Scratch): Long = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return -1L
    java.util.Arrays.fill(sc.dcPred, 0)
    // per-decode table state reset: a stream that never (re)defines a table
    // it references must be rejected, not silently reuse the previous
    // image's tables on this thread (nondeterministic hash — review r5)
    java.util.Arrays.fill(sc.quantSet, false)
    var i = 0
    while (i < 2) { var j = 0; while (j < 4) { sc.huffSet(i)(j) = false; j += 1 }; i += 1 }
    var w = 0; var h = 0; var nComp = 0
    var restartInterval = 0
    var p = 2
    var sofSeen = false
    while (p + 4 <= bytes.length) {
      if ((bytes(p) & 0xFF) != 0xFF) return -1L
      val m = bytes(p + 1) & 0xFF
      if (m == 0xD8) { p += 2 } // stray SOI
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { p += 2 } // standalone
      else {
        val len = u16(bytes, p + 2)
        if (len < 2 || p + 2 + len > bytes.length) return -1L
        m match {
          case 0xC0 => // SOF0 baseline
            if (sofSeen) return -1L
            sofSeen = true
            if (len < 8) return -1L // segment must hold prec+dims+nComp
            val prec = bytes(p + 4) & 0xFF
            h = u16(bytes, p + 5); w = u16(bytes, p + 7)
            nComp = bytes(p + 9) & 0xFF
            if (prec != 8 || w <= 0 || h <= 0 || nComp < 1 || nComp > 4) return -1L
            if (len < 8 + 3 * nComp) return -1L // component specs must fit
            if (w.toLong * h > (Int.MaxValue >> 3)) return -1L
            var c = 0
            while (c < nComp) {
              val o = p + 10 + 3 * c
              sc.compH(c) = (bytes(o + 1) & 0xF0) >> 4
              sc.compV(c) = bytes(o + 1) & 0x0F
              sc.compQ(c) = bytes(o + 2) & 0xFF
              if (sc.compH(c) < 1 || sc.compH(c) > 4 || sc.compV(c) < 1 || sc.compV(c) > 4 ||
                  sc.compQ(c) > 3) return -1L
              c += 1
            }
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return -1L // progressive / extended / arithmetic: fall back
          case 0xC4 => // DHT — may hold several tables
            var q = p + 4
            val end = p + 2 + len
            while (q < end) {
              if (q + 17 > end) return -1L // count table must fit the segment
              val tc = (bytes(q) & 0xF0) >> 4
              val th = bytes(q) & 0x0F
              if (tc > 1 || th > 3) return -1L
              var total = 0
              var l = 1
              while (l <= 16) { total += bytes(q + l) & 0xFF; l += 1 }
              if (total > 256 || q + 17 + total > end) return -1L
              buildHuff(sc, tc, th, bytes, q)
              q += 17 + total
            }
          case 0xDB => // DQT — may hold several tables
            var q = p + 4
            val end = p + 2 + len
            while (q < end) {
              val pq = (bytes(q) & 0xF0) >> 4
              val tq = bytes(q) & 0x0F
              if (tq > 3) return -1L
              if (pq == 0) {
                if (q + 65 > end) return -1L
                var k = 0
                while (k < 64) { sc.quant(tq)(k) = bytes(q + 1 + k) & 0xFF; k += 1 }
                q += 65
              } else { // 16-bit entries
                if (q + 129 > end) return -1L
                var k = 0
                while (k < 64) { sc.quant(tq)(k) = u16(bytes, q + 1 + 2 * k); k += 1 }
                q += 129
              }
              sc.quantSet(tq) = true
            }
          case 0xDD =>
            if (len < 4) return -1L
            restartInterval = u16(bytes, p + 4)
          case 0xDA => // SOS — single interleaved baseline scan
            if (!sofSeen || len < 3) return -1L
            val ns = bytes(p + 4) & 0xFF
            if (ns != nComp) return -1L // non-interleaved multi-scan: fall back
            if (len < 3 + 2 * ns) return -1L // component selectors must fit
            // components appear in SOF order in the interleaved baseline
            // scans every JFIF writer emits; a reordered scan is outside
            // the fast-path subset (the MCU layout below assumes SOF order)
            var c = 0
            while (c < ns) {
              val o = p + 5 + 2 * c
              sc.compDcTab(c) = (bytes(o + 1) & 0xF0) >> 4
              sc.compAcTab(c) = bytes(o + 1) & 0x0F
              if (sc.compDcTab(c) > 3 || sc.compAcTab(c) > 3) return -1L
              c += 1
            }
            return decodeScan(bytes, p + 2 + len, sc, w, h, nComp, restartInterval)
          case 0xD9 => return -1L // EOI before SOS
          case _ => // APPn/COM/others: skip
        }
        p += 2 + len
      }
    }
    -1L
  }

  /** Build canonical Huffman decode tables (spec F.2.2.3) + 8-bit lookahead. */
  private def buildHuff(sc: Scratch, tc: Int, th: Int, b: Array[Byte], q: Int): Unit = {
    val maxc = sc.huffMax(tc)(th); val minc = sc.huffMin(tc)(th)
    val valp = sc.huffValPtr(tc)(th); val vals = sc.huffVals(tc)(th)
    val look = sc.huffLook(tc)(th)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      val count = b(q + l) & 0xFF
      valp(l) = k
      minc(l) = code
      var i = 0
      while (i < count) { vals(k) = b(q + 17 + k) & 0xFF; k += 1; code += 1; i += 1 }
      maxc(l) = code // exclusive
      code <<= 1
      l += 1
    }
    java.util.Arrays.fill(look, -1)
    // lookahead: for codes of length ≤ 8, fill all suffix-extended entries
    l = 1
    while (l <= 8) {
      var c = minc(l)
      while (c < maxc(l)) {
        val v = vals(valp(l) + (c - minc(l)))
        val base = (c << (8 - l)) & 0xFF
        var fill = 0
        while (fill < (1 << (8 - l))) {
          look(base | fill) = (l << 8) | v
          fill += 1
        }
        c += 1
      }
      l += 1
    }
    sc.huffSet(tc)(th) = true
  }

  // ---- entropy-coded scan ----

  @inline private def fillBits(sc: Scratch): Unit = {
    val b = sc.data
    while (sc.bitCnt <= 56 && sc.pos < b.length) {
      val v = b(sc.pos) & 0xFF
      if (v == 0xFF) {
        val nxt = if (sc.pos + 1 < b.length) b(sc.pos + 1) & 0xFF else 0xD9
        if (nxt == 0x00) { // stuffed
          sc.bitBuf = (sc.bitBuf << 8) | 0xFFL; sc.bitCnt += 8; sc.pos += 2
        } else return // marker: stop feeding; caller handles
      } else {
        sc.bitBuf = (sc.bitBuf << 8) | v.toLong; sc.bitCnt += 8; sc.pos += 1
      }
    }
  }

  @inline private def peek8(sc: Scratch): Int = {
    if (sc.bitCnt < 8) fillBits(sc)
    if (sc.bitCnt >= 8) ((sc.bitBuf >>> (sc.bitCnt - 8)) & 0xFF).toInt
    else ((sc.bitBuf << (8 - sc.bitCnt)) & 0xFF).toInt // zero-padded tail
  }

  @inline private def takeBits(sc: Scratch, n: Int): Int = {
    if (n == 0) return 0
    if (sc.bitCnt < n) fillBits(sc)
    if (sc.bitCnt < n) return Int.MinValue // truncated stream
    sc.bitCnt -= n
    ((sc.bitBuf >>> sc.bitCnt) & ((1L << n) - 1)).toInt
  }

  /** Decode one Huffman symbol, or -1 on error. */
  private def decodeSym(sc: Scratch, tc: Int, th: Int): Int = {
    val look = sc.huffLook(tc)(th)
    val lk = look(peek8(sc))
    if (lk >= 0) {
      val l = lk >> 8
      if (sc.bitCnt < l) fillBits(sc)
      if (sc.bitCnt < l) return -1
      sc.bitCnt -= l
      return lk & 0xFF
    }
    // slow path: lengths 9..16
    var code = takeBits(sc, 8)
    if (code == Int.MinValue) return -1
    var l = 8
    val maxc = sc.huffMax(tc)(th)
    while (l < 16) {
      val bit = takeBits(sc, 1)
      if (bit == Int.MinValue) return -1
      code = (code << 1) | bit
      l += 1
      if (code < maxc(l)) {
        val minc = sc.huffMin(tc)(th)
        return sc.huffVals(tc)(th)(sc.huffValPtr(tc)(th)(l) + (code - minc(l)))
      }
    }
    -1
  }

  /** JPEG EXTEND (spec F.2.2.1): map magnitude bits to signed value. */
  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def decodeScan(bytes: Array[Byte], scanStart: Int, sc: Scratch,
                         w: Int, h: Int, nComp: Int, restartInterval: Int): Long = {
    // single-component scans are NON-interleaved per ISO 10918-1 A.2.2:
    // one 8×8 data unit per MCU in raster order, sampling factors ignored
    // (a grayscale stream carrying H=V=2 — e.g. a luma-only transcode that
    // kept the source's factors — would otherwise desync and hash garbage;
    // review r5)
    if (nComp == 1) { sc.compH(0) = 1; sc.compV(0) = 1 }
    var hMax = 1; var vMax = 1
    var c = 0
    while (c < nComp) {
      if (sc.compH(c) > hMax) hMax = sc.compH(c)
      if (sc.compV(c) > vMax) vMax = sc.compV(c)
      if (!sc.huffSet(0)(sc.compDcTab(c)) || !sc.huffSet(1)(sc.compAcTab(c))) return -1L
      if (!sc.quantSet(sc.compQ(c))) return -1L
      c += 1
    }
    // luma must be component 0 with full resolution (JFIF YCbCr / grayscale)
    if (sc.compH(0) != hMax || sc.compV(0) != vMax) return -1L
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val yStrideV = mcusX * hMax * 8
    val yRows = mcusY * vMax * 8
    if (yStrideV.toLong * yRows > Int.MaxValue - 64) return -1L
    val yPlane = sc.yFor(yStrideV * yRows)
    sc.yStride = yStrideV

    sc.data = bytes
    sc.pos = scanStart
    sc.bitBuf = 0L
    sc.bitCnt = 0
    java.util.Arrays.fill(sc.dcPred, 0)

    val coef = sc.coef
    var mcu = 0
    val nMcus = mcusX * mcusY
    var sinceRestart = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        // align to byte, expect RSTn
        sc.bitCnt = 0; sc.bitBuf = 0
        val b = sc.data
        while (sc.pos + 1 < b.length && !((b(sc.pos) & 0xFF) == 0xFF && (b(sc.pos + 1) & 0xFF) >= 0xD0 && (b(sc.pos + 1) & 0xFF) <= 0xD7))
          sc.pos += 1
        if (sc.pos + 1 >= b.length) return -1L
        sc.pos += 2
        java.util.Arrays.fill(sc.dcPred, 0)
        sinceRestart = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      c = 0
      while (c < nComp) {
        val ch = sc.compH(c); val cv = sc.compV(c)
        var by = 0
        while (by < cv) {
          var bx = 0
          while (bx < ch) {
            // --- one block: DC + AC huffman ---
            val t = decodeSym(sc, 0, sc.compDcTab(c))
            if (t < 0 || t > 15) return -1L
            val diffBits = takeBits(sc, t)
            if (diffBits == Int.MinValue) return -1L
            sc.dcPred(c) += extend(diffBits, t)
            if (c == 0) { java.util.Arrays.fill(coef, 0); coef(0) = sc.dcPred(c) * sc.quant(sc.compQ(c))(0) }
            var k = 1
            var ok = true
            while (k < 64 && ok) {
              val rs = decodeSym(sc, 1, sc.compAcTab(c))
              if (rs < 0) return -1L
              val r = rs >> 4; val s = rs & 0xF
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else ok = false      // EOB
              } else {
                k += r
                if (k > 63) return -1L
                val vb = takeBits(sc, s)
                if (vb == Int.MinValue) return -1L
                if (c == 0) coef(zigzag(k)) = extend(vb, s) * sc.quant(sc.compQ(c))(k)
                k += 1
              }
            }
            if (c == 0) {
              // --- IDCT into the Y plane (separable two-pass) ---
              idct8x8(sc)
              val px0 = (my * vMax + by) * 8
              val px1 = (mx * hMax + bx) * 8
              val blk = sc.blk
              var yy = 0
              while (yy < 8) {
                val rowBase = (px0 + yy) * yStrideV + px1
                var xx = 0
                while (xx < 8) {
                  val v = blk(yy * 8 + xx) + 128.5 // level shift + round
                  val iv = if (v < 0) 0 else if (v > 255) 255 else v.toInt
                  yPlane(rowBase + xx) = iv.toByte
                  xx += 1
                }
                yy += 1
              }
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    (w.toLong << 32) | (h.toLong & 0xFFFFFFFFL)
  }

  /** In-place 8×8 IDCT: sc.coef (dequantized, natural order) → sc.blk. */
  private def idct8x8(sc: Scratch): Unit = {
    val coef = sc.coef; val tmp = sc.tmp; val blk = sc.blk
    // pass 1 (columns): tmp[y][v] = Σ_u idctTab(y,u) · coef[u][v]
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += idctTab(y * 8 + u) * coef(u * 8 + v); u += 1 }
        tmp(y * 8 + v) = s
        v += 1
      }
      y += 1
    }
    // pass 2 (rows): blk[y][x] = Σ_v tmp[y][v] · idctTab(x,v)
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(y * 8 + v) * idctTab(x * 8 + v); v += 1 }
        blk(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
  }

  /** Header sniff: true if the bytes start like a JPEG this class might
    * decode (full validation happens during decode). */
  def looksJpeg(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
}
