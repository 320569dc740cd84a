package graft.img

/**
 * Opaque multimodal columns (training-pipeline mandate): audio/video ride
 * in DataFrames as a `binary` column in the "GMV1" container plus typed
 * metadata, with frame-sampling and feature extraction as Catalyst
 * expressions so a 100 TB media corpus processes exactly like the text
 * and image corpora (narrow per-row ops, explode for per-frame fan-out,
 * the same pigeonhole/pHash dedup downstream on sampled frames).
 *
 * Codec status (r5): frames decode REAL JPEG/PNG payloads through
 * ImageIO (kind 2) and audio decodes REAL RIFF/WAV through
 * javax.sound.sampled (kind 3) — actual interchange containers, not
 * stubs; only inter-frame video compression (H.264-class) remains a
 * documented stub via the raw kinds 0/1, because bitstream codecs are
 * not in this sandbox. Everything AROUND the codec — schema, binary
 * layout, metadata struct, per-frame explode shape, feature windows,
 * oracle checks — is the real Spark-side plumbing a libavcodec-backed
 * decoder would slot into (signatures unchanged).
 *
 * Layout ("GMV1", all ints little-endian):
 *   magic  4B 'G''M''V''1'
 *   kind   1B: 0 = audio (raw PCM), 1 = video (raw RGB),
 *              2 = video (coded frames), 3 = audio (RIFF/WAV)
 *   video:   i32 w, i32 h, i32 fps, i32 nFrames, nFrames×(w·h·3) raw RGB
 *   video-2: i32 w, i32 h, i32 fps, i32 nFrames, nFrames×i32 payload
 *            lengths, then the concatenated ImageIO-decodable payloads
 *            (JPEG/PNG — r5: closes half the stub-codec distance with
 *            zero new dependencies; `frame` decodes through
 *            [[Images.decode]] and still returns raw RGB, so the whole
 *            downstream frame surface composes unchanged)
 *   audio:   i32 sampleRate, i32 nSamples, nSamples×2 s16 PCM
 *   audio-3: a complete RIFF/WAV file (PCM s16 mono) parsed through
 *            javax.sound.sampled (r5: the real interchange container for
 *            audio with zero new dependencies; `pcm`/`meta` route through
 *            AudioSystem, everything downstream composes unchanged)
 */
object Media {
  private val MAGIC = Array[Byte]('G', 'M', 'V', '1')

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  private def getInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
    ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def checkMagic(b: Array[Byte]): Unit = {
    require(b.length >= 5 && b(0) == 'G' && b(1) == 'M' && b(2) == 'V' && b(3) == '1',
      "not a GMV1 media container")
    // an unknown kind byte must fail HERE, loudly — a >= 1 branch test
    // would otherwise route kind 3 garbage into the coded-frame length
    // table parser (review r5)
    require(b(4) >= 0 && b(4) <= 3, s"unknown GMV1 kind ${b(4)}")
  }

  def encodeVideo(w: Int, h: Int, fps: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val fb = w * h * 3
    require(frames.forall(_.length == fb), s"every frame must be w*h*3 = $fb bytes")
    val out = new Array[Byte](21 + frames.length * fb)
    MAGIC.copyToArray(out); out(4) = 1
    putInt(out, 5, w); putInt(out, 9, h); putInt(out, 13, fps); putInt(out, 17, frames.length)
    var i = 0
    while (i < frames.length) { frames(i).copyToArray(out, 21 + i * fb); i += 1 }
    out
  }

  def encodeAudio(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](13 + samples.length * 2)
    MAGIC.copyToArray(out); out(4) = 0
    putInt(out, 5, sampleRate); putInt(out, 9, samples.length)
    var i = 0
    while (i < samples.length) {
      out(13 + 2 * i) = samples(i).toByte
      out(13 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  def kind(b: Array[Byte]): String = {
    checkMagic(b)
    if (b(4) == 1 || b(4) == 2) "video" else "audio"
  }

  /** Payload format: "raw"/"coded" (video kinds 1/2), "pcm"/"wav" (audio
    * kinds 0/3). */
  def fmt(b: Array[Byte]): String = {
    checkMagic(b)
    b(4) match { case 2 => "coded"; case 1 => "raw"; case 3 => "wav"; case _ => "pcm" }
  }

  /** (w, h, rate(fps|Hz), n(frames|samples), durationMs). Audio: w=h=0. */
  def meta(b: Array[Byte]): (Int, Int, Int, Int, Long) = {
    checkMagic(b)
    if (b(4) == 1 || b(4) == 2) {
      val w = getInt(b, 5); val h = getInt(b, 9); val fps = getInt(b, 13); val n = getInt(b, 17)
      (w, h, fps, n, if (fps == 0) 0L else n.toLong * 1000 / fps)
    } else if (b(4) == 3) {
      // header-only: frame length + rate without reading the data chunk
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(b, 5, b.length - 5))
      val rate = math.round(aff.getFormat.getSampleRate)
      val n = aff.getFrameLength
      (0, 0, rate, n, if (rate == 0) 0L else n.toLong * 1000 / rate)
    } else {
      val rate = getInt(b, 5); val n = getInt(b, 9)
      (0, 0, rate, n, if (rate == 0) 0L else n.toLong * 1000 / rate)
    }
  }

  /** WAV-coded audio (kind 3): the payload after the 5-byte GMV1 header is
    * a COMPLETE RIFF/WAV file (PCM s16 LE mono), parsed through
    * javax.sound.sampled — a real interchange codec, not the stub. */
  def encodeAudioWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val wav = new Array[Byte](44 + dataLen)
    def w4(off: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(wav, off)
    def wi(off: Int, v: Int): Unit = { wav(off) = v.toByte; wav(off + 1) = (v >>> 8).toByte
      wav(off + 2) = (v >>> 16).toByte; wav(off + 3) = (v >>> 24).toByte }
    def ws(off: Int, v: Int): Unit = { wav(off) = v.toByte; wav(off + 1) = (v >>> 8).toByte }
    w4(0, "RIFF"); wi(4, 36 + dataLen); w4(8, "WAVE")
    w4(12, "fmt "); wi(16, 16); ws(20, 1 /* PCM */); ws(22, 1 /* mono */)
    wi(24, sampleRate); wi(28, sampleRate * 2); ws(32, 2); ws(34, 16)
    w4(36, "data"); wi(40, dataLen)
    var i = 0
    while (i < samples.length) {
      wav(44 + 2 * i) = samples(i).toByte
      wav(44 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val out = new Array[Byte](5 + wav.length)
    MAGIC.copyToArray(out); out(4) = 3
    wav.copyToArray(out, 5)
    out
  }

  private def wavDecode(b: Array[Byte]): (Int, Array[Short]) = {
    val in = new java.io.ByteArrayInputStream(b, 5, b.length - 5)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"GMV1 wav payloads are PCM s16 LE mono, got $f")
      val bytes = ais.readAllBytes()
      (math.round(f.getSampleRate), s16le(bytes, 0, bytes.length / 2))
    } finally ais.close()
  }

  /** Encoded-frame video (kind 2): each payload is an ImageIO-decodable
    * image (JPEG/PNG) of exactly w×h — the container a real lossy codec
    * would write per keyframe. */
  def encodeVideoCoded(w: Int, h: Int, fps: Int, payloads: Array[Array[Byte]]): Array[Byte] = {
    val lenTab = payloads.length * 4
    val out = new Array[Byte](21 + lenTab + payloads.map(_.length).sum)
    MAGIC.copyToArray(out); out(4) = 2
    putInt(out, 5, w); putInt(out, 9, h); putInt(out, 13, fps); putInt(out, 17, payloads.length)
    var off = 21 + lenTab
    var i = 0
    while (i < payloads.length) {
      putInt(out, 21 + 4 * i, payloads(i).length)
      payloads(i).copyToArray(out, off)
      off += payloads(i).length
      i += 1
    }
    out
  }

  /** Frame i as a raw RGB buffer — plugs into img_gray_rgb / img_flip_rgb /
    * img_crop_rgb / img_resize / img_luma_mean unchanged. Coded frames
    * (kind 2) decode through ImageIO on the way out. */
  def frame(b: Array[Byte], i: Int): Array[Byte] = {
    checkMagic(b); require(b(4) == 1 || b(4) == 2, "media_frame expects video")
    val w = getInt(b, 5); val h = getInt(b, 9); val n = getInt(b, 17)
    require(i >= 0 && i < n, s"frame $i out of [0, $n)")
    if (b(4) == 1) {
      val fb = w * h * 3
      java.util.Arrays.copyOfRange(b, 21 + i * fb, 21 + (i + 1) * fb)
    } else {
      var off = 21 + 4 * n
      var j = 0
      while (j < i) { off += getInt(b, 21 + 4 * j); j += 1 }
      val payload = java.util.Arrays.copyOfRange(b, off, off + getInt(b, 21 + 4 * i))
      val (dw, dh, rgb) = Images.decode(payload)
      require(dw == w && dh == h, s"coded frame $i is $dw x $dh, header says $w x $h")
      rgb
    }
  }

  /** Every `step`-th frame (0, step, 2·step, …) — the decimation shape a
    * frame-dedup or captioning pipeline runs before per-frame work. */
  def sampleFrames(b: Array[Byte], step: Int): Array[Array[Byte]] = {
    checkMagic(b); require(b(4) == 1 || b(4) == 2, "media_frame_sample expects video")
    require(step > 0, "step must be positive")
    val n = getInt(b, 17)
    Array.range(0, n, step).map(frame(b, _))
  }

  /** s16 little-endian decode — the one copy of the byte-pair idiom. */
  private def s16le(b: Array[Byte], off: Int, n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (((b(off + 2 * i) & 0xFF)) | (b(off + 2 * i + 1) << 8)).toShort)

  /** PCM samples of an audio container (raw kind 0 or WAV kind 3). */
  def pcm(b: Array[Byte]): Array[Short] = {
    checkMagic(b); require(b(4) == 0 || b(4) == 3, "expects audio")
    if (b(4) == 3) wavDecode(b)._2
    else s16le(b, 13, getInt(b, 9))
  }

  /** RMS per non-overlapping `win`-sample window (trailing partial window
    * dropped) — the feature-extraction shape for audio quality filters. */
  def audioRmsWindows(b: Array[Byte], win: Int): Array[Double] =
    audioRmsOf(pcm(b), win)

  def audioRmsOf(s: Array[Short], win: Int): Array[Double] = {
    require(win > 0, "window must be positive")
    val nw = s.length / win
    Array.tabulate(nw) { w =>
      var acc = 0.0
      var i = w * win
      val end = i + win
      while (i < end) { val v = s(i).toDouble; acc += v * v; i += 1 }
      math.sqrt(acc / win)
    }
  }

  // ---- deterministic synthesis (fixture generation) ----

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic synthetic frames: pixel bytes from a splitmix of
    * (seed, frame, pixel) — stable across JVMs and runs. The per-frame
    * base is itself mixed so frames are never byte-shifted copies of
    * their neighbors (a linear `f·const + i` index would alias whenever
    * the frame byte count exceeds the stride — review r4). */
  def synthFrames(seed: Long, w: Int, h: Int, nFrames: Int): Array[Array[Byte]] =
    Array.tabulate(nFrames) { f =>
      val base = mix(seed * 1000003 + f)
      val buf = new Array[Byte](w * h * 3)
      var i = 0
      while (i < buf.length) {
        buf(i) = (mix(base + i) & 0xFF).toByte
        i += 1
      }
      buf
    }

  def synthVideo(seed: Long, w: Int, h: Int, fps: Int, nFrames: Int): Array[Byte] =
    encodeVideo(w, h, fps, synthFrames(seed, w, h, nFrames))

  /** Deterministic synthetic PCM: bounded s16 from the same mix. */
  def synthSamples(seed: Long, nSamples: Int): Array[Short] =
    Array.tabulate(nSamples)(i => (mix(seed * 7919 + i) % 8192).toShort)

  def synthAudio(seed: Long, rate: Int, nSamples: Int): Array[Byte] =
    encodeAudio(rate, synthSamples(seed, nSamples))
}
