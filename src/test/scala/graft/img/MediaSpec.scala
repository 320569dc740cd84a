package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** GMV1 opaque-binary media containers: codec round-trips, frame
  * sampling, windowed audio features, and composition with the RGB image
  * surface (sampled frames ARE raw RGB buffers). */
class MediaSpec extends AnyFunSuite {

  test("video round-trip: meta, frame extraction, sampling") {
    val frames = Media.synthFrames(seed = 7, w = 4, h = 3, nFrames = 10)
    val b = Media.encodeVideo(4, 3, 5, frames)
    assert(Media.kind(b) == "video")
    assert(Media.meta(b) == ((4, 3, 5, 10, 2000L))) // 10 frames @ 5 fps = 2 s
    (0 until 10).foreach { i =>
      assert(Media.frame(b, i).toSeq == frames(i).toSeq, s"frame $i")
    }
    val sampled = Media.sampleFrames(b, 3) // 0, 3, 6, 9
    assert(sampled.length == 4)
    assert(sampled(1).toSeq == frames(3).toSeq)
    intercept[IllegalArgumentException](Media.frame(b, 10))
    intercept[IllegalArgumentException](Media.frame(b, -1))
  }

  test("audio round-trip: meta, pcm, RMS windows; pre-encode parity") {
    val samples = Media.synthSamples(seed = 11, nSamples = 2500)
    val b = Media.encodeAudio(8000, samples)
    assert(Media.kind(b) == "audio")
    assert(Media.meta(b) == ((0, 0, 8000, 2500, 312L)))
    assert(Media.pcm(b).toSeq == samples.toSeq) // incl. negative samples
    // decode-then-window ≡ window-the-raw-samples (the oracle contract)
    assert(Media.audioRmsWindows(b, 800).toSeq == Media.audioRmsOf(samples, 800).toSeq)
    assert(Media.audioRmsWindows(b, 800).length == 3) // trailing 100 dropped
    // constant signal → RMS is exactly the amplitude
    val const = Media.encodeAudio(8000, Array.fill[Short](1600)(100))
    assert(Media.audioRmsWindows(const, 800).toSeq == Seq(100.0, 100.0))
  }

  test("sampled frames compose with the RGB image surface") {
    val frames = Media.synthFrames(seed = 3, w = 8, h = 6, nFrames = 6)
    val b = Media.encodeVideo(8, 6, 10, frames)
    val f0 = Media.frame(b, 0)
    // luma on a decoded frame equals luma on the source frame
    assert(Images.lumaMean(f0) == Images.lumaMean(frames(0)))
    // gray is idempotent on the frame; flip is an involution
    val g = Images.grayRgb(f0)
    assert(Images.grayRgb(g).toSeq == g.toSeq)
    assert(Images.flipRgb(8, 6, Images.flipRgb(8, 6, f0, true), true).toSeq == f0.toSeq)
  }

  test("planted intro frames are NEAR duplicates: hamming<=10, not all exact") {
    import graft.data.GeoTables
    // the fixture's frame-0 phash, for the planted cluster (i%10==0)
    val planted = (0L until 200L by 10).map(i => GeoTables.mediaRow(i).exp_f0_phash)
    val others = (2L until 200L by 2).filter(_ % 10 != 0).take(20)
      .map(i => GeoTables.mediaRow(i).exp_f0_phash)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val pairHams = for (i <- planted.indices; j <- i + 1 until planted.length)
      yield ham(planted(i), planted(j))
    assert(pairHams.forall(_ <= 10), s"max planted hamming ${pairHams.max}")
    assert(pairHams.exists(_ > 0), "watermark noise should perturb some phash bits")
    // unplanted first frames are far from the intro cluster
    val cross = for (p <- planted; o <- others) yield ham(p, o)
    assert(cross.forall(_ > 10), s"min cross hamming ${cross.min}")

    // 256-bit separation: wider hash widens the planted/stranger margin
    // (measured 2.2× → 2.9×). q69 runs at threshold 16 (15-bit chunks —
    // the candidate-linear operating point, PigeonholeScaleSpec); the
    // margin pinned here (planted ≤ 48, strangers > 96) is what lets a
    // user raise h toward ~24 for looser matching without losing the
    // ≥9-bit chunk class.
    def ph256(i: Long): Array[Long] = {
      val f0 = Media.frame(GeoTables.mediaRow(i).bytes, 0)
      Images.phash256OfRgb(16, 12, f0)
    }
    def ham4(a: Array[Long], b: Array[Long]) =
      (0 until 4).map(k => java.lang.Long.bitCount(a(k) ^ b(k))).sum
    val p2 = (0L until 200L by 10).map(ph256)
    val o2 = (2L until 200L by 2).filter(_ % 10 != 0).take(20).map(ph256)
    val ph2 = for (i <- p2.indices; j <- i + 1 until p2.length) yield ham4(p2(i), p2(j))
    val cr2 = for (p <- p2; o <- o2) yield ham4(p, o)
    assert(ph2.max <= 48, s"planted 256-bit max ${ph2.max} exceeds the documented margin")
    assert(cr2.min > 96, s"cross 256-bit min ${cr2.min}")
    val ratio64 = cross.min.toDouble / pairHams.max
    val ratio256 = cr2.min.toDouble / ph2.max
    assert(ratio256 > ratio64, s"256-bit margin $ratio256 must beat 64-bit $ratio64")
  }

  test("JPEG-coded videos decode back to RGB at PSNR≥40dB (r5)") {
    val w = 16; val h = 12
    val frames = Array.tabulate(6)(f => Images.synthRgb(777L * 1009 + f, w, h))
    val payloads = frames.map(Images.encode(w, h, _, "jpg", 0.995f))
    val v = Media.encodeVideoCoded(w, h, 10, payloads)
    assert(Media.kind(v) == "video" && Media.fmt(v) == "coded")
    val (mw, mh, fps, n, dur) = Media.meta(v)
    assert(mw == w && mh == h && fps == 10 && n == 6 && dur == 600L)
    frames.indices.foreach { i =>
      val dec = Media.frame(v, i)
      assert(dec.length == w * h * 3)
      val p = Images.psnr(frames(i), dec)
      assert(p >= 40.0, s"frame $i PSNR $p below the lossy invariant")
      assert(p < 99.0, "JPEG must actually be lossy here, else the test is vacuous")
    }
    assert(Media.sampleFrames(v, 3).length == 2)
    // fixture: every i%10==4 video is JPEG-coded, exp columns from the
    // reference decode (what q88 matches), and the q63/q64 pipelines keep
    // treating it as kind 'video'
    val row = graft.data.GeoTables.mediaRow(4)
    assert(row.kind == "video" && row.fmt == "jpeg" && Media.fmt(row.bytes) == "coded")
    val p0 = Images.psnr(Images.synthRgb(4L * 1009, 16, 12), Media.frame(row.bytes, 0))
    assert(p0 >= 40.0, s"fixture frame PSNR $p0")
  }

  test("WAV-coded audio decodes through javax.sound.sampled losslessly (r5)") {
    val samples = Media.synthSamples(seed = 21, nSamples = 2500)
    val b = Media.encodeAudioWav(8000, samples)
    assert(Media.kind(b) == "audio" && Media.fmt(b) == "wav")
    assert(Media.meta(b) == ((0, 0, 8000, 2500, 312L)))
    assert(Media.pcm(b).toSeq == samples.toSeq) // RIFF round-trip is exact
    assert(Media.audioRmsWindows(b, 800).toSeq == Media.audioRmsOf(samples, 800).toSeq)
    // the payload after the GMV1 header is a plain standalone WAV file
    val wav = b.drop(5)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
           new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 8000f); ais.close()
    // fixture: every i%10==7 audio row is WAV-coded with identical expecteds
    val row = graft.data.GeoTables.mediaRow(7)
    assert(row.kind == "audio" && row.fmt == "wav" && Media.fmt(row.bytes) == "wav")
    val rawRow = graft.data.GeoTables.mediaRow(9)
    assert(rawRow.fmt == "pcm")
    // WAV is audio: the frame surface must reject it LOUDLY, not parse
    // 'WAVE' bytes as a frame count (review r5 #2)
    intercept[IllegalArgumentException](Media.frame(b, 0))
    intercept[IllegalArgumentException](Media.sampleFrames(b, 3))
  }

  test("delta codec (kind 4): lossless frame-exact round-trip, both content classes") {
    for ((mk, w, h, n) <- Seq(("smooth", 32, 24, 12), ("noise", 16, 12, 8), ("tiny", 1, 1, 3))) {
      val frames = if (mk == "noise") Media.synthFrames(11L, w, h, n)
                   else Media.synthSmoothFrames(11L + w, w, h, n)
      val d = Media.encodeVideoDelta(w, h, 5, frames)
      assert(Media.kind(d) == "video" && Media.fmt(d) == "delta")
      assert(Media.meta(d) == ((w, h, 5, n, n.toLong * 1000 / 5)))
      // random access: every frame reconstructs bit-exactly
      (0 until n).foreach { i =>
        assert(java.util.Arrays.equals(Media.frame(d, i), frames(i)), s"$mk frame $i")
      }
      // one-pass sampling matches per-frame access
      val s2 = Media.sampleFrames(d, 2)
      assert(s2.length == (n + 1) / 2)
      s2.zipWithIndex.foreach { case (f, k) =>
        assert(java.util.Arrays.equals(f, frames(2 * k)), s"$mk sampled $k")
      }
    }
  }

  test("delta codec compresses temporally coherent video; raw-vs-delta surface parity") {
    val w = 48; val h = 36; val n = 16
    val frames = Media.synthSmoothFrames(42L, w, h, n)
    val raw = Media.encodeVideo(w, h, 8, frames)
    val d = Media.encodeVideoDelta(w, h, 8, frames)
    // inter-frame coding must actually compress this content class:
    // only the moving block's old+new rows change per frame
    val ratio = d.length.toDouble / raw.length
    assert(ratio < 0.35, f"delta/raw = $ratio%.3f — inter-frame coding not compressing")
    // and the per-frame surface is indistinguishable from the raw kind
    (0 until n by 3).foreach { i =>
      assert(Images.phashOfRgb(w, h, Media.frame(d, i)) ==
             Images.phashOfRgb(w, h, Media.frame(raw, i)))
    }
    // adversarial content (iid noise) stays within RLE's worst-case bound
    val noisy = Media.synthFrames(9L, w, h, n)
    val dn = Media.encodeVideoDelta(w, h, 8, noisy)
    val rn = Media.encodeVideo(w, h, 8, noisy)
    assert(dn.length <= rn.length * 1.01 + 64, s"worst case blew up: ${dn.length} vs ${rn.length}")
  }

  test("malformed kind-4 payloads fail loudly, never splice frames (review r5)") {
    val frames = Media.synthSmoothFrames(5L, 16, 12, 4)
    val good = Media.encodeVideoDelta(16, 12, 5, frames)
    // corrupt frame 0's declared length to 3 while leaving a literal token
    // that claims the whole frame — decode must reject the crossing read,
    // not copy bytes from frame 1's payload region
    val bad = good.clone()
    bad(21) = 3; bad(22) = 0; bad(23) = 0; bad(24) = 0 // len[0] = 3 (LE)
    intercept[IllegalArgumentException](Media.frame(bad, 0))
    // truncated length table
    val short = java.util.Arrays.copyOf(good, 22)
    intercept[IllegalArgumentException](Media.frame(short, 0))
    // zero-frame delta container: sampleFrames returns empty like kinds 1/2
    val empty = Media.encodeVideoDelta(16, 12, 5, Array.empty)
    assert(Media.sampleFrames(empty, 2).isEmpty)
    intercept[IllegalArgumentException](Media.frame(empty, 0))
  }

  test("malformed containers fail loudly") {
    intercept[IllegalArgumentException](Media.kind(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Media.kind("XXXX?".getBytes))
    // an unknown kind byte fails at the header, not inside a frame parser
    val badKind = "GMV1".getBytes :+ 5.toByte
    intercept[IllegalArgumentException](Media.kind(badKind))
    intercept[IllegalArgumentException](Media.frame(badKind :+ 0.toByte, 0))
    val audio = Media.synthAudio(1, 8000, 100)
    intercept[IllegalArgumentException](Media.frame(audio, 0))
    intercept[IllegalArgumentException](Media.sampleFrames(audio, 2))
    val video = Media.synthVideo(1, 4, 4, 10, 2)
    intercept[IllegalArgumentException](Media.audioRmsWindows(video, 100))
    intercept[IllegalArgumentException](Media.sampleFrames(video, 0))
  }
}
