package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Media.audioZcrOf vs an independent sliding-pair reference, closed
  * forms (alternating signal, constant signal, square wave), the RMS
  * window-framing parity, and the codec round-trip (PCM + WAV). */
class ZcrSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260819)

  private def reference(s: Array[Short], win: Int): Seq[Long] =
    (0 until s.length / win).map { w =>
      s.slice(w * win, w * win + win).sliding(2)
        .count(p => (p(0) < 0) != (p(1) < 0)).toLong
    }

  test("matches the reference on 100 random buffers; framing == RMS framing") {
    (0 until 100).foreach { _ =>
      val n = 1 + rnd.nextInt(4000)
      val win = 1 + rnd.nextInt(900)
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val got = Media.audioZcrOf(s, win)
      assert(got.toSeq == reference(s, win))
      assert(got.length == Media.audioRmsOf(s, win).length, "same window framing")
    }
  }

  test("closed forms: alternating, constant, square wave") {
    val alt = Array.tabulate(1600)(i => if (i % 2 == 0) 100 else -100).map(_.toShort)
    assert(Media.audioZcrOf(alt, 800).toSeq == Seq(799L, 799L))
    val const = Array.fill(1600)(42.toShort)
    assert(Media.audioZcrOf(const, 800).toSeq == Seq(0L, 0L))
    // period-80 square wave: a crossing every 40 samples, none at window start
    val sq = Array.tabulate(800)(i => if ((i / 40) % 2 == 0) 1000 else -1000).map(_.toShort)
    assert(Media.audioZcrOf(sq, 800).toSeq == Seq(19L))
    // zero is NON-negative: a 0/-1 alternation crosses, a 0/1 one does not
    assert(Media.audioZcrOf(Array[Short](0, -1, 0, -1), 4).toSeq == Seq(3L))
    assert(Media.audioZcrOf(Array[Short](0, 1, 0, 1), 4).toSeq == Seq(0L))
  }

  test("codec round-trip: ZCR through GMV1 PCM and WAV equals the raw samples") {
    val s = Media.synthSamples(7L, 3000)
    val direct = Media.audioZcrOf(s, 800).toSeq
    assert(Media.audioZcrWindows(Media.encodeAudio(8000, s), 800).toSeq == direct)
    assert(Media.audioZcrWindows(Media.encodeAudioWav(8000, s), 800).toSeq == direct)
  }

  test("bad window aborts loudly") {
    intercept[IllegalArgumentException](Media.audioZcrOf(Array[Short](1, 2), 0))
  }
}
