package graft.img

import org.scalatest.funsuite.AnyFunSuite

/** Images.equalizeRgb vs an INDEPENDENT reference (sorted-rank
  * formulation) plus closed forms: two-level stretch, constant-channel
  * identity, per-channel monotonicity, pixel conservation. */
class EqualizeSpec extends AnyFunSuite {

  /** Reference: for channel value v, rank = #pixels ≤ v (via a sorted
    * copy), rankMin = #pixels ≤ the smallest value; out =
    * (rank − rankMin)·255 / (n − rankMin) — same definition, different
    * machinery (search over a sorted array instead of a cdf table). */
  private def reference(rgb: Array[Byte]): Array[Byte] = {
    val n = rgb.length / 3
    val out = new Array[Byte](rgb.length)
    (0 until 3).foreach { c =>
      val vals = (0 until n).map(i => rgb(i * 3 + c) & 0xFF).sorted.toArray
      val lo = vals.head
      val rankMin = vals.count(_ == lo).toLong
      def rank(v: Int): Long = {
        // upper bound: count of elements ≤ v
        var i = 0L; var j = vals.length.toLong
        while (i < j) { val m = (i + j) / 2
          if (vals(m.toInt) <= v) i = m + 1 else j = m }
        i
      }
      (0 until n).foreach { i =>
        val v = rgb(i * 3 + c) & 0xFF
        val o = if (vals.head == vals.last) v
          else ((rank(v) - rankMin) * 255L / (n - rankMin)).toInt
        out(i * 3 + c) = o.toByte
      }
    }
    out
  }

  var state = 0x5EEDL
  private def next(): Long = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
  }

  test("matches the sorted-rank reference on random images") {
    (0 until 50).foreach { _ =>
      val n = 1 + (next() & 0x3FF).toInt
      val rgb = Array.fill(n * 3)(((next() >>> 17) & 0xFF).toByte)
      val got = Images.equalizeRgb(rgb)
      val want = reference(rgb)
      assert(java.util.Arrays.equals(got, want), s"n=$n")
    }
  }

  test("two-level image stretches to full range; constant channel is identity") {
    val half = Array.tabulate(100 * 3) { i =>
      val px = i / 3
      if (i % 3 == 2) 77.toByte // constant blue channel
      else if (px < 50) 60.toByte else 180.toByte
    }
    val eq = Images.equalizeRgb(half)
    (0 until 100).foreach { px =>
      val r = eq(px * 3) & 0xFF
      assert(r == (if (px < 50) 0 else 255), s"px $px r=$r")
      assert((eq(px * 3 + 2) & 0xFF) == 77) // constant channel untouched
    }
  }

  test("per-channel mapping is monotone and conserves pixel multiplicity") {
    (0 until 20).foreach { _ =>
      val n = 64 + (next() & 0xFF).toInt
      val rgb = Array.fill(n * 3)(((next() >>> 23) & 0xFF).toByte)
      val eq = Images.equalizeRgb(rgb)
      (0 until 3).foreach { c =>
        val pairs = (0 until n).map(i => (rgb(i * 3 + c) & 0xFF, eq(i * 3 + c) & 0xFF))
        // equal inputs map to equal outputs; ordered inputs stay ordered
        pairs.groupBy(_._1).foreach { case (_, g) => assert(g.map(_._2).distinct.size == 1) }
        val m = pairs.toMap
        m.keys.toSeq.sorted.sliding(2).foreach {
          case Seq(a, b) => assert(m(a) <= m(b), s"monotone $a->$b")
          case _ =>
        }
      }
      assert(eq.length == rgb.length)
    }
  }

  test("equalization never lowers the 16-bin Gini-Simpson tonal diversity on spread inputs") {
    // a deliberately squeezed exposure (all luma in two adjacent bins)
    val n = 600
    val rgb = Array.tabulate(n * 3) { i =>
      val px = i / 3
      (90 + (px % 24)).toByte // luma confined to ~[90, 114)
    }
    def simpson(h: Array[Long]): Double = {
      val tot = h.sum.toDouble
      1.0 - h.map(v => (v / tot) * (v / tot)).sum
    }
    val before = simpson(Images.lumaHist16(rgb))
    val after = simpson(Images.lumaHist16(Images.equalizeRgb(rgb)))
    assert(after > before + 0.3, s"before $before after $after")
  }
}
