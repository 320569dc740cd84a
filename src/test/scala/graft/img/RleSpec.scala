package graft.img

import graft.sql.K
import org.scalatest.funsuite.AnyFunSuite

/** K.maskRle vs an independent bit-list reference, the COCO invariants
  * (background-first, leading zero iff bit 0 set, no other zero runs,
  * counts sum to nBits), and an exact decode round-trip. */
class RleSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260819)

  private def bits(mask: Array[Byte], n: Int): Seq[Boolean] =
    (0 until n).map(i => ((mask(i >> 3) >> (i & 7)) & 1) == 1)

  /** Independent reference: group the materialized bit list. */
  private def reference(mask: Array[Byte], n: Int): Seq[Long] = {
    val bs = bits(mask, n)
    val groups = bs.foldLeft(List.empty[(Boolean, Long)]) {
      case ((b, c) :: tail, x) if b == x => (b, c + 1) :: tail
      case (acc, x) => (x, 1L) :: acc
    }.reverse
    val withLead = if (groups.nonEmpty && groups.head._1) (false, 0L) :: groups else groups
    withLead.map(_._2)
  }

  private def decode(rle: Array[Long]): Seq[Boolean] =
    rle.zipWithIndex.flatMap { case (c, k) => Seq.fill(c.toInt)(k % 2 == 1) }.toSeq

  test("maskRle equals the reference and round-trips on 200 random masks") {
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val mask = new Array[Byte]((n + 7) / 8)
      rnd.nextBytes(mask)
      val rle = K.maskRle(mask, n)
      assert(rle.toSeq == reference(mask, n))
      assert(rle.sum == n, "counts sum to nBits")
      assert(decode(rle) == bits(mask, n), "round-trip")
      // COCO invariants: only the leading count may be zero
      assert(rle.tail.forall(_ > 0), "no interior/trailing zero runs")
    }
  }

  test("closed-form edges: empty, full, single leading bit") {
    val empty = new Array[Byte](32)
    assert(K.maskRle(empty, 256).toSeq == Seq(256L))
    val full = Array.fill[Byte](32)(0xFF.toByte)
    assert(K.maskRle(full, 256).toSeq == Seq(0L, 256L))
    val one = new Array[Byte](32); one(0) = 1
    assert(K.maskRle(one, 256).toSeq == Seq(0L, 1L, 255L))
  }

  test("nBits out of range aborts loudly") {
    intercept[IllegalArgumentException](K.maskRle(new Array[Byte](2), 17))
    intercept[IllegalArgumentException](K.maskRle(new Array[Byte](2), 0))
  }
}
