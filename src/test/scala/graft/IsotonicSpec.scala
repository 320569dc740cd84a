package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q305's relational isotonic fit: the minimax identity
  * fitted(i) = max_{j≤i} min_{k≥i} rate(j..k) over ppm-quantized
  * interval rates equals the classic sequential pool-adjacent-violators
  * fit (computed here in exact rational arithmetic) ppm-floored —
  * floor is monotone, so it commutes with the max/min lattice. */
class IsotonicSpec extends AnyFunSuite {

  private def ppm(np: Long, nn: Long): Long =
    (BigInt(np) * 1000000 / BigInt(nn)).toLong

  /** Sequential PAV with exact rational pooling: returns the fitted
    * block rate (np, nn) per input bin. */
  private def pav(bins: Seq[(Long, Long)]): Seq[Long] = {
    // stack of (np, nn, count-of-bins-pooled)
    var st = List.empty[(Long, Long, Int)]
    bins.foreach { case (np, nn) =>
      var top = (np, nn, 1)
      while (st.nonEmpty &&
        BigInt(st.head._1) * top._2 > BigInt(top._1) * st.head._2) {
        top = (st.head._1 + top._1, st.head._2 + top._2, st.head._3 + top._3)
        st = st.tail
      }
      st = top :: st
    }
    st.reverse.flatMap { case (np, nn, c) => Seq.fill(c)(ppm(np, nn)) }
  }

  /** The engine's shape: max_{j≤i} min_{k≥i} of quantized interval
    * rates from exact cumulative sums. */
  private def minimax(bins: Seq[(Long, Long)]): Seq[Long] = {
    val b = bins.size
    val cp = bins.scanLeft(0L)(_ + _._1)
    val cn = bins.scanLeft(0L)(_ + _._2)
    (1 to b).map { i =>
      (1 to i).map { j =>
        (i to b).map(k => ppm(cp(k) - cp(j - 1), cn(k) - cn(j - 1))).min
      }.max
    }
  }

  test("hand case: a decreasing pair pools to the shared rate") {
    // rates 3/4 then 1/4 violate; PAV pools to 4/8 = 0.5 for both
    val bins = Seq((3L, 4L), (1L, 4L))
    assert(pav(bins) == Seq(500000L, 500000L))
    assert(minimax(bins) == pav(bins))
  }

  test("already isotonic input is untouched") {
    val bins = Seq((0L, 5L), (2L, 6L), (3L, 4L), (7L, 7L))
    assert(pav(bins) == bins.map { case (np, nn) => ppm(np, nn) })
    assert(minimax(bins) == pav(bins))
  }

  test("minimax == PAV ppm on 300 random bin tables") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 300) {
      val b = 1 + rnd.nextInt(12)
      val bins = Seq.fill(b) {
        val nn = 1L + rnd.nextInt(50)
        val np = rnd.nextLong(nn + 1)
        (np, nn)
      }
      assert(minimax(bins) == pav(bins), s"bins $bins")
    }
  }

  test("fit is non-decreasing and mass-preserving per pooled block") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val bins = Seq.fill(1 + rnd.nextInt(10)) {
        val nn = 1L + rnd.nextInt(30)
        (rnd.nextLong(nn + 1), nn)
      }
      val f = minimax(bins)
      assert(f == f.sorted)
    }
  }
}
