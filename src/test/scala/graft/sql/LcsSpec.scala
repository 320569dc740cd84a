package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Independent pins for the q293 LCS kernel: a textbook BRANCH-form
  * full-table DP (the kernel runs the GREATEST-composition form — the
  * equivalence is exactly what these cases certify), closed forms, and
  * seeded fuzz over small alphabets (dense tie structure). */
class LcsSpec extends AnyFunSuite {

  private def ref(a: Array[String], b: Array[String]): Long = {
    val n = a.length; val m = b.length
    val d = Array.ofDim[Long](n + 1, m + 1)
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) =
        if (a(i - 1) == b(j - 1)) d(i - 1)(j - 1) + 1
        else math.max(d(i - 1)(j), d(i)(j - 1))
    d(n)(m)
  }

  private def k(a: Array[String], b: Array[String]): Long =
    K.seqLcs(a.toArray[AnyRef], b.toArray[AnyRef])

  test("closed forms") {
    assert(k(Array("a", "b", "c"), Array("a", "b", "c")) == 3L)
    assert(k(Array("a", "b", "c"), Array("x", "y")) == 0L)
    assert(k(Array("a", "x", "b", "y", "c"), Array("a", "b", "c")) == 3L)
    assert(k(Array.empty[String], Array("a")) == 0L)
    // classic crossing case: only one of the two orders can survive
    assert(k(Array("a", "b"), Array("b", "a")) == 1L)
  }

  test("seeded fuzz vs the textbook branch form, dense ties") {
    val rnd = new scala.util.Random(99)
    val alpha = Array("t0", "t1", "t2")
    (1 to 300).foreach { _ =>
      val a = Array.fill(1 + rnd.nextInt(15))(alpha(rnd.nextInt(3)))
      val b = Array.fill(1 + rnd.nextInt(15))(alpha(rnd.nextInt(3)))
      assert(k(a, b) == ref(a, b))
      assert(k(a, b) == k(b, a))
    }
  }

  test("spine-scale series against the reference") {
    val rnd = new scala.util.Random(5)
    val alpha = (0 until 40).map(i => s"w$i").toArray
    val a = Array.fill(99)(alpha(rnd.nextInt(40)))
    val b = Array.fill(99)(alpha(rnd.nextInt(40)))
    assert(k(a, b) == ref(a, b))
  }
}
