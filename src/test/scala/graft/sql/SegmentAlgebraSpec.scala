package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SketchOps: the bitmap-container pair algebra must equal brute-force
  * Set operations (including ids spanning multiple hi-containers and
  * pairs with empty intersection), and the HLL register pipeline must
  * replay a bit-faithful Scala reference (register split, smear
  * leading-zero rank, integer Z, estimator) while landing within the
  * canonical ~13% error envelope at m=64. Both checked partition-
  * invariant (the mergeability contract). */
class SegmentAlgebraSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def xs64(seed: Long): Long = {
    var x = seed ^ 0x9E3779B97F4A7C15L
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    x
  }

  test("bitmapPairs == brute-force set algebra across hi-containers") {
    val s = spark
    import s.implicits._
    // three segments over ids up to ~300k (≥5 hi-containers), one pair disjoint
    val a = (0 until 4000).map(i => math.abs(xs64(i)) % 300000L).distinct
    val b = (0 until 4000).map(i => math.abs(xs64(i + 50000)) % 300000L).distinct
    val c = Seq(299999L, 7L) // tiny, disjoint from nothing guaranteed — force via offset
    val d = Seq(1000001L, 1000002L) // beyond every a/b id: guaranteed-empty intersections
    val rows = a.map(("segA", _)) ++ b.map(("segB", _)) ++ c.map(("segC", _)) ++ d.map(("segD", _))
    val df = rows.toDF("seg", "id").repartition(7)
    val got = SketchOps.bitmapPairs(df, "seg", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val sets = Map("segA" -> a.toSet, "segB" -> b.toSet, "segC" -> c.toSet, "segD" -> d.toSet)
    val names = sets.keys.toSeq.sorted
    val expectPairs = for (i <- names.indices; j <- i + 1 until names.length) yield (names(i), names(j))
    assert(got.keySet == expectPairs.toSet)
    for ((ta, tb) <- expectPairs) {
      val (sa, sb) = (sets(ta), sets(tb))
      val inter = (sa & sb).size.toLong
      val union = (sa | sb).size.toLong
      val want = (sa.size.toLong, sb.size.toLong, inter, union, inter * 1000000L / union)
      assert(got((ta, tb)) == want, s"pair $ta/$tb")
    }
  }

  test("bitmapPairs is partition-invariant") {
    val s = spark
    import s.implicits._
    val rows = (0 until 3000).map(i => (s"s${i % 3}", math.abs(xs64(i)) % 100000L))
    def run(parts: Int) = SketchOps.bitmapPairs(
      rows.toDF("seg", "id").repartition(parts), "seg", "id")
      .orderBy("ta", "tb").collect().map(_.toSeq).toSeq
    assert(run(1) == run(11))
  }

  /** Scala reference of the register pipeline over 60-bit hashes. */
  private def hllRef(hashes: Seq[Long]): (Long, Long, Long, Long, Long, Long) = {
    val regs = new Array[Long](64)
    for (hv <- hashes) {
      val reg = (hv / 18014398509481984L).toInt
      var sm = hv % 18014398509481984L
      sm |= sm >> 1; sm |= sm >> 2; sm |= sm >> 4
      sm |= sm >> 8; sm |= sm >> 16; sm |= sm >> 32
      val rho = 55L - java.lang.Long.bitCount(sm)
      if (rho > regs(reg)) regs(reg) = rho
    }
    val nNonzero = regs.count(_ > 0L).toLong
    val z = regs.map(r => 1L << (55 - r)).sum
    val est = math.floor(((0.709d * 4096.0d) * 36028797018963968.0d) / z.toDouble).toLong
    (nNonzero, 64 - nNonzero, regs.max, regs.filter(_ > 0).sum, z, est)
  }

  test("hll64 == Scala register reference, estimate within 2σ at m=64") {
    val s = spark
    GraftFunctions.install(s)
    import s.implicits._
    val n = 20000
    val keys = (0 until n).map(i => s"user-$i")
    val hashes = keys.map(k => graft.text.Text.md5Sig60(k.getBytes("UTF-8")))
    val df = keys.map(("g", _)).toDF("grp0", "k").repartition(9)
      .select(col("grp0"), call_function("md5_sig60", col("k")).as("hv"))
    val row = SketchOps.hll64(df, "grp0", "hv").head
    val want = hllRef(hashes)
    val got = (row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6))
    assert(got == want)
    // canonical HLL error 1.04/√64 = 13%; 2σ envelope on a fixed seed corpus
    assert(math.abs(got._6 - n.toDouble) / n < 0.26, s"est=${got._6}")
  }

  test("hll_registers aggregate == relational hll64 registers (and partition-invariant)") {
    val s = spark
    GraftFunctions.install(s)
    import s.implicits._
    val hashes = (0 until 8000).map(i => graft.text.Text.md5Sig60(s"u$i".getBytes("UTF-8")))
    def viaAgg(parts: Int): (Long, Long) = {
      val regs = hashes.toDF("hv").repartition(parts)
        .agg(call_function("hll_registers", col("hv"))).head.getSeq[Long](0)
      assert(regs.length == 64)
      (regs.count(_ > 0L).toLong, regs.map(r => 1L << (55 - r)).sum)
    }
    val rel = SketchOps.hll64(hashes.map(("g", _)).toDF("grp0", "hv"), "grp0", "hv").head
    assert(viaAgg(1) == ((rel.getLong(1), rel.getLong(5))))
    assert(viaAgg(9) == ((rel.getLong(1), rel.getLong(5))))
  }

  test("hll64: registers saturate monotonically (superset never lowers rho or raises Z)") {
    val s = spark
    import s.implicits._
    def summary(n: Int) = {
      val hashes = (0 until n).map(i => graft.text.Text.md5Sig60(s"k$i".getBytes("UTF-8")))
      SketchOps.hll64(hashes.map(("g", _)).toDF("grp0", "hv"), "grp0", "hv").head
    }
    val small = summary(500)
    val big = summary(5000)
    assert(big.getLong(1) >= small.getLong(1))   // n_nonzero
    assert(big.getLong(3) >= small.getLong(3))   // max_rho
    assert(big.getLong(5) <= small.getLong(5))   // z_int shrinks as registers grow
  }
}
