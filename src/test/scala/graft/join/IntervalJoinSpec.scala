package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** IntervalJoin.overlapJoin: exact pair-set (with multiplicity) vs a
  * brute O(n²) driver join — random intervals, boundary touches, long
  * intervals spanning many buckets, duplicate rows, cross-frame join. */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Long, Long, Long)], bucket: Long): Seq[(Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("id", "s", "e")
    IntervalJoin.overlapJoin(df, df, "s", "e", bucket, "id", antiReflexive = true)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  private def brute(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, b._1)).sorted

  test("hand-built: touch at endpoint, containment, disjoint, bucket straddle") {
    spark.sparkContext.setLogLevel("WARN")
    val rows = Seq[(Long, Long, Long)](
      (1L, 0L, 100L), (2L, 100L, 200L),   // closed intervals: touch counts
      (3L, 10L, 20L),                      // contained in 1
      (4L, 300L, 400L),                    // disjoint from all
      (5L, 95L, 405L))                     // spans 5 buckets at B=100
    assert(run(rows, 100L) == brute(rows))
    // tiny bucket => every interval spans many buckets; multiplicity exact
    assert(run(rows, 7L) == brute(rows))
    // huge bucket => everything lands in bucket 0; still exact
    assert(run(rows, 1000000L) == brute(rows))
  }

  test("40 random sets match brute join at three bucket widths") {
    spark.sparkContext.setLogLevel("WARN")
    var state = 99L
    def rnd(n: Int): Int = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state >>> 33) % n).toInt
    }
    (1 to 40).foreach { i =>
      val n = 5 + rnd(40)
      val rows = (0 until n).map { j =>
        val s = rnd(1000).toLong
        (j.toLong, s, s + rnd(200).toLong)
      }
      val b = Seq(13L, 100L, 977L)(i % 3)
      assert(run(rows, b) == brute(rows), s"set $i bucket $b")
    }
  }

  test("cross-frame join (no antiReflexive) keeps full bag multiplicity") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // duplicate right rows must appear twice in the result (bag semantics)
    val l = Seq((1L, 0L, 50L)).toDF("id", "s", "e")
    val r = Seq((7L, 40L, 60L), (7L, 40L, 60L), (8L, 51L, 60L)).toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(l, r, "s", "e", 10L, "id")
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 7L), (1L, 7L)))
  }
}
