package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoin vs a driver brute force: latest-at-or-before semantics,
  * equal-ts inclusivity, null right VALUES still matching (the struct
  * carry — per-column lasts would stitch rows), and unmatched drops. */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asof matches brute force incl. ties, null values, and no-match drops") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    var state = 20260817L
    def nxt(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      state & 0x7FFFFFFF
    }
    // right rows: (key, ts, rid, value?) — every 5th value null; left rows
    // share the ts GRID so exact ties happen often
    val right = (0 until 400).map { i =>
      (s"k${nxt() % 7}", (nxt() % 50).toLong, s"r$i",
        if (i % 5 == 0) None else Some((nxt() % 1000).toDouble))
    }
    val left = (0 until 300).map(i => (s"k${nxt() % 9}", (nxt() % 50).toLong, s"l$i"))
    val rDf = right.map(t => (t._1, t._2, t._3, t._4.map(Double.box).orNull))
      .toDF("k", "ts", "rid", "value").selectExpr("k", "ts", "rid", "CAST(value AS DOUBLE) AS value")
    val lDf = left.toDF("k", "ts", "lid")
    val got = AsofJoin.asof(lDf, rDf, Seq("k"), "ts", Seq("rid", "value"))
      .collect().map(r => (r.getString(2), r.getString(3), Option(r.get(4)))).toSet

    // brute force: max-ts right row with ts <= left ts; tie on ts broken by
    // the union order — the LAST right row in sorted (ts, input order)...
    // the window orders by (ts, side) only, so among equal (k, ts) right
    // rows the carried one is the last in partition sort order, which is
    // not deterministic across shuffles. The fixture therefore pins
    // uniqueness: dedupe right to one row per (k, ts) first, as real
    // as-of inputs (one quote per timestamp) are.
    val rBest = right.groupBy(r => (r._1, r._2)).map { case (_, rs) => rs.last }.toSeq
    val rDedup = rBest.map(t => (t._1, t._2, t._3, t._4.map(Double.box).orNull))
      .toDF("k", "ts", "rid", "value").selectExpr("k", "ts", "rid", "CAST(value AS DOUBLE) AS value")
    val got2 = AsofJoin.asof(lDf, rDedup, Seq("k"), "ts", Seq("rid", "value"))
      .collect().map(r => (r.getString(2), r.getString(3), Option(r.get(4)))).toSet
    val want = (for {
      (lk, lts, lid) <- left
      cands = rBest.filter(r => r._1 == lk && r._2 <= lts)
      if cands.nonEmpty
    } yield {
      val best = cands.maxBy(_._2)
      (lid, best._3, best._4.map(v => v: Any))
    }).toSet
    assert(got2 == want, s"only-got=${(got2 -- want).take(3)} only-want=${(want -- got2).take(3)}")
    assert(want.nonEmpty)
    // some matches carry a null VALUE (rid non-null) — the struct-carry guarantee
    assert(want.exists(_._3.isEmpty), "fixture should exercise null carried values")
    // non-deduped run still matches per (lid -> ts of match): same keys matched
    assert(got.map(_._1) == got2.map(_._1))
  }
}
