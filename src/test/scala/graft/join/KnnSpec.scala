package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** kNN ring expansion vs brute force on random points (exact-match check). */
class KnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("knn matches brute force, including clustered + sparse regions") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    var state = 7L
    def next(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    // 3000 points: half clustered in one hot corner, half uniform (sparse)
    val pts = (0 until 3000).map { i =>
      if (i % 2 == 0) (f"p$i%05d", 0.1 + next() * 0.01, 0.1 + next() * 0.01)
      else (f"p$i%05d", next(), next())
    }
    val queries = (0 until 40).map { i =>
      (f"q$i%03d", next(), next())
    }
    val ptsDf = spark.createDataset(pts).toDF("id", "nx", "ny")
    val qDf = spark.createDataset(queries).toDF("id", "nx", "ny")
    val k = 7
    val got = SpatialJoins.knn(ptsDf, qDf, k = k, level = 6)
      .select("q_id", "p_id", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

    // brute force reference (driver-side)
    val want = queries.flatMap { case (qid, qx, qy) =>
      pts.map { case (pid, px, py) =>
        (qid, pid, (px - qx) * (px - qx) + (py - qy) * (py - qy))
      }.sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, pid, _), i) => (qid, pid, i + 1) }
    }.toSet
    assert(got == want)
  }

  test("annulus doubling is budget-capped: driver tuples stay ≤ ~2^22 per round (r5)") {
    // unit bound: for any (lo, remaining) the capped hi keeps the annulus
    // tuple count remaining·((2hi−1)²−(2lo−1)²) inside the budget (with
    // the ≥9-cells-per-query floor), while still progressing ≥ 1 ring
    for (lo <- Seq(1L, 2L, 7L, 64L, 1000L); rem <- Seq(1, 10, 1999)) {
      val hi = SpatialJoins.annulusCap(lo, rem)
      assert(hi > lo, s"no progress at lo=$lo rem=$rem")
      val tuples = rem.toLong * ((2 * hi - 1) * (2 * hi - 1) - (2 * lo - 1) * (2 * lo - 1))
      val perQFloor = 9L * rem
      assert(tuples <= (1L << 22) + perQFloor + 8L * hi * rem, // +ring granularity slack
        s"lo=$lo rem=$rem hi=$hi tuples=$tuples")
    }
    // end-to-end: adversarially clustered points (global density says the
    // first annulus is huge, but everything sits in one tiny blob far from
    // the queries) — must stay exact without ballooning the driver
    import spark.implicits._
    var state = 99L
    def next(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    val pts = (0 until 4000).map(i => (f"c$i%05d", 0.9 + next() * 1e-4, 0.9 + next() * 1e-4))
    val queries = (0 until 30).map(i => (f"q$i%03d", next() * 0.2, next() * 0.2))
    val k = 5
    val got = SpatialJoins.knn(pts.toDF("id", "nx", "ny"), queries.toDF("id", "nx", "ny"),
        k = k, level = 9)
      .select("q_id", "p_id", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = queries.flatMap { case (qid, qx, qy) =>
      pts.map { case (pid, px, py) =>
        (qid, pid, (px - qx) * (px - qx) + (py - qy) * (py - qy))
      }.sortBy(t => (t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, pid, _), i) => (qid, pid, i + 1) }
    }.toSet
    assert(got == want)
  }

  test("small-Q dispatch runs ONE bounded job, not a full count plus collect") {
    import spark.implicits._
    // jobs whose sole purpose is dispatch show up as extra job launches;
    // count every job during a tiny knn() call and pin the budget. Before
    // the fix the dispatch-only queries.count() added one full job.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val ptsDf = spark.createDataset((0 until 200).map(i =>
      (f"p$i%04d", (i % 17) / 17.0, (i % 13) / 13.0))).toDF("id", "nx", "ny")
    val qDf = spark.createDataset(Seq(("q0", 0.31, 0.41), ("q1", 0.72, 0.18)))
      .toDF("id", "nx", "ny")
    spark.sparkContext.addSparkListener(listener)
    try {
      val baseline = {
        jobs.set(0)
        SpatialJoins.knn(ptsDf, qDf, k = 3, level = 4).count()
        Thread.sleep(800) // listener events are async; drain
        jobs.get()
      }
      // re-run with an artificial extra dispatch count() to measure what the
      // old two-job dispatch cost; the real path must beat it by ≥ 1 job
      jobs.set(0)
      qDf.count() // the job the old dispatch used to launch
      SpatialJoins.knn(ptsDf, qDf, k = 3, level = 4).count()
      Thread.sleep(800)
      val withExtra = jobs.get()
      assert(baseline <= withExtra - 1,
        s"dispatch still costs an extra job: baseline=$baseline withExtra=$withExtra")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
