package graft.join

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** knnSphere vs exact JVM brute force (K.distanceSphere) — including
  * queries whose first density-derived radius misses k, so the doubling
  * loop must take extra rounds, and high-latitude probes where the
  * planar mercator metric would rank differently. */
class KnnSphereSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  var state = 424242L
  private def next(): Long = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
  }
  private def frac(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble

  private def brute(points: Seq[(String, Double, Double)],
                    q: (String, Double, Double), k: Int): Seq[(String, Long)] =
    points.map { case (id, lo, la) =>
      (id, graft.sql.K.distanceSphere(q._2, q._3, lo, la))
    }.sortBy { case (id, d) => (d, id) }.take(k).zipWithIndex
      .map { case ((id, _), i) => (id, (i + 1).toLong) }

  test("knnSphere equals brute-force haversine, incl. sparse multi-round probes") {
    // a dense cluster near Oslo, a second near Cape Town, and three
    // ISOLATED points (the density guess tuned to the dense spread
    // under-shoots their k-th neighbor → extra doubling rounds)
    val dense = (0 until 400).map(i =>
      (f"pt_$i%05d", 10.0 + frac() * 2.0, 59.0 + frac() * 2.0)) ++
      (400 until 700).map(i => (f"pt_$i%05d", 18.0 + frac() * 2.0, -34.0 + frac()))
    val isolated = Seq(("pt_90001", -150.0, -45.0), ("pt_90002", -140.0, -48.0),
      ("pt_90003", -145.0, -40.0), ("pt_90004", -152.0, -42.0),
      ("pt_90005", -139.0, -43.0))
    val pts = dense ++ isolated
    val queries = Seq(("q_oslo", 11.0, 59.5), ("q_cape", 19.0, -33.6),
      ("q_far", -148.0, -44.0), ("q_pole", 10.7, 60.9))

    import spark.implicits._
    val out = SpatialJoins.knnSphere(
        pts.toDF("id", "lon", "lat"), queries.toDF("id", "lon", "lat"), k = 5)
      .select("q_id", "p_id", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(t => (t._2, t._3)).toSeq).toMap

    queries.foreach { q =>
      val want = brute(pts, q, 5)
      assert(out(q._1) == want, s"${q._1}: got ${out(q._1)} want $want")
    }
  }

  test("high-latitude ranking follows the sphere, not the mercator plane") {
    // at 80°N a 1° lon step is ~6× shorter in meters than a 1° lat step,
    // while mercator-normalized coordinates stretch lon the OTHER way:
    // the geodesic nearest must be the lon-offset point
    val pts = Seq(("a_lon", 1.0, 80.0), ("b_lat", 0.0, 79.0), ("c_self", 0.0, 80.0))
    import spark.implicits._
    val out = SpatialJoins.knnSphere(
        pts.toDF("id", "lon", "lat"),
        Seq(("q", 0.0, 80.0)).toDF("id", "lon", "lat"), k = 2)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(out == Seq("c_self", "a_lon"), out.toString)
  }

  test("empty query set returns an empty frame with the contract schema") {
    import spark.implicits._
    val out = SpatialJoins.knnSphere(
      Seq(("a", 0.0, 0.0), ("b", 1.0, 1.0), ("c", 2.0, 2.0)).toDF("id", "lon", "lat"),
      Seq.empty[(String, Double, Double)].toDF("id", "lon", "lat"), k = 3)
    assert(out.columns.toSeq == Seq("q_id", "p_id", "dist_m", "rank"))
    assert(out.count() == 0)
  }

  test("k > point count fails fast with the right diagnosis") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      SpatialJoins.knnSphere(
        Seq(("a", 0.0, 0.0)).toDF("id", "lon", "lat"),
        Seq(("q", 0.0, 0.0)).toDF("id", "lon", "lat"), k = 3)
    }
    assert(e.getMessage.contains("exceeds the point count"))
  }
}
