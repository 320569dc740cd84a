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
}
