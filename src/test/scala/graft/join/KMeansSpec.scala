package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** KMeans.cluster vs a driver replay of the same deterministic Lloyd
  * (identical init/update/tie rules) and clustering sanity on separated
  * blobs. */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matches the driver replay exactly; separated blobs get distinct clusters") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    var st = 777L
    def frac(): Double = {
      st ^= st << 13; st ^= st >>> 7; st ^= st << 17
      (st >>> 11).toDouble / (1L << 53).toDouble
    }
    val blobs = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0))
    // id scheme puts one point of EACH blob among the k smallest ids, so
    // the deterministic smallest-id init seeds every blob (with all seeds
    // in one blob, 3 Lloyd rounds legitimately may not separate them —
    // the usual k-means init sensitivity, not a defect)
    val pts = blobs.zipWithIndex.flatMap { case ((bx, by), b) =>
      (0 until 200).map(i => (f"$i%03d_b$b%d", bx + frac(), by + frac()))
    }
    val k = 4; val rounds = 3
    val got = KMeans.cluster(pts.toDF("image_id", "lon", "lat"), "image_id", k, rounds)
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap

    // driver replay with the same rules
    var cents = pts.sortBy(_._1).take(k).map(t => (t._2, t._3)).toArray
    def assign(x: Double, y: Double): Int =
      cents.zipWithIndex.map { case ((cx, cy), j) =>
        ((x - cx) * (x - cx) + (y - cy) * (y - cy), j) }.min._2
    (1 to rounds).foreach { _ =>
      val groups = pts.groupBy(p => assign(p._2, p._3))
      cents = cents.indices.map { j =>
        groups.get(j) match {
          case Some(g) =>
            val sx = g.map(p => math.floor(p._2 * 1e6 + 0.5).toLong).sum
            val sy = g.map(p => math.floor(p._3 * 1e6 + 0.5).toLong).sum
            (sx.toDouble / (g.size.toDouble * 1e6), sy.toDouble / (g.size.toDouble * 1e6))
          case None => cents(j)
        }
      }.toArray
    }
    val want = pts.map(p => p._1 -> assign(p._2, p._3)).toMap
    assert(got == want)
    // after 3 rounds the four separated blobs are pure clusters
    val byBlob = pts.groupBy(_._1.last).view.mapValues(_.map(p => got(p._1)).toSet).toMap
    assert(byBlob.values.forall(_.size == 1), s"mixed blobs: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 4)
  }
}
