package graft.join

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q124 Getis-Ord Gi* hot-spot detection: an independent driver-side
  * brute-force recompute (scala.math, plain loops — no Spark expressions
  * shared with the engine path) must agree exactly on the sf0.001
  * fixture, and the planted hot cell (GeoTables.HOT_LON/HOT_LAT, 20% of
  * all points) must carry the maximum z-score. */
class HotspotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q124 ≡ brute-force Gi*; planted hot cell is the argmax") {
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    GeoTables.ensure(spark, sfDir)

    val got = graft.SparkEntry.queries("q124_hotspot")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

    // brute force from the raw fixture rows
    val pts = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .select("lon", "lat").collect()
      .map(r => (math.floor((r.getDouble(0) + 180.0) / 360.0 * 1024).toLong,
        math.floor((r.getDouble(1) + 90.0) / 180.0 * 512).toLong))
    val counts = pts.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = 524288.0
    val s1 = counts.values.sum.toDouble
    val s2 = counts.values.map(c => c * c).sum.toDouble
    val targets = counts.keys.flatMap { case (x, y) =>
      for (dx <- -1L to 1L; dy <- -1L to 1L
           if x + dx >= 0 && x + dx <= 1023 && y + dy >= 0 && y + dy <= 511)
        yield (x + dx, y + dy)
    }.toSet
    var maxZ = Double.MinValue
    var argmax = (-1L, -1L)
    val want = scala.collection.mutable.Map[(Long, Long), (Long, Long, Long, Long)]()
    targets.foreach { case (gx, gy) =>
      var wi = 0L
      for (dx <- -1L to 1L; dy <- -1L to 1L)
        wi += counts.getOrElse((gx + dx, gy + dy), 0L)
      val kk = (math.min(gx + 1, 1023) - math.max(gx - 1, 0) + 1) *
        (math.min(gy + 1, 511) - math.max(gy - 1, 0) + 1)
      val z = (wi - s1 * kk / n) /
        (math.sqrt(s2 / n - (s1 / n) * (s1 / n)) *
          math.sqrt((n * kk - kk.toDouble * kk) / (n - 1.0)))
      if (z > maxZ) { maxZ = z; argmax = (gx, gy) }
      val zq = math.floor(1e3 * z).toLong
      if (zq >= 1960L)
        want((gx, gy)) = (counts.getOrElse((gx, gy), 0L), wi, kk, zq)
    }

    assert(got.keySet == want.keySet,
      s"hot-cell sets differ: only-engine=${got.keySet -- want.keySet} " +
        s"only-brute=${want.keySet -- got.keySet}")
    want.foreach { case (k, v) => assert(got(k) == v, s"cell $k: got ${got(k)}, want $v") }

    // the planted 20% hot cluster sits in one lattice cell — it must win
    val hotGx = math.floor((GeoTables.HOT_LON + 180.0) / 360.0 * 1024).toLong
    val hotGy = math.floor((GeoTables.HOT_LAT + 90.0) / 180.0 * 512).toLong
    assert(math.abs(argmax._1 - hotGx) <= 1 && math.abs(argmax._2 - hotGy) <= 1,
      s"argmax $argmax not adjacent to planted hot cell ($hotGx, $hotGy)")
    assert(got.contains(argmax))
  }
}
