package graft.join

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** pHash pigeonhole near-dup join: exact pair-set parity vs driver-side
  * brute force on the planted-variant fixture, with an equi-join plan. */
class ImageDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("nearDup(h=4) equals brute force exactly; plan is an equi-join") {
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    val nd = GeoTables.nearDupImages(spark, sfDir)
    val rows = nd.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length > 2000, s"fixture too small: ${rows.length}")
    assert(rows.count(_._1.endsWith("_v")) >= 200, "planted variants missing")

    val got = ImageDedup.nearDup(nd, "id", "phash", maxHamming = 4)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"near-dup join must be an equi-join:\n$plan")

    val gotSet = got.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      i <- rows.indices.iterator
      j <- (i + 1) until rows.length
      h = java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2)
      if h <= 4
    } yield {
      val (a, b) = if (rows(i)._1 < rows(j)._1) (rows(i)._1, rows(j)._1)
                   else (rows(j)._1, rows(i)._1)
      (a, b, h.toLong)
    }).toSet
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    assert(gotSet == want,
      s"got=${gotSet.size} want=${want.size} diff=${(want diff gotSet).take(3)}")
  }
}
