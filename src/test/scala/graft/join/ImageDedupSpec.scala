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

  test("components equals driver-side union-find exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val nd = GeoTables.nearDupImages(spark, sfDir)
    val pairs = ImageDedup.nearDup(nd, "id", "phash", maxHamming = 4)
    val pairList = pairs.select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairList.nonEmpty)

    val got = ImageDedup.components(pairs).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap

    // union-find ground truth with min-id representatives
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(x: String, y: String): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
    }
    pairList.foreach { case (a, b) => union(a, b) }
    val want = pairList.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap
    assert(got == want, s"got=${got.size} want=${want.size} " +
      s"diff=${(want.toSet diff got.toSet).take(3)}")
  }
}
