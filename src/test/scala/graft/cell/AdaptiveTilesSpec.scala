package graft.cell

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q127 adaptive quadtree tiling invariants, checked independently from
  * the raw fixture points on sf0.001:
  *  - the tiles PARTITION the points: prefix-free tile set, counts sum to
  *    the input size, every point's maxZ quadkey extends exactly one tile
  *  - every tile shallower than maxZ holds ≤ cap points
  *  - every tile deeper than z=1 exists because its parent is over cap
  *    (the recursion never splits a fitting tile). */
class AdaptiveTilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("quadtree invariants: partition, cap, minimal splitting") {
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    GeoTables.ensure(spark, sfDir)
    val maxZ = 10
    val cap = 64L

    val tiles = graft.SparkEntry.queries("q127_adaptive_tiles")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // independent recount from raw lon/lat
    val qks = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .select("lon", "lat").collect()
      .map(r => Cells.quadkey(r.getDouble(0), r.getDouble(1), maxZ))
    assert(tiles.map(_._3).sum == qks.length)

    // prefix-free: no tile is an ancestor of another
    val keys = tiles.map(_._1)
    keys.foreach { a =>
      assert(!keys.exists(b => b != a && b.startsWith(a)),
        s"tile $a has a descendant tile in the output")
    }

    // every point lands in exactly one tile, and tile counts match
    val byTile = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    qks.foreach { qk =>
      val owners = keys.filter(qk.startsWith)
      assert(owners.length == 1, s"point $qk covered by ${owners.length} tiles")
      byTile(owners.head) += 1
    }
    tiles.foreach { case (t, z, n) =>
      assert(z == t.length)
      assert(byTile(t) == n, s"tile $t: output n=$n, recount ${byTile(t)}")
    }

    // cap holds below maxZ; parents of deep tiles are genuinely over cap
    def countAt(prefix: String): Long = qks.count(_.startsWith(prefix))
    tiles.foreach { case (t, z, n) =>
      if (z < maxZ) assert(n <= cap, s"non-leaf tile $t has $n > $cap points")
      if (z > 1) {
        val parent = t.substring(0, t.length - 1)
        assert(countAt(parent) > cap,
          s"tile $t exists but its parent $parent fits the cap — oversplit")
      }
    }
  }
}
