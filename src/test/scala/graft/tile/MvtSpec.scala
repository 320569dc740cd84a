package graft.tile

import graft.geom._
import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** st_asmvt_geom: golden command sequences, a decode round-trip (commands
  * → rings → winding/coords), canonical-form invariance under input
  * vertex rotation/reversal, clip behaviour, and degenerate → null. */
class MvtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def unzz(v: Int): Int = (v >>> 1) ^ -(v & 1)

  /** Decode command ints → (parts, isRing) with absolute int coords. */
  private def decode(cmds: Array[Int]): Seq[(Vector[(Int, Int)], Boolean)] = {
    var i = 0; var cx = 0; var cy = 0
    var cur = Vector.empty[(Int, Int)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Vector[(Int, Int)], Boolean)]
    while (i < cmds.length) {
      val id = cmds(i) & 0x7; val n = cmds(i) >>> 3; i += 1
      id match {
        case 1 => // MoveTo starts a new part
          if (cur.nonEmpty) { out += ((cur, false)); cur = Vector.empty }
          (0 until n).foreach { _ =>
            cx += unzz(cmds(i)); cy += unzz(cmds(i + 1)); i += 2
            cur :+= ((cx, cy))
          }
        case 2 =>
          (0 until n).foreach { _ =>
            cx += unzz(cmds(i)); cy += unzz(cmds(i + 1)); i += 2
            cur :+= ((cx, cy))
          }
        case 7 =>
          out += ((cur, true)); cur = Vector.empty
      }
    }
    if (cur.nonEmpty) out += ((cur, false))
    out.toSeq
  }

  private def shoelace2(pts: Vector[(Int, Int)]): Long =
    pts.indices.map { i =>
      val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % pts.length)
      x1.toLong * y2 - x2.toLong * y1
    }.sum

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))

  // world tile at z=0: quantization py = floor((normY(lat))*extent + 0.5)
  test("golden: rect inside the world tile, extent 256") {
    val g = rect(-90.0, 0.0, 0.0, 66.51326044311186) // lat of normY = 0.25
    val got = Mvt.encode(g, 0, 0, 0, 256)
    // px(-90) = 64, px(0) = 128; py(66.513...) = 64, py(0) = 128
    val exp = Array(9, 2 * 64, 2 * 64, 26, 2 * 64, 0, 0, 2 * 64, 2 * 64 - 1, 0, 15)
    assert(got.toSeq == exp.toSeq, s"got ${got.toSeq}")
  }

  test("decode round-trip: winding, hole, canonical start") {
    val shell = Array(10.0, 10.0, 40.0, 10.0, 40.0, 40.0, 10.0, 40.0, 10.0, 10.0)
    val hole = Array(20.0, 20.0, 30.0, 20.0, 30.0, 30.0, 20.0, 30.0, 20.0, 20.0)
    val g = Polygon(Array(shell, hole))
    val cmds = Mvt.encode(g, 0, 0, 0, 4096)
    val parts = decode(cmds)
    assert(parts.length == 2 && parts.forall(_._2), "two closed rings")
    assert(shoelace2(parts(0)._1) > 0, "exterior positive screen area")
    assert(shoelace2(parts(1)._1) < 0, "hole negative screen area")
    // canonical start: min (py, px) — north-west corner in screen coords
    val (sx, sy) = parts(0)._1.head
    assert(parts(0)._1.forall { case (x, y) => y > sy || (y == sy && x >= sx) })
  }

  test("canonical form is invariant under ring rotation and reversal") {
    val base = rect(-10.0, -10.0, 25.0, 30.0)
    val rotated = Polygon(Array(Array(25.0, -10.0, 25.0, 30.0, -10.0, 30.0, -10.0, -10.0, 25.0, -10.0)))
    val reversed = Polygon(Array(Array(-10.0, -10.0, -10.0, 30.0, 25.0, 30.0, 25.0, -10.0, -10.0, -10.0)))
    val a = Mvt.encode(base, 2, 1, 1, 4096).toSeq
    assert(Mvt.encode(rotated, 2, 1, 1, 4096).toSeq == a)
    assert(Mvt.encode(reversed, 2, 1, 1, 4096).toSeq == a)
  }

  test("clip: rect spanning the tile is cut to the tile square") {
    val g = rect(-400.0, -89.0, 400.0, 89.0) // beyond the world: clips to full tile
    val cmds = Mvt.encode(g, 3, 4, 3, 4096)
    val ring = decode(cmds).head._1
    assert(ring.toSet == Set((0, 0), (4096, 0), (4096, 4096), (0, 4096)),
      s"clipped to the exact tile square, got $ring")
  }

  test("point, multipoint, and clipped linestring") {
    val p = Mvt.encode(Point(0.0, 0.0), 0, 0, 0, 256)
    assert(p.toSeq == Seq(9, 2 * 128, 2 * 128))
    val mp = Mvt.encode(MultiPoint(Array(0.0, 0.0, -90.0, 0.0)), 0, 0, 0, 256)
    assert(mp.toSeq == Seq((1 & 0x7) | (2 << 3), 2 * 128, 2 * 128, 127, 0))
    // line exits the east edge of tile (z=1, tx=0): clipped at lon 0
    val l = Mvt.encode(LineString(Array(-90.0, 0.0, 90.0, 0.0)), 1, 0, 0, 256)
    val pts = decode(l).head._1
    assert(pts == Vector((128, 256), (256, 256)), s"got $pts")
  }

  test("degenerate: sub-pixel rect and outside-tile geometry → null") {
    assert(Mvt.encode(rect(1.0, 1.0, 1.0001, 1.0001), 0, 0, 0, 256) == null)
    assert(Mvt.encode(rect(100.0, 10.0, 120.0, 20.0), 2, 0, 0, 4096) == null)
    assert(Mvt.encode(LineString(Array(1.0, 1.0, 1.0001, 1.0001)), 0, 0, 0, 256) == null)
  }

  test("SQL surface: st_asmvt_geom via the registry") {
    GraftFunctions.install(spark)
    val r = spark.sql(
      "SELECT st_asmvt_geom(st_geomfromwkt('POLYGON ((-90 0, 0 0, 0 66.51326044311186, -90 66.51326044311186, -90 0))'), 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 256) AS m")
      .head.getSeq[Int](0)
    assert(r == Seq(9, 128, 128, 26, 128, 0, 0, 128, 127, 0, 15))
    val n = spark.sql(
      "SELECT st_asmvt_geom(st_geomfromwkt('POINT (100 10)'), 2, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 4096) AS m")
      .head
    assert(n.isNullAt(0), "outside-tile point must encode to null")
  }
}
