package graft.tile

import graft.cell.Cells
import graft.geom.{Pred, Point, Wkb, Wkt}
import org.scalatest.funsuite.AnyFunSuite

/** Raptor-style tile mask: per-pixel bits equal brute-force PIP for
  * general (non-rect) geometry, at every bit position. */
class RasterMaskSpec extends AnyFunSuite {

  test("mask bits equal brute-force pixel-center PIP for a triangle") {
    val tri = Wkt.read("POLYGON ((10 40, 20 42, 12 48, 10 40))")
    val wkb = Wkb.write(tri)
    val z = 5
    val tx = Cells.tileX(14.0, z); val ty = Cells.tileY(44.0, z)
    val size = 32
    val mask = graft.sql.K.rasterizeMask(wkb, z, tx, ty, size)
    val n = (1L << z).toDouble
    var pop = 0
    var j = 0
    while (j < size) {
      val lat = Cells.tileYToLat((ty + (j + 0.5) / size) / n)
      var i = 0
      while (i < size) {
        val lon = Cells.tileXToLon((tx + (i + 0.5) / size) / n)
        val want = Pred.intersects(tri, Point(lon, lat))
        val bit = j * size + i
        val got = ((mask(bit >> 3) >> (bit & 7)) & 1) == 1
        assert(got == want, s"pixel ($i,$j) lon=$lon lat=$lat")
        if (got) pop += 1
        i += 1
      }
      j += 1
    }
    assert(graft.sql.K.maskPopcount(mask) == pop && pop > 0 && pop < size * size)
  }

  test("mask of a geometry covering the whole tile is all-ones") {
    val big = Wkt.read("POLYGON ((-180 -85, 180 -85, 180 85, -180 85, -180 -85))")
    val mask = graft.sql.K.rasterizeMask(Wkb.write(big), 4, 7, 7, 16)
    assert(graft.sql.K.maskPopcount(mask) == 256)
  }
}
