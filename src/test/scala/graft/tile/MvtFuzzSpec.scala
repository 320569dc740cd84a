package graft.tile

import graft.geom._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential coverage for st_asmvt_geom: (a) rect∩tile
  * encodings must match the independent closed-form expectation (the
  * q102 oracle's formulation, reimplemented here); (b) for random convex
  * polygons, the decoded command stream must be a closed ring of the
  * quantized clipped shape with spec winding; (c) canonical invariance
  * under random ring rotation + reversal. */
class MvtFuzzSpec extends AnyFunSuite {

  private def unzz(v: Int): Int = (v >>> 1) ^ -(v & 1)

  private def decodeRings(cmds: Array[Int]): Seq[Vector[(Int, Int)]] = {
    var i = 0; var cx = 0; var cy = 0
    var cur = Vector.empty[(Int, Int)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Vector[(Int, Int)]]
    while (i < cmds.length) {
      val id = cmds(i) & 0x7; val n = cmds(i) >>> 3; i += 1
      id match {
        case 1 | 2 =>
          (0 until n).foreach { _ =>
            cx += unzz(cmds(i)); cy += unzz(cmds(i + 1)); i += 2
            cur :+= ((cx, cy))
          }
        case 7 => out += cur; cur = Vector.empty
      }
    }
    out.toSeq
  }

  private def shoelace2(pts: Vector[(Int, Int)]): Long =
    pts.indices.map { i =>
      val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % pts.length)
      x1.toLong * y2 - x2.toLong * y1
    }.sum

  // independent quantizer (mirrors the q102 oracle formulas)
  private def pxOf(lon: Double, z: Int, tx: Long, extent: Int): Int =
    math.floor((((lon + 180.0) / 360.0) * (1L << z) - tx) * extent + 0.5).toInt
  private def pyOf(lat: Double, z: Int, ty: Long, extent: Int): Int = {
    val s = math.sin(math.toRadians(lat))
    val ny = 0.5 - math.log((1 + s) / (1 - s)) / (4 * math.Pi)
    math.floor((ny * (1L << z) - ty) * extent + 0.5).toInt
  }
  private def lonOfTx(t: Double, z: Int): Double = t / (1L << z) * 360.0 - 180.0
  private def latOfTy(t: Double, z: Int): Double =
    math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * t / (1L << z)))))

  test("2000 random rect x tile cases match the closed-form expectation") {
    val rnd = new scala.util.Random(20260817L)
    var checked = 0
    (0 until 2000).foreach { _ =>
      val z = 1 + rnd.nextInt(7)
      val tx = rnd.nextInt(1 << z).toLong
      val ty = rnd.nextInt(1 << z).toLong
      val extent = Seq(256, 1024, 4096)(rnd.nextInt(3))
      // rect overlapping the tile more often than not
      val w = lonOfTx(tx.toDouble, z); val e = lonOfTx(tx + 1.0, z)
      val n = latOfTy(ty.toDouble, z); val s = latOfTy(ty + 1.0, z)
      val cx = w + (e - w) * rnd.nextDouble(); val cy = s + (n - s) * rnd.nextDouble()
      val hw = (e - w) * (0.01 + rnd.nextDouble()); val hh = (n - s) * (0.01 + rnd.nextDouble())
      // clamp can invert the rect near the ±85 rows (y0 > y1 would be a
      // reverse-wound rect, not a degenerate one) — order the pair
      val (x0, x1) = (cx - hw, cx + hw)
      val (yA, yB) = (math.max(-85.0, cy - hh), math.min(85.0, cy + hh))
      val (y0, y1) = (math.min(yA, yB), math.max(yA, yB))
      val g = Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))
      val got = Mvt.encode(g, z, tx, ty, extent)
      // closed form: quantized corners of the lon/lat clip
      val a = math.max(x0, w); val b = math.min(x1, e)
      val c = math.max(y0, s); val d = math.min(y1, n)
      if (a <= b && c <= d) {
        val qx0 = pxOf(a, z, tx, extent); val qx1 = pxOf(b, z, tx, extent)
        val qy0 = pyOf(d, z, ty, extent); val qy1 = pyOf(c, z, ty, extent)
        if (qx1 > qx0 && qy1 > qy0) {
          def zz(v: Int) = (v << 1) ^ (v >> 31)
          val exp = Seq(9, zz(qx0), zz(qy0), 26, zz(qx1 - qx0), 0, 0, zz(qy1 - qy0), zz(qx0 - qx1), 0, 15)
          assert(got != null && got.toSeq == exp,
            s"z=$z t=($tx,$ty) ext=$extent rect=($x0,$y0,$x1,$y1): got ${if (got == null) "null" else got.toSeq} want $exp")
          checked += 1
        } else assert(got == null, s"degenerate quantized rect must be null, got ${got.toSeq}")
      } else assert(got == null, "disjoint rect must encode to null")
    }
    assert(checked > 1200, s"only $checked non-degenerate cases — fixture generator drifted")
  }

  test("1000 random convex polygons: decoded ring closed, spec winding, canonical") {
    val rnd = new scala.util.Random(0xC0FFEEL)
    (0 until 1000).foreach { _ =>
      val z = 1 + rnd.nextInt(5)
      val tx = rnd.nextInt(1 << z).toLong
      val ty = rnd.nextInt(1 << z).toLong
      val w = lonOfTx(tx.toDouble, z); val e = lonOfTx(tx + 1.0, z)
      val n = latOfTy(ty.toDouble, z); val s = latOfTy(ty + 1.0, z)
      // random points around the tile, convex hull as the test polygon
      val pts = Array.fill(4 + rnd.nextInt(8) * 2) {
        (w + (e - w) * (rnd.nextDouble() * 2 - 0.5), s + (n - s) * (rnd.nextDouble() * 2 - 0.5))
      }
      val hull = Ops.convexHullOfCoords(pts.flatMap(p => Array(p._1, p._2))) match {
        case p: Polygon => p
        case _ => Polygon(Array.empty) // collinear sample — skip
      }
      if (!hull.isEmpty) {
        val cmds = Mvt.encode(hull, z, tx, ty, 4096)
        if (cmds != null) {
          val rings = decodeRings(cmds)
          assert(rings.nonEmpty)
          rings.foreach { r =>
            assert(r.length >= 3, s"ring with ${r.length} points")
            assert(shoelace2(r) > 0, "single-ring polygon must decode with positive screen area")
            assert(r.forall { case (x, y) =>
              x >= -4096 && x <= 8192 && y >= -4096 && y <= 8192 },
              s"quantized coords wildly out of tile: $r")
            // canonical start
            val (sx, sy) = r.head
            assert(r.forall { case (x, y) => y > sy || (y == sy && x >= sx) })
          }
          // invariance: rotate + reverse the input ring
          val ring = hull.rings(0)
          val nv = ring.length / 2 - 1
          val k = rnd.nextInt(nv)
          val rot = Array.tabulate(nv + 1) { i =>
            val j = (i % nv + k) % nv
            Array(ring(2 * j), ring(2 * j + 1))
          }.flatten
          val rev = {
            val open = rot.dropRight(2).grouped(2).toArray.reverse.flatten
            open ++ Array(open(0), open(1))
          }
          assert(Mvt.encode(Polygon(Array(rot)), z, tx, ty, 4096).toSeq == cmds.toSeq)
          assert(Mvt.encode(Polygon(Array(rev)), z, tx, ty, 4096).toSeq == cmds.toSeq)
        }
      }
    }
  }
}
