package graft.geom

import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Delaunay + Voronoi vs JTS and the partition invariants q75/q76 encode. */
class TriangulateSpec extends AnyFunSuite {

  private val reader = new WKTReader()
  private val gf = new org.locationtech.jts.geom.GeometryFactory()

  private def mp(pts: Seq[(Double, Double)]): String =
    s"MULTIPOINT (${pts.map { case (x, y) => s"($x $y)" }.mkString(", ")})"

  // the q75/q76 unit configuration — must be in general position (affine
  // images inherit it), verified here once
  private val inner = Seq((0.21, 0.34), (0.63, 0.27), (0.78, 0.69), (0.36, 0.82), (0.52, 0.55))
  private val corners = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))

  test("q76 unit configuration is in general position (no 3 collinear)") {
    val all = (corners ++ inner).toArray
    for (i <- all.indices; j <- all.indices; k <- all.indices
         if i < j && j < k) {
      val (ax, ay) = all(i); val (bx, by) = all(j); val (cx, cy) = all(k)
      val o = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      assert(math.abs(o) > 1e-9, s"collinear: $i $j $k")
    }
  }

  test("delaunay triangle count and area vs JTS on random point sets") {
    var state = 271828L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 40).foreach { trial =>
      val n = 4 + (frac() * 30).toInt
      val pts = Seq.fill(n)((math.rint(frac() * 1000) / 10, math.rint(frac() * 1000) / 10)).distinct
      if (pts.length >= 3) {
        val tris = Triangulate.delaunay(Wkt.read(mp(pts)))
        val builder = new org.locationtech.jts.triangulate.DelaunayTriangulationBuilder()
        builder.setSites(reader.read(mp(pts)))
        val jt = builder.getTriangles(gf)
        val jtsTris = (0 until jt.getNumGeometries).map(jt.getGeometryN)
        // counts can differ on exactly-cocircular quadruples (both answers
        // legal); areas must always agree — the triangulation covers the hull
        val got = tris.map(Ops.area).sum
        val want = jtsTris.map(_.getArea).sum
        assert(math.abs(got - want) < 1e-6 * math.max(1, want),
          s"trial $trial: area $got vs $want (${pts.length} pts)")
        if (tris.length != jtsTris.length)
          info(s"trial $trial: count ${tris.length} vs ${jtsTris.length} (cocircular tie)")
        // every triangle CCW and non-degenerate
        tris.foreach(t => assert(Ops.area(t) > 0, "triangle must be CCW"))
      }
    }
  }

  test("delaunay of the 9-point q76 configuration has exactly 12 triangles under affine maps") {
    Seq((1.0, 1.0, 0.0, 0.0), (3.7, 0.4, -20.0, 55.0), (0.01, 12.0, 7.7, -3.3),
        (5.5, 5.5, 120.0, 40.0)).foreach { case (sx, sy, ox, oy) =>
      val pts = (corners ++ inner).map { case (x, y) => (ox + sx * x, oy + sy * y) }
      val tris = Triangulate.delaunay(Wkt.read(mp(pts)))
      assert(tris.length == 12, s"scale ($sx,$sy): got ${tris.length}")
      val area = tris.map(Ops.area).sum
      assert(math.abs(area - sx * sy) < 1e-9 * math.max(1, sx * sy), s"area $area vs ${sx * sy}")
    }
  }

  test("voronoi cells partition the clip envelope and contain their seeds") {
    val pts = inner.map { case (x, y) => (x * 10, y * 10) }
    val env = Env(0, 0, 10, 10)
    val cells = Triangulate.voronoi(Wkt.read(mp(pts)), Some(env))
    assert(cells.length == 5)
    assert(math.abs(cells.map(Ops.area).sum - 100.0) < 1e-9, "cells must partition the envelope")
    // seed containment: seed order is SORTED vertex order
    val sorted = pts.sortBy(identity)
    cells.zip(sorted).foreach { case (cell, (x, y)) =>
      assert(Pred.contains(cell, Point(x, y)), s"cell must contain its seed ($x,$y)")
    }
    // pairwise interiors disjoint (area of pairwise intersections ~ 0)
    for (i <- cells.indices; j <- cells.indices if i < j) {
      val inter = Overlay.intersection(cells(i), cells(j))
      assert(Ops.area(inter) < 1e-9, s"cells $i,$j overlap")
    }
  }

  test("concave hull: chi-shape removes the notch; infinite length = convex hull") {
    // 4 corners of (0,0)-(1,0.5) + interior (0.5,0.2): Delaunay is the
    // 4-triangle fan; λ=0.75 removes exactly the bottom edge (len 1, tie
    // with top broken by sorted-index order; sides 0.5 < λ stay)
    val pts = "MULTIPOINT ((0 0), (1 0), (1 0.5), (0 0.5), (0.5 0.2))"
    val chi = Triangulate.concaveHull(Wkt.read(pts), 0.75)
    assert(math.abs(Ops.area(chi) - 0.4) < 1e-12, s"got ${Ops.area(chi)}")
    assert(chi.asInstanceOf[Polygon].rings(0).length / 2 == 6) // 5 distinct + close
    // λ = ∞ → convex hull
    val hull = Triangulate.concaveHull(Wkt.read(pts), 1e18)
    assert(math.abs(Ops.area(hull) - 0.5) < 1e-12)
    // monotone: smaller λ ⇒ area never larger; always contains the points
    val star = "MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 1), (1 2), (3 2), (2 3), (2 2))"
    var prev = Double.MaxValue
    Seq(1e18, 4.0, 3.0, 2.5).foreach { lam =>
      val h = Triangulate.concaveHull(Wkt.read(star), lam)
      val a = Ops.area(h)
      assert(a <= prev + 1e-12, s"λ=$lam area $a > $prev")
      prev = a
      Wkt.read(star).asInstanceOf[MultiPoint].coords.grouped(2).foreach { p =>
        assert(Pred.covers(h, Point(p(0), p(1))), s"λ=$lam lost point ${p.toSeq}")
      }
    }
  }

  test("minimum bounding circle and oriented envelope match JTS") {
    var state = 1618033L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 40).foreach { trial =>
      val n = 3 + (frac() * 20).toInt
      val pts = Seq.fill(n)((frac() * 100, frac() * 100)).distinct
      if (pts.length >= 3) {
        val wkt = mp(pts)
        val (cx, cy, r) = Triangulate.minimumBoundingCircle(Wkt.read(wkt))
        val jmbc = new org.locationtech.jts.algorithm.MinimumBoundingCircle(reader.read(wkt))
        val jc = jmbc.getCentre; val jr = jmbc.getRadius
        assert(math.abs(r - jr) < 1e-6 * math.max(1, jr), s"trial $trial r=$r vs $jr")
        assert(math.hypot(cx - jc.x, cy - jc.y) < 1e-6, s"trial $trial center")
        // oriented envelope minimizes AREA; JTS MinimumDiameter's
        // rectangle minimizes WIDTH — ours must never be larger
        val obb = Triangulate.orientedEnvelope(Wkt.read(wkt))
        val jobb = org.locationtech.jts.algorithm.MinimumDiameter
          .getMinimumRectangle(reader.read(wkt))
        assert(Ops.area(obb) <= jobb.getArea * (1 + 1e-9),
          s"trial $trial obb ${Ops.area(obb)} vs JTS width-minimal ${jobb.getArea}")
        // the envelope covers every input point (to FP tolerance: hull
        // points ON the rect boundary can land 1 ulp outside)
        pts.foreach { case (x, y) =>
          assert(Pred.distance(obb, Point(x, y)) < 1e-9, s"trial $trial obb lost ($x,$y)")
        }
      }
    }
  }

  test("voronoi per-cell areas match JTS VoronoiDiagramBuilder") {
    val pts = Seq((1.0, 1.0), (8.0, 2.0), (4.0, 7.0), (6.5, 5.0), (2.0, 5.5), (9.0, 9.0))
    val env = Env(0, 0, 10, 10)
    val cells = Triangulate.voronoi(Wkt.read(mp(pts)), Some(env))
    val vdb = new org.locationtech.jts.triangulate.VoronoiDiagramBuilder()
    vdb.setSites(reader.read(mp(pts)))
    vdb.setClipEnvelope(new org.locationtech.jts.geom.Envelope(0, 10, 0, 10))
    val jd = vdb.getDiagram(gf)
    // JTS may return cells exceeding the clip env; intersect with the env
    val envPoly = reader.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val jtsAreas = (0 until jd.getNumGeometries)
      .map(i => jd.getGeometryN(i).intersection(envPoly).getArea).sorted
    val ourAreas = cells.map(Ops.area).sorted
    assert(ourAreas.length == jtsAreas.length)
    ourAreas.zip(jtsAreas).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"cell area $a vs JTS $b")
    }
  }

  // ---------------- ear-clip polygon triangulation ----------------

  test("ear clip: dyadic L-hexagon — exactly 4 triangles, exact 0.75wh area") {
    val (w, h) = (3.0, 2.0)
    val ring = Array(0.0, 0.0, w, 0.0, w, h / 2, w / 2, h / 2, w / 2, h, 0.0, h, 0.0, 0.0)
    val tris = Triangulate.triangulatePolygon(Polygon(Array(ring)))
    assert(tris.length == 4)
    assert(tris.map(Ops.area).sum == 0.75 * w * h) // dyadic — bit exact
    tris.foreach(t => assert(Ops.area(t) > 0))
  }

  test("ear clip: random star polygons — n-2 triangles covering the polygon") {
    var state = 314159L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 120).foreach { trial =>
      val n = 4 + (frac() * 28).toInt
      // sorted angles + positive radii ⇒ star-shaped ⇒ simple
      val angs = Seq.fill(n)(frac() * 2 * math.Pi).sorted.distinct
      if (angs.length >= 4) {
        val pts = angs.map { a =>
          val r = 0.4 + 0.6 * frac()
          (math.rint(r * math.cos(a) * 1e6) / 1e6, math.rint(r * math.sin(a) * 1e6) / 1e6)
        }.distinct
        val ringStr = (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString(", ")
        val jts = reader.read(s"POLYGON (($ringStr))")
        if (pts.length >= 4 && jts.isValid) {
          val g = Wkt.read(s"POLYGON (($ringStr))")
          val tris = Triangulate.triangulatePolygon(g)
          assert(tris.length == pts.length - 2, s"trial $trial count")
          val sum = tris.map(Ops.area).sum
          assert(math.abs(sum - jts.getArea) <= 1e-9 * math.max(1.0, jts.getArea),
            s"trial $trial area $sum vs ${jts.getArea}")
          // every triangle sits inside the polygon (centroid containment —
          // triangles tile the interior, so centroids are interior points)
          tris.foreach { t =>
            assert(Ops.area(t) > 0, s"trial $trial degenerate triangle")
            val c = Ops.centroid(t)
            assert(jts.contains(reader.read(Wkt.write(c))), s"trial $trial escape")
          }
        }
      }
    }
  }

  test("ear clip: reflex comb polygon (many concavities)") {
    // teeth: (0,0)(10,0)(10,4) then 5 downward notches along the top
    val top = (0 until 5).flatMap { i =>
      val x = 9.0 - 2 * i
      Seq((x, 4.0), (x - 0.5, 1.0), (x - 1.0, 4.0))
    }
    val pts = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 4.0)) ++ top.drop(1)
    val ringStr = (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString(", ")
    val jts = reader.read(s"POLYGON (($ringStr))")
    assert(jts.isValid)
    val tris = Triangulate.triangulatePolygon(Wkt.read(s"POLYGON (($ringStr))"))
    assert(tris.length == pts.length - 2)
    assert(math.abs(tris.map(Ops.area).sum - jts.getArea) < 1e-9)
  }

  test("ear clip: collinear vertices clean away; lines throw") {
    // square with a redundant mid-edge vertex: 5 verts → cleaned 4 → 2 tris
    val g = Wkt.read("POLYGON ((0 0, 1 0, 2 0, 2 2, 0 2, 0 0))")
    val tris = Triangulate.triangulatePolygon(g)
    assert(tris.length == 2)
    assert(tris.map(Ops.area).sum == 4.0)
    assertThrows[IllegalArgumentException](
      Triangulate.triangulatePolygon(Wkt.read("LINESTRING (0 0, 1 1)")))
  }

  test("ear clip with holes: exact dyadic areas, triangles stay in the face") {
    val holed = Wkt.read(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val jts = reader.read(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val tris = Triangulate.triangulatePolygon(holed)
    assert(tris.map(Ops.area).sum == 15.0) // dyadic coords — bit exact
    // 10-vertex bridged ring → ≤8 triangles; collapsed seam ears may skip
    assert(tris.length >= 7 && tris.length <= 8)
    tris.foreach { t =>
      assert(Ops.area(t) > 0)
      assert(jts.covers(reader.read(Wkt.write(Ops.centroid(t)))))
    }
    // two holes, one off-center (bridge order by min-x exercised)
    val two = "POLYGON ((0 0, 8 0, 8 4, 0 4, 0 0)," +
      " (1 1, 2 1, 2 2, 1 2, 1 1), (5 2, 6.5 2, 6.5 3, 5 3, 5 2))"
    val tris2 = Triangulate.triangulatePolygon(Wkt.read(two))
    assert(tris2.map(Ops.area).sum == 32.0 - 1.0 - 1.5)
    val jts2 = reader.read(two)
    tris2.foreach(t =>
      assert(jts2.covers(reader.read(Wkt.write(Ops.centroid(t))))))
  }

  test("ear clip with holes: random shell/hole fuzz vs JTS area") {
    var state = 987654321L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    var ran = 0
    (0 until 80).foreach { trial =>
      // star shell of radius ~[4,10]; star hole of radius ~[0.5,1.5] at center
      def star(n: Int, r0: Double, r1: Double, cx: Double, cy: Double): Seq[(Double, Double)] = {
        val angs = Seq.fill(n)(frac() * 2 * math.Pi).sorted.distinct
        angs.map { a =>
          val r = r0 + (r1 - r0) * frac()
          (math.rint((cx + r * math.cos(a)) * 1e6) / 1e6,
            math.rint((cy + r * math.sin(a)) * 1e6) / 1e6)
        }.distinct
      }
      val sh = star(6 + (frac() * 10).toInt, 4, 10, 0, 0)
      val hl = star(4 + (frac() * 6).toInt, 0.5, 1.5, 0, 0)
      if (sh.length >= 4 && hl.length >= 4) {
        def ring(pts: Seq[(Double, Double)]) =
          (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString(", ")
        val wkt = s"POLYGON ((${ring(sh)}), (${ring(hl)}))"
        val jts = reader.read(wkt)
        if (jts.isValid) {
          ran += 1
          val tris = Triangulate.triangulatePolygon(Wkt.read(wkt))
          val sum = tris.map(Ops.area).sum
          assert(math.abs(sum - jts.getArea) <= 1e-9 * jts.getArea,
            s"trial $trial area $sum vs ${jts.getArea}")
          tris.foreach { t =>
            assert(Ops.area(t) > 0)
            assert(jts.covers(reader.read(Wkt.write(Ops.centroid(t)))), s"trial $trial escape")
          }
        }
      }
    }
    assert(ran >= 40, s"only $ran valid fuzz cases ran")
  }
}
