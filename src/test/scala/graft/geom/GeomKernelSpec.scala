package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Golden kernel tests (FIXTURES.md §F3) — WKT in → value out. */
class GeomKernelSpec extends AnyFunSuite {

  def g(wkt: String): Geometry = Wkt.read(wkt)

  val poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
  val roundTrips = Seq(
    "POINT (1 2)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1 1, 2 0)",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    poly,
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "POLYGON EMPTY",
    "LINESTRING EMPTY"
  )

  test("WKT round-trip") {
    roundTrips.foreach { w => assert(Wkt.write(Wkt.read(w)) == w, s"for $w") }
  }

  test("WKB round-trip") {
    roundTrips.foreach { w =>
      assert(Wkt.write(Wkb.read(Wkb.write(Wkt.read(w)))) == w, s"for $w")
    }
  }

  test("GeoJSON round-trip") {
    roundTrips.filterNot(_.contains("EMPTY")).foreach { w =>
      assert(Wkt.write(GeoJson.read(GeoJson.write(Wkt.read(w)))) == w, s"for $w")
    }
  }

  test("WKT tolerates alternate multipoint style and whitespace") {
    assert(Wkt.write(Wkt.read("MULTIPOINT (1 2, 3 4)")) == "MULTIPOINT ((1 2), (3 4))")
    assert(Wkt.write(Wkt.read("  point( 1.5   -2.25 ) ")) == "POINT (1.5 -2.25)")
  }

  test("area/length/perimeter") {
    assert(Ops.area(g(poly)) == 96.0) // 100 - 4 hole
    assert(Ops.length(g("LINESTRING (0 0, 3 4)")) == 5.0)
    assert(Ops.length(g(poly)) == 48.0) // 40 shell + 8 hole
  }

  test("predicates: disjoint / touches / overlaps / equals / contains") {
    val a = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = g("POLYGON ((3 0, 5 0, 5 2, 3 2, 3 0))") // disjoint
    val c = g("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))") // touches a along edge
    val d = g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))") // overlaps a
    val e = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") // equals a
    assert(Pred.disjoint(a, b))
    assert(!Pred.intersects(a, b))
    assert(Pred.touches(a, c))
    assert(Pred.intersects(a, c))
    assert(!Pred.overlaps(a, c))
    assert(Pred.overlaps(a, d))
    assert(Pred.intersects(a, d))
    assert(!Pred.touches(a, d))
    assert(Pred.equalsTopo(a, e))
    assert(Pred.contains(a, g("POINT (1 1)")))
    assert(!Pred.contains(a, g("POINT (0 0)"))) // boundary not contained
    assert(Pred.covers(a, g("POINT (0 0)")))
    assert(Pred.intersects(a, g("POINT (0 0)")))
    assert(Pred.within(g("POINT (1 1)"), a))
  }

  test("point in polygon with hole") {
    val p = g(poly)
    assert(Pred.contains(p, g("POINT (5 5)")))
    assert(!Pred.contains(p, g("POINT (3 3)"))) // inside hole
    assert(!Pred.contains(p, g("POINT (2 3)"))) // hole boundary
    assert(Pred.intersects(p, g("POINT (2 3)")))
  }

  test("crosses: line crossing polygon, line crossing line") {
    val a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val l = g("LINESTRING (-1 2, 5 2)")
    assert(Pred.crosses(l, a))
    assert(Pred.intersects(l, a))
    val l2 = g("LINESTRING (0 0, 4 4)")
    val l3 = g("LINESTRING (0 4, 4 0)")
    assert(Pred.crosses(l2, l3))
    assert(!Pred.crosses(l2, l2))
    assert(Pred.equalsTopo(l2, l2))
  }

  test("relate matrices for fixture families") {
    val a = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val c = g("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")
    assert(Pred.relate(a, c) == "FF2F11212") // edge touch
    val b = g("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
    assert(Pred.relate(a, b) == "FF2FF1212") // disjoint
    assert(Pred.relateMatch(a, c, "FT*******") || Pred.relateMatch(a, c, "F***T****"))
  }

  test("distance") {
    assert(Pred.distance(g("POINT (0 0)"), g("POINT (3 4)")) == 5.0)
    assert(Pred.distance(g("POINT (0 0)"), g("LINESTRING (2 -1, 2 1)")) == 2.0)
    val a = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    val b = g("POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))")
    assert(Pred.distance(a, b) == 2.0)
    assert(Pred.distance(a, g("POINT (0.5 0.5)")) == 0.0)
  }

  test("convex hull") {
    val h = Ops.convexHull(g("MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 2), (1 1))"))
    assert(Ops.area(h) == 16.0)
    assert(Pred.contains(h, g("POINT (2 2)")))
    val line = Ops.convexHull(g("MULTIPOINT ((0 0), (1 1))"))
    assert(line.isInstanceOf[LineString])
  }

  test("generalize (Douglas-Peucker)") {
    val l = g("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    val out = Ops.generalize(l, 0.1).asInstanceOf[LineString]
    assert(out.numPoints == 2)
    assert(Wkt.write(out) == "LINESTRING (0 0, 4 0)")
  }

  test("densify") {
    val out = Ops.densify(g("LINESTRING (0 0, 10 0)"), 3.0).asInstanceOf[LineString]
    assert(out.numPoints == 5) // 0, 2.5, 5, 7.5, 10
    assert(Ops.length(out) == 10.0)
  }

  test("clip") {
    val env = Env(0, 0, 5, 5)
    val p = Ops.clip(g("POLYGON ((-2 -2, 8 -2, 8 8, -2 8, -2 -2))"), env)
    assert(Ops.area(p) == 25.0)
    val l = Ops.clip(g("LINESTRING (-5 2, 10 2)"), env).asInstanceOf[LineString]
    assert(Ops.length(l) == 5.0)
    assert(Ops.clip(g("POINT (6 6)"), env).isEmpty)
    assert(!Ops.clip(g("POINT (1 1)"), env).isEmpty)
  }

  test("buffer: point area within tolerance; polygon chain buffer->simplify->intersects") {
    val b = Ops.buffer(g("POINT (0 0)"), 2.0)
    val exact = math.Pi * 4
    assert(math.abs(Ops.area(b) - exact) / exact < 0.01) // 96-gon within 1%
    assert(Pred.contains(b, g("POINT (0 0)")))
    assert(Pred.contains(b, g("POINT (1.9 0)")))
    // north_star chain: buffer -> simplify -> intersects (convex polygon)
    val sq = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val buf = Ops.simplify(Ops.buffer(sq, 2.0))
    val analytic = 16.0 + 16.0 * 2.0 + math.Pi * 4 // A + P*d + pi*d^2
    assert(math.abs(Ops.area(buf) - analytic) / analytic < 0.01)
    assert(Pred.contains(buf, sq))
    assert(Pred.intersects(buf, g("POLYGON ((-3 -3, -1 -3, -1 -1, -3 -1, -3 -3))")))
    assert(!Pred.intersects(buf, g("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")))
  }

  test("line buffer contains its line") {
    val l = g("LINESTRING (0 0, 4 0, 4 4)")
    val b = Ops.buffer(l, 1.0)
    assert(Pred.intersects(b, g("POINT (2 0)")))
    assert(Pred.intersects(b, g("POINT (4 2)")))
    assert(!Pred.intersects(b, g("POINT (0 3)")))
  }

  test("transform 4326 <-> 3857 golden values") {
    val p0 = Ops.transform(g("POINT (0 0)"), 4326, 3857).asInstanceOf[Point]
    assert(p0.x == 0.0 && p0.y == 0.0)
    val p180 = Ops.transform(g("POINT (180 0)"), 4326, 3857).asInstanceOf[Point]
    assert(math.abs(p180.x - 20037508.342789244) < 1e-6)
    val rt = Ops.transform(Ops.transform(g("POINT (12.5 41.9)"), 4326, 3857), 3857, 4326).asInstanceOf[Point]
    assert(math.abs(rt.x - 12.5) < 1e-9 && math.abs(rt.y - 41.9) < 1e-9)
  }

  test("spherical area of 1x1 degree box near equator ~ 12364 km^2") {
    val box = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    val a = Ops.areaSphere(box) / 1e6 // km^2
    assert(math.abs(a - 12364) / 12364 < 0.01, s"got $a")
  }

  test("haversine length") {
    val l = Ops.lengthSphere(g("LINESTRING (0 0, 1 0)"))
    assert(math.abs(l - 111195) / 111195 < 0.01, s"got $l") // 1 deg at equator
  }

  test("simplify canonicalizes orientation and dedupes") {
    val p = g("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))") // CW shell
    val s = Ops.simplify(p).asInstanceOf[Polygon]
    assert(Ops.signedRingArea(s.rings(0)) > 0) // CCW after
    val l = Ops.simplify(g("LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)")).asInstanceOf[LineString]
    assert(l.numPoints == 3)
  }

  test("random points are deterministic and inside") {
    val p = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val a = Ops.randomPoints(p, 50, 42L)
    val b = Ops.randomPoints(p, 50, 42L)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
    var i = 0
    while (i < a.length) {
      assert(Pred.pointInPolygon(p.asInstanceOf[Polygon].rings, a(i), a(i + 1)) == 1)
      i += 2
    }
  }

  test("cut line by blade") {
    val parts = Ops.cut(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (5 -1, 5 1)"))
    assert(parts.length == 2)
    assert(Ops.length(parts(0)) == 5.0 && Ops.length(parts(1)) == 5.0)
  }

  test("closest point") {
    val cp = Ops.closestPoint(g("LINESTRING (0 0, 10 0)"), Point(3, 4))
    assert(cp == Point(3, 0))
  }

  test("affine") {
    val p = Ops.affine(g("POINT (1 2)"), 2, 0, 0, 2, 10, 20).asInstanceOf[Point]
    assert(p == Point(12, 24))
  }

  test("centroid") {
    val c = Ops.centroid(g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(c == Point(2, 2))
  }
}

class UtmSpec extends AnyFunSuite {
  test("UTM golden values and round-trip") {
    // central meridian of zone 33N at the equator → (500000, 0)
    val (x0, y0) = Utm.forward(15.0, 0.0, 32633)
    assert(math.abs(x0 - 500000.0) < 1e-6 && math.abs(y0) < 1e-6)
    // meridian arc for the first degree (~110574.4 m) scaled by k0 = 0.9996
    val (_, y1) = Utm.forward(15.0, 1.0, 32633)
    assert(math.abs(y1 - 110574.39 * 0.9996) < 1.0, s"y1=$y1")
    // southern hemisphere false northing
    val (_, ys) = Utm.forward(15.0, -1.0, 32733)
    assert(ys > 9.8e6 && ys < 1e7)
    // round-trips across the zone
    var lon = 12.0
    while (lon <= 18.0) {
      var lat = -80.0
      while (lat <= 80.0) {
        val (x, y) = Utm.forward(lon, lat, 32633)
        val (lon2, lat2) = Utm.inverse(x, y, 32633)
        assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7, // series ~1 mm
          s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
        lat += 7.3
      }
      lon += 1.1
    }
    // via the geometry API
    val p = Ops.transform(Point(12.5, 41.9), 4326, 32633).asInstanceOf[Point]
    val back = Ops.transform(p, 32633, 4326).asInstanceOf[Point]
    assert(math.abs(back.x - 12.5) < 1e-8 && math.abs(back.y - 41.9) < 1e-8)
  }
}
