package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/**
 * proj4-lite correctness: round-trips, and the projections' DEFINING
 * properties checked against independent formulas (meridian/parallel arc
 * integrals, conformality) — not against the code under test.
 */
class ProjSpec extends AnyFunSuite {

  /** Ellipsoidal meridian arc length by Simpson integration of
    * M(φ) = a(1−e²)/(1−e²sin²φ)^{3/2} — independent of the TM series. */
  private def meridianArc(ell: Proj.Ellipsoid, lat1: Double, lat2: Double): Double = {
    def m(phi: Double): Double = {
      val s = math.sin(phi)
      ell.a * (1 - ell.e2) / math.pow(1 - ell.e2 * s * s, 1.5)
    }
    val n = 10000
    val h = math.toRadians(lat2 - lat1) / n
    var s = m(math.toRadians(lat1)) + m(math.toRadians(lat2))
    var i = 1
    while (i < n) { s += (if (i % 2 == 1) 4 else 2) * m(math.toRadians(lat1) + i * h); i += 1 }
    s * h / 3
  }

  /** Exact parallel arc length: a·cosφ/√(1−e²sin²φ) · Δλ. */
  private def parallelArc(ell: Proj.Ellipsoid, lat: Double, dLonDeg: Double): Double = {
    val s = math.sin(math.toRadians(lat))
    ell.a * math.cos(math.toRadians(lat)) / math.sqrt(1 - ell.e2 * s * s) * math.toRadians(dLonDeg)
  }

  test("round-trips < 5e-8 degrees (~5 mm) across the whole EPSG table") {
    val cases = Seq(
      (32633, 15.3, 48.2), (32718, -75.0, -12.0), (25832, 9.7, 51.1),
      (26917, -80.2, 40.5), (28355, 147.9, -37.8), (27700, -0.1276, 51.5074),
      (2193, 174.78, -41.29), (3067, 25.5, 62.0), (2154, 2.3522, 48.8566),
      (3978, -106.0, 56.0), (3347, -91.0, 60.0), (26985, -76.6, 39.3))
    cases.foreach { case (srid, lon, lat) =>
      val (x, y) = Proj.forward(lon, lat, srid)
      val (lon2, lat2) = Proj.inverse(x, y, srid)
      // 5e-8° ≈ 5 mm; the Snyder series truncates at ~1e-8° a couple of
      // degrees off the central meridian (same order in the pinned Utm
      // impl) — far below the ±3 m documented accuracy of the OSGB Helmert
      assert(math.abs(lon2 - lon) < 5e-8 && math.abs(lat2 - lat) < 5e-8,
        s"EPSG:$srid round-trip ($lon,$lat)->($x,$y)->($lon2,$lat2)")
    }
  }

  test("generalized TM reproduces the pinned-tested Utm implementation") {
    Seq((32633, 14.2, 47.9), (32633, 16.9, 50.1), (32718, -74.3, -13.5)).foreach {
      case (srid, lon, lat) =>
        val (xa, ya) = Utm.forward(lon, lat, srid)
        val (xb, yb) = Proj.forward(lon, lat, srid)
        assert(math.abs(xa - xb) < 1e-6 && math.abs(ya - yb) < 1e-6,
          s"EPSG:$srid ($xa,$ya) vs ($xb,$yb)")
    }
  }

  test("TM scale along the central meridian equals k0 (vs meridian-arc integral)") {
    // NZTM (k0=0.9996, lon0=173): projected Δy over [−44°,−40°] on the CM
    // must be k0 × the independently integrated meridian arc
    val (_, y1) = Proj.forward(173.0, -44.0, 2193)
    val (_, y2) = Proj.forward(173.0, -40.0, 2193)
    val arc = meridianArc(Proj.GRS80, -44.0, -40.0)
    assert(math.abs((y2 - y1) / arc - 0.9996) < 1e-7, s"scale=${(y2 - y1) / arc}")
  }

  test("LCC standard parallels carry scale exactly 1 (vs parallel-arc formula)") {
    // Lambert-93: lat1=49, lat2=44 are the touch latitudes of the cone
    Seq(49.0, 44.0).foreach { lat =>
      val (x1, yy1) = Proj.forward(3.0, lat, 2154)
      val (x2, yy2) = Proj.forward(3.2, lat, 2154)
      val chord = math.hypot(x2 - x1, yy2 - yy1)
      val arc = parallelArc(Proj.GRS80, lat, 0.2)
      // projected parallel is a circular arc; chord/arc differs from scale
      // by O((Δθ)²) ≈ 1e-6 here — dominate it with the scale check at 1e-5
      assert(math.abs(chord / arc - 1.0) < 1e-5, s"lat=$lat scale=${chord / arc}")
    }
    // between the parallels scale < 1, outside > 1 (cone geometry)
    val (xa, ya) = Proj.forward(3.0, 46.5, 2154)
    val (xb, yb) = Proj.forward(3.05, 46.5, 2154)
    val mid = math.hypot(xb - xa, yb - ya) / parallelArc(Proj.GRS80, 46.5, 0.05)
    assert(mid < 1.0 && mid > 0.998, s"mid-cone scale $mid")
  }

  test("LCC is conformal: local scale isotropic at arbitrary points") {
    val d = 1e-4
    Seq((2154, 5.0, 47.0), (3978, -100.0, 55.0), (26985, -76.5, 39.0)).foreach {
      case (srid, lon, lat) =>
        val ell = Proj.crsFor(srid).get.proj.ell
        val (x0, y0) = Proj.forward(lon, lat, srid)
        val (xe, ye) = Proj.forward(lon + d, lat, srid)
        val (xn, yn) = Proj.forward(lon, lat + d, srid)
        val sEast = math.hypot(xe - x0, ye - y0) / parallelArc(ell, lat, d)
        val sNorth = math.hypot(xn - x0, yn - y0) / meridianArc(ell, lat, lat + d)
        assert(math.abs(sEast / sNorth - 1.0) < 1e-5,
          s"EPSG:$srid anisotropy ${sEast / sNorth}")
    }
  }

  test("projection of the grid origin lands on (FE, FN)") {
    // NZTM true origin (173E, 0N) → (1600000, 10000000)
    val (x, y) = Proj.forward(173.0, 0.0, 2193)
    assert(math.abs(x - 1600000) < 1e-6 && math.abs(y - 1e7) < 1e-6)
    // Lambert-93 origin (3E, 46.5N) → (700000, 6600000)
    val (lx, ly) = Proj.forward(3.0, 46.5, 2154)
    assert(math.abs(lx - 700000) < 1e-6 && math.abs(ly - 6600000) < 1e-6)
  }

  test("sanity windows on well-known city coordinates") {
    // central London ≈ (530000, 180000) on the OSGB grid (±3 km window —
    // catches wrong parameters/datum sign, tolerates Helmert-vs-OSTN15)
    val (ex, ny) = Proj.forward(-0.1276, 51.5074, 27700)
    assert(ex > 527000 && ex < 534000 && ny > 177000 && ny < 184000, s"London ($ex,$ny)")
    // Paris ≈ (652000, 6862000) in Lambert-93
    val (px, py) = Proj.forward(2.3522, 48.8566, 2154)
    assert(px > 648000 && px < 657000 && py > 6858000 && py < 6867000, s"Paris ($px,$py)")
    // Wellington ≈ (1748000, 5428000) in NZTM2000
    val (wx, wy) = Proj.forward(174.7762, -41.2865, 2193)
    assert(wx > 1744000 && wx < 1752000 && wy > 5424000 && wy < 5432000, s"Wellington ($wx,$wy)")
  }

  test("Albers IS equal-area: projected planar area == ellipsoidal area (vs areaGeodesic)") {
    // densify a lon/lat rect, project every vertex, take the PLANAR area of
    // the projected polygon and compare with the independent ellipsoidal
    // area — the defining property, no reference coordinates needed
    Seq((5070, -100.0, -90.0, 35.0, 42.0), (3577, 120.0, 145.0, -35.0, -20.0)).foreach {
      case (srid, x1, x2, y1, y2) =>
        val rect = Wkt.read(s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))")
        val dense = Ops.densify(rect, 0.02)
        val proj = Ops.mapCoords(dense, (lon, lat) => Proj.forward(lon, lat, srid))
        val planar = Ops.area(proj)
        val truth = Ops.areaGeodesic(rect)
        assert(math.abs(planar / truth - 1.0) < 1e-6,
          s"EPSG:$srid area ratio ${planar / truth}")
    }
  }

  test("polar stereographic: pole anchors, true scale at the standard parallel, conformal") {
    // poles project to the grid origin
    val (sx, sy) = Proj.forward(123.0, -90.0, 3031) // any lon at the pole
    assert(math.hypot(sx, sy) < 1e-6, s"south pole ($sx,$sy)")
    val (nx2, ny2) = Proj.forward(-7.0, 90.0, 3413)
    assert(math.hypot(nx2, ny2) < 1e-6, s"north pole ($nx2,$ny2)")
    // scale is exactly 1 along the standard parallel (71S / 70N)
    Seq((3031, -71.0), (3413, 70.0)).foreach { case (srid, lat) =>
      val (x1, y1) = Proj.forward(10.0, lat, srid)
      val (x2, y2) = Proj.forward(10.2, lat, srid)
      val ell = Proj.crsFor(srid).get.proj.ell
      val scale = math.hypot(x2 - x1, y2 - y1) / parallelArc(ell, lat, 0.2)
      assert(math.abs(scale - 1.0) < 1e-5, s"EPSG:$srid scale $scale at $lat")
    }
    // conformal: isotropic local scale away from the parallel
    val d = 1e-4
    Seq((3031, 100.0, -80.0), (3413, -45.0, 75.0)).foreach { case (srid, lon, lat) =>
      val ell = Proj.crsFor(srid).get.proj.ell
      val (x0, y0) = Proj.forward(lon, lat, srid)
      val (xe, ye) = Proj.forward(lon + d, lat, srid)
      val (xn, yn) = Proj.forward(lon, lat + d, srid)
      val sEast = math.hypot(xe - x0, ye - y0) / parallelArc(ell, lat, d)
      val sNorth = math.hypot(xn - x0, yn - y0) / meridianArc(ell, lat, lat + d)
      assert(math.abs(sEast / sNorth - 1.0) < 1e-5, s"EPSG:$srid anisotropy ${sEast / sNorth}")
    }
    // round trips
    Seq((3031, 166.67, -77.85), (3031, -60.0, -75.0), (3413, -45.0, 80.0),
      (3413, 120.0, 66.0), (5070, -96.5, 39.0), (3577, 133.0, -25.0)).foreach {
      case (srid, lon, lat) =>
        val (x, y) = Proj.forward(lon, lat, srid)
        val (lon2, lat2) = Proj.inverse(x, y, srid)
        assert(math.abs(lon2 - lon) < 5e-8 && math.abs(lat2 - lat) < 5e-8,
          s"EPSG:$srid round-trip ($lon,$lat)->($lon2,$lat2)")
    }
  }

  test("st_transform end-to-end through Ops for a new CRS, incl. cross-CRS pivot") {
    val g = Wkt.read("POINT (2.3522 48.8566)")
    val p = Ops.transform(g, 4326, 2154).asInstanceOf[Point]
    val back = Ops.transform(Point(p.x, p.y), 2154, 4326).asInstanceOf[Point]
    assert(math.abs(back.x - 2.3522) < 1e-9 && math.abs(back.y - 48.8566) < 1e-9)
    // 2154 → 27700 pivots through WGS84 (and a datum shift on the way in)
    val uk = Ops.transform(Ops.transform(Wkt.read("POINT (-0.1276 51.5074)"), 4326, 2154), 2154, 27700)
      .asInstanceOf[Point]
    val direct = Ops.transform(Wkt.read("POINT (-0.1276 51.5074)"), 4326, 27700).asInstanceOf[Point]
    assert(math.abs(uk.x - direct.x) < 1e-6 && math.abs(uk.y - direct.y) < 1e-6)
  }
}
