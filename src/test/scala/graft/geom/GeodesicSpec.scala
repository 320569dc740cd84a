package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Vincenty ellipsoidal distance vs well-known WGS84 constants. */
class GeodesicSpec extends AnyFunSuite {

  test("quarter meridian = 10,001,965.73 m") {
    val d = Ops.vincenty(0, 0, 0, 90)
    assert(math.abs(d - 10001965.729) < 1.0, s"got $d")
  }

  test("equatorial 90-degree arc = a*pi/2 = 10,018,754.17 m") {
    val d = Ops.vincenty(0, 0, 90, 0)
    assert(math.abs(d - 10018754.171) < 1.0, s"got $d")
  }

  test("one-degree arcs: equator 111,319.49 m; meridian at equator 110,574.39 m") {
    assert(math.abs(Ops.vincenty(0, 0, 1, 0) - 111319.491) < 0.5)
    assert(math.abs(Ops.vincenty(0, 0, 0, 1) - 110574.389) < 0.5)
  }

  test("symmetric and within 0.6% of the spherical value on random pairs") {
    var state = 17L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 300).foreach { _ =>
      val lon1 = -180 + 360 * frac(); val lat1 = -80 + 160 * frac()
      val lon2 = -180 + 360 * frac(); val lat2 = -80 + 160 * frac()
      val d = Ops.vincenty(lon1, lat1, lon2, lat2)
      val dRev = Ops.vincenty(lon2, lat2, lon1, lat1)
      assert(math.abs(d - dRev) < 1e-6 * math.max(1.0, d), "asymmetric")
      val h = Ops.haversine(lon1, lat1, lon2, lat2)
      if (h > 1000) // skip degenerate tiny distances
        assert(math.abs(d - h) / h < 0.006, s"($lon1,$lat1)→($lon2,$lat2) vin=$d hav=$h")
    }
  }

  test("st_length_geodesic of a closed ring sums the segments") {
    // 1°×1° square at the equator: bottom+top ≈ 111319.49 + 111302.6, sides = meridian arcs
    val sq = Wkt.read("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    val len = Ops.lengthGeodesic(sq)
    assert(len > 4.4e5 && len < 4.46e5, s"got $len")
  }

  // ---------------- ellipsoidal area ----------------

  /** Independent oracle: Simpson integration of the EXACT WGS84 surface
    * area element a²(1−e²)cosφ/(1−e²sin²φ)² over a lon/lat rectangle —
    * a different formula path than the authalic q-function under test. */
  private def rectAreaByIntegration(lon1: Double, lon2: Double,
                                    lat1: Double, lat2: Double): Double = {
    val a = 6378137.0; val f = 1.0 / 298.257223563; val e2 = f * (2 - f)
    def el(phi: Double): Double = {
      val s = math.sin(phi); val d = 1 - e2 * s * s
      a * a * (1 - e2) * math.cos(phi) / (d * d)
    }
    val n = 20000 // Simpson over latitude; longitude integrates trivially
    val h = (math.toRadians(lat2) - math.toRadians(lat1)) / n
    var s = el(math.toRadians(lat1)) + el(math.toRadians(lat2))
    var i = 1
    while (i < n) {
      s += (if (i % 2 == 1) 4 else 2) * el(math.toRadians(lat1) + i * h)
      i += 1
    }
    s * h / 3 * (math.toRadians(lon2) - math.toRadians(lon1))
  }

  test("st_area_geodesic: whole ellipsoid pins the authalic radius 6371007.1810 m") {
    val world = Wkt.read("POLYGON ((-180 -90, 180 -90, 180 90, -180 90, -180 -90))")
    val area = Ops.areaGeodesic(world)
    val rAuth = math.sqrt(area / (4 * math.Pi))
    assert(math.abs(rAuth - 6371007.1810) < 0.01, s"authalic radius $rAuth")
  }

  test("st_area_geodesic matches exact-element integration on rectangles (<1e-9 rel)") {
    val cases = Seq((0.0, 1.0, 0.0, 1.0), (10.0, 12.5, 45.0, 47.0),
      (-120.0, -100.0, 60.0, 75.0), (5.0, 6.0, -80.0, -70.0))
    cases.foreach { case (x1, x2, y1, y2) =>
      val g = Wkt.read(s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))")
      val got = Ops.areaGeodesic(g)
      val want = rectAreaByIntegration(x1, x2, y1, y2)
      assert(math.abs(got - want) / want < 1e-9, s"[$x1,$x2]x[$y1,$y2]: got=$got want=$want")
    }
  }

  test("st_area_geodesic differs from spherical by the expected spheroid bias") {
    // vs the MEAN-radius sphere the ellipsoid area element is larger near
    // the poles (×a²/((1−e²)R²) ≈ 1.009 at 90°) and smaller at the equator
    // (×a²(1−e²)/R² ≈ 0.9955) — the bias anyone summing zone areas at high
    // latitude pays with the spherical formula
    val high = Wkt.read("POLYGON ((0 60, 10 60, 10 70, 0 70, 0 60))")
    val ratioH = Ops.areaSphere(high) / Ops.areaGeodesic(high)
    assert(ratioH > 0.991 && ratioH < 0.998, s"high-lat ratio $ratioH")
    val eq = Wkt.read("POLYGON ((0 -5, 10 -5, 10 5, 0 5, 0 -5))")
    val ratioE = Ops.areaSphere(eq) / Ops.areaGeodesic(eq)
    assert(ratioE > 1.002 && ratioE < 1.008, s"equatorial ratio $ratioE")
  }

  test("st_area_geodesic: holes subtract; triangle close to integration") {
    val withHole = Wkt.read(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val outer = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val hole = Wkt.read("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    val got = Ops.areaGeodesic(withHole)
    val want = Ops.areaGeodesic(outer) - Ops.areaGeodesic(hole)
    assert(math.abs(got - want) / want < 1e-12)
    // slanted edges: CD-on-authalic-sphere vs planar-decomposition bound —
    // half the 1°x1° square at 45°N, against half the rectangle integral
    // corrected by the known triangle/rect spherical split ≈ tiny; allow 1e-4
    val tri = Wkt.read("POLYGON ((10 45, 11 45, 10 46, 10 45))")
    val rect = rectAreaByIntegration(10, 11, 45, 46)
    val triArea = Ops.areaGeodesic(tri)
    assert(math.abs(triArea / (rect / 2) - 1.0) < 2e-3, s"tri=$triArea rect/2=${rect / 2}")
  }

  // ---------------- direct problem (r4) ----------------

  test("vincentyDirect: known arcs invert the inverse constants") {
    // 90° along the equator from (0,0) heading east → (90, 0)
    val (lonE, latE) = Ops.vincentyDirect(0, 0, 90, 10018754.171)
    assert(math.abs(lonE - 90) < 1e-6 && math.abs(latE) < 1e-6, s"($lonE,$latE)")
    // quarter meridian north from (0,0) → the pole
    val (_, latN) = Ops.vincentyDirect(0, 0, 0, 10001965.729)
    assert(math.abs(latN - 90) < 1e-6, s"lat=$latN")
  }

  test("direct ∘ inverse round-trips distance and azimuth on random pairs") {
    var state = 99L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 500).foreach { _ =>
      val lon1 = -180 + 360 * frac(); val lat1 = -80 + 160 * frac()
      val az = 360 * frac(); val s = 10.0 + 5.0e6 * frac()
      val (lon2, lat2) = Ops.vincentyDirect(lon1, lat1, az, s)
      val d = Ops.vincenty(lon1, lat1, lon2, lat2)
      assert(math.abs(d - s) < 1e-3 + 1e-9 * s, s"dist $d vs $s")
      val azBack = Ops.vincentyAzimuth(lon1, lat1, lon2, lat2)
      val dAz = math.min(math.abs(azBack - az), 360 - math.abs(azBack - az))
      assert(dAz < 1e-6, s"az $azBack vs $az")
    }
  }

  test("point geodesic buffer: every vertex at exactly r (1e-6 relative)") {
    Seq((0.0, 0.0, 50000.0), (-73.97, 40.78, 120000.0), (18.0, -72.5, 5000.0),
        (151.2, -33.9, 250000.0)).foreach { case (lon, lat, r) =>
      val buf = Ops.geodesicBuffer(Point(lon, lat), r)
      val p = buf.asInstanceOf[Polygon]
      val ring = p.rings(0)
      assert(ring.length == 97 * 2, s"ring pts ${ring.length / 2}")
      var i = 0
      while (i + 1 < ring.length) {
        val d = Ops.vincenty(lon, lat, ring(i), ring(i + 1))
        assert(math.abs(d / r - 1.0) < 1e-6, s"vertex $i at $d vs $r")
        i += 2
      }
      // CCW shell (positive signed area in lon/lat)
      assert(Ops.area(p) > 0, "shell must be CCW")
    }
  }
}
