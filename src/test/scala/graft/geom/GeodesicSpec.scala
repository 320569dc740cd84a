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
}
