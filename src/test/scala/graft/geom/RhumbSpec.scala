package graft.geom

import graft.sql.K
import org.scalatest.funsuite.AnyFunSuite

/** K.rhumbDistance / K.rhumbBearing closed forms: equator and meridian
  * sailings, bearing compass points, antimeridian wrap, the
  * loxodrome ≥ great-circle inequality, and a textbook 45°-course
  * consistency check (dep = dist·sin(course) equals R·q·dλ). */
class RhumbSpec extends AnyFunSuite {

  private val R = 6371008.8
  private val eps = 1e-6

  test("equator sailing: distance R*dlon, bearing east/west") {
    val d = K.rhumbDistance(10.0, 0.0, 20.0, 0.0)
    assert(math.abs(d - R * math.toRadians(10.0)) < eps * d)
    assert(math.abs(K.rhumbBearing(10.0, 0.0, 20.0, 0.0) - 90.0) < 1e-9)
    assert(math.abs(K.rhumbBearing(20.0, 0.0, 10.0, 0.0) + 90.0) < 1e-9)
  }

  test("meridian sailing: distance R*dlat, bearing north/south") {
    val d = K.rhumbDistance(5.0, -10.0, 5.0, 30.0)
    assert(math.abs(d - R * math.toRadians(40.0)) < eps * d)
    assert(math.abs(K.rhumbBearing(5.0, -10.0, 5.0, 30.0)) < 1e-9)
    assert(math.abs(math.abs(K.rhumbBearing(5.0, 30.0, 5.0, -10.0)) - 180.0) < 1e-9)
  }

  test("constant-latitude sailing shrinks by cos(lat)") {
    val d60 = K.rhumbDistance(10.0, 60.0, 20.0, 60.0)
    assert(math.abs(d60 - R * math.toRadians(10.0) * math.cos(math.toRadians(60.0))) < eps * d60)
  }

  test("antimeridian wrap: 179.9E to 179.9W is 0.2 degrees, eastward") {
    val d = K.rhumbDistance(179.9, 0.0, -179.9, 0.0)
    assert(math.abs(d - R * math.toRadians(0.2)) < 1.0)
    assert(math.abs(K.rhumbBearing(179.9, 0.0, -179.9, 0.0) - 90.0) < 1e-9)
  }

  test("loxodrome >= great circle on 2000 random pairs; coincident -> 0") {
    val rnd = new scala.util.Random(20260819)
    (0 until 2000).foreach { _ =>
      val lon1 = rnd.nextDouble() * 360 - 180; val lat1 = rnd.nextDouble() * 160 - 80
      val lon2 = rnd.nextDouble() * 360 - 180; val lat2 = rnd.nextDouble() * 160 - 80
      val rh = K.rhumbDistance(lon1, lat1, lon2, lat2)
      val gc = K.distanceSphere(lon1, lat1, lon2, lat2)
      assert(rh >= gc - 1e-6 * math.max(1.0, gc),
        s"loxodrome $rh < great circle $gc at ($lon1,$lat1)->($lon2,$lat2)")
    }
    assert(K.rhumbDistance(12.3, 45.6, 12.3, 45.6) == 0.0)
    assert(K.rhumbBearing(12.3, 45.6, 12.3, 45.6) == 0.0)
  }

  test("departure consistency: dist*sin(bearing) = R*q*dlam on a slanted course") {
    val (lon1, lat1, lon2, lat2) = (3.0, 10.0, 17.0, 42.0)
    val d = K.rhumbDistance(lon1, lat1, lon2, lat2)
    val brg = math.toRadians(K.rhumbBearing(lon1, lat1, lon2, lat2))
    val dl = math.toRadians(lon2 - lon1)
    val df = math.toRadians(lat2 - lat1)
    val q = df / math.log(math.tan(math.Pi / 4 + math.toRadians(lat2) / 2) /
      math.tan(math.Pi / 4 + math.toRadians(lat1) / 2))
    assert(math.abs(d * math.sin(brg) - R * q * dl) < 1e-4 * d)
    assert(math.abs(d * math.cos(brg) - R * df) < 1e-4 * d)
  }
}
