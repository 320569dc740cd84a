package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader

/** Staged overlay vs JTS on the supported cases (SURVEY §2.3). */
class OverlaySpec extends AnyFunSuite {

  val reader = new WKTReader()
  def jts(w: String): org.locationtech.jts.geom.Geometry = reader.read(w)
  def ours(w: String): Geometry = Wkt.read(w)

  var state = 99L
  def nextInt(bound: Int): Int = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17
    (math.abs(state) % bound).toInt
  }

  def randRect(): String = {
    val x = nextInt(15); val y = nextInt(15)
    val w = 1 + nextInt(6); val h = 1 + nextInt(6)
    s"POLYGON (($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))"
  }
  def randTriangle(): String = {
    var ax = 0; var ay = 0; var bx = 0; var by = 0; var cx = 0; var cy = 0
    do {
      ax = nextInt(20); ay = nextInt(20); bx = nextInt(20); by = nextInt(20)
      cx = nextInt(20); cy = nextInt(20)
    } while ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) == 0)
    s"POLYGON (($ax $ay, $bx $by, $cx $cy, $ax $ay))"
  }
  def randLine(): String = {
    val n = 2 + nextInt(4)
    s"LINESTRING (${Seq.fill(n)(s"${nextInt(20)} ${nextInt(20)}").mkString(", ")})"
  }

  test("polygon x convex polygon intersection area matches JTS") {
    (0 until 300).foreach { _ =>
      val wa = randRect()
      val wb = if (nextInt(2) == 0) randRect() else randTriangle()
      val got = Ops.area(Overlay.intersection(ours(wa), ours(wb)))
      val want = jts(wa).intersection(jts(wb)).getArea
      assert(math.abs(got - want) < 1e-9, s"a=$wa b=$wb got=$got want=$want")
    }
  }

  test("line x polygon intersection length matches JTS") {
    (0 until 300).foreach { _ =>
      val wl = randLine()
      val wp = if (nextInt(2) == 0) randRect() else randTriangle()
      if (jts(wl).isSimple) {
        val got = Ops.length(Overlay.intersection(ours(wl), ours(wp)))
        val want = jts(wl).intersection(jts(wp)).getLength
        assert(math.abs(got - want) < 1e-9, s"l=$wl p=$wp got=$got want=$want")
      }
    }
  }

  test("line x polygon difference length matches JTS") {
    (0 until 300).foreach { _ =>
      val wl = randLine()
      val wp = randRect()
      // JTS nodes+dissolves self-overlapping (non-simple) lines; restrict the
      // corpus to simple inputs where set semantics coincide
      if (jts(wl).isSimple) {
        val got = Ops.length(Overlay.difference(ours(wl), ours(wp)))
        val want = jts(wl).difference(jts(wp)).getLength
        assert(math.abs(got - want) < 1e-9, s"l=$wl p=$wp got=$got want=$want")
      }
    }
  }

  test("puntal intersection/difference/union vs JTS") {
    (0 until 200).foreach { _ =>
      val pts = Seq.fill(1 + nextInt(6))(s"(${nextInt(10)} ${nextInt(10)})").distinct
      val wm = s"MULTIPOINT (${pts.mkString(", ")})"
      val wp = randRect()
      val gotI = Overlay.intersection(ours(wm), ours(wp))
      val wantI = jts(wm).intersection(jts(wp))
      assert(gotI.numPoints == wantI.getNumPoints, s"m=$wm p=$wp inter")
      val gotD = Overlay.difference(ours(wm), ours(wp))
      val wantD = jts(wm).difference(jts(wp))
      assert(gotD.numPoints == wantD.getNumPoints, s"m=$wm p=$wp diff")
    }
  }

  test("line x line intersection: crossing points and collinear overlaps") {
    val x = Overlay.intersection(ours("LINESTRING (0 0, 4 4)"), ours("LINESTRING (0 4, 4 0)"))
    assert(Wkt.write(x) == "POINT (2 2)")
    val o = Overlay.intersection(ours("LINESTRING (0 0, 4 0)"), ours("LINESTRING (2 0, 6 0)"))
    assert(Ops.length(o) == 2.0)
  }

  test("containment and disjoint fast paths; unsupported concave pair throws") {
    val big = ours("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val small = ours("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(Ops.area(Overlay.intersection(big, small)) == 4.0)
    assert(Ops.area(Overlay.union(big, small)) == 100.0)
    val far = ours("POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))")
    assert(Ops.area(Overlay.union(big, far)) == 101.0)
    assert(Overlay.intersection(big, far).isEmpty)
    // concave x concave now routes through Greiner-Hormann
    val concaveA = ours("POLYGON ((0 0, 6 0, 6 6, 3 3, 0 6, 0 0))")
    val concaveB = ours("POLYGON ((1 -1, 7.3 -1, 7.3 5.2, 4.1 2.2, 1 5.4, 1 -1))")
    val got = Ops.area(Overlay.intersection(concaveA, concaveB))
    val want = jts(Wkt.write(concaveA)).intersection(jts(Wkt.write(concaveB))).getArea
    assert(math.abs(got - want) < 1e-9, s"got=$got want=$want")
  }

  test("geodesic buffer: exact ellipsoidal circle at any latitude (Vincenty direct)") {
    Seq((12.5, 41.9), (10.0, 80.0), (-120.0, -75.0), (0.0, 0.0)).foreach { case (lon, lat) =>
      val b = Ops.geodesicBuffer(Point(lon, lat), 1000.0) // 1 km
      // r4: point buffers are ellipsoidal (direct geodesic vertices), so the
      // ELLIPSOIDAL area must be pi r^2 up to 96-gon tessellation (~0.21%)
      val areaM2 = Ops.areaGeodesic(b)
      val exact = math.Pi * 1000 * 1000
      assert(math.abs(areaM2 - exact) / exact < 0.005, s"($lon,$lat) got $areaM2")
    }
    // extended geometry at high latitude: buffered zone contains the input
    val zone = Wkt.read("POLYGON ((9 79, 11 79, 11 80, 9 80, 9 79))")
    val bz = Ops.geodesicBuffer(zone, 5000.0)
    assert(Pred.covers(bz, zone), "buffer must cover the input")
  }

  test("offset of straight line is parallel at distance d") {
    val off = Ops.offset(Wkt.read("LINESTRING (0 0, 10 0)"), 2.0).asInstanceOf[LineString]
    assert(off.coords.toSeq == Seq(0.0, -2.0, 10.0, -2.0))
  }

  test("generalize by area removes small-triangle vertices") {
    val l = Wkt.read("LINESTRING (0 0, 5 0.1, 10 0)")
    val out = Ops.generalizeByArea(l, 1.0).asInstanceOf[LineString]
    assert(out.numPoints == 2)
  }

  test("geodetic densify: no segment longer than bound") {
    val out = Ops.geodeticDensify(Wkt.read("LINESTRING (0 0, 2 0)"), 50000.0).asInstanceOf[LineString]
    assert(out.numPoints >= 5)
    var i = 0
    while (i + 3 < out.coords.length) {
      assert(Ops.haversine(out.coords(i), out.coords(i + 1), out.coords(i + 2), out.coords(i + 3)) <= 50001)
      i += 2
    }
  }
}
