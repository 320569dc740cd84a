package graft.geom

import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

/** snaptogrid / reverse / boundary / pointonsurface / isclosed / azimuth /
  * hausdorff on irregular shapes, pinned against JTS where it has the
  * operator (q74 covers the rectangular closed forms). */
class UtilOpsSpec extends AnyFunSuite {

  private val reader = new WKTReader()
  private val star = "POLYGON ((5 0, 6 4, 10 5, 6 6, 5 10, 4 6, 0 5, 4 4, 5 0))"
  private val hole = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
  private val zig = "LINESTRING (0 0, 3 1, 5 -1, 8 2)"

  test("boundary matches JTS on polygon-with-hole and open line") {
    val b = Ops.boundary(Wkt.read(hole))
    val jb = reader.read(hole).getBoundary
    assert(Ops.length(b) == jb.getLength)
    assert(b.asInstanceOf[MultiLineString].lines.length == 2)
    val lb = Ops.boundary(Wkt.read(zig)).asInstanceOf[MultiPoint]
    assert(lb.coords.toSeq == Seq(0.0, 0.0, 8.0, 2.0))
    // closed line → empty boundary
    assert(Ops.boundary(Wkt.read("LINESTRING (0 0, 1 0, 1 1, 0 0)")).isEmpty)
    // mod-2: the Y junction has degree 3 (odd) → it IS boundary, like the
    // three leaf endpoints: 4 boundary points total (matches JTS)
    val yWkt = "MULTILINESTRING ((0 0, 1 1), (2 0, 1 1), (1 1, 1 3))"
    val y = Ops.boundary(Wkt.read(yWkt))
    assert(y.asInstanceOf[MultiPoint].coords.length / 2 == 4)
    assert(reader.read(yWkt).getBoundary.getNumGeometries == 4)
  }

  test("reverse: involution, start/end swap, Z stream rides per part") {
    val l = Wkt.read(zig)
    val r = Ops.reverse(l).asInstanceOf[LineString]
    assert(r.coords.toSeq == Seq(8.0, 2.0, 5.0, -1.0, 3.0, 1.0, 0.0, 0.0))
    assert(Ops.reverse(r).asInstanceOf[LineString].coords.sameElements(
      l.asInstanceOf[LineString].coords))
    val zl = Wkt.read("LINESTRING Z (0 0 10, 1 0 20, 2 0 30)")
    val zr = Ops.reverse(zl).asInstanceOf[GeometryZM]
    assert(zr.zs.toSeq == Seq(30.0, 20.0, 10.0))
    // multi-part: parts keep their order, streams reverse within each
    val ml = Wkt.read("MULTILINESTRING Z ((0 0 1, 1 0 2), (5 5 7, 6 5 8, 7 5 9))")
    val mr = Ops.reverse(ml).asInstanceOf[GeometryZM]
    assert(mr.zs.toSeq == Seq(2.0, 1.0, 9.0, 8.0, 7.0))
  }

  test("pointonsurface lands strictly inside, including with holes") {
    Seq(star, hole).foreach { w =>
      val p = Ops.pointOnSurface(Wkt.read(w)).asInstanceOf[Point]
      assert(Pred.contains(Wkt.read(w), p), s"POS outside for $w")
    }
  }

  test("snaptogrid matches JTS-style rounding and keeps vertex count") {
    val g = Wkt.read(zig)
    val s = Ops.snapToGrid(g, 0.5).asInstanceOf[LineString]
    assert(s.coords.toSeq == Seq(0.0, 0.0, 3.0, 1.0, 5.0, -1.0, 8.0, 2.0))
    val s2 = Ops.snapToGrid(Wkt.read("LINESTRING (0.26 0.24, 1.13 0.88)"), 0.25)
      .asInstanceOf[LineString]
    assert(s2.coords.toSeq == Seq(0.25, 0.25, 1.25, 1.0))
  }

  test("discrete hausdorff parity vs JTS on star/hole/line pairs") {
    val pairs = Seq((star, hole), (star, zig), (hole, zig),
      // seed-77788899 escape: a line vertex INSIDE the polygon must measure
      // to the BOUNDARY (JTS semantics), not zero
      ("LINESTRING (1 12, 4 3, 10 9, 11 10, 5 8)", "POLYGON ((1 12, 4 1, 11 9, 1 12))"),
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
    pairs.foreach { case (wa, wb) =>
      val got = Ops.hausdorff(Wkt.read(wa), Wkt.read(wb))
      val want = org.locationtech.jts.algorithm.distance.DiscreteHausdorffDistance
        .distance(reader.read(wa), reader.read(wb))
      assert(math.abs(got - want) < 1e-9, s"hausdorff($wa, $wb) got=$got want=$want")
    }
  }

  test("discrete Fréchet parity vs JTS on random lines; order-awareness (r5)") {
    var st = 13571113L
    def frac(): Double = {
      st ^= st << 13; st ^= st >>> 7; st ^= st << 17
      (st >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 200).foreach { _ =>
      def randLine(): String = {
        val n = 2 + (frac() * 6).toInt
        s"LINESTRING (${Seq.fill(n)(s"${frac() * 20} ${frac() * 20}").mkString(", ")})"
      }
      val wa = randLine(); val wb = randLine()
      val got = Ops.frechet(Wkt.read(wa), Wkt.read(wb))
      val want = org.locationtech.jts.algorithm.distance.DiscreteFrechetDistance
        .distance(reader.read(wa), reader.read(wb))
      assert(math.abs(got - want) < 1e-9, s"frechet($wa, $wb) got=$got want=$want")
    }
    // order-awareness: a segment vs its reversal is far in Fréchet, 0 in Hausdorff
    val fwd = Wkt.read("LINESTRING (0 0, 8 0)")
    val rev = Wkt.read("LINESTRING (8 0, 0 0)")
    assert(Ops.frechet(fwd, rev) == 8.0 && Ops.hausdorff(fwd, rev) == 0.0)
    intercept[IllegalArgumentException](Ops.frechet(fwd, Wkt.read("POLYGON ((0 0, 1 0, 1 1, 0 0))")))
  }

  test("linear referencing: interpolate/locate/substring invariants") {
    val path = Wkt.read("LINESTRING (0 0, 10 0, 10 5)") // L = 15
    // interpolate on each segment
    val p1 = Ops.lineInterpolate(path, 1.0 / 3).asInstanceOf[Point]
    assert(p1.x == 5.0 && p1.y == 0.0)
    val p2 = Ops.lineInterpolate(path, 0.8).asInstanceOf[Point]
    assert(p2.x == 10.0 && math.abs(p2.y - 2.0) < 1e-12)
    // endpoints + clamping
    assert(Ops.lineInterpolate(path, 0.0) == Point(0, 0))
    assert(Ops.lineInterpolate(path, 1.0) == Point(10, 5))
    assert(Ops.lineInterpolate(path, 2.0) == Point(10, 5))
    // locate inverts interpolate
    (1 to 9).foreach { k =>
      val f = k / 10.0
      val p = Ops.lineInterpolate(path, f).asInstanceOf[Point]
      assert(math.abs(Ops.lineLocate(path, p.x, p.y) - f) < 1e-12, s"f=$f")
    }
    // off-line point projects to the closest vertex/segment
    assert(Ops.lineLocate(path, 5.0, 3.0) == 5.0 / 15)
    assert(Ops.lineLocate(path, 20.0, 20.0) == 1.0)
    // substring: length proportional, concatenation recovers endpoints
    val sub = Ops.lineSubstring(path, 0.2, 0.9).asInstanceOf[LineString]
    assert(math.abs(Ops.length(sub) - 0.7 * 15) < 1e-12)
    assert(sub.coords(0) == 3.0 && sub.coords(1) == 0.0)
    assert(sub.coords(sub.coords.length - 2) == 10.0 &&
      math.abs(sub.coords(sub.coords.length - 1) - 3.5) < 1e-12)
    // degenerate: f1 == f2 → the point
    assert(Ops.lineSubstring(path, 0.5, 0.5).isInstanceOf[Point])
    // Z stream interpolates with the vertex parameter
    val zl = Wkt.read("LINESTRING Z (0 0 100, 10 0 200)")
    val zp = Ops.lineInterpolate(zl, 0.25).asInstanceOf[GeometryZM]
    assert(zp.base == Point(2.5, 0) && zp.zs(0) == 125.0)
    // ... and through substring (both cut points + interior vertices)
    val zsub = Ops.lineSubstring(Wkt.read("LINESTRING Z (0 0 100, 10 0 200, 10 10 300)"),
      0.25, 0.75).asInstanceOf[GeometryZM]
    assert(zsub.zs.toSeq == Seq(150.0, 200.0, 250.0), s"zs=${zsub.zs.toSeq}")
  }

  test("geometric median: symmetric center, 1D median vertex, Fermat 120° rule") {
    // 4 corners → diagonal intersection
    val sq = Ops.geometricMedian(Wkt.read("MULTIPOINT ((0 0), (4 0), (4 2), (0 2))"))
      .asInstanceOf[Point]
    assert(math.abs(sq.x - 2.0) < 1e-10 && math.abs(sq.y - 1.0) < 1e-10)
    // 5 collinear → the middle vertex EXACTLY (Vardi–Zhang vertex test)
    val col5 = Ops.geometricMedian(Wkt.read(
      "MULTIPOINT ((0 0), (1 0), (3 0), (8 0), (9 0))")).asInstanceOf[Point]
    assert(col5.x == 3.0 && col5.y == 0.0, s"got $col5")
    // obtuse triangle with a ≥120° vertex → that vertex IS the median
    // (vertex (0,0), arms along azimuths ±65° from x-axis ⇒ 130° apart)
    val arms = Ops.geometricMedian(Wkt.read(
      "MULTIPOINT ((0 0), (4.226182617406994 9.063077870366499), (4.226182617406994 -9.063077870366499))"))
      .asInstanceOf[Point] // 10·(cos65°, ±sin65°)
    assert(math.hypot(arms.x, arms.y) < 1e-9, s"got $arms — 130° vertex must win")
    // median minimizes summed distance vs centroid on a skewed set
    val skew = "MULTIPOINT ((0 0), (0.1 0), (0 0.1), (0.1 0.1), (10 10))"
    val gm = Ops.geometricMedian(Wkt.read(skew)).asInstanceOf[Point]
    def cost(x: Double, y: Double): Double =
      Wkt.read(skew).asInstanceOf[MultiPoint].coords.grouped(2)
        .map(p => math.hypot(x - p(0), y - p(1))).sum
    assert(cost(gm.x, gm.y) < cost(2.04, 2.04) - 1.0, "median must beat the centroid")
  }

  test("shortestline/maxdistance parity vs JTS on mixed random pairs") {
    var state = 246810L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    def rnd(): String = (frac() * 3).toInt match {
      case 0 =>
        val x = (frac() * 10).toInt; val y = (frac() * 10).toInt
        s"POLYGON (($x $y, ${x + 2} $y, ${x + 2} ${y + 2}, $x ${y + 2}, $x $y))"
      case 1 =>
        s"LINESTRING (${(frac() * 12).toInt} ${(frac() * 12).toInt}, " +
          s"${(frac() * 12).toInt} ${(frac() * 12).toInt})"
      case _ => s"POINT (${(frac() * 12).toInt} ${(frac() * 12).toInt})"
    }
    (0 until 200).foreach { trial =>
      val wa = rnd(); val wb = rnd()
      val ja = reader.read(wa); val jb = reader.read(wb)
      val sl = Ops.shortestLine(Wkt.read(wa), Wkt.read(wb))
      val want = ja.distance(jb)
      assert(math.abs(Ops.length(sl) - want) < 1e-9,
        s"trial $trial shortestline len ${Ops.length(sl)} vs $want ($wa | $wb)")
      // witness endpoints actually lie on the inputs
      val l = sl.asInstanceOf[LineString]
      assert(Pred.distance(Wkt.read(wa), Point(l.coords(0), l.coords(1))) < 1e-9)
      assert(Pred.distance(Wkt.read(wb), Point(l.coords(2), l.coords(3))) < 1e-9)
    }
  }

  test("review regressions: antimeridian buffer, degenerate subdivide, ZM multipoint reverse") {
    // geodesic point buffer at lon ≈ 180 must stay a CONTIGUOUS ring
    // (unwrapped lons, like the AEQ path) — not a map-wide bowtie
    val buf = Ops.geodesicBuffer(Point(179.9, 0.0), 50000.0).asInstanceOf[Polygon]
    val lons = buf.rings(0).indices.collect { case i if i % 2 == 0 => buf.rings(0)(i) }
    assert(lons.max - lons.min < 2.0, s"ring spans ${lons.max - lons.min} degrees of lon")
    assert(Ops.area(buf) > 0, "ring must stay CCW")
    // degenerate inputs terminate promptly instead of 2^48 recursion
    val dup = MultiPoint(Array.fill(10)(Array(1.0, 2.0)).flatten)
    val parts = Ops.subdivide(dup, 8)
    assert(parts.length == 1)
    val zig = LineString((0 until 30).flatMap(i =>
      Seq(if (i % 2 == 0) 0.0 else 1.0, if (i % 2 == 0) 0.0 else 1.0)).toArray)
    Ops.subdivide(zig, 8) // must return quickly (progress guard), any split
    // ZM multipoint: reverse must not desynchronize streams
    val mpz = Wkt.read("MULTIPOINT Z ((0 0 1), (1 1 2))")
    val r = Ops.reverse(mpz).asInstanceOf[GeometryZM]
    assert(r.zs.toSeq == Seq(1.0, 2.0), "streams must stay aligned with unchanged coords")
  }

  test("second-review regressions: subdivide both-axes, median multiset, ZM degenerate substring") {
    // zig-zag whose PREFERRED (taller) axis split makes no progress: the
    // perpendicular split must be tried before emitting oversized parts
    val zz = LineString((0 until 31).flatMap(i =>
      Seq(i * 0.2, if (i % 2 == 0) 0.0 else 10.0)).toArray)
    val parts = Ops.subdivide(zz, 8)
    assert(parts.length > 1, "must actually subdivide")
    assert(parts.forall(_.numPoints <= 8), s"worst=${parts.map(_.numPoints).max}")
    // duplicate points keep their weight: 3x(0,0) + 1x(10,0) → (0,0)
    val mm = Ops.geometricMedian(Wkt.read(
      "MULTIPOINT ((0 0), (0 0), (0 0), (10 0))")).asInstanceOf[Point]
    // (the deduped variant returned (5,0); with multiplicity the iteration
    // converges to the triple point — numerically, within step tolerance)
    assert(math.hypot(mm.x, mm.y) < 1e-9, s"got $mm")
    // zero-length Z line keeps its stream through substring
    val zdeg = Ops.lineSubstring(Wkt.read("LINESTRING Z (1 1 5, 1 1 7)"), 0.2, 0.8)
    assert(zdeg.asInstanceOf[GeometryZM].zs(0) == 5.0)
  }

  test("azimuth convention: CW from north, [0,360)") {
    assert(Ops.azimuthPlanar(0, 0, 0, 1) == 0.0)   // north
    assert(Ops.azimuthPlanar(0, 0, 1, 0) == 90.0)  // east
    assert(Ops.azimuthPlanar(0, 0, 0, -1) == 180.0)
    assert(Ops.azimuthPlanar(0, 0, -1, 0) == 270.0)
    intercept[IllegalArgumentException](Ops.azimuthPlanar(1, 1, 1, 1))
  }
}
