package graft.geom

import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** st_polygonize / st_linemerge / st_subdivide semantics, pinned against
  * JTS (Polygonizer, LineMerger) and analytic invariants. */
class PolygonizeSpec extends AnyFunSuite {

  private val reader = new WKTReader()

  /** JTS Polygonizer requires correctly-noded input (as does PostGIS
    * ST_Polygonize); ours nodes internally, i.e. it computes
    * ST_Polygonize(ST_Node(...)). Node via JTS union for parity. */
  private def jtsPolygonize(lines: Seq[String]): (Int, Double) = {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val coll = gf.createGeometryCollection(lines.map(reader.read).toArray)
    val noded = coll.union() // UnaryUnion nodes the arrangement
    val pz = new org.locationtech.jts.operation.polygonize.Polygonizer()
    pz.add(noded)
    val polys = pz.getPolygons.asScala.toSeq
      .map(_.asInstanceOf[org.locationtech.jts.geom.Polygon])
    (polys.length, polys.map(_.getArea).sum)
  }

  test("2x2 grid of lines → 4 unit faces") {
    val lines = Seq(
      "LINESTRING (0 0, 2 0)", "LINESTRING (0 1, 2 1)", "LINESTRING (0 2, 2 2)",
      "LINESTRING (0 0, 0 2)", "LINESTRING (1 0, 1 2)", "LINESTRING (2 0, 2 2)")
    val g = GeometryCollection(lines.map(Wkt.read).toArray)
    val faces = Ops.polygonize(g)
    assert(faces.length == 4, s"got ${faces.length} faces")
    assert(math.abs(faces.map(Ops.area).sum - 4.0) < 1e-12)
    val (jn, ja) = jtsPolygonize(lines)
    assert(jn == 4 && math.abs(ja - 4.0) < 1e-12)
  }

  test("nested rings → annulus with hole + inner face (JTS convention)") {
    val lines = Seq(
      "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)",
      "LINESTRING (3 3, 7 3, 7 7, 3 7, 3 3)")
    val g = GeometryCollection(lines.map(Wkt.read).toArray)
    val faces = Ops.polygonize(g).sortBy(Ops.area)
    assert(faces.length == 2, s"got ${faces.length}")
    assert(math.abs(Ops.area(faces(0)) - 16.0) < 1e-12, "inner face 4x4")
    assert(math.abs(Ops.area(faces(1)) - 84.0) < 1e-12, "annulus 100-16")
    val annulus = faces(1).asInstanceOf[Polygon]
    assert(annulus.rings.length == 2, "annulus must carry the hole")
    val (jn, ja) = jtsPolygonize(lines)
    assert(jn == 2 && math.abs(ja - 100.0) < 1e-12) // JTS: 84 + 16
  }

  test("crossing midlines inside a rectangle → 4 faces, dangles dropped") {
    val lines = Seq(
      "LINESTRING (0 0, 4 0, 4 2, 0 2, 0 0)", // boundary
      "LINESTRING (2 -1, 2 3)",               // vertical through + dangling ends
      "LINESTRING (-1 1, 5 1)")               // horizontal through + dangling ends
    val g = GeometryCollection(lines.map(Wkt.read).toArray)
    val faces = Ops.polygonize(g)
    assert(faces.length == 4, s"got ${faces.length}")
    assert(math.abs(faces.map(Ops.area).sum - 8.0) < 1e-12)
    faces.foreach(f => assert(math.abs(Ops.area(f) - 2.0) < 1e-12))
  }

  test("polygonize parity vs JTS on random segment soups") {
    var state = 31337L
    def frac(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state >>> 11).toDouble / (1L << 53).toDouble
    }
    (0 until 60).foreach { trial =>
      // random short segments in a 10x10 box: most arrangements produce a
      // handful of faces; JTS Polygonizer is the oracle
      val lines = (0 until 12).map { _ =>
        val x1 = (frac() * 10).round.toDouble; val y1 = (frac() * 10).round.toDouble
        val x2 = (frac() * 10).round.toDouble; val y2 = (frac() * 10).round.toDouble
        s"LINESTRING ($x1 $y1, $x2 $y2)"
      }.filterNot { w =>
        val c = reader.read(w).getCoordinates; c(0).equals2D(c(1))
      }
      val g = GeometryCollection(lines.map(Wkt.read).toArray)
      val faces = Ops.polygonize(g)
      val (jn, ja) = jtsPolygonize(lines)
      assert(faces.length == jn, s"trial $trial: ${faces.length} faces vs JTS $jn")
      assert(math.abs(faces.map(Ops.area).sum - ja) < 1e-9,
        s"trial $trial: area ${faces.map(Ops.area).sum} vs JTS $ja")
    }
  }

  test("regression: pinched-face soups trace whole (DeepFuzz escapes)") {
    // three arrangements where vertex-closing split faces at revisited
    // vertices (found by the r4 DeepFuzz polygonize axis, seed 20260817);
    // the fix is the JTS EdgeRing rule: close only at the starting EDGE
    val soups = Seq(
      Seq("LINESTRING (5 5, 0 10)", "LINESTRING (11 1, 0 4, 8 4, 0 5)",
        "LINESTRING (10 4, 9 0)", "LINESTRING (3 2, 3 11)",
        "LINESTRING (3 4, 3 7, 11 5)", "LINESTRING (2 7, 6 11, 9 2)",
        "LINESTRING (5 9, 0 10)"),
      Seq("LINESTRING (6 7, 0 1, 9 8, 9 5, 10 8)", "LINESTRING (7 2, 2 3, 5 11)",
        "LINESTRING (1 3, 0 4, 6 0, 9 10, 6 6)", "LINESTRING (0 8, 9 11, 4 1, 0 11)",
        "LINESTRING (9 3, 7 10)", "LINESTRING (5 11, 2 3)",
        "LINESTRING (5 6, 7 0, 11 9, 1 11, 0 4)", "LINESTRING (4 9, 8 6, 6 9)",
        "LINESTRING (9 4, 11 3, 3 10, 1 4)"),
      Seq("LINESTRING (1 8, 10 10, 11 2)", "LINESTRING (4 2, 4 4)",
        "LINESTRING (4 11, 4 3, 3 2, 2 2)", "LINESTRING (1 3, 7 6)",
        "LINESTRING (5 4, 4 6)", "LINESTRING (9 2, 10 8, 11 1)",
        "LINESTRING (10 11, 9 11)", "LINESTRING (10 11, 11 6, 1 11, 0 4)"),
      // near-concurrent crossings landing on ADJACENT snap cells: without
      // post-noding node merging the micro-edge scrambles angular order
      // and two real faces merge (53 vs 54)
      Seq("LINESTRING (2 4, 4 4, 8 8, 6 3, 7 8)", "LINESTRING (2 9, 1 2, 1 7)",
        "LINESTRING (0 11, 10 4)", "LINESTRING (1 0, 7 6, 4 4, 10 9)",
        "LINESTRING (10 7, 7 2)", "LINESTRING (7 8, 7 6, 6 6)",
        "LINESTRING (4 2, 0 7, 10 4)", "LINESTRING (7 8, 6 5, 0 11, 10 4, 2 5)",
        "LINESTRING (5 3, 2 1, 5 11)"),
      // a component's unbounded CW orbit shares every vertex with its big
      // shell — assembly must use CONNECTED COMPONENTS (a hole only comes
      // from a different, nested component), not vertex containment
      Seq("LINESTRING (7 1, 2 8, 10 9)", "LINESTRING (0 7, 6 11, 9 9, 0 8)",
        "LINESTRING (10 0, 9 1)", "LINESTRING (6 7, 0 2)",
        "LINESTRING (2 5, 8 6)", "LINESTRING (8 5, 1 1, 9 0, 8 4, 11 0)",
        "LINESTRING (10 9, 11 0)"))
    soups.foreach { lines =>
      val faces = Ops.polygonize(GeometryCollection(lines.map(Wkt.read).toArray))
      val (jn, ja) = jtsPolygonize(lines)
      assert(faces.length == jn, s"${faces.length} faces vs JTS $jn")
      assert(math.abs(faces.map(Ops.area).sum - ja) < 1e-9,
        s"area ${faces.map(Ops.area).sum} vs JTS $ja")
    }
  }

  test("linemerge sews a chain and closes a ring; parity vs JTS LineMerger") {
    // four boundary edges in scrambled order/orientation
    val segs = Seq(
      "LINESTRING (4 0, 4 2)", "LINESTRING (0 0, 4 0)",
      "LINESTRING (0 2, 0 0)", "LINESTRING (4 2, 0 2)")
    val merged = Ops.lineMerge(GeometryCollection(segs.map(Wkt.read).toArray))
    val l = merged.asInstanceOf[LineString]
    assert(l.numPoints == 5, s"got ${l.numPoints}")
    assert(l.coords(0) == l.coords(l.coords.length - 2) &&
      l.coords(1) == l.coords(l.coords.length - 1), "must close")
    assert(math.abs(Ops.length(merged) - 12.0) < 1e-12)
    val lm = new org.locationtech.jts.operation.linemerge.LineMerger()
    segs.foreach(w => lm.add(reader.read(w)))
    val jls = lm.getMergedLineStrings.asScala.toSeq
    assert(jls.length == 1 && jls.head.asInstanceOf[org.locationtech.jts.geom.LineString].getNumPoints == 5)

    // degree-3 junction blocks merging (T shape): JTS yields 3 lines
    val t = Seq("LINESTRING (0 0, 1 0)", "LINESTRING (1 0, 2 0)", "LINESTRING (1 0, 1 1)")
    val tm = Ops.lineMerge(GeometryCollection(t.map(Wkt.read).toArray))
    assert(tm.asInstanceOf[MultiLineString].lines.length == 3)
  }

  test("subdivide: parts bounded, areas sum, deep polygons terminate") {
    // unit square densified to 65 boundary points
    val sq = Ops.densify(Wkt.read("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"), 1.0 / 16)
    assert(sq.numPoints == 65)
    Seq(12, 20, 40).foreach { maxV =>
      val parts = Ops.subdivide(sq, maxV)
      assert(parts.forall(_.numPoints <= maxV),
        s"maxV=$maxV worst=${parts.map(_.numPoints).max}")
      assert(math.abs(parts.map(Ops.area).sum - 1.0) < 1e-9, s"maxV=$maxV area")
      assert(parts.length >= 2)
    }
    // non-square aspect: splits alternate axes
    val wide = Ops.densify(Wkt.read("POLYGON ((0 0, 8 0, 8 1, 0 1, 0 0))"), 0.25)
    val parts = Ops.subdivide(wide, 16)
    assert(parts.forall(_.numPoints <= 16))
    assert(math.abs(parts.map(Ops.area).sum - 8.0) < 1e-9)
    // a geometry already under the bound comes back whole
    val small = Wkt.read("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(Ops.subdivide(small, 32).length == 1)
  }
}
