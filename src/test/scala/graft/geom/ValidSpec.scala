package graft.geom

import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

/** st_isvalid semantics pinned on the classic OGC invalidity taxonomy,
  * each case cross-checked against JTS isValid (DeepFuzz's validCase axis
  * runs the randomized version at 100k scale). */
class ValidSpec extends AnyFunSuite {

  private val reader = new WKTReader()

  private def both(wkt: String, expectValid: Boolean): Unit = {
    val got = Valid.check(Wkt.read(wkt))
    assert(got.valid == expectValid, s"$wkt → ${got.reason}")
    assert(reader.read(wkt).isValid == expectValid, s"JTS disagrees with the pin: $wkt")
  }

  test("valid shapes") {
    both("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", expectValid = true)
    both("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))", expectValid = true)
    // hole touching shell at ONE point is legal
    both("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 0, 4 2, 2 4, 0 0))", expectValid = true)
    // multipolygon elements touching at one point
    both("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((2 2, 4 2, 4 4, 2 4, 2 2)))", expectValid = true)
    // polygon nested inside another's hole
    both("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2)), ((4 4, 6 4, 6 6, 4 6, 4 4)))", expectValid = true)
    both("LINESTRING (0 0, 1 1, 2 0)", expectValid = true)
    both("POINT (3 4)", expectValid = true)
  }

  test("invalid shapes") {
    // bowtie (self-crossing ring)
    both("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))", expectValid = false)
    // figure-eight via repeated vertex
    both("POLYGON ((0 0, 2 0, 2 2, 4 2, 4 4, 2 4, 2 2, 0 2, 0 0))", expectValid = false)
    // hole outside shell
    both("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (5 5, 7 5, 7 7, 5 7, 5 5))", expectValid = false)
    // hole crossing the shell
    both("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (6 6, 10 6, 10 10, 6 10, 6 6))", expectValid = false)
    // nested holes
    both("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2), (4 4, 6 4, 6 6, 4 6, 4 4))", expectValid = false)
    // hole touching shell at TWO points (interior disconnected)
    both("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 5, 5 2, 10 5, 5 8, 0 5))", expectValid = false)
    // overlapping multipolygon shells (incl. the fuzz escape shape)
    both("MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((4 3, 8 3, 8 7, 4 7, 4 3)))", expectValid = false)
    // duplicate rings
    both("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((0 0, 4 0, 4 4, 0 4, 0 0)))", expectValid = false)
    // nested shells without a hole
    both("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((2 2, 4 2, 4 4, 2 4, 2 2)))", expectValid = false)
    // polygon in another's hole SHARING AN EDGE with the hole boundary
    // (review finding: shell-vs-shell contact check alone missed this)
    both("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2)), ((2 2, 8 2, 8 5, 2 5, 2 2)))", expectValid = false)
    // collinear spike
    both("POLYGON ((0 0, 4 0, 8 0, 4 0, 4 4, 0 0))", expectValid = false)
    // zero-length line
    both("LINESTRING (1 1, 1 1)", expectValid = false)
    // unclosed ring is invalid structurally (JTS WKT reader rejects it, so
    // check only our side)
    assert(!Valid.check(Polygon(Array(Array(0.0, 0, 4, 0, 4, 4, 0, 4)))).valid)
    // a ring-less (empty) element must not crash the multipolygon pairwise
    // shell checks (advisor r4: polys(a)(0) on an empty element threw);
    // the non-empty elements still get verdicts
    val rect = Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)
    val rect2 = Array(10.0, 0, 14, 0, 14, 4, 10, 4, 10, 0)
    assert(Valid.check(MultiPolygon(Array(Array.empty, Array(rect), Array(rect2)))).valid)
    assert(!Valid.check(MultiPolygon(Array(Array.empty, Array(rect), Array(rect)))).valid)
  }

  test("reasons are specific") {
    assert(Valid.check(Wkt.read("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"))
      .reason.contains("self-intersection"))
    assert(Valid.check(Wkt.read(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (5 5, 7 5, 7 7, 5 7, 5 5))"))
      .reason.contains("outside shell"))
  }
}
