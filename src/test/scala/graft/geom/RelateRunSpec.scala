package graft.geom
import org.scalatest.funsuite.AnyFunSuite
class DebugRelSpec extends AnyFunSuite {
  test("seed-77788899 relate regression: line collinear along a triangle edge") {
    val l = Wkt.read("LINESTRING (2 2, 17 7)")
    val p = Wkt.read("POLYGON ((8 4, 5 3, 15 15, 8 4))")
    val got = Pred.relate(l, p)
    val want = new org.locationtech.jts.io.WKTReader().read("LINESTRING (2 2, 17 7)")
      .relate(new org.locationtech.jts.io.WKTReader().read("POLYGON ((8 4, 5 3, 15 15, 8 4))"))
      .toString
    assert(got == want, s"got $got want $want")
  }
}
