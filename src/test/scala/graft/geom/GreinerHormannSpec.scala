package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader

/** Greiner–Hormann concave overlay vs JTS on star-shaped (simple, concave)
  * polygons with continuous coordinates (degeneracies are measure-zero). */
class GreinerHormannSpec extends AnyFunSuite {

  val reader = new WKTReader()
  var state = 2026L
  def frac(): Double = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17
    (state >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Random star-shaped polygon around (cx, cy): always simple, often concave. */
  def star(cx: Double, cy: Double, rMax: Double): Array[Double] = {
    val n = 5 + (frac() * 8).toInt
    val angles = Array.fill(n)(frac() * 2 * math.Pi).sorted
    val ring = new Array[Double]((n + 1) * 2)
    var i = 0
    while (i < n) {
      val r = rMax * (0.25 + 0.75 * frac())
      ring(2 * i) = cx + r * math.cos(angles(i))
      ring(2 * i + 1) = cy + r * math.sin(angles(i))
      i += 1
    }
    ring(2 * n) = ring(0); ring(2 * n + 1) = ring(1)
    ring
  }

  def jtsOf(rings: Array[Double]*): org.locationtech.jts.geom.Geometry =
    reader.read(Wkt.write(Polygon(Array(rings(0)))))

  test("concave intersection/union/difference areas match JTS (fuzz)") {
    var tested = 0
    var degenerate = 0
    (0 until 400).foreach { _ =>
      val a = star(5 + frac() * 2, 5 + frac() * 2, 3 + frac() * 2)
      val b = star(6 + frac() * 2, 6 + frac() * 2, 3 + frac() * 2)
      val ga = Polygon(Array(a)); val gb = Polygon(Array(b))
      val ja = jtsOf(a); val jb = jtsOf(b)
      if (ja.isValid && jb.isValid) {
        try {
          val gotI = Ops.area(Overlay.intersection(ga, gb))
          val wantI = ja.intersection(jb).getArea
          assert(math.abs(gotI - wantI) < 1e-6 * math.max(1, wantI),
            s"INT a=${Wkt.write(ga)} b=${Wkt.write(gb)} got=$gotI want=$wantI")
          val gotU = Ops.area(Overlay.union(ga, gb))
          val wantU = ja.union(jb).getArea
          assert(math.abs(gotU - wantU) < 1e-6 * math.max(1, wantU),
            s"UNION a=${Wkt.write(ga)} b=${Wkt.write(gb)} got=$gotU want=$wantU")
          val gotD = Ops.area(Overlay.difference(ga, gb))
          val wantD = ja.difference(jb).getArea
          assert(math.abs(gotD - wantD) < 1e-6 * math.max(1, wantD),
            s"DIFF a=${Wkt.write(ga)} b=${Wkt.write(gb)} got=$gotD want=$wantD")
          tested += 1
        } catch {
          case _: UnsupportedOperationException => degenerate += 1
        }
      }
    }
    info(s"tested=$tested degenerate-fallback=$degenerate")
    assert(tested > 300, s"only $tested pairs exercised the GH path")
  }

  test("hole-punch difference: contained hole-free B") {
    val a = Wkt.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val b = Wkt.read("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))")
    val d = Overlay.difference(a, b)
    assert(Ops.area(d) == 96.0)
    assert(d.asInstanceOf[Polygon].rings.length == 2)
  }

  test("union producing a hole (two C-shapes forming an O) matches JTS") {
    // C-shape and its mirror overlapping to enclose a cavity
    val c1 = "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))"
    val c2 = "POLYGON ((8 0.5, 10.5 0.5, 10.5 9.5, 8 9.5, 8 7, 9 7, 9 3, 8 3, 8 0.5))"
    val ga = Wkt.read(c1); val gb = Wkt.read(c2)
    val ja = reader.read(c1); val jb = reader.read(c2)
    try {
      val got = Ops.area(Overlay.union(ga, gb))
      val want = ja.union(jb).getArea
      assert(math.abs(got - want) < 1e-9, s"got=$got want=$want")
    } catch {
      case _: UnsupportedOperationException => // acceptable: degenerate contact
    }
  }
}
