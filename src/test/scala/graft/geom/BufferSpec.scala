package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader

/** Buffer vs JTS on concave polygons (capsule-union path). */
class BufferSpec extends AnyFunSuite {

  val reader = new WKTReader()
  var state = 777L
  def frac(): Double = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17
    (state >>> 11).toDouble / (1L << 53).toDouble
  }

  def star(cx: Double, cy: Double, rMax: Double): Array[Double] = {
    val n = 5 + (frac() * 7).toInt
    val angles = Array.fill(n)(frac() * 2 * math.Pi).sorted
    val ring = new Array[Double]((n + 1) * 2)
    var i = 0
    while (i < n) {
      val r = rMax * (0.3 + 0.7 * frac())
      ring(2 * i) = cx + r * math.cos(angles(i))
      ring(2 * i + 1) = cy + r * math.sin(angles(i))
      i += 1
    }
    ring(2 * n) = ring(0); ring(2 * n + 1) = ring(1)
    ring
  }

  test("concave polygon buffer area within 1% of JTS; contains the input") {
    var exercised = 0
    (0 until 120).foreach { _ =>
      val ring = star(5, 5, 3 + frac() * 2)
      val g = Polygon(Array(ring))
      val j = reader.read(Wkt.write(g))
      if (j.isValid) {
        val d = 0.3 + frac() * 1.2
        val buf = Ops.simplify(Ops.buffer(g, d))
        val want = j.buffer(d).getArea
        val got = Ops.area(buf)
        assert(math.abs(got - want) / want < 0.01,
          s"poly=${Wkt.write(g)} d=$d got=$got want=$want")
        assert(Pred.covers(buf, g), s"buffer must cover input: ${Wkt.write(g)} d=$d")
        exercised += 1
      }
    }
    assert(exercised > 100)
  }

  test("snap-ladder regression: DeepFuzz seed-101 capsule union no longer dead-ends") {
    // found 2026-08-17 by Test/runMain graft.tools.DeepFuzz 101 100000:
    // two capsule arcs tangent within an ulp made overlay classification
    // and tracing disagree at the default snap grid — the coarser-grid
    // retry ladder (PlanarOverlay.overlay) resolves it
    val w = "POLYGON ((6.108786037096861 5.05086130068804, 6.302702148749027 5.108938920230858, " +
      "6.530921647642393 6.196414603566598, 5.6174171049747565 6.724035106501056, " +
      "4.757160274976361 6.7130900479293265, 4.489732914057353 6.106017878190258, " +
      "1.7992334399965233 4.408489348587485, 6.108786037096861 5.05086130068804))"
    val g = Wkt.read(w)
    val d = 0.4153826746580283
    val buf = Ops.simplify(Ops.buffer(g, d))
    val want = reader.read(w).buffer(d).getArea
    val got = Ops.area(buf)
    assert(math.abs(got - want) / want < 0.01, s"got=$got want=$want")
    assert(Pred.covers(buf, g))
  }

  test("max_deviation controls tessellation: coarse=8 segs, fine>=default accuracy") {
    val pt = Point(3.0, 4.0)
    val coarse = Ops.bufferDeviation(pt, 1.0, 0.5).asInstanceOf[Polygon]
    assert(coarse.rings(0).length / 2 - 1 == 8, s"got ${coarse.rings(0).length / 2 - 1}")
    val fine = Ops.bufferDeviation(pt, 1.0, 1e-4).asInstanceOf[Polygon]
    val nFine = fine.rings(0).length / 2 - 1
    assert(nFine > 96 && nFine <= 720, s"got $nFine")
    // sagitta bound actually holds: min vertex-to-center distance is r exactly,
    // and the inscribed polygon's area deficit is within the deviation budget
    val err = math.Pi - Ops.area(fine)
    assert(err < 1e-4 * 2 * math.Pi, s"area deficit $err") // perimeter x maxDev bound
    // default when maxDev <= 0
    assert(Ops.bufferDeviation(pt, 1.0, 0.0).asInstanceOf[Polygon].rings(0).length / 2 - 1 == 96)
  }
}
