package graft.geom

import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** st_chaikin + st_inscribedcircle: exact corner-cut vertices, point-count
  * law under iteration, and polylabel against closed-form poles of
  * inaccessibility (square, L-shape, holed square, elongated rect). */
class SmoothSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))

  test("chaikin: exact vertices on a rect ring, one iteration") {
    val sm = Smooth.chaikin(rect(0, 0, 4, 2), 1).asInstanceOf[Polygon]
    val r = sm.rings(0)
    assert(r.length == 18) // 8 distinct + closing dup
    val expected = Array[Double](1, 0, 3, 0, 4, 0.5, 4, 1.5, 3, 2, 1, 2, 0, 1.5, 0, 0.5, 1, 0)
    assert(r.toSeq == expected.toSeq, r.mkString(","))
  }

  test("chaikin: open line keeps endpoints; point counts follow 2n-2+2 per pass") {
    val l0 = LineString(Array(0, 0, 10, 0, 10, 10, 20, 10))
    val l1 = Smooth.chaikin(l0, 1).asInstanceOf[LineString]
    assert(l1.coords.length / 2 == 2 * (4 - 1) + 2) // 8
    assert(l1.coords(0) == 0 && l1.coords(1) == 0)
    assert(l1.coords(l1.coords.length - 2) == 20 && l1.coords.last == 10)
    val l2 = Smooth.chaikin(l0, 2).asInstanceOf[LineString]
    assert(l2.coords.length / 2 == 2 * (8 - 1) + 2) // 16
    // iterating once twice == iters = 2
    val twice = Smooth.chaikin(Smooth.chaikin(l0, 1), 1).asInstanceOf[LineString]
    assert(twice.coords.toSeq == l2.coords.toSeq)
  }

  test("polylabel: square center exact, radius = side/2") {
    val Array(cx, cy, r) = Smooth.inscribedCircle(rect(2, 3, 8, 9), 1e-9)
    assert(math.abs(cx - 5) < 1e-8 && math.abs(cy - 6) < 1e-8, s"($cx, $cy)")
    assert(math.abs(r - 3) < 1e-8, s"r=$r")
  }

  test("polylabel: L-shape pole = (t, t) with t = 2 - sqrt(2)") {
    val l = Polygon(Array(Array(0, 0, 2, 0, 2, 1, 1, 1, 1, 2, 0, 2, 0, 0)))
    val Array(cx, cy, r) = Smooth.inscribedCircle(l, 1e-7)
    val t = 2 - math.sqrt(2.0)
    assert(math.abs(r - t) < 1e-6, s"r=$r want $t")
    assert(math.abs(cx - t) < 1e-5 && math.abs(cy - t) < 1e-5, s"($cx, $cy)")
  }

  test("polylabel: holed square radius = 8 - 4*sqrt(2) (4 symmetric optima)") {
    val g = Polygon(Array(
      Array(0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(4, 4, 6, 4, 6, 6, 4, 6, 4, 4)))
    val Array(_, _, r) = Smooth.inscribedCircle(g, 1e-7)
    assert(math.abs(r - (8 - 4 * math.sqrt(2.0))) < 1e-6, s"r=$r")
  }

  test("polylabel: elongated rect (continuum of optima) at coarse precision") {
    val Array(_, cy, r) = Smooth.inscribedCircle(rect(0, 0, 30, 2), 1e-3)
    assert(math.abs(r - 1.0) < 1e-3, s"r=$r")
    assert(math.abs(cy - 1.0) < 2e-3, s"cy=$cy")
  }

  test("polylabel: sliver envelope (aspect 1e9) terminates under the seed cap") {
    // pre-cap this allocated ~1e9 eager-signedDist seed cells (OOM before
    // the step budget); the capped coarse cover must return promptly with
    // the radius still bounded by the short half-extent
    val t0 = System.nanoTime()
    val Array(_, cy, r) = Smooth.inscribedCircle(rect(0, 0, 1e6, 1e-3), 10.0)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "sliver polylabel took too long")
    assert(r <= 5e-4 + 1e-9, s"r=$r exceeds the short half-extent")
    assert(cy >= 0 && cy <= 1e-3, s"cy=$cy outside the sliver")
  }

  test("fuzz: 300 random convex polygons — chaikin invariants + polylabel vs grid") {
    val rnd = new scala.util.Random(0x600D5EEDL)
    var done = 0
    while (done < 300) {
      val n = 6 + rnd.nextInt(10)
      val cs = Array.fill(n)((rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 30 - 15))
      Ops.convexHullOfCoords(cs.flatMap(p => Array(p._1, p._2))) match {
        case hull: Polygon if !hull.isEmpty =>
          done += 1
          val a0 = math.abs(Ops.area(hull)); val l0 = Ops.length(hull)
          val iters = 1 + rnd.nextInt(3)
          val sm = Smooth.chaikin(hull, iters).asInstanceOf[Polygon]
          val a1 = math.abs(Ops.area(sm)); val l1 = Ops.length(sm)
          // corner cutting on a convex ring strictly shrinks area+perimeter
          assert(a1 < a0 + 1e-12 && l1 < l0 + 1e-12, s"area $a0->$a1 len $l0->$l1")
          // point-count law: distinct vertices double per pass
          val v0 = hull.rings(0).length / 2 - 1
          assert(sm.rings(0).length / 2 - 1 == v0 * (1 << iters))
          // smoothed ring stays inside the hull (convexity preserved)
          val env0 = hull.envelope; val env1 = sm.envelope
          assert(env1.xmin >= env0.xmin - 1e-12 && env1.xmax <= env0.xmax + 1e-12 &&
                 env1.ymin >= env0.ymin - 1e-12 && env1.ymax <= env0.ymax + 1e-12)

          // polylabel sanity vs a dense grid lower bound
          val Array(_, _, r) = Smooth.inscribedCircle(hull, 1e-4)
          var gridMax = 0.0
          val e = hull.envelope
          val steps = 40
          (1 until steps).foreach { i =>
            (1 until steps).foreach { j =>
              val x = e.xmin + e.width * i / steps
              val y = e.ymin + e.height * j / steps
              val d = Smooth.signedDist(Array(hull.rings), x, y)
              if (d > gridMax) gridMax = d
            }
          }
          assert(r >= gridMax - 1e-4, s"polylabel r=$r below grid bound $gridMax")
        case _ => // degenerate sample — redraw
      }
    }
  }

  test("SQL surface: st_chaikin + st_inscribedcircle via the registry") {
    GraftFunctions.install(spark)
    val row = spark.sql(
      """SELECT st_numpoints(st_chaikin(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))'), 2)) AS n,
         st_inscribedcircle(st_geomfromwkt('POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))'), 1e-9) AS c""").head
    assert(row.getInt(0) == 17) // 16 distinct + closing
    val c = row.getSeq[Double](1)
    assert(math.abs(c(0) - 3) < 1e-8 && math.abs(c(1) - 3) < 1e-8 && math.abs(c(2) - 3) < 1e-8)
  }
}
