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
