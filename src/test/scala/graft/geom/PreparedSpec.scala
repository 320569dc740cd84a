package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Prepared (stripe-indexed) point location must be BIT-identical to the
  * unaccelerated Pred path — it exists for speed, never for different
  * answers — and the executor cache must admit only worthwhile payloads. */
class PreparedSpec extends AnyFunSuite {

  private var state = 42L
  private def frac(): Double = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17
    (state >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Random star-shaped (valid, possibly very non-convex) ring. */
  private def star(cx: Double, cy: Double, n: Int, rMax: Double): Array[Double] = {
    val cs = new Array[Double](2 * (n + 1))
    var i = 0
    while (i < n) {
      val a = 2 * math.Pi * i / n
      val r = rMax * (0.3 + 0.7 * frac())
      cs(2 * i) = cx + r * math.cos(a); cs(2 * i + 1) = cy + r * math.sin(a)
      i += 1
    }
    cs(2 * n) = cs(0); cs(2 * n + 1) = cs(1)
    cs
  }

  test("locate == Pred.pointInPolygonal on fuzzed stars (incl. holes, multi)") {
    (0 until 30).foreach { t =>
      val shell = star(0, 0, 60 + t * 7, 10.0)
      val hole = star(0, 0, 23, 1.5) // inside the shell's inner radius (3.0)
      val polys: Array[Array[Array[Double]]] =
        if (t % 3 == 0) Array(Array(shell))
        else if (t % 3 == 1) Array(Array(shell, hole))
        else Array(Array(shell, hole), Array(star(30, 0, 41, 4.0)))
      val g: Geometry = if (polys.length == 1) Polygon(polys(0)) else MultiPolygon(polys)
      val p = new Prepared(g)
      // probe a grid + random points + exact vertices (boundary cases)
      var i = 0
      while (i < 4000) {
        val (x, y) =
          if (i % 4 == 0) (shell(2 * (i % (shell.length / 2))), shell(2 * (i % (shell.length / 2)) + 1))
          else (-12.0 + 48 * frac(), -12.0 + 24 * frac())
        val want = Pred.pointInPolygonal(polys, x, y)
        val got = p.locate(x, y)
        assert(got == want, s"t=$t ($x,$y): got=$got want=$want")
        i += 1
      }
      // midpoints of boundary edges are exactly on-boundary only when
      // representable; still must agree whatever Pred says
      var j = 0
      while (j + 3 < shell.length) {
        val mx = (shell(j) + shell(j + 2)) / 2; val my = (shell(j + 1) + shell(j + 3)) / 2
        assert(p.locate(mx, my) == Pred.pointInPolygonal(polys, mx, my))
        j += 2
      }
    }
  }

  test("K predicate facade agrees with raw Pred on a dense polygon sweep") {
    val shell = star(5, 5, 400, 5.0)
    val poly = Polygon(Array(shell))
    val wkb = Wkb.write(poly)
    assert(wkb.length >= Prepared.MIN_CACHE_BYTES, "fixture must exercise the cache")
    Prepared.clearCache()
    var i = 0
    while (i < 2000) {
      val x = 10 * frac(); val y = 10 * frac()
      val pw = Wkb.write(Point(x, y))
      assert(graft.sql.K.intersectsXY(wkb, x, y) == Pred.intersects(poly, Point(x, y)))
      assert(graft.sql.K.containsXY(wkb, x, y) == Pred.contains(poly, Point(x, y)))
      assert(graft.sql.K.intersects(wkb, pw) == Pred.intersects(poly, Point(x, y)))
      assert(graft.sql.K.contains(wkb, pw) == Pred.contains(poly, Point(x, y)))
      assert(graft.sql.K.covers(wkb, pw) == Pred.covers(poly, Point(x, y)))
      assert(graft.sql.K.within(pw, wkb) == Pred.within(Point(x, y), poly))
      i += 1
    }
    assert(Prepared.cacheSize == 1, s"zone should be cached once, size=${Prepared.cacheSize}")
  }

  test("small payloads skip the cache; cap clears instead of growing") {
    Prepared.clearCache()
    val rect = Wkb.write(Wkt.read("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert(rect.length < Prepared.MIN_CACHE_BYTES)
    graft.sql.K.intersectsXY(rect, 0.5, 0.5)
    assert(Prepared.cacheSize == 0, "a tiny rect must not be cached")
  }
}
