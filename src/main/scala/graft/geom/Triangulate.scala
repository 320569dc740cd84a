package graft.geom

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Delaunay triangulation (Bowyer–Watson, public textbook algorithm) and
 * Voronoi cells (direct half-plane intersection) over the vertex set of a
 * geometry — the DeconstructGeometry-adjacent analysis operators a full
 * geometry engine ships ⟨ref(engine): fork triangulation utilities [L]⟩.
 *
 * Design for the engine: both run PER ROW on one geometry's vertices
 * (10s–1000s of points), so an O(n²) Voronoi via successive half-plane
 * clipping is simpler AND more robust than tracing the Delaunay dual —
 * each cell is independently exact. Delaunay inserts points in sorted
 * order for determinism; the in-circle test uses the standard 3×3
 * determinant with a magnitude-scaled epsilon.
 *
 * Verified: TriangulateSpec pins JTS DelaunayTriangulationBuilder /
 * VoronoiDiagramBuilder parity (triangle count, total area, per-cell
 * areas) plus the partition invariants the q75/q76 oracles encode.
 */
object Triangulate {

  /** Distinct vertices of a geometry, lexicographically sorted. */
  def distinctPoints(g: Geometry): Array[Double] = {
    val seen = new mutable.LinkedHashSet[(Long, Long)]()
    val out = new ArrayBuffer[Double]()
    def add(cs: Array[Double]): Unit = {
      var i = 0
      while (i + 1 < cs.length) {
        val k = (java.lang.Double.doubleToLongBits(cs(i)), java.lang.Double.doubleToLongBits(cs(i + 1)))
        if (seen.add(k)) { out += cs(i); out += cs(i + 1) }
        i += 2
      }
    }
    def walk(h: Geometry): Unit = h match {
      case p: Point => if (!p.isEmpty) add(Array(p.x, p.y))
      case m: MultiPoint => add(m.coords)
      case l: LineString => add(l.coords)
      case m: MultiLineString => m.lines.foreach(add)
      case p: Polygon => p.rings.foreach(add)
      case m: MultiPolygon => m.polys.foreach(_.foreach(add))
      case c: GeometryCollection => c.geoms.foreach(walk)
      case zm: GeometryZM => walk(zm.base)
    }
    walk(g)
    val pts = out.toArray
    val idx = Array.range(0, pts.length / 2)
      .sortBy(i => (pts(2 * i), pts(2 * i + 1)))
    val sorted = new Array[Double](pts.length)
    var j = 0
    idx.foreach { i => sorted(2 * j) = pts(2 * i); sorted(2 * j + 1) = pts(2 * i + 1); j += 1 }
    sorted
  }

  private final case class Tri(a: Int, b: Int, c: Int)

  /**
   * Delaunay triangulation of the geometry's distinct vertices → triangles
   * as CCW Polygons. Fewer than 3 points (or all collinear) → empty.
   */
  def delaunay(g: Geometry): Array[Geometry] = {
    val pts = distinctPoints(g)
    val (xs2, ys2, tris) = delaunayIndexed(pts)
    tris.map { t =>
      Polygon(Array(Array(xs2(t.a), ys2(t.a), xs2(t.b), ys2(t.b),
        xs2(t.c), ys2(t.c), xs2(t.a), ys2(t.a)))): Geometry
    }
  }

  /** Index-form Delaunay over a packed point array (used by delaunay and
    * the chi-shape concave hull). Returns (xs, ys, CCW triangles). */
  private def delaunayIndexed(pts: Array[Double]): (Array[Double], Array[Double], Array[Tri]) = {
    val n = pts.length / 2
    if (n < 3) {
      val px = Array.tabulate(n)(i => pts(2 * i))
      val py = Array.tabulate(n)(i => pts(2 * i + 1))
      return (px, py, Array.empty)
    }
    // bounding super-triangle, comfortably outside the data
    val env = {
      var x0 = pts(0); var y0 = pts(1); var x1 = pts(0); var y1 = pts(1)
      var i = 2
      while (i + 1 < pts.length) {
        if (pts(i) < x0) x0 = pts(i); if (pts(i) > x1) x1 = pts(i)
        if (pts(i + 1) < y0) y0 = pts(i + 1); if (pts(i + 1) > y1) y1 = pts(i + 1)
        i += 2
      }
      (x0, y0, x1, y1)
    }
    val dx = math.max(env._3 - env._1, 1e-9); val dy = math.max(env._4 - env._2, 1e-9)
    val cx = (env._1 + env._3) / 2; val cy = (env._2 + env._4) / 2
    // the super vertices must lie OUTSIDE every circumcircle of finite
    // hull triples, whose radius grows as extent/deviation for
    // near-collinear triples — 1e9× covers deviations down to 1e-9
    // relative (below that the sliver's area is under every consumer's
    // tolerance); the exact-sign predicates keep the huge magnitudes safe
    val d = 1e9 * math.max(dx, dy)
    // coords array extended with the 3 super vertices at indices n..n+2
    val xs = new Array[Double](n + 3); val ys = new Array[Double](n + 3)
    var i = 0
    while (i < n) { xs(i) = pts(2 * i); ys(i) = pts(2 * i + 1); i += 1 }
    xs(n) = cx - d; ys(n) = cy - d
    xs(n + 1) = cx + d; ys(n + 1) = cy - d
    xs(n + 2) = cx; ys(n + 2) = cy + d

    // ---- exact-sign predicates: float fast path, BigDecimal fallback ----
    // (BigDecimal +,−,× are exact on double inputs, so the determinant
    // SIGN is exact — the textbook remedy for grid-aligned collinear
    // triples and points landing exactly on circumcircles/edges.)
    def orientSign(a: Int, b: Int, c: Int): Int = {
      val det = (xs(b) - xs(a)) * (ys(c) - ys(a)) - (ys(b) - ys(a)) * (xs(c) - xs(a))
      val mag = (math.abs(xs(b) - xs(a)) + math.abs(ys(b) - ys(a))) *
                (math.abs(xs(c) - xs(a)) + math.abs(ys(c) - ys(a)))
      if (math.abs(det) > 1e-12 * mag) math.signum(det).toInt
      else {
        import java.math.BigDecimal
        def bd(v: Double) = new BigDecimal(v)
        val d = bd(xs(b)).subtract(bd(xs(a))).multiply(bd(ys(c)).subtract(bd(ys(a))))
          .subtract(bd(ys(b)).subtract(bd(ys(a))).multiply(bd(xs(c)).subtract(bd(xs(a)))))
        d.signum()
      }
    }

    /** sign of the in-circle determinant for CCW (a,b,c): >0 strictly
      * inside, 0 cocircular, <0 outside. */
    def inCircleSign(t: Tri, p: Int): Int = {
      val ax = xs(t.a) - xs(p); val ay = ys(t.a) - ys(p)
      val bx = xs(t.b) - xs(p); val by = ys(t.b) - ys(p)
      val ccx = xs(t.c) - xs(p); val ccy = ys(t.c) - ys(p)
      val det =
        (ax * ax + ay * ay) * (bx * ccy - ccx * by) -
        (bx * bx + by * by) * (ax * ccy - ccx * ay) +
        (ccx * ccx + ccy * ccy) * (ax * by - bx * ay)
      val m = math.max(math.abs(ax) + math.abs(ay),
        math.max(math.abs(bx) + math.abs(by), math.abs(ccx) + math.abs(ccy)))
      if (math.abs(det) > 1e-10 * m * m * m * m) math.signum(det).toInt
      else {
        import java.math.BigDecimal
        def bd(v: Double) = new BigDecimal(v)
        def sub(u: Double, v: Double) = bd(u).subtract(bd(v))
        val Ax = sub(xs(t.a), xs(p)); val Ay = sub(ys(t.a), ys(p))
        val Bx = sub(xs(t.b), xs(p)); val By = sub(ys(t.b), ys(p))
        val Cx = sub(xs(t.c), xs(p)); val Cy = sub(ys(t.c), ys(p))
        val d = Ax.multiply(Ax).add(Ay.multiply(Ay))
          .multiply(Bx.multiply(Cy).subtract(Cx.multiply(By)))
          .subtract(Bx.multiply(Bx).add(By.multiply(By))
            .multiply(Ax.multiply(Cy).subtract(Cx.multiply(Ay))))
          .add(Cx.multiply(Cx).add(Cy.multiply(Cy))
            .multiply(Ax.multiply(By).subtract(Bx.multiply(Ay))))
        d.signum()
      }
    }

    /** p exactly on segment (u,v)? (exact collinearity + bbox) */
    def onEdge(u: Int, v: Int, p: Int): Boolean =
      orientSign(u, v, p) == 0 &&
        xs(p) >= math.min(xs(u), xs(v)) && xs(p) <= math.max(xs(u), xs(v)) &&
        ys(p) >= math.min(ys(u), ys(v)) && ys(p) <= math.max(ys(u), ys(v))

    var tris = mutable.ListBuffer[Tri]({
      // super-triangle, CCW
      val t = Tri(n, n + 1, n + 2)
      if (orientSign(t.a, t.b, t.c) > 0) t else Tri(n, n + 2, n + 1)
    })

    var p = 0
    while (p < n) {
      // bad = circumcircle strictly contains p, PLUS any triangle with p
      // exactly on one of its edges (cocircular det = 0 would otherwise
      // leave both edge-adjacent triangles in place and corrupt the cavity)
      val bad = tris.filter(t => inCircleSign(t, p) > 0 ||
        onEdge(t.a, t.b, p) || onEdge(t.b, t.c, p) || onEdge(t.c, t.a, p)).toList
      if (bad.nonEmpty) {
        tris = tris.filterNot(bad.contains)
        // cavity boundary = edges of bad triangles not shared by two bads
        val edgeCount = new mutable.LinkedHashMap[(Int, Int), Int]()
        def bump(u: Int, v: Int): Unit = {
          val k = if (u < v) (u, v) else (v, u)
          edgeCount(k) = edgeCount.getOrElse(k, 0) + 1
        }
        bad.foreach { t => bump(t.a, t.b); bump(t.b, t.c); bump(t.c, t.a) }
        bad.foreach { t =>
          Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { case (u, v) =>
            val k = if (u < v) (u, v) else (v, u)
            if (edgeCount(k) == 1) {
              val s = orientSign(u, v, p)
              // s == 0 ⇒ p exactly on a hull cavity edge — the degenerate
              // triangle is skipped; the remaining boundary edges cover
              // the cavity exactly
              if (s > 0) tris += Tri(u, v, p)
              else if (s < 0) tris += Tri(v, u, p)
            }
          }
        }
      }
      p += 1
    }

    (xs, ys, tris.toArray.filter(t => t.a < n && t.b < n && t.c < n))
  }

  /**
   * Chi-shape concave hull (Duckham et al. 2008, public): start from the
   * Delaunay triangulation, repeatedly remove the longest boundary edge
   * exceeding `maxEdgeLen` whose adjacent triangle's opposite vertex is
   * NOT already on the boundary (keeps the boundary simple and the region
   * connected), then trace the remaining region's boundary.
   * `maxEdgeLen = ∞` (or large) reproduces the convex hull exactly.
   */
  def concaveHull(g: Geometry, maxEdgeLen: Double): Geometry = {
    val pts = distinctPoints(g)
    val (xs, ys, tris0) = delaunayIndexed(pts)
    if (tris0.isEmpty) return Ops.convexHull(g)
    val live = mutable.LinkedHashSet(tris0.indices: _*)
    @inline def ekey(u: Int, v: Int): (Int, Int) = if (u < v) (u, v) else (v, u)
    @inline def elen(u: Int, v: Int): Double = math.hypot(xs(u) - xs(v), ys(u) - ys(v))
    // edge → adjacent live triangles
    val adj = new mutable.HashMap[(Int, Int), ArrayBuffer[Int]]()
    tris0.zipWithIndex.foreach { case (t, i) =>
      Seq(ekey(t.a, t.b), ekey(t.b, t.c), ekey(t.c, t.a)).foreach { k =>
        adj.getOrElseUpdate(k, new ArrayBuffer[Int](2)) += i
      }
    }
    def boundaryEdges: Seq[(Int, Int)] =
      adj.keysIterator.filter(k => adj(k).count(live.contains) == 1).toSeq
    var changed = true
    while (changed) {
      changed = false
      val bset = boundaryEdges
      val onBoundary = mutable.HashSet[Int]()
      bset.foreach { case (u, v) => onBoundary += u; onBoundary += v }
      // longest removable first (canonical: ties by key)
      val candidates = bset.filter { case (u, v) => elen(u, v) > maxEdgeLen }
        .sortBy { case (u, v) => (-elen(u, v), u, v) }
      val it = candidates.iterator
      while (it.hasNext && !changed) {
        val (u, v) = it.next()
        val ts = adj(ekey(u, v)).filter(live.contains)
        if (ts.length == 1) {
          val t = tris0(ts.head)
          val w = if (t.a != u && t.a != v) t.a else if (t.b != u && t.b != v) t.b else t.c
          if (!onBoundary.contains(w) && live.size > 1) {
            live -= ts.head
            changed = true
          }
        }
      }
    }
    // trace the boundary of the remaining region via the face tracer
    val dir = new ArrayBuffer[PlanarOverlay.DirEdge]()
    boundaryEdges.foreach { case (u, v) =>
      // orient so the region interior is on the LEFT: the live triangle's
      // winding gives the direction (CCW triangle edge order)
      val ti = adj(ekey(u, v)).filter(live.contains).head
      val t = tris0(ti)
      val (su, sv) =
        if ((t.a == u && t.b == v) || (t.b == u && t.c == v) || (t.c == u && t.a == v)) (u, v)
        else (v, u)
      dir += PlanarOverlay.DirEdge(xs(su), ys(su), xs(sv), ys(sv))
    }
    if (dir.isEmpty) return Ops.convexHull(g)
    val rings = PlanarOverlay.trace(dir)
    PlanarOverlay.mkResult(rings)
  }

  /**
   * Smallest enclosing circle (Welzl 1991, public; deterministic input
   * order — no shuffle — which is O(n²) worst-case and fine at per-row
   * vertex counts). Returns (cx, cy, r).
   */
  def minimumBoundingCircle(g: Geometry): (Double, Double, Double) = {
    val pts = distinctPoints(g)
    val n = pts.length / 2
    require(n > 0, "empty geometry has no bounding circle")
    @inline def d(x1: Double, y1: Double, x2: Double, y2: Double) = math.hypot(x1 - x2, y1 - y2)
    def circum(ax: Double, ay: Double, bx: Double, by: Double,
               cx: Double, cy: Double): (Double, Double, Double) = {
      val dd = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      if (dd == 0) { // collinear: diameter of the extreme pair
        val pairs = Seq(((ax, ay), (bx, by)), ((ax, ay), (cx, cy)), ((bx, by), (cx, cy)))
        val ((x1, y1), (x2, y2)) = pairs.maxBy { case ((p, q), (r2, s2)) => d(p, q, r2, s2) }
        ((x1 + x2) / 2, (y1 + y2) / 2, d(x1, y1, x2, y2) / 2)
      } else {
        val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
          (cx * cx + cy * cy) * (ay - by)) / dd
        val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
          (cx * cx + cy * cy) * (bx - ax)) / dd
        (ux, uy, d(ux, uy, ax, ay))
      }
    }
    val EPS = 1e-10
    @inline def in(c: (Double, Double, Double), x: Double, y: Double): Boolean =
      d(c._1, c._2, x, y) <= c._3 * (1 + EPS) + EPS
    var c: (Double, Double, Double) = (pts(0), pts(1), 0.0)
    var i = 1
    while (i < n) {
      val (px, py) = (pts(2 * i), pts(2 * i + 1))
      if (!in(c, px, py)) {
        c = (px, py, 0.0)
        var j = 0
        while (j < i) {
          val (qx, qy) = (pts(2 * j), pts(2 * j + 1))
          if (!in(c, qx, qy)) {
            c = ((px + qx) / 2, (py + qy) / 2, d(px, py, qx, qy) / 2)
            var k = 0
            while (k < j) {
              val (rx, ry) = (pts(2 * k), pts(2 * k + 1))
              if (!in(c, rx, ry)) c = circum(px, py, qx, qy, rx, ry)
              k += 1
            }
          }
          j += 1
        }
      }
      i += 1
    }
    c
  }

  /**
   * Minimum-area oriented bounding rectangle (rotating calipers over the
   * convex hull, public textbook method) → 5-point CCW ring Polygon.
   */
  def orientedEnvelope(g: Geometry): Geometry = {
    val hull = Ops.convexHull(g) match {
      case p: Polygon => p.rings(0)
      case other => return other // point/segment inputs: the hull itself
    }
    val m = hull.length / 2 - 1 // closed ring
    var best = Double.MaxValue
    var bestRect: Array[Double] = null
    var e = 0
    while (e < m) {
      val ex = hull(2 * ((e + 1) % m)) - hull(2 * e)
      val ey = hull(2 * ((e + 1) % m) + 1) - hull(2 * e + 1)
      val len = math.hypot(ex, ey)
      if (len > 0) {
        val ux = ex / len; val uy = ey / len // edge direction
        var minU = Double.MaxValue; var maxU = Double.MinValue
        var minV = Double.MaxValue; var maxV = Double.MinValue
        var i = 0
        while (i < m) {
          val px = hull(2 * i); val py = hull(2 * i + 1)
          val u = px * ux + py * uy
          val v = -px * uy + py * ux
          if (u < minU) minU = u; if (u > maxU) maxU = u
          if (v < minV) minV = v; if (v > maxV) maxV = v
          i += 1
        }
        val area = (maxU - minU) * (maxV - minV)
        if (area < best) {
          best = area
          @inline def pt(u: Double, v: Double): (Double, Double) =
            (u * ux - v * uy, u * uy + v * ux)
          val corners = Seq(pt(minU, minV), pt(maxU, minV), pt(maxU, maxV), pt(minU, maxV))
          bestRect = (corners.flatMap { case (x, y) => Seq(x, y) } ++
            Seq(corners.head._1, corners.head._2)).toArray
        }
      }
      e += 1
    }
    if (bestRect == null) Ops.convexHull(g)
    else {
      val ring = if (Ops.signedRingArea(bestRect) < 0)
        PlanarOverlay.reverseRing(bestRect) else bestRect
      Polygon(Array(ring))
    }
  }

  /** Clip a ring by the half-plane {(x,y) : a·x + b·y ≤ c} (SH step). */
  private def clipHalfPlane(ring: Array[Double], a: Double, b: Double, c: Double): Array[Double] = {
    val out = new ArrayBuffer[Double]()
    val m = ring.length / 2 - 1 // closed ring: last point repeats first
    var i = 0
    while (i < m) {
      val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
      val x2 = ring(2 * i + 2); val y2 = ring(2 * i + 3)
      val d1 = a * x1 + b * y1 - c
      val d2 = a * x2 + b * y2 - c
      if (d1 <= 0) { out += x1; out += y1 }
      if ((d1 < 0 && d2 > 0) || (d1 > 0 && d2 < 0)) {
        val t = d1 / (d1 - d2)
        out += x1 + t * (x2 - x1); out += y1 + t * (y2 - y1)
      }
      i += 1
    }
    if (out.length < 6) return Array.empty
    out += out(0); out += out(1)
    out.toArray
  }

  /**
   * Voronoi cells of the geometry's distinct vertices, clipped to `env`
   * (defaults to the vertex envelope expanded by 10%). Cell i is the set
   * of env points nearer to seed i than to any other seed — computed as
   * successive half-plane clips by the perpendicular bisectors, so the
   * cells exactly PARTITION the clip envelope (the q75 invariant).
   * Returned in seed (sorted-vertex) order.
   */
  def voronoi(g: Geometry, envOpt: Option[Env] = None): Array[Geometry] = {
    val pts = distinctPoints(g)
    val n = pts.length / 2
    if (n == 0) return Array.empty
    val env = envOpt.getOrElse {
      val e = g.envelope
      val mx = math.max(e.xmax - e.xmin, 1e-9) * 0.1
      val my = math.max(e.ymax - e.ymin, 1e-9) * 0.1
      Env(e.xmin - mx, e.ymin - my, e.xmax + mx, e.ymax + my)
    }
    (0 until n).map { i =>
      val px = pts(2 * i); val py = pts(2 * i + 1)
      var ring = Array(env.xmin, env.ymin, env.xmax, env.ymin,
        env.xmax, env.ymax, env.xmin, env.ymax, env.xmin, env.ymin)
      var j = 0
      while (j < n && ring.nonEmpty) {
        if (j != i) {
          val qx = pts(2 * j); val qy = pts(2 * j + 1)
          // bisector: points nearer p than q → 2(q-p)·x ≤ |q|² - |p|²
          val a = 2 * (qx - px); val b = 2 * (qy - py)
          val c = qx * qx + qy * qy - px * px - py * py
          ring = clipHalfPlane(ring, a, b, c)
        }
        j += 1
      }
      (if (ring.isEmpty) Polygon(Array.empty) else Polygon(Array(ring))): Geometry
    }.toArray
  }

  // ---------- constrained polygon triangulation (ear clipping) ----------

  /** Exact orientation sign of the corner a→b→c: float fast path with a
    * relative-error filter, BigDecimal fallback (the same remedy as
    * delaunayIndexed's predicates — BigDecimal +,−,× are exact on double
    * inputs, so the determinant SIGN is exact). */
  private def orientXY(ax: Double, ay: Double, bx: Double, by: Double,
                       cx: Double, cy: Double): Int = {
    val det = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val mag = (math.abs(bx - ax) + math.abs(by - ay)) *
              (math.abs(cx - ax) + math.abs(cy - ay))
    if (math.abs(det) > 1e-12 * mag) math.signum(det).toInt
    else {
      import java.math.BigDecimal
      def bd(v: Double) = new BigDecimal(v)
      bd(bx).subtract(bd(ax)).multiply(bd(cy).subtract(bd(ay)))
        .subtract(bd(by).subtract(bd(ay)).multiply(bd(cx).subtract(bd(ax)))).signum()
    }
  }

  /** EAR-CLIP triangulation of one simple hole-free closed ring: CCW
    * triangles whose disjoint union is the ring's polygon — exactly n−2
    * of them after collinear/duplicate-vertex cleaning (a collinear
    * corner EXPOSED by clipping is removed without emitting its zero-area
    * sliver, so degenerate triangles never appear in the output). The
    * two-ears theorem guarantees progress on simple input; a ring that
    * exposes no ear (self-intersecting) throws. O(n²) in the RING's
    * vertex count — a per-row bound, never data size (st_subdivide is
    * the tool that keeps n small at scale). */
  /** Open a closed ring: strip the closing vertex and consecutive
    * duplicates, normalize winding (`ccw` selects the target). */
  private def openRing(closed: Array[Double], ccw: Boolean): (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    var xs = ArrayBuffer.empty[Double]; var ys = ArrayBuffer.empty[Double]
    val m = closed.length / 2 - 1
    var i = 0
    while (i < m) {
      val x = closed(2 * i); val y = closed(2 * i + 1)
      if (xs.isEmpty || xs.last != x || ys.last != y) { xs += x; ys += y }
      i += 1
    }
    if (xs.length >= 2 && xs.head == xs.last && ys.head == ys.last) {
      xs = xs.dropRight(1); ys = ys.dropRight(1)
    }
    var area2 = 0.0
    i = 0
    while (i < xs.length) {
      val j = (i + 1) % xs.length
      area2 += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    if ((area2 < 0) == ccw) { xs = xs.reverse; ys = ys.reverse }
    (xs, ys)
  }

  private def earClipRing(closed: Array[Double]): ArrayBuffer[Geometry] = {
    var (xs, ys) = openRing(closed, ccw = true)
    // clean collinear runs (a hole-free ring only — bridged rings carry
    // structural zero-width seams that must survive to the clip loop)
    var changed = true
    while (changed && xs.length > 2) {
      changed = false
      var k = 0
      while (k < xs.length && xs.length > 2) {
        val p = (k + xs.length - 1) % xs.length; val nx = (k + 1) % xs.length
        if (orientXY(xs(p), ys(p), xs(k), ys(k), xs(nx), ys(nx)) == 0) {
          xs.remove(k); ys.remove(k); changed = true
        } else k += 1
      }
    }
    earClipOpen(xs, ys)
  }

  /** The clip loop proper, over an open CCW vertex list. */
  private def earClipOpen(xs: ArrayBuffer[Double], ys: ArrayBuffer[Double]): ArrayBuffer[Geometry] = {
    val out = ArrayBuffer.empty[Geometry]
    val n0 = xs.length
    if (n0 < 3) return out

    val alive = ArrayBuffer.tabulate(n0)(identity)
    def emit(a: Int, b: Int, c: Int): Unit =
      out += Polygon(Array(Array(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c), xs(a), ys(a))))
    while (alive.length > 3) {
      val n = alive.length
      var clipped = false
      var k = 0
      while (k < n && !clipped) {
        val a = alive((k + n - 1) % n); val b = alive(k); val c = alive((k + 1) % n)
        val o = orientXY(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c))
        if (o == 0) {
          // collinear corner exposed by earlier clips: zero-area ear —
          // remove the vertex, emit nothing (the region is unchanged)
          alive.remove(k); clipped = true
        } else if (o > 0) {
          // convex corner: an ear iff no other alive vertex lies in or on
          // the candidate triangle (on-edge blocks — clipping through it
          // would strand that vertex on a seam)
          var blocked = false
          var t = 0
          while (t < n && !blocked) {
            val p = alive(t)
            // a vertex COINCIDENT with a corner never blocks: bridge
            // splicing (holes) doubles the two bridge endpoints, and the
            // twin sitting exactly on a corner is the seam itself, not an
            // obstruction (the earcut rule)
            val twin = (xs(p) == xs(a) && ys(p) == ys(a)) ||
              (xs(p) == xs(b) && ys(p) == ys(b)) ||
              (xs(p) == xs(c) && ys(p) == ys(c))
            if (p != a && p != b && p != c && !twin &&
              orientXY(xs(a), ys(a), xs(b), ys(b), xs(p), ys(p)) >= 0 &&
              orientXY(xs(b), ys(b), xs(c), ys(c), xs(p), ys(p)) >= 0 &&
              orientXY(xs(c), ys(c), xs(a), ys(a), xs(p), ys(p)) >= 0) blocked = true
            t += 1
          }
          if (!blocked) { emit(a, b, c); alive.remove(k); clipped = true }
        }
        k += 1
      }
      if (!clipped)
        throw new IllegalArgumentException(
          "st_triangulate: no ear found — ring is not a simple polygon")
    }
    // the last corner of a bridged ring can be a collapsed seam — never
    // emit a zero-area triangle
    if (orientXY(xs(alive(0)), ys(alive(0)), xs(alive(1)), ys(alive(1)),
        xs(alive(2)), ys(alive(2))) != 0)
      emit(alive(0), alive(1), alive(2))
    out
  }

  /** Proper/degenerate segment-crossing test used by the hole-bridge
    * visibility search: true when (p1,p2) and (q1,q2) cross at an interior
    * point, touch at a non-shared endpoint, or overlap collinearly. Shared
    * endpoints (coincident coordinates) do not block. */
  private def segsBlock(p1x: Double, p1y: Double, p2x: Double, p2y: Double,
                        q1x: Double, q1y: Double, q2x: Double, q2y: Double): Boolean = {
    def shared(ax: Double, ay: Double, bx: Double, by: Double) = ax == bx && ay == by
    if (shared(p1x, p1y, q1x, q1y) || shared(p1x, p1y, q2x, q2y) ||
        shared(p2x, p2y, q1x, q1y) || shared(p2x, p2y, q2x, q2y)) return false
    val o1 = orientXY(p1x, p1y, p2x, p2y, q1x, q1y)
    val o2 = orientXY(p1x, p1y, p2x, p2y, q2x, q2y)
    val o3 = orientXY(q1x, q1y, q2x, q2y, p1x, p1y)
    val o4 = orientXY(q1x, q1y, q2x, q2y, p2x, p2y)
    if (o1 * o2 < 0 && o3 * o4 < 0) return true
    @inline def onSeg(ax: Double, ay: Double, bx: Double, by: Double,
                      px: Double, py: Double): Boolean =
      math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
        math.min(ay, by) <= py && py <= math.max(ay, by)
    (o1 == 0 && onSeg(p1x, p1y, p2x, p2y, q1x, q1y)) ||
      (o2 == 0 && onSeg(p1x, p1y, p2x, p2y, q2x, q2y)) ||
      (o3 == 0 && onSeg(q1x, q1y, q2x, q2y, p1x, p1y)) ||
      (o4 == 0 && onSeg(q1x, q1y, q2x, q2y, p2x, p2y))
  }

  /** Earcut-style hole elimination: splice every hole into the outer ring
    * with a zero-width bridge at a mutually VISIBLE vertex pair, producing
    * one pinched ring the clip loop handles via the coincident-corner seam
    * rule. Holes are processed by ascending min-x and each bridges from
    * its min-x vertex toward smaller x, so a bridge can never cross a
    * not-yet-spliced hole (their interiors lie at larger x). Visibility is
    * decided by exact-sign crossing tests against every edge of the
    * current outer ring and the hole itself — O(n²) per hole, a per-row
    * polygon bound. */
  private def bridgeHoles(shell: Array[Double], holes: Seq[Array[Double]]): (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    var (ox, oy) = openRing(shell, ccw = true)
    val opened = holes.map(h => openRing(h, ccw = false)).filter(_._1.length >= 3)
      .sortBy { case (hx, _) => hx.min }
    opened.zipWithIndex.foreach { case ((hx, hy), hi) =>
      // hole anchor: min-x vertex (ties by min y, then first index)
      var m = 0
      var i = 1
      while (i < hx.length) {
        if (hx(i) < hx(m) || (hx(i) == hx(m) && hy(i) < hy(m))) m = i
        i += 1
      }
      val mx = hx(m); val my = hy(m)
      // nearest visible outer vertex; first pass restricts to x <= anchor
      // (a leftward bridge can't cross a not-yet-spliced hole, whose
      // interior lies at larger x), the FALLBACK pass admits any vertex
      // but then must test visibility against the remaining holes too
      // (shell pockets can occlude every leftward vertex)
      def findVisible(restrictX: Boolean): Int = {
        var best = -1; var bestD = Double.PositiveInfinity
        var v = 0
        while (v < ox.length) {
          if (!restrictX || ox(v) <= mx) {
            val d = (ox(v) - mx) * (ox(v) - mx) + (oy(v) - my) * (oy(v) - my)
            if (d < bestD) {
              var blocked = false
              var e = 0
              while (e < ox.length && !blocked) {
                val f = (e + 1) % ox.length
                if (segsBlock(mx, my, ox(v), oy(v), ox(e), oy(e), ox(f), oy(f))) blocked = true
                e += 1
              }
              e = 0
              while (e < hx.length && !blocked) {
                val f = (e + 1) % hx.length
                if (segsBlock(mx, my, ox(v), oy(v), hx(e), hy(e), hx(f), hy(f))) blocked = true
                e += 1
              }
              if (!restrictX && !blocked) {
                var oi = hi + 1
                while (oi < opened.length && !blocked) {
                  val (rx, ry) = opened(oi)
                  e = 0
                  while (e < rx.length && !blocked) {
                    val f = (e + 1) % rx.length
                    if (segsBlock(mx, my, ox(v), oy(v), rx(e), ry(e), rx(f), ry(f))) blocked = true
                    e += 1
                  }
                  oi += 1
                }
              }
              if (!blocked) { best = v; bestD = d }
            }
          }
          v += 1
        }
        best
      }
      var best = findVisible(restrictX = true)
      if (best < 0) best = findVisible(restrictX = false)
      if (best < 0)
        throw new IllegalArgumentException(
          "st_triangulate: no visible bridge vertex for a hole — polygon is not valid")
      // splice after `best`: hole cycle from m back to m, then the bridge
      // return to the outer vertex (both endpoints doubled — the seam)
      val nx = ArrayBuffer.empty[Double]; val ny = ArrayBuffer.empty[Double]
      var k = 0
      while (k <= best) { nx += ox(k); ny += oy(k); k += 1 }
      k = 0
      while (k <= hx.length) { // inclusive: m reappears at the end
        val idx = (m + k) % hx.length
        nx += hx(idx); ny += hy(idx); k += 1
      }
      nx += ox(best); ny += oy(best)
      k = best + 1
      while (k < ox.length) { nx += ox(k); ny += oy(k); k += 1 }
      ox = nx; oy = ny
    }
    (ox, oy)
  }

  /** Constrained triangulation of polygonal geometry (PostGIS
    * ST_TriangulatePolygon's role): each part becomes ear-clip triangles
    * whose disjoint union is the part — exactly n−2 per general-position
    * hole-free ring; holed parts first splice every hole into the shell
    * with zero-width bridges (earcut's elimination), then clip the
    * pinched ring. */
  def triangulatePolygon(g: Geometry): Array[Geometry] = g match {
    case p: Polygon =>
      if (p.isEmpty) Array.empty else triangulateRings(p.rings).toArray
    case mp: MultiPolygon =>
      mp.polys.flatMap(rings => if (rings.isEmpty) Nil else triangulateRings(rings))
    case _ => throw new IllegalArgumentException(
      s"st_triangulate expects polygonal input, got type ${g.typeCode}")
  }

  private def triangulateRings(rings: Array[Array[Double]]): ArrayBuffer[Geometry] =
    if (rings.length == 1) earClipRing(rings(0))
    else {
      val (xs, ys) = bridgeHoles(rings(0), rings.toSeq.tail)
      earClipOpen(xs, ys)
    }
}
