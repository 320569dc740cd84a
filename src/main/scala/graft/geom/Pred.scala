package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Relational predicate kernels: DE-9IM relate + named predicates + distance.
 *
 * Behavioral counterpart of the reference's shared relational core
 * ⟨ref(engine): com.esri.core.geometry.RelationalOperations /
 * RelationalOperationsMatrix⟩ dispatched by OperatorRelateLocal,
 * OperatorIntersectsLocal, OperatorContainsLocal, … (SURVEY.md §2.4).
 * Like the reference, all named predicates are specializations of one
 * relate kernel, with envelope quick-reject fast paths for the hot ones.
 *
 * Geometry inputs are assumed topologically valid (simple rings, shell +
 * holes); `Ops.simplify` canonicalizes. 2D planar only.
 */
object Pred {

  // ---------------- low-level primitives ----------------

  @inline def orient(ax: Double, ay: Double, bx: Double, by: Double,
                     px: Double, py: Double): Double =
    (bx - ax) * (py - ay) - (by - ay) * (px - ax)

  /** p collinear with and within segment ab (inclusive of endpoints). */
  def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
                px: Double, py: Double): Boolean = {
    if (orient(ax, ay, bx, by, px, py) != 0.0) return false
    px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)
  }

  /**
   * Segment×segment intersection classification.
   * Returns 0 = disjoint; 1 = single point (out(0,1) = point);
   * 2 = collinear overlap of positive length (out(0..3) = endpoints).
   */
  def segSeg(ax: Double, ay: Double, bx: Double, by: Double,
             cx: Double, cy: Double, dx: Double, dy: Double,
             out: Array[Double]): Int = {
    // bbox quick reject
    if (math.max(ax, bx) < math.min(cx, dx) || math.max(cx, dx) < math.min(ax, bx) ||
        math.max(ay, by) < math.min(cy, dy) || math.max(cy, dy) < math.min(ay, by)) return 0
    val d1 = orient(cx, cy, dx, dy, ax, ay)
    val d2 = orient(cx, cy, dx, dy, bx, by)
    val d3 = orient(ax, ay, bx, by, cx, cy)
    val d4 = orient(ax, ay, bx, by, dx, dy)
    if (d1 == 0.0 && d2 == 0.0 && d3 == 0.0 && d4 == 0.0) {
      // collinear: project on dominant axis
      val useX = math.abs(bx - ax) + math.abs(dx - cx) >= math.abs(by - ay) + math.abs(dy - cy)
      var a0 = if (useX) ax else ay; var a1 = if (useX) bx else by
      var aP0x = ax; var aP0y = ay; var aP1x = bx; var aP1y = by
      if (a0 > a1) { val t = a0; a0 = a1; a1 = t; val tx = aP0x; aP0x = aP1x; aP1x = tx; val ty = aP0y; aP0y = aP1y; aP1y = ty }
      var c0 = if (useX) cx else cy; var c1 = if (useX) dx else dy
      var cP0x = cx; var cP0y = cy; var cP1x = dx; var cP1y = dy
      if (c0 > c1) { val t = c0; c0 = c1; c1 = t; val tx = cP0x; cP0x = cP1x; cP1x = tx; val ty = cP0y; cP0y = cP1y; cP1y = ty }
      val lo = math.max(a0, c0); val hi = math.min(a1, c1)
      if (lo > hi) return 0
      if (lo == hi) {
        // single shared endpoint
        val (px, py) = if (a0 >= c0) (aP0x, aP0y) else (cP0x, cP0y)
        out(0) = px; out(1) = py
        return 1
      }
      // overlap endpoints: pick the actual coordinates at lo / hi
      val (p1x, p1y) = if (a0 >= c0) (aP0x, aP0y) else (cP0x, cP0y)
      val (p2x, p2y) = if (a1 <= c1) (aP1x, aP1y) else (cP1x, cP1y)
      out(0) = p1x; out(1) = p1y; out(2) = p2x; out(3) = p2y
      return 2
    }
    if ((d1 > 0 && d2 > 0) || (d1 < 0 && d2 < 0)) return 0
    if ((d3 > 0 && d4 > 0) || (d3 < 0 && d4 < 0)) return 0
    // touching at an endpoint → use exact endpoint coordinates
    if (d1 == 0.0 && onSegment(cx, cy, dx, dy, ax, ay)) { out(0) = ax; out(1) = ay; return 1 }
    if (d2 == 0.0 && onSegment(cx, cy, dx, dy, bx, by)) { out(0) = bx; out(1) = by; return 1 }
    if (d3 == 0.0 && onSegment(ax, ay, bx, by, cx, cy)) { out(0) = cx; out(1) = cy; return 1 }
    if (d4 == 0.0 && onSegment(ax, ay, bx, by, dx, dy)) { out(0) = dx; out(1) = dy; return 1 }
    if (d1 == 0.0 || d2 == 0.0 || d3 == 0.0 || d4 == 0.0) return 0 // collinear-ish but outside
    // proper crossing
    val t = d1 / (d1 - d2)
    out(0) = ax + t * (bx - ax); out(1) = ay + t * (by - ay)
    1
  }

  /** Ray-crossing point-in-ring: -1 outside, 0 on boundary, 1 inside. */
  def pointInRing(r: Array[Double], x: Double, y: Double): Int = {
    var inside = false
    var i = 0
    val n = r.length
    while (i + 3 < n) {
      val x1 = r(i); val y1 = r(i + 1); val x2 = r(i + 2); val y2 = r(i + 3)
      if (onSegment(x1, y1, x2, y2, x, y)) return 0
      if ((y1 > y) != (y2 > y) && x < (x2 - x1) * (y - y1) / (y2 - y1) + x1) inside = !inside
      i += 2
    }
    if (inside) 1 else -1
  }

  /** Point vs polygon (shell + holes): -1 exterior, 0 boundary, 1 interior. */
  def pointInPolygon(rings: Array[Array[Double]], x: Double, y: Double): Int = {
    if (rings.isEmpty) return -1
    val s = pointInRing(rings(0), x, y)
    if (s <= 0) return s
    var i = 1
    while (i < rings.length) {
      val h = pointInRing(rings(i), x, y)
      if (h == 0) return 0
      if (h == 1) return -1
      i += 1
    }
    1
  }

  /** Point vs multipolygon parts: -1 exterior, 0 boundary, 1 interior. */
  def pointInPolygonal(polys: Array[Array[Array[Double]]], x: Double, y: Double): Int = {
    var best = -1
    var i = 0
    while (i < polys.length) {
      val r = pointInPolygon(polys(i), x, y)
      if (r == 1) return 1
      if (r == 0) best = 0
      i += 1
    }
    best
  }

  // ---------------- homogeneous decomposition ----------------

  /** (puntal coords | null, lineal parts | null, polygonal parts | null) */
  private[geom] def decompose(g: Geometry):
      (Array[Double], Array[Array[Double]], Array[Array[Array[Double]]]) = g match {
    case p: Point           => (if (p.isEmpty) Array.empty[Double] else Array(p.x, p.y), null, null)
    case m: MultiPoint      => (m.coords, null, null)
    case l: LineString      => (null, Array(l.coords), null)
    case m: MultiLineString => (null, m.lines, null)
    case p: Polygon         => (null, null, Array(p.rings))
    case m: MultiPolygon    => (null, null, m.polys)
    case c: GeometryCollection =>
      val dims = c.geoms.filterNot(_.isEmpty).map(_.dimension).distinct
      if (dims.length != 1)
        throw new IllegalArgumentException("relate on heterogeneous GeometryCollection not supported")
      dims(0) match {
        case 0 => (c.geoms.flatMap(g0 => decompose(g0)._1), null, null)
        case 1 => (null, c.geoms.flatMap(g0 => decompose(g0)._2), null)
        case _ => (null, null, c.geoms.flatMap(g0 => decompose(g0)._3))
      }
  }

  /** mod-2 boundary points of a set of linestrings (closed rings have none). */
  private[geom] def linealBoundary(lines: Array[Array[Double]]): Array[Double] = {
    val counts = scala.collection.mutable.HashMap.empty[(Double, Double), Int]
    var i = 0
    while (i < lines.length) {
      val cs = lines(i)
      if (cs.length >= 4) {
        val p0 = (cs(0), cs(1)); val p1 = (cs(cs.length - 2), cs(cs.length - 1))
        counts(p0) = counts.getOrElse(p0, 0) + 1
        counts(p1) = counts.getOrElse(p1, 0) + 1
      }
      i += 1
    }
    val out = new ArrayBuffer[Double]()
    counts.foreach { case ((x, y), c) => if (c % 2 == 1) { out += x; out += y } }
    out.toArray
  }

  /** Is (x,y) on any segment of the lineal set? */
  def onLineal(lines: Array[Array[Double]], x: Double, y: Double): Boolean = {
    var i = 0
    while (i < lines.length) {
      val cs = lines(i)
      var j = 0
      while (j + 3 < cs.length) {
        if (onSegment(cs(j), cs(j + 1), cs(j + 2), cs(j + 3), x, y)) return true
        j += 2
      }
      i += 1
    }
    false
  }

  // ---------------- DE-9IM relate ----------------

  // matrix indices: row (A side) I=0,B=1,E=2; col (B side) I=0,B=1,E=2; idx = row*3+col
  private val II = 0; private val IB = 1; private val IE = 2
  private val BI = 3; private val BB = 4; private val BE = 5
  private val EI = 6; private val EB = 7; private val EE = 8

  @inline private def upd(m: Array[Int], i: Int, d: Int): Unit = if (d > m(i)) m(i) = d

  def relateMatrix(a: Geometry, b: Geometry): Array[Int] = {
    val m = Array.fill(9)(-1)
    m(EE) = 2
    if (a.isEmpty || b.isEmpty) {
      if (!b.isEmpty) { m(EI) = b.dimension; if (b.dimension > 0) m(EB) = b.dimension - 1 }
      if (!a.isEmpty) { m(IE) = a.dimension; if (a.dimension > 0) m(BE) = a.dimension - 1 }
      return m
    }
    val (ap, al, aa) = decompose(a)
    val (bp, bl, ba) = decompose(b)
    (ap, al, aa, bp, bl, ba) match {
      case (p1, _, _, p2, _, _) if p1 != null && p2 != null => relPP(p1, p2, m)
      case (p1, _, _, _, l2, _) if p1 != null && l2 != null => relPL(p1, l2, m, flip = false)
      case (_, l1, _, p2, _, _) if l1 != null && p2 != null => relPL(p2, l1, m, flip = true)
      case (p1, _, _, _, _, a2) if p1 != null && a2 != null => relPA(p1, a2, m, flip = false)
      case (_, _, a1, p2, _, _) if a1 != null && p2 != null => relPA(p2, a1, m, flip = true)
      case (_, l1, _, _, l2, _) if l1 != null && l2 != null => relLL(l1, l2, m)
      case (_, l1, _, _, _, a2) if l1 != null && a2 != null => relLA(l1, a2, m, flip = false)
      case (_, _, a1, _, l2, _) if a1 != null && l2 != null => relLA(l2, a1, m, flip = true)
      case (_, _, a1, _, _, a2) if a1 != null && a2 != null => relAA(a1, a2, m)
      case _ => // one side empty-decomposed
    }
    m
  }

  @inline private def put(m: Array[Int], i: Int, d: Int, flip: Boolean): Unit =
    upd(m, if (flip) (i % 3) * 3 + i / 3 else i, d)

  private def relPP(pa: Array[Double], pb: Array[Double], m: Array[Int]): Unit = {
    def hasPoint(set: Array[Double], x: Double, y: Double): Boolean = {
      var i = 0
      while (i < set.length) { if (set(i) == x && set(i + 1) == y) return true; i += 2 }
      false
    }
    var i = 0
    while (i < pa.length) {
      if (hasPoint(pb, pa(i), pa(i + 1))) upd(m, II, 0) else upd(m, IE, 0)
      i += 2
    }
    i = 0
    while (i < pb.length) {
      if (!hasPoint(pa, pb(i), pb(i + 1))) upd(m, EI, 0)
      i += 2
    }
  }

  private def relPL(pts: Array[Double], lines: Array[Array[Double]], m: Array[Int], flip: Boolean): Unit = {
    val bnd = linealBoundary(lines)
    def isBnd(x: Double, y: Double): Boolean = {
      var i = 0
      while (i < bnd.length) { if (bnd(i) == x && bnd(i + 1) == y) return true; i += 2 }
      false
    }
    var i = 0
    while (i < pts.length) {
      val x = pts(i); val y = pts(i + 1)
      if (onLineal(lines, x, y)) {
        if (isBnd(x, y)) put(m, IB, 0, flip) else put(m, II, 0, flip)
      } else put(m, IE, 0, flip)
      i += 2
    }
    put(m, EI, 1, flip) // a 1-dim interior can't be covered by finitely many points
    i = 0
    var uncovered = false
    while (i < bnd.length) {
      var found = false
      var j = 0
      while (j < pts.length && !found) {
        if (pts(j) == bnd(i) && pts(j + 1) == bnd(i + 1)) found = true
        j += 2
      }
      if (!found) uncovered = true
      i += 2
    }
    if (uncovered) put(m, EB, 0, flip)
  }

  private def relPA(pts: Array[Double], polys: Array[Array[Array[Double]]], m: Array[Int], flip: Boolean): Unit = {
    var i = 0
    while (i < pts.length) {
      pointInPolygonal(polys, pts(i), pts(i + 1)) match {
        case 1  => put(m, II, 0, flip)
        case 0  => put(m, IB, 0, flip)
        case _  => put(m, IE, 0, flip)
      }
      i += 2
    }
    put(m, EI, 2, flip); put(m, EB, 1, flip)
  }

  /** Split points (parameter ts) of segment (ax,ay)-(bx,by) against a lineal set. */
  /** Split points (t, x, y) of a segment against cutter segments, sorted
    * by t, with the EXACT intersection coordinates preserved (collinear
    * overlaps return the cutter's own endpoint coords). */
  private def splitPts(ax: Double, ay: Double, bx: Double, by: Double,
                       other: Array[Array[Double]]): Array[(Double, Double, Double)] = {
    val ts = new ArrayBuffer[(Double, Double, Double)](8)
    ts += ((0.0, ax, ay)); ts += ((1.0, bx, by))
    val out = new Array[Double](4)
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    @inline def tOf(px: Double, py: Double): Double =
      if (len2 == 0) 0.0 else ((px - ax) * dx + (py - ay) * dy) / len2
    var i = 0
    while (i < other.length) {
      val cs = other(i)
      var j = 0
      while (j + 3 < cs.length) {
        segSeg(ax, ay, bx, by, cs(j), cs(j + 1), cs(j + 2), cs(j + 3), out) match {
          case 1 => ts += ((tOf(out(0), out(1)), out(0), out(1)))
          case 2 => ts += ((tOf(out(0), out(1)), out(0), out(1)))
                    ts += ((tOf(out(2), out(3)), out(2), out(3)))
          case _ =>
        }
        j += 2
      }
      i += 1
    }
    ts.sortBy(_._1).toArray
  }

  /** Iterate sub-segment midpoints of `lines` split against `cutter`. The
    * callback's third argument is TRUE when the sub-segment is a COLLINEAR
    * RUN along one cutter segment — decided EXACTLY from the stored split
    * coordinates (both interval endpoints on one cutter segment), because
    * the t-interpolated midpoint of a run lands an ulp off the cutter and
    * misclassifies (DeepFuzz seed 77788899: line-along-triangle-edge lost
    * its 1-dimensional interior∩boundary entry). */
  private def foreachSubMid(lines: Array[Array[Double]], cutter: Array[Array[Double]])
                           (f: (Double, Double, Boolean) => Unit): Unit = {
    var i = 0
    while (i < lines.length) {
      val cs = lines(i)
      var j = 0
      while (j + 3 < cs.length) {
        val ax = cs(j); val ay = cs(j + 1); val bx = cs(j + 2); val by = cs(j + 3)
        if (ax != bx || ay != by) {
          val pts = splitPts(ax, ay, bx, by, cutter)
          var k = 0
          while (k < pts.length - 1) {
            val (t0, x0, y0) = pts(k)
            val (t1, x1, y1) = pts(k + 1)
            if (t1 - t0 > 1e-12) {
              var onRun = false
              var c = 0
              while (c < cutter.length && !onRun) {
                val rs = cutter(c)
                var l = 0
                while (l + 3 < rs.length && !onRun) {
                  if (onSegment(rs(l), rs(l + 1), rs(l + 2), rs(l + 3), x0, y0) &&
                      onSegment(rs(l), rs(l + 1), rs(l + 2), rs(l + 3), x1, y1)) onRun = true
                  l += 2
                }
                c += 1
              }
              val tm = (t0 + t1) / 2
              f(ax + tm * (bx - ax), ay + tm * (by - ay), onRun)
            }
            k += 1
          }
        }
        j += 2
      }
      i += 1
    }
  }

  private def ringsOf(polys: Array[Array[Array[Double]]]): Array[Array[Double]] =
    polys.flatten

  private def relLL(la: Array[Array[Double]], lb: Array[Array[Double]], m: Array[Int]): Unit = {
    val bndA = linealBoundary(la)
    val bndB = linealBoundary(lb)
    def inSet(set: Array[Double], x: Double, y: Double): Boolean = {
      var i = 0
      while (i < set.length) { if (set(i) == x && set(i + 1) == y) return true; i += 2 }
      false
    }
    // classify every pairwise intersection point; overlaps → II dim 1
    val out = new Array[Double](4)
    var i = 0
    while (i < la.length) {
      val as = la(i)
      var j = 0
      while (j + 3 < as.length) {
        var k = 0
        while (k < lb.length) {
          val bs = lb(k)
          var l = 0
          while (l + 3 < bs.length) {
            val r = segSeg(as(j), as(j + 1), as(j + 2), as(j + 3),
                           bs(l), bs(l + 1), bs(l + 2), bs(l + 3), out)
            if (r == 2) upd(m, II, 1)
            if (r >= 1) {
              var p = 0
              while (p < r) {
                val x = out(2 * p); val y = out(2 * p + 1)
                val ra = if (inSet(bndA, x, y)) 1 else 0
                val rb = if (inSet(bndB, x, y)) 1 else 0
                upd(m, ra * 3 + rb, 0)
                p += 1
              }
            }
            l += 2
          }
          k += 1
        }
        j += 2
      }
      i += 1
    }
    // IE / EI via coverage tests
    var aCovered = true
    foreachSubMid(la, lb)((x, y, run) => if (!run && !onLineal(lb, x, y)) aCovered = false)
    if (!aCovered) upd(m, IE, 1)
    var bCovered = true
    foreachSubMid(lb, la)((x, y, run) => if (!run && !onLineal(la, x, y)) bCovered = false)
    if (!bCovered) upd(m, EI, 1)
    // boundary vs other line / exterior
    i = 0
    while (i < bndA.length) {
      val x = bndA(i); val y = bndA(i + 1)
      if (onLineal(lb, x, y)) { if (inSet(bndB, x, y)) upd(m, BB, 0) else upd(m, BI, 0) }
      else upd(m, BE, 0)
      i += 2
    }
    i = 0
    while (i < bndB.length) {
      val x = bndB(i); val y = bndB(i + 1)
      if (onLineal(la, x, y)) { if (!inSet(bndA, x, y)) upd(m, IB, 0) }
      else upd(m, EB, 0)
      i += 2
    }
  }

  private def relLA(lines: Array[Array[Double]], polys: Array[Array[Array[Double]]],
                    m: Array[Int], flip: Boolean): Unit = {
    val rings = ringsOf(polys)
    val bnd = linealBoundary(lines)
    def isBnd(x: Double, y: Double): Boolean = {
      var i = 0
      while (i < bnd.length) { if (bnd(i) == x && bnd(i + 1) == y) return true; i += 2 }
      false
    }
    // line sub-segments vs polygon (a collinear run along a ring IS the
    // 1-dimensional interior∩boundary case, decided exactly)
    foreachSubMid(lines, rings) { (x, y, run) =>
      if (run) put(m, IB, 1, flip)
      else pointInPolygonal(polys, x, y) match {
        case 1  => put(m, II, 1, flip)
        case 0  => put(m, IB, 1, flip)
        case _  => put(m, IE, 1, flip)
      }
    }
    // isolated touch points of line interior on polygon boundary
    val out = new Array[Double](4)
    var i = 0
    while (i < lines.length) {
      val cs = lines(i)
      var j = 0
      while (j + 3 < cs.length) {
        var k = 0
        while (k < rings.length) {
          val rs = rings(k)
          var l = 0
          while (l + 3 < rs.length) {
            val r = segSeg(cs(j), cs(j + 1), cs(j + 2), cs(j + 3),
                           rs(l), rs(l + 1), rs(l + 2), rs(l + 3), out)
            if (r >= 1) {
              var p = 0
              while (p < r) {
                val x = out(2 * p); val y = out(2 * p + 1)
                if (isBnd(x, y)) put(m, BB, 0, flip) else put(m, IB, 0, flip)
                p += 1
              }
            }
            l += 2
          }
          k += 1
        }
        j += 2
      }
      i += 1
    }
    // line boundary points vs polygon
    i = 0
    while (i < bnd.length) {
      pointInPolygonal(polys, bnd(i), bnd(i + 1)) match {
        case 1  => put(m, BI, 0, flip)
        case 0  => put(m, BB, 0, flip)
        case _  => put(m, BE, 0, flip)
      }
      i += 2
    }
    put(m, EI, 2, flip)
    // polygon boundary outside the line?
    var ringCovered = true
    foreachSubMid(rings, lines)((x, y, run) => if (!run && !onLineal(lines, x, y)) ringCovered = false)
    if (!ringCovered) put(m, EB, 1, flip)
  }

  /** A representative point strictly inside a polygon (shell + holes). */
  def interiorPoint(rings: Array[Array[Double]]): (Double, Double) = {
    val env = Env.ofRings(rings)
    var attempt = 0
    var yScan = (env.ymin + env.ymax) / 2
    while (attempt < 20) {
      // collect x-crossings of all rings with the horizontal line y = yScan
      val xs = new ArrayBuffer[Double](8)
      var degenerate = false
      var i = 0
      while (i < rings.length) {
        val r = rings(i)
        var j = 0
        while (j + 3 < r.length) {
          val y1 = r(j + 1); val y2 = r(j + 3)
          if (y1 == yScan || y2 == yScan) degenerate = true
          else if ((y1 > yScan) != (y2 > yScan)) {
            val x1 = r(j); val x2 = r(j + 2)
            xs += x1 + (yScan - y1) * (x2 - x1) / (y2 - y1)
          }
          j += 2
        }
        i += 1
      }
      if (!degenerate && xs.length >= 2) {
        val arr = xs.toArray
        java.util.Arrays.sort(arr)
        // first even-odd inside interval of positive width
        var k = 0
        while (k + 1 < arr.length) {
          if (arr(k + 1) - arr(k) > 1e-13) {
            val x = (arr(k) + arr(k + 1)) / 2
            if (pointInPolygon(rings, x, yScan) == 1) return (x, yScan)
          }
          k += 2
        }
      }
      attempt += 1
      yScan = env.ymin + (env.ymax - env.ymin) * (0.5 + 0.03137 * attempt * (if (attempt % 2 == 0) 1 else -1))
    }
    // fallback: first shell vertex (may be boundary; callers tolerate)
    (rings(0)(0), rings(0)(1))
  }

  private def relAA(pa: Array[Array[Array[Double]]], pb: Array[Array[Array[Double]]],
                    m: Array[Int]): Unit = {
    val ringsA = ringsOf(pa)
    val ringsB = ringsOf(pb)
    // A boundary vs B (a collinear run along B's boundary = shared edge)
    foreachSubMid(ringsA, ringsB) { (x, y, run) =>
      if (run) upd(m, BB, 1)
      else pointInPolygonal(pb, x, y) match {
        case 1  => upd(m, BI, 1)
        case 0  => upd(m, BB, 1)
        case _  => upd(m, BE, 1)
      }
    }
    // B boundary vs A
    foreachSubMid(ringsB, ringsA) { (x, y, run) =>
      if (!run) pointInPolygonal(pa, x, y) match {
        case 1  => upd(m, IB, 1)
        case 0  => // BB already handled
        case _  => upd(m, EB, 1)
      }
    }
    // point touches between boundaries
    val out = new Array[Double](4)
    var i = 0
    while (i < ringsA.length) {
      val as = ringsA(i)
      var j = 0
      while (j + 3 < as.length) {
        var k = 0
        while (k < ringsB.length) {
          val bs = ringsB(k)
          var l = 0
          while (l + 3 < bs.length) {
            if (segSeg(as(j), as(j + 1), as(j + 2), as(j + 3),
                       bs(l), bs(l + 1), bs(l + 2), bs(l + 3), out) >= 1) upd(m, BB, 0)
            l += 2
          }
          k += 1
        }
        j += 2
      }
      i += 1
    }
    // interior/interior + containment via representative points
    def repsInClosure(parts: Array[Array[Array[Double]]],
                      other: Array[Array[Array[Double]]]): (Boolean, Boolean) = {
      // (all reps in closure(other), some rep strictly inside other)
      var allClosure = true; var someStrict = false
      var i2 = 0
      while (i2 < parts.length) {
        val (px, py) = interiorPoint(parts(i2))
        val r = pointInPolygonal(other, px, py)
        if (r < 0) allClosure = false
        if (r == 1) someStrict = true
        i2 += 1
      }
      (allClosure, someStrict)
    }
    val (aAllIn, aSomeStrict) = repsInClosure(pa, pb)
    val (bAllIn, bSomeStrict) = repsInClosure(pb, pa)
    if (m(BI) == 1 || m(IB) == 1 || aSomeStrict || bSomeStrict) upd(m, II, 2)
    // subset-of-closure tests (hole-aware): A ⊆ closure(B)?
    val aSubsetB = m(BE) == -1 && aAllIn && !coversAnyHole(pa, pb)
    val bSubsetA = m(EB) == -1 && bAllIn && !coversAnyHole(pb, pa)
    if (!aSubsetB) upd(m, IE, 2)
    if (!bSubsetA) upd(m, EI, 2)
  }

  /** Does some hole of `outer` have its representative point strictly inside `inner`? */
  private def coversAnyHole(inner: Array[Array[Array[Double]]],
                            outer: Array[Array[Array[Double]]]): Boolean = {
    var i = 0
    while (i < outer.length) {
      val rings = outer(i)
      var j = 1
      while (j < rings.length) {
        val (hx, hy) = interiorPoint(Array(rings(j)))
        if (pointInPolygonal(inner, hx, hy) == 1) return true
        j += 1
      }
      i += 1
    }
    false
  }

  // ---------------- matrix formatting & mask matching ----------------

  def relate(a: Geometry, b: Geometry): String = {
    val m = relateMatrix(a, b)
    val sb = new java.lang.StringBuilder(9)
    var i = 0
    while (i < 9) {
      sb.append(m(i) match {
        case -1 => 'F'
        case d  => ('0' + d).toChar
      })
      i += 1
    }
    sb.toString
  }

  def matrixMatches(matrix: String, mask: String): Boolean = {
    if (matrix.length != 9 || mask.length != 9) return false
    var i = 0
    while (i < 9) {
      val mc = mask.charAt(i); val vc = matrix.charAt(i)
      mc match {
        case '*' =>
        case 'T' | 't' => if (vc == 'F') return false
        case 'F' | 'f' => if (vc != 'F') return false
        case d => if (vc != d) return false
      }
      i += 1
    }
    true
  }

  def relateMatch(a: Geometry, b: Geometry, mask: String): Boolean =
    matrixMatches(relate(a, b), mask)

  // ---------------- named predicates ----------------

  def intersects(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false
    // hot fast paths
    (a, b) match {
      case (p: Point, q: Point)   => p.x == q.x && p.y == q.y
      case (p: Point, g: Polygon) => pointInPolygon(g.rings, p.x, p.y) >= 0
      case (g: Polygon, p: Point) => pointInPolygon(g.rings, p.x, p.y) >= 0
      case (p: Point, g: MultiPolygon) => pointInPolygonal(g.polys, p.x, p.y) >= 0
      case (g: MultiPolygon, p: Point) => pointInPolygonal(g.polys, p.x, p.y) >= 0
      case _ =>
        val m = relateMatrix(a, b)
        m(II) >= 0 || m(IB) >= 0 || m(BI) >= 0 || m(BB) >= 0
    }
  }

  def disjoint(a: Geometry, b: Geometry): Boolean = !intersects(a, b)

  def contains(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.containsEnv(b.envelope)) return false
    (a, b) match {
      case (g: Polygon, p: Point)      => pointInPolygon(g.rings, p.x, p.y) == 1
      case (g: MultiPolygon, p: Point) => pointInPolygonal(g.polys, p.x, p.y) == 1
      case _ =>
        val m = relateMatrix(a, b)
        m(II) >= 0 && m(EI) == -1 && m(EB) == -1
    }
  }

  def within(a: Geometry, b: Geometry): Boolean = contains(b, a)

  /** Closed-set containment: every point of b (incl. boundary) in closure of a. */
  def covers(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.containsEnv(b.envelope)) return false
    (a, b) match {
      case (g: Polygon, p: Point)      => pointInPolygon(g.rings, p.x, p.y) >= 0
      case (g: MultiPolygon, p: Point) => pointInPolygonal(g.polys, p.x, p.y) >= 0
      case _ =>
        val m = relateMatrix(a, b)
        m(EI) == -1 && m(EB) == -1
    }
  }

  def touches(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false
    val m = relateMatrix(a, b)
    m(II) == -1 && (m(IB) >= 0 || m(BI) >= 0 || m(BB) >= 0)
  }

  def crosses(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false
    val m = relateMatrix(a, b)
    val da = a.dimension; val db = b.dimension
    if (da < db) m(II) >= 0 && m(IE) >= 0
    else if (da > db) m(II) >= 0 && m(EI) >= 0
    else if (da == 1 && db == 1) m(II) == 0
    else false
  }

  def overlaps(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false
    val m = relateMatrix(a, b)
    val da = a.dimension; val db = b.dimension
    if (da != db) false
    else if (da == 1) m(II) == 1 && m(IE) >= 0 && m(EI) >= 0
    else m(II) >= 0 && m(IE) >= 0 && m(EI) >= 0
  }

  def equalsTopo(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty && b.isEmpty) return true
    if (a.isEmpty || b.isEmpty) return false
    if (a.envelope != b.envelope) return false
    val m = relateMatrix(a, b)
    m(II) >= 0 && m(IE) == -1 && m(BE) == -1 && m(EI) == -1 && m(EB) == -1
  }

  // ---------------- distance ----------------

  def ptSegDist2(px: Double, py: Double, ax: Double, ay: Double,
                 bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    var t = if (len2 == 0) 0.0 else ((px - ax) * dx + (py - ay) * dy) / len2
    if (t < 0) t = 0 else if (t > 1) t = 1
    val qx = ax + t * dx - px; val qy = ay + t * dy - py
    qx * qx + qy * qy
  }

  def segSegDist2(ax: Double, ay: Double, bx: Double, by: Double,
                  cx: Double, cy: Double, dx: Double, dy: Double): Double = {
    val out = new Array[Double](4)
    if (segSeg(ax, ay, bx, by, cx, cy, dx, dy, out) != 0) return 0.0
    math.min(math.min(ptSegDist2(ax, ay, cx, cy, dx, dy), ptSegDist2(bx, by, cx, cy, dx, dy)),
             math.min(ptSegDist2(cx, cy, ax, ay, bx, by), ptSegDist2(dx, dy, ax, ay, bx, by)))
  }

  /** Min planar distance; 0 if geometries intersect. */
  def distance(a: Geometry, b: Geometry): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    if (intersects(a, b)) return 0.0
    val (ap, al, aa) = decompose(a)
    val (bp, bl, ba) = decompose(b)
    // every geometry → set of points + set of segments (rings count as segments)
    def partsOf(p: Array[Double], l: Array[Array[Double]], ar: Array[Array[Array[Double]]]):
        (Array[Double], Array[Array[Double]]) = {
      if (p != null) (p, Array.empty)
      else if (l != null) (Array.empty[Double], l)
      else (Array.empty[Double], ringsOf(ar))
    }
    val (pA, sA) = partsOf(ap, al, aa)
    val (pB, sB) = partsOf(bp, bl, ba)
    var best = Double.PositiveInfinity
    // point-point
    var i = 0
    while (i < pA.length) {
      var j = 0
      while (j < pB.length) {
        val dx = pA(i) - pB(j); val dy = pA(i + 1) - pB(j + 1)
        val d2 = dx * dx + dy * dy
        if (d2 < best) best = d2
        j += 2
      }
      i += 2
    }
    // point-seg both directions
    def ptVsSegs(pts: Array[Double], segs: Array[Array[Double]]): Unit = {
      var i2 = 0
      while (i2 < pts.length) {
        var k = 0
        while (k < segs.length) {
          val cs = segs(k)
          var j2 = 0
          while (j2 + 3 < cs.length) {
            val d2 = ptSegDist2(pts(i2), pts(i2 + 1), cs(j2), cs(j2 + 1), cs(j2 + 2), cs(j2 + 3))
            if (d2 < best) best = d2
            j2 += 2
          }
          k += 1
        }
        i2 += 2
      }
    }
    ptVsSegs(pA, sB)
    ptVsSegs(pB, sA)
    // seg-seg
    i = 0
    while (i < sA.length) {
      val as = sA(i)
      var j = 0
      while (j + 3 < as.length) {
        var k = 0
        while (k < sB.length) {
          val bs = sB(k)
          var l = 0
          while (l + 3 < bs.length) {
            val d2 = segSegDist2(as(j), as(j + 1), as(j + 2), as(j + 3),
                                 bs(l), bs(l + 1), bs(l + 2), bs(l + 3))
            if (d2 < best) best = d2
            l += 2
          }
          k += 1
        }
        j += 2
      }
      i += 1
    }
    math.sqrt(best)
  }
}
