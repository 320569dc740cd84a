package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Planar overlay dispatch (SURVEY.md §2.3) — behavioral counterpart of
 * ⟨ref(engine): OperatorIntersectionLocal / OperatorDifferenceLocal /
 * OperatorUnionLocal → TopoGraph overlay⟩.
 *
 * Exact cheap paths are taken first (puntal classification, lineal×
 * polygonal splitting, lineal×lineal segment arithmetic, convex×convex
 * Sutherland–Hodgman, containment/disjoint); everything else — concave
 * pairs, degenerate boundary contact, holes on both sides, mixed
 * dimensions — routes through the snap-rounded node/classify/trace core
 * in [[PlanarOverlay]]. The remaining `UnsupportedOperationException`
 * throws guard only genuinely undefined combinations (e.g. subtracting a
 * higher-dimensional set from a lower-dimensional one is handled; the
 * reverse of nothing meaningful is not).
 */
object Overlay {

  // ---------------- intersection ----------------

  def intersection(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty || b.isEmpty) return GeometryCollection(Array.empty)
    if (!a.envelope.intersects(b.envelope)) return GeometryCollection(Array.empty)
    val (ap, al, aa) = Pred.decompose(a)
    val (bp, bl, ba) = Pred.decompose(b)
    if (ap != null) puntalIntersection(ap, b)
    else if (bp != null) puntalIntersection(bp, a)
    else if (al != null && ba != null) linealPolygonalIntersection(al, ba)
    else if (bl != null && aa != null) linealPolygonalIntersection(bl, aa)
    else if (al != null && bl != null) linealLinealIntersection(al, bl)
    else polygonalIntersection(aa, ba)
  }

  private def puntalIntersection(pts: Array[Double], other: Geometry): Geometry = {
    val out = new ArrayBuffer[Double]()
    var i = 0
    while (i < pts.length) {
      if (onClosure(other, pts(i), pts(i + 1))) { out += pts(i); out += pts(i + 1) }
      i += 2
    }
    mkPuntal(out.toArray)
  }

  private def onClosure(g: Geometry, x: Double, y: Double): Boolean = {
    val (gp, gl, ga) = Pred.decompose(g)
    if (gp != null) {
      var i = 0
      while (i < gp.length) { if (gp(i) == x && gp(i + 1) == y) return true; i += 2 }
      false
    } else if (gl != null) Pred.onLineal(gl, x, y)
    else Pred.pointInPolygonal(ga, x, y) >= 0
  }

  private def mkPuntal(cs: Array[Double]): Geometry =
    if (cs.isEmpty) GeometryCollection(Array.empty)
    else if (cs.length == 2) Point(cs(0), cs(1))
    else MultiPoint(cs)

  private def mkLineal(parts: ArrayBuffer[Array[Double]]): Geometry =
    if (parts.isEmpty) GeometryCollection(Array.empty)
    else if (parts.length == 1) LineString(parts(0))
    else MultiLineString(parts.toArray)

  /** Keep the sub-segments of `lines` whose midpoint is in the closure (or,
    * for difference, the exterior) of the polygonal set; stitch runs. */
  private def linealVsPolygonal(lines: Array[Array[Double]],
                                polys: Array[Array[Array[Double]]],
                                keepInside: Boolean): Geometry = {
    val rings = polys.flatten
    val parts = new ArrayBuffer[Array[Double]]()
    lines.foreach { cs =>
      val cur = new ArrayBuffer[Double]()
      def flush(): Unit = {
        if (cur.length >= 4) parts += cur.toArray
        cur.clear()
      }
      var i = 0
      while (i + 3 < cs.length) {
        val ax = cs(i); val ay = cs(i + 1); val bx = cs(i + 2); val by = cs(i + 3)
        if (ax != bx || ay != by) {
          val ts = splitParams(ax, ay, bx, by, rings)
          var k = 0
          while (k < ts.length - 1) {
            val t0 = ts(k); val t1 = ts(k + 1)
            if (t1 - t0 > 1e-12) {
              val mx = ax + (t0 + t1) / 2 * (bx - ax)
              val my = ay + (t0 + t1) / 2 * (by - ay)
              val in = Pred.pointInPolygonal(polys, mx, my) >= 0
              if (in == keepInside) {
                val sx = ax + t0 * (bx - ax); val sy = ay + t0 * (by - ay)
                val ex = ax + t1 * (bx - ax); val ey = ay + t1 * (by - ay)
                if (cur.length >= 2 && cur(cur.length - 2) == sx && cur(cur.length - 1) == sy) {
                  cur += ex; cur += ey
                } else {
                  flush()
                  cur += sx; cur += sy; cur += ex; cur += ey
                }
              } else flush()
            }
            k += 1
          }
        }
        i += 2
      }
      flush()
    }
    mkLineal(parts)
  }

  private def linealPolygonalIntersection(lines: Array[Array[Double]],
                                          polys: Array[Array[Array[Double]]]): Geometry =
    linealVsPolygonal(lines, polys, keepInside = true)

  private def splitParams(ax: Double, ay: Double, bx: Double, by: Double,
                          cutter: Array[Array[Double]]): Array[Double] = {
    val ts = new ArrayBuffer[Double](8)
    ts += 0.0; ts += 1.0
    val out = new Array[Double](4)
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    @inline def tOf(px: Double, py: Double): Double =
      if (len2 == 0) 0.0 else ((px - ax) * dx + (py - ay) * dy) / len2
    cutter.foreach { cs =>
      var j = 0
      while (j + 3 < cs.length) {
        Pred.segSeg(ax, ay, bx, by, cs(j), cs(j + 1), cs(j + 2), cs(j + 3), out) match {
          case 1 => ts += clamp01(tOf(out(0), out(1)))
          case 2 => ts += clamp01(tOf(out(0), out(1))); ts += clamp01(tOf(out(2), out(3)))
          case _ =>
        }
        j += 2
      }
    }
    val arr = ts.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  @inline private def clamp01(t: Double): Double = if (t < 0) 0 else if (t > 1) 1 else t

  private def linealLinealIntersection(la: Array[Array[Double]], lb: Array[Array[Double]]): Geometry = {
    // collinear overlaps (dim 1) take precedence; else crossing points (dim 0)
    val segs = new ArrayBuffer[Array[Double]]()
    val pts = new ArrayBuffer[Double]()
    val out = new Array[Double](4)
    la.foreach { as =>
      var i = 0
      while (i + 3 < as.length) {
        lb.foreach { bs =>
          var j = 0
          while (j + 3 < bs.length) {
            Pred.segSeg(as(i), as(i + 1), as(i + 2), as(i + 3),
                        bs(j), bs(j + 1), bs(j + 2), bs(j + 3), out) match {
              case 2 => segs += Array(out(0), out(1), out(2), out(3))
              case 1 => pts += out(0); pts += out(1)
              case _ =>
            }
            j += 2
          }
        }
        i += 2
      }
    }
    if (segs.nonEmpty) mkLineal(segs)
    else {
      // dedupe points
      val seen = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      var i = 0
      while (i < pts.length) { seen += ((pts(i), pts(i + 1))); i += 2 }
      mkPuntal(seen.toArray.flatMap(p => Array(p._1, p._2)))
    }
  }

  /** Is a closed ring convex (and non-degenerate)? */
  def isConvexRing(r: Array[Double]): Boolean = {
    val n = r.length / 2 - 1
    if (n < 3) return false
    var sign = 0
    var i = 0
    while (i < n) {
      val o = Pred.orient(r(2 * i), r(2 * i + 1),
        r(2 * ((i + 1) % n)), r(2 * ((i + 1) % n) + 1),
        r(2 * ((i + 2) % n)), r(2 * ((i + 2) % n) + 1))
      if (o != 0) {
        val s = if (o > 0) 1 else -1
        if (sign == 0) sign = s else if (s != sign) return false
      }
      i += 1
    }
    sign != 0
  }

  private def polygonalIntersection(pa: Array[Array[Array[Double]]],
                                    pb: Array[Array[Array[Double]]]): Geometry = {
    // containment / disjoint fast paths (exact, no snapping)
    val ga = if (pa.length == 1) Polygon(pa(0)) else MultiPolygon(pa)
    val gb = if (pb.length == 1) Polygon(pb(0)) else MultiPolygon(pb)
    if (!ga.envelope.intersects(gb.envelope)) return GeometryCollection(Array.empty)
    if (Pred.covers(gb, ga)) return ga
    if (Pred.covers(ga, gb)) return gb
    if (Pred.disjoint(ga, gb)) return GeometryCollection(Array.empty)
    // exact convex clip only when BOTH sides are single convex rings (the
    // clipped region is then guaranteed connected; a concave subject could
    // pinch — advisor finding r1)
    def convexSide(p: Array[Array[Array[Double]]]): Array[Double] =
      if (p.length == 1 && p(0).length == 1 && isConvexRing(p(0)(0))) p(0)(0) else null
    val cb = convexSide(pb)
    if (cb != null && convexSide(pa) != null) return clipPolygonalByConvex(pa, cb)
    // general path: snap-rounded node/classify/trace core — handles
    // concave pairs, holes on both sides, shared edges, vertex-on-edge
    PlanarOverlay.overlay(pa, pb, PlanarOverlay.Inter)
  }

  /** Sutherland–Hodgman against each half-plane of a convex CCW clip ring. */
  def clipPolygonalByConvex(polys: Array[Array[Array[Double]]], clipRing: Array[Double]): Geometry = {
    // orient clip ring CCW so "inside" = left of each directed edge
    val ring = if (Ops.signedRingArea(clipRing) >= 0) clipRing else {
      val n = clipRing.length / 2
      val out = new Array[Double](clipRing.length)
      var i = 0
      while (i < n) {
        out(2 * i) = clipRing(2 * (n - 1 - i)); out(2 * i + 1) = clipRing(2 * (n - 1 - i) + 1)
        i += 1
      }
      out
    }
    val resultPolys = new ArrayBuffer[Array[Array[Double]]]()
    polys.foreach { rings =>
      val clipped = rings.map(r => clipRingByConvex(r, ring)).filter(_.length >= 8)
      if (clipped.nonEmpty && Ops.signedRingArea(clipped(0)) != 0.0)
        resultPolys += clipped
    }
    if (resultPolys.isEmpty) GeometryCollection(Array.empty)
    else if (resultPolys.length == 1) Polygon(resultPolys(0))
    else MultiPolygon(resultPolys.toArray)
  }

  private def clipRingByConvex(subject: Array[Double], clip: Array[Double]): Array[Double] = {
    var cur = subject
    val n = clip.length / 2 - 1
    var e = 0
    while (e < n && cur.length >= 6) {
      val ax = clip(2 * e); val ay = clip(2 * e + 1)
      val bx = clip(2 * e + 2); val by = clip(2 * e + 3)
      cur = clipRingHalfPlane(cur, ax, ay, bx, by)
      e += 1
    }
    cur
  }

  /** Clip a ring to the left half-plane of directed edge (a→b). */
  private def clipRingHalfPlane(ring: Array[Double], ax: Double, ay: Double,
                                bx: Double, by: Double): Array[Double] = {
    val out = new ArrayBuffer[Double](ring.length)
    val m = ring.length / 2 -
      (if (ring.length >= 4 && ring(0) == ring(ring.length - 2) && ring(1) == ring(ring.length - 1)) 1 else 0)
    var i = 0
    while (i < m) {
      val px = ring(2 * i); val py = ring(2 * i + 1)
      val j = (i + 1) % m
      val qx = ring(2 * j); val qy = ring(2 * j + 1)
      val pIn = Pred.orient(ax, ay, bx, by, px, py) >= 0
      val qIn = Pred.orient(ax, ay, bx, by, qx, qy) >= 0
      if (pIn) {
        out += px; out += py
        if (!qIn) { val (cx2, cy2) = lineCross(ax, ay, bx, by, px, py, qx, qy); out += cx2; out += cy2 }
      } else if (qIn) {
        val (cx2, cy2) = lineCross(ax, ay, bx, by, px, py, qx, qy); out += cx2; out += cy2
      }
      i += 1
    }
    if (out.length >= 2) { out += out(0); out += out(1) }
    dedupeRing(out.toArray)
  }

  private def lineCross(ax: Double, ay: Double, bx: Double, by: Double,
                        px: Double, py: Double, qx: Double, qy: Double): (Double, Double) = {
    val d1 = Pred.orient(ax, ay, bx, by, px, py)
    val d2 = Pred.orient(ax, ay, bx, by, qx, qy)
    val t = d1 / (d1 - d2)
    (px + t * (qx - px), py + t * (qy - py))
  }

  private def dedupeRing(cs: Array[Double]): Array[Double] = {
    if (cs.length < 2) return cs
    val out = new ArrayBuffer[Double](cs.length)
    out += cs(0); out += cs(1)
    var i = 2
    while (i < cs.length) {
      if (cs(i) != out(out.length - 2) || cs(i + 1) != out(out.length - 1)) {
        out += cs(i); out += cs(i + 1)
      }
      i += 2
    }
    out.toArray
  }

  // ---------------- difference ----------------

  def difference(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty) return a
    if (b.isEmpty || !a.envelope.intersects(b.envelope)) return a
    val (ap, al, aa) = Pred.decompose(a)
    val (_, _, ba) = Pred.decompose(b)
    if (ap != null) {
      val out = new ArrayBuffer[Double]()
      var i = 0
      while (i < ap.length) {
        if (!onClosure(b, ap(i), ap(i + 1))) { out += ap(i); out += ap(i + 1) }
        i += 2
      }
      mkPuntal(out.toArray)
    } else if (al != null && ba != null) {
      linealVsPolygonal(al, ba, keepInside = false)
    } else if (aa != null && ba != null) {
      if (Pred.disjoint(a, b)) a
      else if (Pred.covers(b, a)) GeometryCollection(Array.empty)
      else PlanarOverlay.overlay(aa, ba, PlanarOverlay.DiffAB)
    } else if (aa != null && ba == null) {
      a // subtracting a lower-dimensional set leaves the area unchanged
    } else throw new UnsupportedOperationException(
      s"difference(${a.getClass.getSimpleName}, ${b.getClass.getSimpleName}) staged for P2")
  }

  // ---------------- union ----------------

  /** Decompose ANY geometry (incl. heterogeneous collections) into its
    * puntal / lineal / polygonal components (each possibly empty). */
  private def decomposeAll(g: Geometry): (ArrayBuffer[Double], ArrayBuffer[Array[Double]], ArrayBuffer[Array[Array[Double]]]) = {
    val pts = new ArrayBuffer[Double]()
    val lines = new ArrayBuffer[Array[Double]]()
    val polys = new ArrayBuffer[Array[Array[Double]]]()
    def walk(x: Geometry): Unit = x match {
      case p: Point           => if (!p.isEmpty) { pts += p.x; pts += p.y }
      case m: MultiPoint      => pts ++= m.coords
      case l: LineString      => if (!l.isEmpty) lines += l.coords
      case m: MultiLineString => lines ++= m.lines
      case p: Polygon         => if (!p.isEmpty) polys += p.rings
      case m: MultiPolygon    => polys ++= m.polys
      case c: GeometryCollection => c.geoms.foreach(walk)
    }
    walk(g)
    (pts, lines, polys)
  }

  /**
   * Union of MIXED-dimension operands (OGC set semantics): polygonal parts
   * union first; lineal parts node/dissolve and keep only what lies outside
   * the polygonal closure; points keep only what lies on neither. Result is
   * the homogeneous geometry when one class remains, else a collection.
   */
  private def unionMixed(a: Geometry, b: Geometry): Geometry = {
    val (pts, lines, polys) = decomposeAll(GeometryCollection(Array(a, b)))
    val arealG: Geometry =
      if (polys.isEmpty) GeometryCollection(Array.empty)
      else polys.map(rs => Polygon(rs): Geometry).reduce((x, y) => Ops.simplify(union(x, y)))
    val linealAll: Geometry =
      if (lines.isEmpty) GeometryCollection(Array.empty)
      else PlanarOverlay.linealUnion(lines.toArray, Array.empty)
    val linealG = (linealAll, arealG) match {
      case (l, _) if l.isEmpty => l
      case (l, ar) if ar.isEmpty => l
      case (l, ar) => difference(l, ar)
    }
    val keepPts = new ArrayBuffer[Double]()
    var i = 0
    while (i < pts.length) {
      val x = pts(i); val y = pts(i + 1)
      val covered =
        (!arealG.isEmpty && onClosure(arealG, x, y)) ||
        (!linealAll.isEmpty && onClosure(linealAll, x, y)) ||
        { var dup = false; var j = 0
          while (j < keepPts.length && !dup) { dup = keepPts(j) == x && keepPts(j + 1) == y; j += 2 }
          dup }
      if (!covered) { keepPts += x; keepPts += y }
      i += 2
    }
    val parts = new ArrayBuffer[Geometry]()
    if (!arealG.isEmpty) parts += arealG
    if (!linealG.isEmpty) parts += linealG
    if (keepPts.nonEmpty) parts += mkPuntal(keepPts.toArray)
    if (parts.isEmpty) GeometryCollection(Array.empty)
    else if (parts.length == 1) parts(0)
    else GeometryCollection(parts.toArray)
  }

  def union(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    if (a.isInstanceOf[GeometryCollection] || b.isInstanceOf[GeometryCollection] ||
        a.dimension != b.dimension) return unionMixed(a, b)
    val (ap, al, aa) = Pred.decompose(a)
    val (bp, bl, ba) = Pred.decompose(b)
    if (ap != null && bp != null) {
      val seen = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      var i = 0
      while (i < ap.length) { seen += ((ap(i), ap(i + 1))); i += 2 }
      i = 0
      while (i < bp.length) { seen += ((bp(i), bp(i + 1))); i += 2 }
      mkPuntal(seen.toArray.flatMap(p => Array(p._1, p._2)))
    } else if (aa != null && ba != null) {
      if (Pred.covers(a, b)) a
      else if (Pred.covers(b, a)) b
      else if (Pred.disjoint(a, b)) MultiPolygon(aa ++ ba)
      else PlanarOverlay.overlay(aa, ba, PlanarOverlay.Uni)
    } else if (al != null && bl != null) {
      if (Pred.disjoint(a, b)) MultiLineString(al ++ bl)
      else PlanarOverlay.linealUnion(al, bl)
    } else throw new UnsupportedOperationException(
      s"union(${a.getClass.getSimpleName}, ${b.getClass.getSimpleName}) staged for P2")
  }

  /** One planar traversal (Xor selection), not union-of-differences — the
    * two difference pieces share collinear boundary along a∩b, which the
    * composed formulation re-nodes needlessly (advisor finding r1). */
  /** Mixed-dimension intersection per the reference's dimension_mask
    * (bits: 1=points, 2=lines, 4=areas). Polygonal×polygonal gets the full
    * decomposition; other combinations already produce their natural
    * dimension via [[intersection]] (filtered by the mask). */
  def intersectionDim(a: Geometry, b: Geometry, mask: Int): Geometry = {
    val (_, _, aa) = Pred.decompose(a)
    val (_, _, ba) = Pred.decompose(b)
    if (aa != null && ba != null) {
      if (!a.envelope.intersects(b.envelope)) GeometryCollection(Array.empty)
      else PlanarOverlay.intersectionDim(aa, ba, mask)
    } else {
      val g = intersection(a, b)
      val dimBit = g.dimension match {
        case 0 => 1
        case 1 => 2
        case 2 => 4
        case _ => 0
      }
      if ((mask & dimBit) != 0) g else GeometryCollection(Array.empty)
    }
  }

  def symDifference(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (_, _, aa) = Pred.decompose(a)
    val (_, _, ba) = Pred.decompose(b)
    if (aa != null && ba != null) {
      if (Pred.disjoint(a, b)) MultiPolygon(aa ++ ba)
      else PlanarOverlay.overlay(aa, ba, PlanarOverlay.Xor)
    } else union(difference(a, b), difference(b, a))
  }
}
