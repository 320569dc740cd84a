package graft.geom

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Robust polygonal overlay core: node → classify → select → trace.
 *
 * Replaces the round-1 Greiner–Hormann tracer, whose proper-crossings-only
 * contract threw on any shared vertex, collinear edge, or vertex-on-edge
 * contact — configurations that adjacent parcels and snapped grids produce
 * constantly. Behavioral counterpart of the reference's planar topology
 * core ⟨ref(engine): com.esri.core.geometry.TopographicOperations /
 * TopoGraph⟩, re-derived from the classical boundary-algebra formulation
 * (node all edges, classify each sub-edge against the other operand,
 * select by operation, re-trace faces).
 *
 * Robustness strategy: snap-rounding to a power-of-two grid sized so that
 * `coord * scale` stays exact in a double (≈2^-43 of the coordinate
 * magnitude). All intersection points are computed ONCE per edge pair and
 * pushed to both edges, so node identity across the two operands is exact
 * bit equality — no epsilon comparisons anywhere in the tracer.
 *
 * Semantics: AREA overlay. Results are polygonal; lower-dimensional
 * residue (e.g. the shared edge of two touching rectangles under
 * intersection) is dropped, matching the reference's default
 * dimension_mask behavior for polygon inputs.
 */
object PlanarOverlay {

  sealed trait Op
  case object Inter extends Op
  case object Uni extends Op
  case object DiffAB extends Op
  case object Xor extends Op

  /** Overlay of two polygonal sets (array of polygons, each = rings with
    * shell first). Returns Polygon / MultiPolygon / empty collection.
    *
    * Robustness ladder (the OverlayNG pattern): the default 2^-43-relative
    * snap grid resolves ~all inputs bit-stably; on the rare
    * near-degenerate configuration where classification and tracing
    * disagree (sub-edge degrees don't close — e.g. two capsule arcs
    * tangent within an ulp), retry on a coarser power-of-two grid, which
    * forces the almost-shared edges to become EXACTLY shared and the
    * selection consistent. Deterministic: same input → same ladder → same
    * output; inputs that succeed at the default grid are untouched. */
  def overlay(pa: Array[Array[Array[Double]]], pb: Array[Array[Array[Double]]], op: Op): Geometry = {
    val scale0 = snapScale(math.max(maxAbs(pa), maxAbs(pb)))
    var k = 0
    var last: IllegalStateException = null
    while (k < 4) {
      try return overlayAt(pa, pb, op, scale0 / (1L << (4 * k)))
      catch { case e: IllegalStateException => last = e; k += 1 }
    }
    throw last
  }

  private def overlayAt(pa: Array[Array[Array[Double]]], pb: Array[Array[Array[Double]]],
                        op: Op, scale: Double): Geometry = {
    val a = normalize(pa, scale)
    val b = normalize(pb, scale)
    if (a.isEmpty || b.isEmpty) return op match {
      case Inter  => GeometryCollection(Array.empty)
      case Uni    => mkResult(if (a.isEmpty) ringsOf(b) else ringsOf(a))
      case DiffAB => mkResult(ringsOf(a))
      case Xor    => mkResult(ringsOf(if (a.isEmpty) b else a))
    }

    val edges = new ArrayBuffer[Edge]()
    collectEdges(a, 0, edges)
    collectEdges(b, 1, edges)
    nodeAll(edges, scale)
    val subs = splitAll(edges, scale)

    // undirected-key index for shared/anti-shared detection across sides
    val index = new mutable.HashMap[(Long, Long, Long, Long), ArrayBuffer[Sub]]()
    subs.foreach { s => index.getOrElseUpdate(s.ukey, new ArrayBuffer[Sub](2)) += s }

    val selected = new ArrayBuffer[DirEdge]()
    subs.foreach { s =>
      val twins = index(s.ukey)
      var sharedSame = false; var sharedAnti = false
      twins.foreach { t =>
        if (t.side != s.side) { if (t.dir == s.dir) sharedSame = true else sharedAnti = true }
      }
      val other = if (s.side == 0) b else a
      def mid: Int = classifyMid(s, other)
      op match {
        case Inter =>
          if (sharedSame) { if (s.side == 0) selected += s.asDir(false) }
          else if (!sharedAnti && mid == 1) selected += s.asDir(false)
        case Uni =>
          if (sharedSame) { if (s.side == 0) selected += s.asDir(false) }
          else if (!sharedAnti && mid == -1) selected += s.asDir(false)
        case DiffAB =>
          if (s.side == 0) {
            if (sharedAnti) selected += s.asDir(false)
            else if (!sharedSame && mid == -1) selected += s.asDir(false)
          } else {
            if (!sharedSame && !sharedAnti && mid == 1) selected += s.asDir(true)
          }
        case Xor =>
          if (!sharedSame && !sharedAnti) {
            val m = mid
            if (m == -1) selected += s.asDir(false)
            else if (m == 1) selected += s.asDir(true)
          }
      }
    }

    mkResult(trace(selected))
  }

  // ---------------- snapping ----------------

  /** Power-of-two scale: coord*scale exact in a double, resolution ≈2^-43
    * of the coordinate magnitude (1e-13 at lon/lat scale, 1e-8 m at
    * web-mercator scale). */
  def snapScale(maxAbs: Double): Double = {
    val m = math.max(1.0, maxAbs)
    val bits = math.ceil(math.log(m) / math.log(2.0)).toInt
    math.pow(2.0, math.min(43, 52 - bits - 1))
  }

  @inline def snap(v: Double, scale: Double): Double = {
    val r = math.rint(v * scale) / scale
    if (r == 0.0) 0.0 else r // normalize -0.0
  }

  private def maxAbs(p: Array[Array[Array[Double]]]): Double = {
    var m = 0.0
    var i = 0
    while (i < p.length) {
      var j = 0
      while (j < p(i).length) {
        val r = p(i)(j)
        var k = 0
        while (k < r.length) { val v = math.abs(r(k)); if (v > m) m = v; k += 1 }
        j += 1
      }
      i += 1
    }
    m
  }

  /** Snap coords, dedupe consecutive duplicates, orient shell CCW / holes
    * CW, drop degenerate rings and empty polygons. */
  private def normalize(p: Array[Array[Array[Double]]], scale: Double): Array[Array[Array[Double]]] = {
    val out = new ArrayBuffer[Array[Array[Double]]]()
    p.foreach { rings =>
      val rs = new ArrayBuffer[Array[Double]]()
      var shellDropped = false
      var ri = 0
      while (ri < rings.length && !shellDropped) {
        val r = rings(ri)
        val snapped = new ArrayBuffer[Double](r.length)
        var i = 0
        while (i < r.length) {
          val x = snap(r(i), scale); val y = snap(r(i + 1), scale)
          val n = snapped.length
          if (n < 2 || snapped(n - 2) != x || snapped(n - 1) != y) { snapped += x; snapped += y }
          i += 2
        }
        // ensure closed
        if (snapped.length >= 6 &&
            (snapped(0) != snapped(snapped.length - 2) || snapped(1) != snapped(snapped.length - 1))) {
          snapped += snapped(0); snapped += snapped(1)
        }
        var kept = false
        if (snapped.length >= 8) {
          var ring = snapped.toArray
          val area = Ops.signedRingArea(ring)
          if (area != 0.0) {
            val wantCCW = ri == 0
            if ((area > 0) != wantCCW) ring = reverseRing(ring)
            rs += ring
            kept = true
          }
        }
        // a collapsed shell voids the polygon (holes of nothing)
        if (ri == 0 && !kept) shellDropped = true
        ri += 1
      }
      if (rs.nonEmpty && !shellDropped) out += rs.toArray
    }
    out.toArray
  }

  def reverseRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      out(2 * i) = r(2 * (n - 1 - i)); out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  private def ringsOf(p: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    // identity passthrough for one-sided results: re-trace not needed,
    // rings are already normalized (shell CCW / holes CW)
    p.flatten
  }

  // ---------------- edges + noding ----------------

  /** A directed input edge with its accumulated split points. */
  private final class Edge(val x1: Double, val y1: Double,
                           val x2: Double, val y2: Double, val side: Int) {
    // split points (exact doubles as computed; snapped during splitAll)
    var splits: ArrayBuffer[Double] = _ // packed (t, x, y)*
    def addSplit(t: Double, x: Double, y: Double): Unit = {
      if (splits == null) splits = new ArrayBuffer[Double](6)
      splits += t; splits += x; splits += y
    }
    @inline def param(px: Double, py: Double): Double = {
      val dx = x2 - x1; val dy = y2 - y1
      if (math.abs(dx) >= math.abs(dy)) (px - x1) / dx else (py - y1) / dy
    }
  }

  private def collectEdges(p: Array[Array[Array[Double]]], side: Int,
                           out: ArrayBuffer[Edge]): Unit = {
    p.foreach { rings =>
      rings.foreach { r =>
        var i = 0
        while (i + 3 < r.length) {
          if (r(i) != r(i + 2) || r(i + 1) != r(i + 3))
            out += new Edge(r(i), r(i + 1), r(i + 2), r(i + 3), side)
          i += 2
        }
      }
    }
  }

  /** All-pairs noding (bbox-pruned): every intersection point is computed
    * once and pushed to both edges, so shared nodes are bit-identical. */
  private def nodeAll(edges: ArrayBuffer[Edge], scale: Double): Unit = {
    val n = edges.length
    val out = new Array[Double](4)
    var i = 0
    while (i < n) {
      val e = edges(i)
      var j = i + 1
      while (j < n) {
        val f = edges(j)
        Pred.segSeg(e.x1, e.y1, e.x2, e.y2, f.x1, f.y1, f.x2, f.y2, out) match {
          case 1 =>
            pushSplit(e, out(0), out(1)); pushSplit(f, out(0), out(1))
          case 2 =>
            pushSplit(e, out(0), out(1)); pushSplit(f, out(0), out(1))
            pushSplit(e, out(2), out(3)); pushSplit(f, out(2), out(3))
          case _ =>
        }
        j += 1
      }
      i += 1
    }
  }

  @inline private def pushSplit(e: Edge, x: Double, y: Double): Unit = {
    if ((x != e.x1 || y != e.y1) && (x != e.x2 || y != e.y2))
      e.addSplit(e.param(x, y), x, y)
  }

  /** A directed sub-edge after noding + snapping. */
  private final case class Sub(sx: Double, sy: Double, ex: Double, ey: Double, side: Int) {
    def dir: Boolean = { // canonical direction flag for the undirected key
      if (sx != ex) sx < ex else sy < ey
    }
    def ukey: (Long, Long, Long, Long) = {
      val a = (java.lang.Double.doubleToLongBits(sx), java.lang.Double.doubleToLongBits(sy))
      val b = (java.lang.Double.doubleToLongBits(ex), java.lang.Double.doubleToLongBits(ey))
      if (dir) (a._1, a._2, b._1, b._2) else (b._1, b._2, a._1, a._2)
    }
    def asDir(rev: Boolean): DirEdge =
      if (rev) DirEdge(ex, ey, sx, sy) else DirEdge(sx, sy, ex, ey)
  }

  final case class DirEdge(sx: Double, sy: Double, ex: Double, ey: Double)

  private def splitAll(edges: ArrayBuffer[Edge], scale: Double): ArrayBuffer[Sub] = {
    val subs = new ArrayBuffer[Sub](edges.length * 2)
    edges.foreach { e =>
      if (e.splits == null) {
        val s = Sub(snap(e.x1, scale), snap(e.y1, scale), snap(e.x2, scale), snap(e.y2, scale), e.side)
        if (s.sx != s.ex || s.sy != s.ey) subs += s
      } else {
        // sort split points by t, walk with snapped coords
        val k = e.splits.length / 3
        val order = (0 until k).sortBy(i => e.splits(3 * i))
        var px = snap(e.x1, scale); var py = snap(e.y1, scale)
        order.foreach { i =>
          val qx = snap(e.splits(3 * i + 1), scale); val qy = snap(e.splits(3 * i + 2), scale)
          if (qx != px || qy != py) {
            subs += Sub(px, py, qx, qy, e.side)
            px = qx; py = qy
          }
        }
        val qx = snap(e.x2, scale); val qy = snap(e.y2, scale)
        if (qx != px || qy != py) subs += Sub(px, py, qx, qy, e.side)
      }
    }
    subs
  }

  // ---------------- classification ----------------

  /** Midpoint of a sub-edge vs the other operand: 1 inside, -1 outside.
    * After complete mutual noding a non-shared sub-edge midpoint cannot lie
    * on the other boundary; if the sampler still reports boundary at three
    * distinct parameters the noding assumption is broken → fail loud. */
  private def classifyMid(s: Sub, other: Array[Array[Array[Double]]]): Int = {
    var t = 0.5
    var attempt = 0
    while (attempt < 3) {
      val mx = s.sx + t * (s.ex - s.sx)
      val my = s.sy + t * (s.ey - s.sy)
      val r = Pred.pointInPolygonal(other, mx, my)
      if (r != 0) return r
      attempt += 1
      t = if (attempt == 1) 0.25 else 0.75
    }
    throw new IllegalStateException(
      s"overlay classification: sub-edge (${s.sx},${s.sy})→(${s.ex},${s.ey}) " +
        "lies on the other boundary but was not noded as shared")
  }

  // ---------------- tracing ----------------

  private type PKey = (Long, Long)
  @inline private def pkey(x: Double, y: Double): PKey =
    (java.lang.Double.doubleToLongBits(x), java.lang.Double.doubleToLongBits(y))

  /** Trace faces from selected directed edges (interior on the left).
    * At a multi-degree node the next edge is the first outgoing edge
    * CLOCKWISE from the reversed incoming direction — this keeps touching
    * faces separate and never crosses the boundary. */
  def trace(selected: ArrayBuffer[DirEdge]): Array[Array[Double]] = {
    val outgoing = new mutable.HashMap[PKey, ArrayBuffer[Int]]()
    selected.indices.foreach { i =>
      val e = selected(i)
      outgoing.getOrElseUpdate(pkey(e.sx, e.sy), new ArrayBuffer[Int](2)) += i
    }
    val used = new Array[Boolean](selected.length)
    val rings = new ArrayBuffer[Array[Double]]()

    selected.indices.foreach { start =>
      if (!used(start)) {
        val ring = new ArrayBuffer[Double]()
        val s0 = selected(start)
        val startKey = pkey(s0.sx, s0.sy)
        var cur = start
        var steps = 0
        var closed = false
        while (!closed) {
          val e = selected(cur)
          used(cur) = true
          ring += e.sx; ring += e.sy
          steps += 1
          if (steps > selected.length + 1)
            throw new IllegalStateException("overlay tracing did not terminate")
          val endKey = pkey(e.ex, e.ey)
          if (endKey == startKey) closed = true
          else {
            val cands = outgoing.getOrElse(endKey, null)
            var next = -1
            if (cands != null) {
              if (cands.length == 1) { if (!used(cands(0))) next = cands(0) }
              else {
                // clockwise-first from reversed incoming direction
                val inAngle = math.atan2(e.sy - e.ey, e.sx - e.ex) // reverse of incoming
                var bestDelta = Double.MaxValue
                cands.foreach { c =>
                  if (!used(c)) {
                    val o = selected(c)
                    val outAngle = math.atan2(o.ey - o.sy, o.ex - o.sx)
                    var delta = inAngle - outAngle
                    while (delta <= 1e-12) delta += 2 * math.Pi
                    while (delta > 2 * math.Pi) delta -= 2 * math.Pi
                    if (delta < bestDelta) { bestDelta = delta; next = c }
                  }
                }
              }
            }
            if (next < 0)
              throw new IllegalStateException(
                s"overlay tracing dead-ended at (${e.ex},${e.ey})")
            cur = next
          }
        }
        if (ring.length >= 6) {
          ring += ring(0); ring += ring(1)
          val arr = ring.toArray
          if (Ops.signedRingArea(arr) != 0.0) rings += arr
        }
      }
    }
    rings.toArray
  }

  // ---------------- even-odd repair (SIMPLIFY_OGC) ----------------

  /**
   * Repair a possibly self-intersecting / mis-oriented ring set into a
   * valid polygonal geometry under the EVEN-ODD fill rule: each ring is
   * noded against itself and decomposed into simple loops, then the loops
   * fold with Xor (a point is filled iff it is covered by an odd number of
   * loops). Behavioral counterpart of ⟨ref(engine): OperatorSimplifyOGC⟩.
   */
  def evenOddRepair(rings: Array[Array[Double]]): Geometry = {
    val loops = rings.flatMap(simpleLoops)
    if (loops.isEmpty) return GeometryCollection(Array.empty)
    var acc: Geometry = Polygon(Array(loops(0)))
    var i = 1
    while (i < loops.length) {
      acc = Overlay.symDifference(acc, Polygon(Array(loops(i))))
      i += 1
    }
    acc
  }

  /** Decompose one closed (possibly self-intersecting) ring into simple
    * loops by splitting the noded walk at repeated nodes. */
  def simpleLoops(ring: Array[Double]): Array[Array[Double]] = {
    val scale = snapScale(ring.foldLeft(0.0)((m, v) => math.max(m, math.abs(v))))
    val edges = new ArrayBuffer[Edge]()
    var i = 0
    while (i + 3 < ring.length) {
      val x1 = snap(ring(i), scale); val y1 = snap(ring(i + 1), scale)
      val x2 = snap(ring(i + 2), scale); val y2 = snap(ring(i + 3), scale)
      if (x1 != x2 || y1 != y2) edges += new Edge(x1, y1, x2, y2, 0)
      i += 2
    }
    if (edges.isEmpty) return Array.empty
    nodeAll(edges, scale)
    val subs = splitAll(edges, scale)
    // walk in order, extracting a loop whenever a node repeats
    val out = new ArrayBuffer[Array[Double]]()
    val stack = new ArrayBuffer[Double]() // packed x,y
    val at = new mutable.HashMap[PKey, Int]() // node -> index in stack (pairs)
    def push(x: Double, y: Double): Unit = {
      at(pkey(x, y)) = stack.length / 2
      stack += x; stack += y
    }
    if (subs.isEmpty) return Array.empty
    push(subs(0).sx, subs(0).sy)
    subs.foreach { s =>
      val k = pkey(s.ex, s.ey)
      at.get(k) match {
        case Some(j) =>
          // extract loop stack[j..] + close
          val loop = new ArrayBuffer[Double]((stack.length / 2 - j + 1) * 2)
          var p = j
          while (p < stack.length / 2) { loop += stack(2 * p); loop += stack(2 * p + 1); p += 1 }
          loop += stack(2 * j); loop += stack(2 * j + 1)
          // pop extracted nodes (keep j itself as the new top)
          var q = stack.length / 2 - 1
          while (q > j) { at.remove(pkey(stack(2 * q), stack(2 * q + 1))); q -= 1 }
          stack.remove(2 * (j + 1), stack.length - 2 * (j + 1))
          if (loop.length >= 8 && Ops.signedRingArea(loop.toArray) != 0.0)
            out += loop.toArray
        case None =>
          push(s.ex, s.ey)
      }
    }
    out.toArray
  }

  // ---------------- mixed-dimension intersection ----------------

  /**
   * Full point-set intersection of two polygonal operands, decomposed by
   * dimension (the reference's `IntersectionParams.dimension_mask`
   * ⟨ref: geometry.proto⟩): the areal part, plus boundary-contact segments
   * not adjacent to it, plus isolated touch points. `mask` bits: 1 = dim 0,
   * 2 = dim 1, 4 = dim 2 (Esri convention).
   */
  def intersectionDim(pa: Array[Array[Array[Double]]], pb: Array[Array[Array[Double]]],
                      mask: Int): Geometry = {
    val scale = snapScale(math.max(maxAbs(pa), maxAbs(pb)))
    val a = normalize(pa, scale)
    val b = normalize(pb, scale)
    if (a.isEmpty || b.isEmpty) return GeometryCollection(Array.empty)

    val areal = overlay(pa, pb, Inter)
    val arealPolys: Array[Array[Array[Double]]] = areal match {
      case p: Polygon if !p.isEmpty => Array(p.rings)
      case m: MultiPolygon          => m.polys
      case _                        => Array.empty
    }
    @inline def inAreal(x: Double, y: Double): Boolean =
      arealPolys.nonEmpty && Pred.pointInPolygonal(arealPolys, x, y) >= 0

    // re-node to recover shared sub-edges and touch points
    val edges = new ArrayBuffer[Edge]()
    collectEdges(a, 0, edges)
    collectEdges(b, 1, edges)
    nodeAll(edges, scale)
    val subs = splitAll(edges, scale)
    val byKey = new mutable.HashMap[(Long, Long, Long, Long), Int]() // bitmask of sides
    subs.foreach { s =>
      val k = s.ukey
      byKey(k) = byKey.getOrElse(k, 0) | (1 << s.side)
    }
    // dim-1: segments on both boundaries whose midpoint is outside the areal closure
    val dim1 = new ArrayBuffer[Array[Double]]()
    val onDim1 = new mutable.HashSet[PKey]()
    subs.foreach { s =>
      if (s.side == 0 && byKey(s.ukey) == 3) {
        val mx = s.sx + 0.5 * (s.ex - s.sx); val my = s.sy + 0.5 * (s.ey - s.sy)
        if (!inAreal(mx, my)) {
          dim1 += Array(s.sx, s.sy, s.ex, s.ey)
          onDim1 += pkey(s.sx, s.sy); onDim1 += pkey(s.ex, s.ey)
        }
      }
    }
    // dim-0: nodes shared by both boundaries, not in the areal closure, not
    // endpoints of a dim-1 segment. After mutual noding every boundary-touch
    // point is a sub-edge endpoint present on both sides.
    val aNodes = new mutable.HashSet[PKey]()
    val touch = new mutable.LinkedHashSet[PKey]()
    subs.foreach { s => if (s.side == 0) { aNodes += pkey(s.sx, s.sy); aNodes += pkey(s.ex, s.ey) } }
    subs.foreach { s =>
      if (s.side == 1) {
        Seq(pkey(s.sx, s.sy), pkey(s.ex, s.ey)).foreach { k =>
          if (aNodes.contains(k) && !onDim1.contains(k)) {
            val x = doubleOf(k._1); val y = doubleOf(k._2)
            // a shared node counts as contact only if it lies on BOTH
            // boundaries (noding inserts it on each side it lies on)
            if (!inAreal(x, y)) touch += k
          }
        }
      }
    }
    val out = new ArrayBuffer[Geometry]()
    if ((mask & 4) != 0 && !areal.isEmpty) out += areal
    if ((mask & 2) != 0 && dim1.nonEmpty) out += stitchDim1(dim1)
    if ((mask & 1) != 0 && touch.nonEmpty) {
      val cs = touch.toArray.flatMap(k => Array(doubleOf(k._1), doubleOf(k._2)))
      out += (if (cs.length == 2) Point(cs(0), cs(1)) else MultiPoint(cs))
    }
    if (out.isEmpty) GeometryCollection(Array.empty)
    else if (out.length == 1) out(0)
    else GeometryCollection(out.toArray)
  }

  private def stitchDim1(segs: ArrayBuffer[Array[Double]]): Geometry = {
    val parts = segs.map(s => LineString(s): Geometry)
    if (parts.length == 1) parts(0)
    else linealUnion(segs.map(identity).toArray, Array.empty)
  }

  // ---------------- lineal union (noding + dissolve) ----------------

  /**
   * Union of two lineal sets: node every segment against both sides, drop
   * duplicate (collinear-overlapping) sub-segments, stitch chains back
   * through degree-2 nodes. Matches JTS's node-and-dissolve semantics
   * (total length = measure of the union of the two point sets).
   */
  def linealUnion(la: Array[Array[Double]], lb: Array[Array[Double]]): Geometry = {
    var maxAbs = 0.0
    (la ++ lb).foreach(_.foreach(v => { val a = math.abs(v); if (a > maxAbs) maxAbs = a }))
    val scale = snapScale(maxAbs)
    val edges = new ArrayBuffer[Edge]()
    def add(lines: Array[Array[Double]], side: Int): Unit = lines.foreach { cs =>
      var i = 0
      while (i + 3 < cs.length) {
        val x1 = snap(cs(i), scale); val y1 = snap(cs(i + 1), scale)
        val x2 = snap(cs(i + 2), scale); val y2 = snap(cs(i + 3), scale)
        if (x1 != x2 || y1 != y2) edges += new Edge(x1, y1, x2, y2, side)
        i += 2
      }
    }
    add(la, 0); add(lb, 1)
    if (edges.isEmpty) return GeometryCollection(Array.empty)
    nodeAll(edges, scale)
    val subs = splitAll(edges, scale)
    // dedupe by undirected key (collinear overlaps collapse to one copy)
    val uniq = new mutable.LinkedHashMap[(Long, Long, Long, Long), Sub]()
    subs.foreach(s => if (!uniq.contains(s.ukey)) uniq(s.ukey) = s)
    // stitch chains through degree-2 nodes
    val es = uniq.values.toArray
    val at = new mutable.HashMap[PKey, ArrayBuffer[Int]]()
    es.indices.foreach { i =>
      at.getOrElseUpdate(pkey(es(i).sx, es(i).sy), new ArrayBuffer[Int](2)) += i
      at.getOrElseUpdate(pkey(es(i).ex, es(i).ey), new ArrayBuffer[Int](2)) += i
    }
    val used = new Array[Boolean](es.length)
    val parts = new ArrayBuffer[Array[Double]]()
    def walk(start: Int, fromKey: PKey): Unit = {
      val out = new ArrayBuffer[Double]()
      var cur = start
      var key = fromKey
      out += doubleOf(key._1); out += doubleOf(key._2)
      var going = true
      while (going) {
        used(cur) = true
        val e = es(cur)
        val next = if (pkey(e.sx, e.sy) == key) pkey(e.ex, e.ey) else pkey(e.sx, e.sy)
        out += doubleOf(next._1); out += doubleOf(next._2)
        key = next
        val cands = at(key).filter(i => !used(i))
        if (at(key).length == 2 && cands.length == 1) cur = cands(0)
        else going = false
      }
      parts += out.toArray
    }
    // start at non-degree-2 endpoints first (open chains), then cycles
    es.indices.foreach { i =>
      if (!used(i)) {
        val ks = pkey(es(i).sx, es(i).sy); val ke = pkey(es(i).ex, es(i).ey)
        if (at(ks).length != 2) walk(i, ks)
        else if (at(ke).length != 2) walk(i, ke)
      }
    }
    es.indices.foreach(i => if (!used(i)) walk(i, pkey(es(i).sx, es(i).sy)))
    if (parts.length == 1) LineString(parts(0)) else MultiLineString(parts.toArray)
  }

  @inline private def doubleOf(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)

  // ---------------- polygon cut ----------------

  /**
   * Cut a polygonal set by a lineal blade: boundary sub-edges keep their
   * direction, blade sub-edges strictly inside the polygon are doubled
   * (both directions) after pruning dangling pieces, and the faces of the
   * resulting planar graph are the cut parts. Counterpart of
   * ⟨ref(engine): OperatorCutLocal⟩ extended from lineal to polygonal
   * targets. Returns parts smallest-first; an uncrossed polygon comes
   * back whole as a single part.
   */
  def cutPolygonal(pa: Array[Array[Array[Double]]], blade: Array[Array[Double]]): Array[Geometry] = {
    val scale = snapScale(math.max(maxAbs(pa), maxAbs(Array(blade))))
    val a = normalize(pa, scale)
    if (a.isEmpty) return Array.empty
    val edges = new ArrayBuffer[Edge]()
    collectEdges(a, 0, edges)
    blade.foreach { cs =>
      var i = 0
      while (i + 3 < cs.length) {
        val x1 = snap(cs(i), scale); val y1 = snap(cs(i + 1), scale)
        val x2 = snap(cs(i + 2), scale); val y2 = snap(cs(i + 3), scale)
        if (x1 != x2 || y1 != y2) edges += new Edge(x1, y1, x2, y2, 1)
        i += 2
      }
    }
    nodeAll(edges, scale)
    val subs = splitAll(edges, scale)
    val boundaryKeys = new mutable.HashSet[(Long, Long, Long, Long)]()
    subs.foreach { s => if (s.side == 0) boundaryKeys += s.ukey }
    // candidate interior blade edges (undirected, deduped)
    val bladeCand = new mutable.LinkedHashMap[(Long, Long, Long, Long), Sub]()
    subs.foreach { s =>
      if (s.side == 1 && !boundaryKeys.contains(s.ukey) && !bladeCand.contains(s.ukey)) {
        if (classifyStrictInterior(s, a)) bladeCand(s.ukey) = s
      }
    }
    // prune dangling blade pieces: an interior blade edge participates in a
    // cut only if both endpoints connect onward (to boundary or blade)
    val boundarySubs = subs.filter(_.side == 0)
    var changed = true
    while (changed) {
      changed = false
      val degree = new mutable.HashMap[PKey, Int]()
      def bump(x: Double, y: Double): Unit = {
        val k = pkey(x, y); degree(k) = degree.getOrElse(k, 0) + 1
      }
      boundarySubs.foreach { s => bump(s.sx, s.sy); bump(s.ex, s.ey) }
      bladeCand.values.foreach { s => bump(s.sx, s.sy); bump(s.ex, s.ey) }
      val drop = bladeCand.values.filter(s =>
        degree(pkey(s.sx, s.sy)) < 2 || degree(pkey(s.ex, s.ey)) < 2).map(_.ukey).toList
      if (drop.nonEmpty) { drop.foreach(bladeCand.remove); changed = true }
    }
    val selected = new ArrayBuffer[DirEdge]()
    boundarySubs.foreach(s => selected += s.asDir(false))
    bladeCand.values.foreach { s => selected += s.asDir(false); selected += s.asDir(true) }
    val rings = trace(selected)
    mkResult(rings) match {
      case m: MultiPolygon => m.polys.map(Polygon(_): Geometry)
      case p: Polygon      => Array(p: Geometry)
      case _               => Array.empty
    }
  }

  /**
   * Node a set of lineal paths (PostGIS ST_Node contract, segment form):
   * split every crossing/overlap, snap, dedupe undirected duplicates, and
   * return the resulting 2-point segments. Zero-length input segments are
   * dropped; dangling parts are KEPT (noding, not polygonizing).
   */
  def nodeLinework(lines: Array[Array[Double]]): Array[Array[Double]] = {
    var mx = 1.0
    lines.foreach { cs =>
      var i = 0
      while (i < cs.length) { val v = math.abs(cs(i)); if (v > mx) mx = v; i += 1 }
    }
    val scale = snapScale(mx)
    val edges = new ArrayBuffer[Edge]()
    lines.foreach { cs =>
      var i = 0
      while (i + 3 < cs.length) {
        val x1 = snap(cs(i), scale); val y1 = snap(cs(i + 1), scale)
        val x2 = snap(cs(i + 2), scale); val y2 = snap(cs(i + 3), scale)
        if (x1 != x2 || y1 != y2) edges += new Edge(x1, y1, x2, y2, 0)
        i += 2
      }
    }
    if (edges.isEmpty) return Array.empty
    nodeAll(edges, scale)
    val subs = splitAll(edges, scale)
    val uniq = new mutable.LinkedHashMap[(Long, Long, Long, Long), Sub]()
    subs.foreach { s => if (!uniq.contains(s.ukey)) uniq(s.ukey) = s }
    uniq.values.map(s => Array(s.sx, s.sy, s.ex, s.ey)).toArray
  }

  /**
   * Polygonize a set of lineal paths: node every crossing, dedupe
   * undirected sub-edges, iteratively drop dangling edges (an edge can
   * bound a face only if both endpoints connect onward), trace minimal
   * rings from BOTH directions of every surviving edge, and assemble CCW
   * shells with CW holes — dropping CW rings contained in no shell (the
   * unbounded face). JTS Polygonizer semantics without the JTS graph.
   */
  def polygonize(lines: Array[Array[Double]]): Array[Geometry] = {
    var mx = 1.0
    lines.foreach { cs =>
      var i = 0
      while (i < cs.length) { val v = math.abs(cs(i)); if (v > mx) mx = v; i += 1 }
    }
    val scale = snapScale(mx)
    val edges = new ArrayBuffer[Edge]()
    lines.foreach { cs =>
      var i = 0
      while (i + 3 < cs.length) {
        val x1 = snap(cs(i), scale); val y1 = snap(cs(i + 1), scale)
        val x2 = snap(cs(i + 2), scale); val y2 = snap(cs(i + 3), scale)
        if (x1 != x2 || y1 != y2) edges += new Edge(x1, y1, x2, y2, 0)
        i += 2
      }
    }
    if (edges.isEmpty) return Array.empty
    nodeAll(edges, scale)
    val subs0 = splitAll(edges, scale)
    // Merge near-coincident nodes (≤2.5 grid steps): three nearly-concurrent
    // crossings can snap onto ADJACENT grid cells, splitting one geometric
    // node in two and scrambling the angular order around each half — the
    // walk then weaves through the micro-edge and merges real faces
    // (DeepFuzz seed 20260817, 53-vs-54 soup). Union-find to the
    // lexicographically smallest representative, then drop collapsed edges.
    val res0 = 1.0 / scale
    val nodePts = new mutable.LinkedHashMap[(Long, Long), Int]()
    val xs = new ArrayBuffer[Double](); val ys = new ArrayBuffer[Double]()
    @inline def nodeIdx(x: Double, y: Double): Int = {
      val k = (java.lang.Double.doubleToLongBits(x), java.lang.Double.doubleToLongBits(y))
      nodePts.getOrElseUpdate(k, { xs += x; ys += y; xs.length - 1 })
    }
    subs0.foreach { s => nodeIdx(s.sx, s.sy); nodeIdx(s.ex, s.ey) }
    val parent = Array.tabulate(xs.length)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); var c = i; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val cellW = 4 * res0
    val buckets = new mutable.HashMap[(Long, Long), ArrayBuffer[Int]]()
    (0 until xs.length).foreach { i =>
      buckets.getOrElseUpdate(
        (math.floor(xs(i) / cellW).toLong, math.floor(ys(i) / cellW).toLong),
        new ArrayBuffer[Int]()) += i
    }
    val tol = 2.5 * res0
    (0 until xs.length).foreach { i =>
      val bx = math.floor(xs(i) / cellW).toLong; val by = math.floor(ys(i) / cellW).toLong
      var dx = -1L
      while (dx <= 1) {
        var dy = -1L
        while (dy <= 1) {
          buckets.get((bx + dx, by + dy)).foreach(_.foreach { j =>
            if (j > i && math.hypot(xs(i) - xs(j), ys(i) - ys(j)) <= tol) union(i, j)
          })
          dy += 1
        }
        dx += 1
      }
    }
    // canonical coordinate per cluster: lexicographically smallest member
    val canonOf = new Array[Int](xs.length)
    (0 until xs.length).foreach { i => canonOf(i) = i }
    (0 until xs.length).foreach { i =>
      val r = find(i)
      val c = canonOf(r)
      if (xs(i) < xs(c) || (xs(i) == xs(c) && ys(i) < ys(c))) canonOf(r) = i
    }
    val subs = new ArrayBuffer[Sub](subs0.length)
    subs0.foreach { s =>
      val a = canonOf(find(nodeIdx(s.sx, s.sy)))
      val b = canonOf(find(nodeIdx(s.ex, s.ey)))
      if (a != b) subs += Sub(xs(a), ys(a), xs(b), ys(b), s.side)
    }
    val uniq = new mutable.LinkedHashMap[(Long, Long, Long, Long), Sub]()
    subs.foreach { s => if (!uniq.contains(s.ukey)) uniq(s.ukey) = s }
    // iterative dangling-edge removal (same pattern as cutPolygonal)
    var changed = true
    while (changed) {
      changed = false
      val degree = new mutable.HashMap[PKey, Int]()
      uniq.values.foreach { s =>
        val k1 = pkey(s.sx, s.sy); degree(k1) = degree.getOrElse(k1, 0) + 1
        val k2 = pkey(s.ex, s.ey); degree(k2) = degree.getOrElse(k2, 0) + 1
      }
      val drop = uniq.values.filter(s =>
        degree(pkey(s.sx, s.sy)) < 2 || degree(pkey(s.ex, s.ey)) < 2).map(_.ukey).toList
      if (drop.nonEmpty) { drop.foreach(uniq.remove); changed = true }
    }
    if (uniq.isEmpty) return Array.empty
    // DCEL face orbits: directed edges in pairs (2k = forward, 2k+1 =
    // reverse); next(e) = the predecessor of reverse(e) in CCW angular
    // order around e's endpoint (interior-on-the-left convention). This is
    // a pure permutation — every directed edge lies on exactly one face
    // orbit — so pinched faces trace whole with no walk-order state to
    // corrupt (the seed-424243 DeepFuzz escape: a wrong early walk with
    // used-flags consumed edges a later face needed).
    val dirEdges = new ArrayBuffer[DirEdge]()
    uniq.values.foreach { s => dirEdges += s.asDir(false); dirEdges += s.asDir(true) }
    val nE = dirEdges.length
    val nodeOut = new mutable.HashMap[PKey, ArrayBuffer[Int]]()
    (0 until nE).foreach { i =>
      val e = dirEdges(i)
      nodeOut.getOrElseUpdate(pkey(e.sx, e.sy), new ArrayBuffer[Int]()) += i
    }
    val posInNode = new Array[Int](nE)
    nodeOut.values.foreach { lst =>
      val sorted = lst.sortBy { i =>
        val e = dirEdges(i); math.atan2(e.ey - e.sy, e.ex - e.sx)
      }
      lst.clear(); lst ++= sorted
      sorted.zipWithIndex.foreach { case (i, p) => posInNode(i) = p }
    }
    @inline def nextEdge(i: Int): Int = {
      val rev = i ^ 1
      val lst = nodeOut(pkey(dirEdges(rev).sx, dirEdges(rev).sy))
      lst((posInNode(rev) - 1 + lst.length) % lst.length)
    }
    // connected components over the arrangement's nodes: a CW orbit is the
    // OUTER boundary of its own component (drop it) — it can only be a
    // hole of a shell from a DIFFERENT component (nested, unconnected).
    // Two components that touched anywhere would share a node (noding
    // splits vertex-on-edge contacts), i.e. be one component — so holes
    // never share vertices with their shell.
    val nodeIds = new mutable.LinkedHashMap[PKey, Int]()
    uniq.values.foreach { s =>
      nodeIds.getOrElseUpdate(pkey(s.sx, s.sy), nodeIds.size)
      nodeIds.getOrElseUpdate(pkey(s.ex, s.ey), nodeIds.size)
    }
    val compParent = Array.tabulate(nodeIds.size)(identity)
    def compFind(i: Int): Int = { var r = i; while (compParent(r) != r) r = compParent(r); r }
    uniq.values.foreach { s =>
      val a = compFind(nodeIds(pkey(s.sx, s.sy)))
      val b = compFind(nodeIds(pkey(s.ex, s.ey)))
      if (a != b) compParent(math.max(a, b)) = math.min(a, b)
    }

    val visited = new Array[Boolean](nE)
    val ringsBuf = new ArrayBuffer[(Array[Double], Int)]()
    (0 until nE).foreach { start =>
      if (!visited(start)) {
        val ring = new ArrayBuffer[Double]()
        var cur = start
        var guard = 0
        while (!visited(cur)) {
          visited(cur) = true
          ring += dirEdges(cur).sx; ring += dirEdges(cur).sy
          cur = nextEdge(cur)
          guard += 1
          if (guard > nE + 1) throw new IllegalStateException("face orbit did not close")
        }
        if (ring.length >= 6) {
          ring += ring(0); ring += ring(1)
          val arr = ring.toArray
          if (Ops.signedRingArea(arr) != 0.0)
            ringsBuf += ((arr, compFind(nodeIds(pkey(arr(0), arr(1))))))
        }
      }
    }
    // assemble: CCW shells; CW rings attach as holes or are the unbounded
    // face boundary (dropped). Rings THINNER than the snap grid (area <
    // perimeter × grid step) are noise: three nearly-concurrent crossings
    // can land on adjacent grid nodes and leave a sliver face between them
    // where full-precision noding sees one node (DeepFuzz seed 20260817).
    val res = 1.0 / scale
    @inline def perim(r: Array[Double]): Double = {
      var p = 0.0; var i = 0
      while (i + 3 < r.length) { p += math.hypot(r(i + 2) - r(i), r(i + 3) - r(i + 1)); i += 2 }
      p
    }
    val shells = new ArrayBuffer[(Array[Double], Double, Int, ArrayBuffer[Array[Double]])]()
    val cw = new ArrayBuffer[(Array[Double], Int)]()
    ringsBuf.foreach { case (r, comp) =>
      val a = Ops.signedRingArea(r)
      if (math.abs(a) >= perim(r) * res) {
        if (a > 0) shells += ((r, a, comp, new ArrayBuffer[Array[Double]]()))
        else if (a < 0) cw += ((r, comp))
      }
    }
    val byArea = shells.sortBy(_._2)
    // a CW orbit is its component's OUTER boundary: within its own
    // component it is never a hole (drop — that is the unbounded side);
    // from a DIFFERENT component it is a hole of the smallest CCW shell
    // strictly containing it (nested components never share vertices).
    cw.foreach { case (h, comp) =>
      val (ix, iy) = Pred.interiorPoint(Array(h))
      val ha = -Ops.signedRingArea(h)
      // a strictly-contained hole is never larger than its shell — this
      // also rejects a component's unbounded ring (area = whole component)
      // whose interior point happens to fall inside a small nested shell
      byArea.find { case (shell, a, sComp, _) =>
        sComp != comp && ha <= a && Pred.pointInRing(shell, ix, iy) > 0
      }.foreach { case (_, _, _, hs) => hs += h }
    }
    byArea.map { case (shell, _, _, hs) => Polygon(shell +: hs.toArray): Geometry }.toArray
  }

  /** Is the sub-edge strictly interior to the polygonal set? (midpoint
    * sampling; boundary-coincident runs were excluded via ukey already). */
  private def classifyStrictInterior(s: Sub, polys: Array[Array[Array[Double]]]): Boolean = {
    var t = 0.5
    var attempt = 0
    while (attempt < 3) {
      val mx = s.sx + t * (s.ex - s.sx)
      val my = s.sy + t * (s.ey - s.sy)
      val r = Pred.pointInPolygonal(polys, mx, my)
      if (r != 0) return r == 1
      attempt += 1
      t = if (attempt == 1) 0.25 else 0.75
    }
    false
  }

  // ---------------- assembly ----------------

  /** Assemble traced rings (CCW shells / CW holes by signed area) into
    * polygons; each hole attaches to the smallest shell containing it. */
  def mkResult(rings: Array[Array[Double]]): Geometry = {
    if (rings.isEmpty) return GeometryCollection(Array.empty)
    val shells = new ArrayBuffer[(Array[Double], Double, ArrayBuffer[Array[Double]])]()
    val holes = new ArrayBuffer[Array[Double]]()
    rings.foreach { r =>
      val a = Ops.signedRingArea(r)
      if (a > 0) shells += ((r, a, new ArrayBuffer[Array[Double]]()))
      else if (a < 0) holes += r
    }
    if (shells.isEmpty) {
      if (holes.isEmpty) return GeometryCollection(Array.empty)
      throw new IllegalStateException("overlay produced holes without shells")
    }
    val byArea = shells.sortBy(_._2)
    holes.foreach { h =>
      val (ix, iy) = Pred.interiorPoint(Array(h))
      byArea.find { case (shell, _, _) => Pred.pointInRing(shell, ix, iy) >= 0 } match {
        case Some((_, _, hs)) => hs += h
        case None =>
          throw new IllegalStateException("overlay hole not contained in any shell")
      }
    }
    val polys = byArea.map { case (shell, _, hs) => shell +: hs.toArray }.toArray
    if (polys.length == 1) Polygon(polys(0)) else MultiPolygon(polys)
  }
}
