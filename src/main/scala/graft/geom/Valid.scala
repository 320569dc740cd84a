package graft.geom

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * OGC validity checking (`st_isvalid` / `st_isvalid_reason`) — the JTS
 * IsValidOp semantics re-derived over the flat-array model, fuzz-pinned
 * against JTS in DeepFuzz's validCase axis:
 *
 * - rings: ≥4 coordinate pairs, closed, SIMPLE (no repeated non-consecutive
 *   vertex, no non-adjacent segment contact, no collinear spike);
 * - holes inside the shell, not inside each other, touching other rings at
 *   finitely many POINTS only (edge contact = self-intersection);
 * - interior connected: the ring-touch graph must be acyclic (a hole chain
 *   that closes a loop, or any pair touching twice, pinches the interior);
 * - multipolygon: element interiors disjoint — shells may touch at points,
 *   must not cross or share edges; a shell nested inside another polygon
 *   must lie inside one of its holes.
 *
 * Repeated CONSECUTIVE vertices are allowed (JTS convention) and skipped.
 */
object Valid {

  final case class Result(valid: Boolean, reason: String)
  private val OK = Result(valid = true, "Valid Geometry")

  def check(g: Geometry): Result = g match {
    case p: Point =>
      if (p.isEmpty || (!p.x.isNaN && !p.y.isNaN)) OK else Result(valid = false, "NaN coordinate")
    case _: MultiPoint => OK
    case l: LineString => checkLine(l.coords)
    case m: MultiLineString =>
      m.lines.iterator.map(checkLine).find(!_.valid).getOrElse(OK)
    case p: Polygon => checkPolygon(p.rings)
    case m: MultiPolygon => checkMulti(m.polys)
    case c: GeometryCollection =>
      c.geoms.iterator.map(check).find(!_.valid).getOrElse(OK)
    case zm: GeometryZM => check(zm.base)
  }

  private def checkLine(cs: Array[Double]): Result = {
    if (cs.length < 4) return Result(valid = false, "Too few points in LineString")
    var i = 2
    while (i + 1 < cs.length) {
      if (cs(i) != cs(0) || cs(i + 1) != cs(1)) return OK
      i += 2
    }
    Result(valid = false, "LineString has zero length")
  }

  /** Distinct (deduped-consecutive, unclosed) vertex list of a ring. */
  private def openRing(r: Array[Double]): Array[Double] = {
    val out = new ArrayBuffer[Double](r.length)
    var i = 0
    while (i + 1 < r.length) {
      if (out.length < 2 || r(i) != out(out.length - 2) || r(i + 1) != out(out.length - 1)) {
        out += r(i); out += r(i + 1)
      }
      i += 2
    }
    // drop the closing duplicate if present
    if (out.length >= 4 && out(0) == out(out.length - 2) && out(1) == out(out.length - 1)) {
      out.remove(out.length - 2, 2)
    }
    out.toArray
  }

  private def checkRing(r: Array[Double]): Result = {
    if (r.length < 8) return Result(valid = false, "Too few points in ring")
    if (r(0) != r(r.length - 2) || r(1) != r(r.length - 1))
      return Result(valid = false, "Ring not closed")
    val o = openRing(r)
    val n = o.length / 2
    if (n < 3) return Result(valid = false, "Too few points in ring")
    // repeated (non-consecutive) vertex ⇒ pinch / figure-eight
    val seen = new mutable.HashSet[(Long, Long)]()
    var i = 0
    while (i + 1 < o.length) {
      val k = (java.lang.Double.doubleToLongBits(o(i)), java.lang.Double.doubleToLongBits(o(i + 1)))
      if (!seen.add(k)) return Result(valid = false, "Ring self-intersection (repeated vertex)")
      i += 2
    }
    // segment pairs: adjacent may only share their common endpoint
    val out = new Array[Double](4)
    var a = 0
    while (a < n) {
      val ax = o(2 * a); val ay = o(2 * a + 1)
      val bx = o(2 * ((a + 1) % n)); val by = o(2 * ((a + 1) % n) + 1)
      var b = a + 1
      while (b < n) {
        val cx = o(2 * b); val cy = o(2 * b + 1)
        val dx = o(2 * ((b + 1) % n)); val dy = o(2 * ((b + 1) % n) + 1)
        val adjacent = (b == a + 1) || (a == 0 && b == n - 1)
        val hits = Pred.segSeg(ax, ay, bx, by, cx, cy, dx, dy, out)
        if (hits == 2) return Result(valid = false, "Ring self-intersection (collinear overlap)")
        if (hits == 1) {
          val sharedOk = adjacent &&
            ((out(0) == bx && out(1) == by && b == a + 1) ||
             (out(0) == ax && out(1) == ay && a == 0 && b == n - 1))
          if (!sharedOk) return Result(valid = false, "Ring self-intersection")
        }
        b += 1
      }
      a += 1
    }
    OK
  }

  /** Distinct touch points between two rings; None = edge contact/cross. */
  private def ringContacts(r1: Array[Double], r2: Array[Double]): Option[Set[(Long, Long)]] = {
    val out = new Array[Double](4)
    val touches = new mutable.HashSet[(Long, Long)]()
    var i = 0
    while (i + 3 < r1.length) {
      var j = 0
      while (j + 3 < r2.length) {
        Pred.segSeg(r1(i), r1(i + 1), r1(i + 2), r1(i + 3),
          r2(j), r2(j + 1), r2(j + 2), r2(j + 3), out) match {
          case 2 => return None // collinear shared run = edge contact
          case 1 =>
            touches += ((java.lang.Double.doubleToLongBits(out(0)),
              java.lang.Double.doubleToLongBits(out(1))))
          case _ => ()
        }
        j += 2
      }
      i += 2
    }
    Some(touches.toSet)
  }

  /** Does any sub-edge midpoint of `ring` — after NODING its edges against
    * `others`' segments — satisfy `bad`? Full-edge midpoints are not enough:
    * an edge that crosses in and back out can have its midpoint outside the
    * other region (the overlapping-rects escape, DeepFuzz seed 424243). */
  private def anySubMid(ring: Array[Double], others: Array[Array[Double]],
                        bad: (Double, Double) => Boolean): Boolean = {
    val out = new Array[Double](4)
    var i = 0
    while (i + 3 < ring.length) {
      val ax = ring(i); val ay = ring(i + 1); val bx = ring(i + 2); val by = ring(i + 3)
      @inline def param(x: Double, y: Double): Double =
        if (math.abs(bx - ax) >= math.abs(by - ay)) {
          if (bx == ax) 0.0 else (x - ax) / (bx - ax)
        } else (y - ay) / (by - ay)
      val ts = ArrayBuffer(0.0, 1.0)
      others.foreach { r2 =>
        var j = 0
        while (j + 3 < r2.length) {
          val k = Pred.segSeg(ax, ay, bx, by, r2(j), r2(j + 1), r2(j + 2), r2(j + 3), out)
          if (k >= 1) ts += param(out(0), out(1))
          if (k == 2) ts += param(out(2), out(3))
          j += 2
        }
      }
      val s = ts.filter(t => t >= 0 && t <= 1).sorted
      var k = 0
      while (k + 1 < s.length) {
        if (s(k + 1) > s(k)) {
          val t = (s(k) + s(k + 1)) / 2
          val mx = ax + t * (bx - ax); val my = ay + t * (by - ay)
          if (bad(mx, my)) return true
        }
        k += 1
      }
      i += 2
    }
    false
  }

  private def checkPolygon(rings: Array[Array[Double]]): Result = {
    if (rings.isEmpty) return OK // empty polygon
    rings.foreach { r =>
      val res = checkRing(r)
      if (!res.valid) return res
    }
    val shell = rings(0)
    val holes = rings.drop(1)
    // hole position: every hole vertex + edge midpoint inside-or-on shell,
    // and holes not nested in each other
    holes.zipWithIndex.foreach { case (h, hi) =>
      var i = 0
      while (i + 1 < h.length) {
        if (Pred.pointInRing(shell, h(i), h(i + 1)) < 0)
          return Result(valid = false, "Hole lies outside shell")
        i += 2
      }
      if (anySubMid(h, Array(shell), (x, y) => Pred.pointInRing(shell, x, y) < 0))
        return Result(valid = false, "Hole lies outside shell")
      val (ix, iy) = Pred.interiorPoint(Array(h))
      holes.zipWithIndex.foreach { case (h2, hj) =>
        if (hi != hj) {
          if (Pred.pointInRing(h2, ix, iy) > 0 && {
            // strictly nested only if every vertex is inside-or-on too
            var k = 0; var allIn = true
            while (k + 1 < h.length && allIn) {
              if (Pred.pointInRing(h2, h(k), h(k + 1)) < 0) allIn = false
              k += 2
            }
            allIn
          }) return Result(valid = false, "Holes are nested")
        }
      }
    }
    // pairwise contacts: edge contact invalid; build the touch graph
    val n = rings.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    var a = 0
    while (a < n) {
      var b = a + 1
      while (b < n) {
        ringContacts(rings(a), rings(b)) match {
          case None => return Result(valid = false, "Self-intersection (rings share an edge)")
          case Some(pts) =>
            if (pts.size >= 2) return Result(valid = false, "Interior is disconnected")
            if (pts.size == 1) {
              val ra = find(a); val rb = find(b)
              if (ra == rb) return Result(valid = false, "Interior is disconnected")
              parent(ra) = rb
            }
        }
        b += 1
      }
      a += 1
    }
    OK
  }

  private def checkMulti(polysIn: Array[Array[Array[Double]]]): Result = {
    polysIn.foreach { p =>
      val res = checkPolygon(p)
      if (!res.valid) return res
    }
    // ring-less elements are valid-empty (checkPolygon accepts them) and
    // have no interior to overlap — drop them before the pairwise shell
    // checks, which dereference polys(x)(0) (advisor r4)
    val polys = polysIn.filter(_.nonEmpty)
    // element interiors must be disjoint: for each pair, boundaries may
    // touch at points (never share edges), and no shell edge midpoint may
    // lie STRICTLY inside the other polygon (inside its shell and not
    // inside-or-on a hole) — this uniformly rejects crossing, overlapping,
    // covering and badly-nested shells while accepting a polygon properly
    // nested in another's hole.
    @inline def midStrictlyInside(shell: Array[Double], other: Array[Array[Double]]): Boolean =
      anySubMid(shell, other, (x, y) => Pred.pointInPolygonal(Array(other), x, y) > 0)
    var a = 0
    while (a < polys.length) {
      var b = a + 1
      while (b < polys.length) {
        // edge contact between ANY ring of A and ANY ring of B is a
        // self-intersection — e.g. a polygon nested in another's hole
        // sharing an edge run with that hole's boundary (review finding)
        polys(a).foreach { ra =>
          polys(b).foreach { rb =>
            if (ringContacts(ra, rb).isEmpty)
              return Result(valid = false, "Elements share an edge")
          }
        }
        val sa = polys(a)(0); val sb = polys(b)(0)
        if (midStrictlyInside(sa, polys(b)) || midStrictlyInside(sb, polys(a)))
          return Result(valid = false, "Nested or overlapping shells")
        b += 1
      }
      a += 1
    }
    OK
  }
}
