package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Greiner–Hormann clipping for general simple (hole-free) polygon pairs —
 * the concave×concave overlay path (SURVEY §7.5 HARD item 1, staged in).
 *
 * Classic GH handles polygons whose boundaries cross PROPERLY; degenerate
 * configurations (vertex-on-edge, collinear overlap) raise [[Degenerate]]
 * and the caller (graft.geom.Overlay) falls back to its exact fast paths
 * or reports unsupported — never silently-wrong output. Robustness via
 * snap-rounding is the remaining P2 item.
 *
 * Behavioral counterpart of the reference's TopoGraph planar overlay
 * ⟨ref(engine): com.esri.core.geometry.TopographicOperations⟩.
 */
object GreinerHormann {

  final class Degenerate(msg: String) extends RuntimeException(msg)

  private final class Node(val x: Double, val y: Double) {
    var next: Node = _
    var prev: Node = _
    var intersect = false
    var entry = false
    var neighbor: Node = _
    var visited = false
  }

  private def buildRing(r: Array[Double]): Node = {
    // open ring (drop closing vertex), must have >= 3 distinct points
    val n = r.length / 2 - 1
    require(n >= 3, "degenerate ring")
    var first: Node = null
    var last: Node = null
    var i = 0
    while (i < n) {
      val node = new Node(r(2 * i), r(2 * i + 1))
      if (first == null) first = node
      else { last.next = node; node.prev = last }
      last = node
      i += 1
    }
    last.next = first; first.prev = last
    first
  }

  /** Proper intersection of open segments (strict interior of both). */
  private def properIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                              cx: Double, cy: Double, dx: Double, dy: Double): Option[(Double, Double, Double, Double)] = {
    val d1 = Pred.orient(cx, cy, dx, dy, ax, ay)
    val d2 = Pred.orient(cx, cy, dx, dy, bx, by)
    val d3 = Pred.orient(ax, ay, bx, by, cx, cy)
    val d4 = Pred.orient(ax, ay, bx, by, dx, dy)
    if (d1 == 0.0 && d2 == 0.0 && d3 == 0.0 && d4 == 0.0) {
      // collinear: degenerate only if the segments actually overlap
      val out = new Array[Double](4)
      if (Pred.segSeg(ax, ay, bx, by, cx, cy, dx, dy, out) != 0)
        throw new Degenerate("collinear overlapping edges")
      return None
    }
    if (d1 == 0.0 || d2 == 0.0 || d3 == 0.0 || d4 == 0.0) {
      // endpoint touches an edge: degenerate only when within both segments
      val out = new Array[Double](4)
      if (Pred.segSeg(ax, ay, bx, by, cx, cy, dx, dy, out) != 0)
        throw new Degenerate("vertex-on-edge intersection")
      return None
    }
    if ((d1 > 0) == (d2 > 0) || (d3 > 0) == (d4 > 0)) return None
    val tA = d1 / (d1 - d2)
    val tB = d3 / (d3 - d4)
    Some((ax + tA * (bx - ax), ay + tA * (by - ay), tA, tB))
  }

  sealed trait Op
  case object Intersection extends Op
  case object Union extends Op
  case object DifferenceAB extends Op

  /**
   * Run GH on two simple hole-free rings (closed coordinate arrays).
   * Returns result rings (closed). Throws [[Degenerate]] on non-proper
   * intersections; returns None if boundaries don't cross (caller handles
   * containment/disjoint).
   */
  def clip(ringA: Array[Double], ringB: Array[Double], op: Op): Option[Array[Array[Double]]] = {
    val a0 = buildRing(ringA)
    val b0 = buildRing(ringB)

    // collect intersections per edge with parameters, then splice
    final case class Hit(aEdge: Node, bEdge: Node, x: Double, y: Double, tA: Double, tB: Double)
    val hits = new ArrayBuffer[Hit]()
    var ae = a0
    do {
      var be = b0
      do {
        properIntersect(ae.x, ae.y, ae.next.x, ae.next.y,
                        be.x, be.y, be.next.x, be.next.y).foreach {
          case (x, y, tA, tB) => hits += Hit(ae, be, x, y, tA, tB)
        }
        be = be.next
      } while (be ne b0)
      ae = ae.next
    } while (ae ne a0)

    if (hits.isEmpty) return None
    if (hits.length % 2 != 0) throw new Degenerate("odd crossing count (near-degenerate geometry)")

    // splice intersection nodes into both rings (sorted by parameter per edge)
    val pairs = hits.map { h =>
      val na = new Node(h.x, h.y); na.intersect = true
      val nb = new Node(h.x, h.y); nb.intersect = true
      na.neighbor = nb; nb.neighbor = na
      (h, na, nb)
    }
    pairs.groupBy(_._1.aEdge).foreach { case (edge, es) =>
      var insertAfter = edge
      es.sortBy(_._1.tA).foreach { case (_, na, _) =>
        na.next = insertAfter.next; na.prev = insertAfter
        insertAfter.next.prev = na; insertAfter.next = na
        insertAfter = na
      }
    }
    pairs.groupBy(_._1.bEdge).foreach { case (edge, es) =>
      var insertAfter = edge
      es.sortBy(_._1.tB).foreach { case (_, _, nb) =>
        nb.next = insertAfter.next; nb.prev = insertAfter
        insertAfter.next.prev = nb; insertAfter.next = nb
        insertAfter = nb
      }
    }

    // entry/exit marking
    val bPoly = Polygon(Array(ringB))
    val aPoly = Polygon(Array(ringA))
    def mark(start: Node, other: Polygon, flip: Boolean): Unit = {
      val s = Pred.pointInPolygon(other.rings, start.x, start.y)
      if (s == 0) throw new Degenerate("ring start on other boundary")
      var inside = s == 1
      if (flip) inside = !inside
      var cur = start
      do {
        if (cur.intersect) { cur.entry = !inside; inside = !inside }
        cur = cur.next
      } while (cur ne start)
    }
    val (flipA, flipB) = op match {
      case Intersection => (false, false)
      case Union        => (true, true)
      case DifferenceAB => (true, false)
    }
    mark(a0, bPoly, flipA)
    mark(b0, aPoly, flipB)

    // trace result rings
    val results = new ArrayBuffer[Array[Double]]()
    var guard = 0
    val maxSteps = (ringA.length + ringB.length) * 4 + hits.length * 8
    def nextUnvisited(): Node = {
      var cur = a0
      do {
        if (cur.intersect && !cur.visited) return cur
        cur = cur.next
      } while (cur ne a0)
      null
    }
    var startNode = nextUnvisited()
    while (startNode != null) {
      val ring = new ArrayBuffer[Double]()
      var cur = startNode
      do {
        cur.visited = true; cur.neighbor.visited = true
        if (cur.entry) {
          do {
            ring += cur.x; ring += cur.y
            cur = cur.next
            guard += 1
            if (guard > maxSteps) throw new Degenerate("tracing did not terminate")
          } while (!cur.intersect)
        } else {
          do {
            ring += cur.x; ring += cur.y
            cur = cur.prev
            guard += 1
            if (guard > maxSteps) throw new Degenerate("tracing did not terminate")
          } while (!cur.intersect)
        }
        cur = cur.neighbor
      } while (!cur.visited)
      if (ring.length >= 6) {
        ring += ring(0); ring += ring(1)
        results += ring.toArray
      }
      startNode = nextUnvisited()
    }
    Some(results.toArray)
  }

  /** Assemble traced rings into polygons: CCW-area rings are shells, rings
    * contained in a shell with smaller |area| become its holes. */
  def assemble(rings: Array[Array[Double]]): Geometry = {
    if (rings.isEmpty) return GeometryCollection(Array.empty)
    val sorted = rings.map(r => (r, math.abs(Ops.signedRingArea(r)))).sortBy(-_._2)
    val shells = new ArrayBuffer[(Array[Double], ArrayBuffer[Array[Double]])]()
    sorted.foreach { case (r, _) =>
      val (ix, iy) = Pred.interiorPoint(Array(r))
      val host = shells.find { case (shell, _) => Pred.pointInRing(shell, ix, iy) == 1 }
      host match {
        case Some((_, holes)) => holes += r
        case None => shells += ((r, new ArrayBuffer[Array[Double]]()))
      }
    }
    val polys = shells.map { case (shell, holes) => shell +: holes.toArray }.toArray
    if (polys.length == 1) Polygon(polys(0)) else MultiPolygon(polys)
  }
}
