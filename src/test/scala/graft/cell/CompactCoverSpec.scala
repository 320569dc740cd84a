package graft.cell

import graft.geom.{Env, Geometry, Point, Polygon, Pred, Wkt}
import org.scalatest.funsuite.AnyFunSuite

/** Compact multi-level cover invariants (r5): disjointness (quadtree node
  * emitted XOR recursed), exact expansion equality against the flat
  * single-level cover, point soundness through the ancestor chain, and
  * the perimeter-vs-area compaction win the operator exists for. */
class CompactCoverSpec extends AnyFunSuite {

  var state = 7L
  def next(): Long = { state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state }
  def frac(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble

  def randRect(): Polygon = {
    val x0 = -170.0 + 320.0 * frac(); val y0 = -80.0 + 150.0 * frac()
    val w = 0.5 + 40.0 * frac(); val h = 0.5 + 20.0 * frac()
    Env(x0, y0, math.min(179.9, x0 + w), math.min(84.9, y0 + h)).toPolygon
  }

  def randTri(): Polygon = {
    val x0 = -170.0 + 320.0 * frac(); val y0 = -80.0 + 150.0 * frac()
    def p() = (x0 + 30.0 * frac(), y0 + 15.0 * frac())
    val (ax, ay) = p(); val (bx, by) = p(); val (cx, cy) = p()
    val o = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val ring = if (o >= 0) Array(ax, ay, bx, by, cx, cy, ax, ay)
               else Array(ax, ay, cx, cy, bx, by, ax, ay)
    Polygon(Array(ring))
  }

  def expand(packed: Array[Long], maxLevel: Int): Set[Long] =
    packed.flatMap { p =>
      val cell = Cells.packedCell(p); val lvl = Cells.packedLevel(p)
      val (s, e) = Cells.childRange(cell, lvl, maxLevel)
      s until e
    }.toSet

  test("expansion equality: compact cover = flat cover at maxLevel") {
    (0 until 30).foreach { i =>
      val g: Geometry = if (i % 2 == 0) randRect() else randTri()
      val maxL = 8 + (i % 3)
      val minL = math.max(0, maxL - 5)
      val compact = Cells.compactCover(g, minL, maxL)
      val flat = Cells.cover(g, maxL).toSet
      assert(expand(compact, maxL) == flat, s"case $i ($minL..$maxL)")
    }
  }

  test("disjointness: no packed cell is an ancestor of another") {
    (0 until 20).foreach { i =>
      val g: Geometry = if (i % 2 == 0) randRect() else randTri()
      val compact = Cells.compactCover(g, 4, 10)
      val byLevel = compact.groupBy(Cells.packedLevel).view.mapValues(_.map(Cells.packedCell).toSet).toMap
      compact.foreach { p =>
        val cell = Cells.packedCell(p); val lvl = Cells.packedLevel(p)
        (4 until lvl).foreach { al =>
          byLevel.get(al).foreach { anc =>
            assert(!anc.contains(Cells.parent(cell, lvl, al)),
              s"cell $cell@$lvl shadowed by ancestor at level $al")
          }
        }
      }
    }
  }

  test("point soundness: ancestor chain meets the cover in exactly one cell for interior points") {
    (0 until 20).foreach { _ =>
      val g = randRect()
      val env = g.envelope
      val cover = Cells.compactCover(g, 5, 12).toSet
      (0 until 50).foreach { _ =>
        val lon = env.xmin + (env.xmax - env.xmin) * frac()
        val lat = env.ymin + (env.ymax - env.ymin) * frac()
        val chain = Cells.cellAncestors(Cells.cellId(lon, lat, 12), 12, 5)
        val hits = chain.count(cover.contains)
        assert(hits == 1, s"point ($lon,$lat) hit $hits cover cells")
      }
    }
  }

  test("compaction win: big-rect cover is perimeter-bound, not area-bound") {
    // the sf hot zone shape: a ~1.5 degree rect, covered at a fine level
    val hot = Env(-0.6, 51.0, 0.9, 52.5).toPolygon
    val flat = Cells.cover(hot, 14, maxCells = 1 << 22).length
    val compact = Cells.compactCover(hot, 6, 14).length
    assert(flat > 5000, s"flat cover unexpectedly small: $flat")
    assert(compact.toLong * 10 < flat, s"compact $compact not ≪ flat $flat")
    // and expansion still matches exactly
    assert(expand(Cells.compactCover(hot, 6, 14), 14) == Cells.cover(hot, 14, maxCells = 1 << 22).toSet)
  }

  test("general polygon (non-rect) compact cover via WKT round-trip geometry") {
    val g = Wkt.read("POLYGON ((0 0, 20 0, 20 6, 10 6, 10 14, 20 14, 20 20, 0 20, 0 0))")
    val compact = Cells.compactCover(g, 5, 11)
    assert(expand(compact, 11) == Cells.cover(g, 11).toSet)
    // interior coarse cells exist (the compaction actually fires)
    assert(compact.exists(p => Cells.packedLevel(p) < 11))
    // every coarse cell is fully contained in the polygon
    compact.filter(p => Cells.packedLevel(p) < 11).foreach { p =>
      val ce = Cells.cellEnvelope(Cells.packedCell(p), Cells.packedLevel(p)).toPolygon
      assert(Pred.contains(g, ce))
    }
  }
}
