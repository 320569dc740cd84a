package graft.geom

/**
 * Curve smoothing + pole of inaccessibility (PostGIS parity surface:
 * ST_ChaikinSmoothing, ST_MaximumInscribedCircle).
 *
 * Chaikin corner cutting uses only ×0.25/×0.75 (exact binary factors) so
 * one iteration over an axis-aligned rectangle has closed-form area
 * 0.875·w·h and perimeter w + h + √(w²+h²) — the q109 oracle.
 *
 * The inscribed circle uses the public "polylabel" quadtree refinement
 * (Mapbox blog / PostGIS GEOS): cells ordered by the upper bound
 * d(center) + halfSize·√2, split until no cell can beat the best point
 * by more than `precision`. DETERMINISM: the priority order ties break
 * by (x, y), so the returned point is a pure function of the polygon.
 * The result radius is within `precision` of the true maximum; the
 * returned POINT is only unique where the optimum is (e.g. squares —
 * an elongated rectangle has a whole centerline segment of optima, any
 * of which is a correct answer).
 */
object Smooth {

  // ---------------- Chaikin corner cutting ----------------

  private def chaikinOpen(cs: Array[Double]): Array[Double] = {
    val n = cs.length / 2
    if (n < 3) return cs.clone()
    val out = new Array[Double]((2 * (n - 1) + 2) * 2)
    out(0) = cs(0); out(1) = cs(1)
    var i = 0; var m = 2
    while (i < n - 1) {
      val ax = cs(2 * i); val ay = cs(2 * i + 1)
      val bx = cs(2 * i + 2); val by = cs(2 * i + 3)
      out(m) = ax + 0.25 * (bx - ax); out(m + 1) = ay + 0.25 * (by - ay)
      out(m + 2) = ax + 0.75 * (bx - ax); out(m + 3) = ay + 0.75 * (by - ay)
      m += 4
      i += 1
    }
    out(m) = cs(2 * n - 2); out(m + 1) = cs(2 * n - 1)
    out
  }

  /** Closed ring (stored with duplicate closing vertex). */
  private def chaikinRing(cs: Array[Double]): Array[Double] = {
    val n = cs.length / 2 - 1 // distinct vertices
    if (n < 3) return cs.clone()
    val out = new Array[Double]((2 * n + 1) * 2)
    var i = 0; var m = 0
    while (i < n) {
      val ax = cs(2 * i); val ay = cs(2 * i + 1)
      val bx = cs(2 * i + 2); val by = cs(2 * i + 3)
      out(m) = ax + 0.25 * (bx - ax); out(m + 1) = ay + 0.25 * (by - ay)
      out(m + 2) = ax + 0.75 * (bx - ax); out(m + 3) = ay + 0.75 * (by - ay)
      m += 4
      i += 1
    }
    out(m) = out(0); out(m + 1) = out(1)
    out
  }

  def chaikin(g: Geometry, iters: Int): Geometry = {
    require(iters >= 1 && iters <= 5, s"st_chaikin iterations $iters out of [1, 5]")
    def many(f: Array[Double] => Array[Double], cs: Array[Double]): Array[Double] = {
      var out = cs; var i = 0
      while (i < iters) { out = f(out); i += 1 }
      out
    }
    g match {
      case p: Point => p
      case m: MultiPoint => m
      case l: LineString => LineString(many(chaikinOpen, l.coords))
      case m: MultiLineString => MultiLineString(m.lines.map(many(chaikinOpen, _)))
      case p: Polygon => Polygon(p.rings.map(many(chaikinRing, _)))
      case m: MultiPolygon => MultiPolygon(m.polys.map(_.map(many(chaikinRing, _))))
      case c: GeometryCollection => GeometryCollection(c.geoms.map(chaikin(_, iters)))
      case z: GeometryZM => chaikin(GeometryZM.strip(z), iters)
    }
  }

  // ---------------- polylabel (pole of inaccessibility) ----------------

  private def ringsOf(g: Geometry): Array[Array[Array[Double]]] = g match {
    case p: Polygon => Array(p.rings)
    case m: MultiPolygon => m.polys
    case z: GeometryZM => ringsOf(GeometryZM.strip(z))
    case other => throw new IllegalArgumentException(
      s"st_inscribedcircle expects polygonal input, got ${other.getClass.getSimpleName}")
  }

  /** Signed distance: + inside, − outside; |·| = distance to the nearest
    * ring segment (even-odd containment over all rings of all parts).
    * Package-visible for the SmoothSpec grid cross-check. */
  private[geom] def signedDist(parts: Array[Array[Array[Double]]], x: Double, y: Double): Double = {
    var inside = false
    var minD2 = Double.MaxValue
    parts.foreach(_.foreach { ring =>
      var i = 0
      val n = ring.length / 2 - 1
      while (i < n) {
        val ax = ring(2 * i); val ay = ring(2 * i + 1)
        val bx = ring(2 * i + 2); val by = ring(2 * i + 3)
        if ((ay > y) != (by > y) && x < (bx - ax) * (y - ay) / (by - ay) + ax)
          inside = !inside
        // point-segment squared distance
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        val t = if (len2 == 0) 0.0
          else math.max(0.0, math.min(1.0, ((x - ax) * dx + (y - ay) * dy) / len2))
        val px = ax + t * dx - x; val py = ay + t * dy - y
        val d2 = px * px + py * py
        if (d2 < minD2) minD2 = d2
        i += 1
      }
    })
    val d = math.sqrt(minD2)
    if (inside) d else -d
  }

  private val SQRT2 = math.sqrt(2.0)

  /** (cx, cy, radius) of the maximum inscribed circle, radius within
    * `precision` of the true maximum. Empty/degenerate input → radius 0
    * at the envelope center. */
  def inscribedCircle(g: Geometry, precision: Double): Array[Double] = {
    require(precision > 0, "st_inscribedcircle precision must be > 0")
    val parts = ringsOf(g).filter(_.nonEmpty)
    val env = g.envelope
    if (parts.isEmpty || env.isEmpty)
      return Array((env.xmin + env.xmax) / 2, (env.ymin + env.ymax) / 2, 0.0)
    val short = math.min(env.width, env.height)
    val cx0 = (env.xmin + env.xmax) / 2; val cy0 = (env.ymin + env.ymax) / 2
    if (short == 0) return Array(cx0, cy0, 0.0)
    // Seed with the classic min-extent grid, but bound the seed COUNT: a
    // sliver envelope (aspect ratio ~1e9) would otherwise allocate
    // aspect-ratio-many cells — each eagerly running signedDist — before
    // the step budget below ever applies. A coarser uniform cover is
    // equally valid for this branch-and-bound (max = d + h·√2 still
    // upper-bounds every point of the cell); shapes with aspect ≤ 2¹⁶
    // keep the exact original seeding.
    val cell = {
      val n0 = math.ceil(env.width / short) * math.ceil(env.height / short)
      val maxSeeds = (1 << 16).toDouble
      if (n0 <= maxSeeds) short
      else {
        var c = short * math.sqrt(n0 / maxSeeds)
        while (math.ceil(env.width / c) * math.ceil(env.height / c) > maxSeeds) c *= 1.5
        c
      }
    }

    final case class Cell(x: Double, y: Double, h: Double) {
      val d: Double = signedDist(parts, x, y)
      val max: Double = d + h * SQRT2
    }
    // deterministic order: max desc, then x, y asc
    implicit val ord: Ordering[Cell] =
      Ordering.by((c: Cell) => (-c.max, c.x, c.y))
    val queue = scala.collection.mutable.PriorityQueue.empty[Cell](ord.reverse)

    var best = Cell(cx0, cy0, 0) // envelope center seed
    val h0 = cell / 2
    var gx = env.xmin
    while (gx < env.xmax) {
      var gy = env.ymin
      while (gy < env.ymax) {
        queue += Cell(gx + h0, gy + h0, h0)
        gy += cell
      }
      gx += cell
    }
    var steps = 0
    while (queue.nonEmpty && steps < 2000000) {
      val c = queue.dequeue()
      if (c.d > best.d) best = c
      if (c.max - best.d > precision) {
        val h = c.h / 2
        queue += Cell(c.x - h, c.y - h, h)
        queue += Cell(c.x + h, c.y - h, h)
        queue += Cell(c.x - h, c.y + h, h)
        queue += Cell(c.x + h, c.y + h, h)
      }
      steps += 1
    }
    // the refinement is O(extent/precision) when the optimum is a
    // CONTINUUM (e.g. an elongated rectangle's centerline), so a fixed
    // budget must exist; report the certified bound actually achieved so
    // the caller knows how coarse a precision WOULD converge
    require(queue.isEmpty || queue.head.max - best.d <= precision,
      f"st_inscribedcircle exhausted its step budget before certifying precision=$precision%g " +
        f"(radius is correct within ${queue.head.max - best.d}%g). Cost grows ~extent/precision " +
        "when the optimum region is a continuum (elongated shapes) — use a precision at least " +
        "the reported bound, or simplify the shape.")
    Array(best.x, best.y, math.max(0.0, best.d))
  }
}
