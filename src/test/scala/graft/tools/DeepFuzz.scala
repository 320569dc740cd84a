package graft.tools

import graft.geom._
import org.locationtech.jts.io.WKTReader

/**
 * One-off deep differential fuzz vs JTS (the independent oracle on the
 * classpath) — the same generators and comparisons as the CI specs
 * (PlanarOverlaySpec / JtsOracleSpec / BufferSpec) at 100–1000× the
 * iteration count, for idle-capacity bug hunting between rounds. Not
 * part of `sbt test` (runtime scales with N).
 *
 * Usage: runMain graft.tools.DeepFuzz [seed] [N]
 * Prints a one-line summary; exits 1 with the failing WKT pair on any
 * divergence.
 */
object DeepFuzz {

  val reader = new WKTReader()
  var state = 1L
  def frac(): Double = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17
    (state >>> 11).toDouble / (1L << 53).toDouble
  }
  def nextInt(bound: Int): Int = (frac() * bound).toInt

  def star(cx: Double, cy: Double, rMax: Double): Array[Double] = {
    val n = 5 + (frac() * 8).toInt
    val angles = Array.fill(n)(frac() * 2 * math.Pi).sorted
    val ring = new Array[Double]((n + 1) * 2)
    var i = 0
    while (i < n) {
      val r = rMax * (0.25 + 0.75 * frac())
      ring(2 * i) = cx + r * math.cos(angles(i))
      ring(2 * i + 1) = cy + r * math.sin(angles(i))
      i += 1
    }
    ring(2 * n) = ring(0); ring(2 * n + 1) = ring(1)
    ring
  }

  def rect(lim: Int, span: Int): String = {
    val x = nextInt(lim); val y = nextInt(lim)
    val w = 1 + nextInt(span); val h = 1 + nextInt(span)
    s"POLYGON (($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))"
  }
  def tri(lim: Int): String = {
    var ax = 0; var ay = 0; var bx = 0; var by = 0; var cx = 0; var cy = 0
    do {
      ax = nextInt(lim); ay = nextInt(lim); bx = nextInt(lim); by = nextInt(lim)
      cx = nextInt(lim); cy = nextInt(lim)
    } while ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) == 0)
    s"POLYGON (($ax $ay, $bx $by, $cx $cy, $ax $ay))"
  }
  def line(lim: Int): String = {
    val n = 2 + nextInt(4)
    s"LINESTRING (${Seq.fill(n)(s"${nextInt(lim)} ${nextInt(lim)}").mkString(", ")})"
  }
  def point(lim: Int): String = s"POINT (${nextInt(lim)} ${nextInt(lim)})"

  private var fails = 0
  private def check(cond: Boolean, msg: => String): Unit =
    if (!cond) { fails += 1; System.err.println(s"[deepfuzz] ESCAPE: $msg") }

  def overlayCase(wa: String, wb: String, tol: Double): Unit = {
    val ja = reader.read(wa); val jb = reader.read(wb)
    if (!ja.isValid || !jb.isValid) return
    val ga = Wkt.read(wa); val gb = Wkt.read(wb)
    val ops = Seq[(String, () => Double, () => Double)](
      ("INT", () => Ops.area(Overlay.intersection(ga, gb)), () => ja.intersection(jb).getArea),
      ("UNION", () => Ops.area(Overlay.union(ga, gb)), () => ja.union(jb).getArea),
      ("DIFF", () => Ops.area(Overlay.difference(ga, gb)), () => ja.difference(jb).getArea),
      ("XOR", () => Ops.area(Overlay.symDifference(ga, gb)), () => ja.symDifference(jb).getArea))
    ops.foreach { case (name, got, want) =>
      try {
        val g = got(); val w = want()
        check(math.abs(g - w) < tol * math.max(1, w), s"$name a=$wa b=$wb got=$g want=$w")
      } catch {
        case e: Exception => check(cond = false, s"$name a=$wa b=$wb threw ${e.getMessage}")
      }
    }
  }

  def predicateCase(wa: String, wb: String): Unit = {
    val ja = reader.read(wa); val jb = reader.read(wb)
    if (!ja.isValid || !jb.isValid) return
    val oa = Wkt.read(wa); val ob = Wkt.read(wb)
    try {
      // relate is compared on SIMPLE inputs only: for a line that
      // self-crosses exactly ON a polygon boundary point, JTS relate
      // reports dim(I∩B)=1 while JTS's own overlay computes the same
      // intersection as a MULTIPOINT (dim 0, the OGC set answer, which
      // we return) — verified 2026-08-17 (FuzzRepro); JTS contradicts
      // itself there, so it cannot serve as the oracle for that shape.
      if (ja.isSimple && jb.isSimple)
        check(Pred.relate(oa, ob) == ja.relate(jb).toString,
          s"relate a=$wa b=$wb got=${Pred.relate(oa, ob)} want=${ja.relate(jb)}")
      val gd = Pred.distance(oa, ob); val wd = ja.distance(jb)
      check(math.abs(gd - wd) < 1e-9 * math.max(1, wd), s"distance a=$wa b=$wb got=$gd want=$wd")
    } catch {
      case e: Exception => check(cond = false, s"pred a=$wa b=$wb threw ${e.getMessage}")
    }
  }

  def bufferCase(): Unit = {
    val g = Polygon(Array(star(5, 5, 3 + frac() * 2)))
    val w = Wkt.write(g)
    val j = reader.read(w)
    if (!j.isValid) return
    val d = 0.3 + frac() * 1.2
    try {
      val buf = Ops.simplify(Ops.buffer(g, d))
      val want = j.buffer(d).getArea
      val got = Ops.area(buf)
      check(math.abs(got - want) / want < 0.01, s"buffer poly=$w d=$d got=$got want=$want")
      check(Pred.covers(buf, g), s"buffer must cover input: $w d=$d")
    } catch {
      case e: Exception => check(cond = false, s"buffer poly=$w d=$d threw ${e.getMessage}")
    }
  }

  /** Clip vs JTS intersection-with-envelope: AREA/LENGTH comparison only
    * (Sutherland–Hodgman emits zero-width bridges on concave splits —
    * area-neutral, topology-degenerate by design). Lines must be SIMPLE:
    * clip preserves PATH multiplicity (a retraced run keeps both passes,
    * the Esri Clip semantics) while JTS intersection is a point SET that
    * counts a retraced run once — the two only coincide on simple lines. */
  def clipCase(): Unit = {
    val poly = nextInt(2) == 0
    val w = if (poly) Wkt.write(Polygon(Array(star(5 + frac() * 2, 5 + frac() * 2, 3 + frac() * 2))))
            else line(14)
    val j = reader.read(w)
    if (!j.isValid || !j.isSimple) return
    val x0 = frac() * 8; val y0 = frac() * 8
    val env = Env(x0, y0, x0 + 1 + frac() * 6, y0 + 1 + frac() * 6)
    val envWkt = s"POLYGON ((${env.xmin} ${env.ymin}, ${env.xmax} ${env.ymin}, " +
      s"${env.xmax} ${env.ymax}, ${env.xmin} ${env.ymax}, ${env.xmin} ${env.ymin}))"
    val je = reader.read(envWkt)
    try {
      val got = Wkt.read(w) match { case g =>
        val c = Ops.clip(g, env)
        if (poly) Ops.area(c) else Ops.length(c)
      }
      val want = if (poly) j.intersection(je).getArea else j.intersection(je).getLength
      check(math.abs(got - want) < 1e-6 * math.max(1, want),
        s"clip g=$w env=$env got=$got want=$want")
    } catch {
      case e: Exception => check(cond = false, s"clip g=$w env=$env threw ${e.getMessage}")
    }
  }

  def hullCase(): Unit = {
    val w = Wkt.write(Polygon(Array(star(5 + frac() * 2, 5 + frac() * 2, 3 + frac() * 2))))
    val j = reader.read(w)
    if (!j.isValid) return
    try {
      val got = Ops.area(Ops.convexHull(Wkt.read(w)))
      val want = j.convexHull().getArea
      check(math.abs(got - want) < 1e-9 * math.max(1, want), s"hull g=$w got=$got want=$want")
    } catch {
      case e: Exception => check(cond = false, s"hull g=$w threw ${e.getMessage}")
    }
  }

  /** Polygonize vs JTS Polygonizer over the UNION-noded arrangement (ours
    * nodes internally, ST_Polygonize∘ST_Node — see PolygonizeSpec). */
  def polygonizeCase(): Unit = {
    val lines = (0 until 6 + nextInt(8)).map(_ => line(12)).filter { w =>
      val c = reader.read(w).getCoordinates
      !(c.length == 2 && c(0).equals2D(c(1)))
    }
    if (lines.isEmpty) return
    try {
      val faces = Ops.polygonize(GeometryCollection(lines.map(Wkt.read).toArray))
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      val noded = gf.createGeometryCollection(lines.map(reader.read).toArray).union()
      val pz = new org.locationtech.jts.operation.polygonize.Polygonizer()
      pz.add(noded)
      import scala.jdk.CollectionConverters._
      val jpolys = pz.getPolygons.asScala.toSeq
        .map(_.asInstanceOf[org.locationtech.jts.geom.Polygon])
      check(faces.length == jpolys.length,
        s"polygonize count ${faces.length} vs ${jpolys.length}: ${lines.mkString(" | ")}")
      val got = faces.map(Ops.area).sum; val want = jpolys.map(_.getArea).sum
      check(math.abs(got - want) < 1e-9 * math.max(1, want),
        s"polygonize area $got vs $want: ${lines.mkString(" | ")}")
    } catch {
      case e: Exception => check(cond = false, s"polygonize threw ${e.getMessage}: ${lines.mkString(" | ")}")
    }
  }

  /** Subdivide invariants: parts respect the vertex bound and partition
    * the input area (no JTS counterpart — analytic oracle). */
  def subdivideCase(): Unit = {
    val g = Polygon(Array(star(5 + frac() * 2, 5 + frac() * 2, 3 + frac() * 2)))
    val j = reader.read(Wkt.write(g))
    if (!j.isValid) return
    val dense = Ops.densify(g, 0.05 + frac() * 0.2)
    val maxV = 16 + nextInt(48)
    try {
      val parts = Ops.subdivide(dense, maxV)
      check(parts.forall(_.numPoints <= maxV),
        s"subdivide bound maxV=$maxV worst=${parts.map(_.numPoints).max} g=${Wkt.write(g)}")
      val got = parts.map(Ops.area).sum; val want = Ops.area(g)
      check(math.abs(got - want) < 1e-6 * math.max(1, want),
        s"subdivide area $got vs $want g=${Wkt.write(g)} maxV=$maxV")
    } catch {
      case e: Exception => check(cond = false, s"subdivide threw ${e.getMessage} g=${Wkt.write(g)}")
    }
  }

  /** Delaunay vs JTS: area must match; counts too (float coords make exact
    * cocircularity measure-zero). */
  def delaunayCase(): Unit = {
    val m = 4 + nextInt(24)
    val pts = Seq.fill(m)((frac() * 100, frac() * 100)).distinct
    if (pts.length < 3) return
    val wkt = s"MULTIPOINT (${pts.map { case (x, y) => s"($x $y)" }.mkString(", ")})"
    try {
      val tris = Triangulate.delaunay(Wkt.read(wkt))
      val builder = new org.locationtech.jts.triangulate.DelaunayTriangulationBuilder()
      builder.setSites(reader.read(wkt))
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      val jt = builder.getTriangles(gf)
      val want = (0 until jt.getNumGeometries).map(jt.getGeometryN(_).getArea).sum
      val got = tris.map(Ops.area).sum
      check(tris.length == jt.getNumGeometries,
        s"delaunay count ${tris.length} vs ${jt.getNumGeometries}: $wkt")
      check(math.abs(got - want) < 1e-6 * math.max(1, want), s"delaunay area $got vs $want: $wkt")
    } catch {
      case e: Exception => check(cond = false, s"delaunay threw ${e.getMessage}: $wkt")
    }
  }

  /** Voronoi vs JTS: sorted per-cell areas within the clip env + exact
    * partition of the envelope. */
  def voronoiCase(): Unit = {
    val m = 2 + nextInt(10)
    val pts = Seq.fill(m)((1.0 + frac() * 8, 1.0 + frac() * 8)).distinct
    val wkt = s"MULTIPOINT (${pts.map { case (x, y) => s"($x $y)" }.mkString(", ")})"
    try {
      val cells = Triangulate.voronoi(Wkt.read(wkt), Some(Env(0, 0, 10, 10)))
      check(math.abs(cells.map(Ops.area).sum - 100.0) < 1e-9, s"voronoi partition: $wkt")
      val vdb = new org.locationtech.jts.triangulate.VoronoiDiagramBuilder()
      vdb.setSites(reader.read(wkt))
      vdb.setClipEnvelope(new org.locationtech.jts.geom.Envelope(0, 10, 0, 10))
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      val jd = vdb.getDiagram(gf)
      val envPoly = reader.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
      val wantAreas = (0 until jd.getNumGeometries)
        .map(i => jd.getGeometryN(i).intersection(envPoly).getArea).sorted
      val gotAreas = cells.map(Ops.area).sorted.toSeq
      check(gotAreas.length == wantAreas.length &&
        gotAreas.zip(wantAreas).forall { case (a, b) => math.abs(a - b) < 1e-6 },
        s"voronoi areas $gotAreas vs $wantAreas: $wkt")
    } catch {
      case e: Exception => check(cond = false, s"voronoi threw ${e.getMessage}: $wkt")
    }
  }

  /** Discrete Hausdorff + LineMerger parity on random inputs. */
  def utilCase(): Unit = {
    val wa = if (nextInt(2) == 0) rect(10, 5) else line(14)
    val wb = if (nextInt(2) == 0) tri(14) else line(14)
    try {
      val got = Ops.hausdorff(Wkt.read(wa), Wkt.read(wb))
      val want = org.locationtech.jts.algorithm.distance.DiscreteHausdorffDistance
        .distance(reader.read(wa), reader.read(wb))
      check(math.abs(got - want) < 1e-9, s"hausdorff($wa, $wb) $got vs $want")
      // linemerge: merged total length and piece count match JTS
      val segs = Seq.fill(3 + nextInt(4))(line(8))
      val merged = Ops.lineMerge(GeometryCollection(segs.map(Wkt.read).toArray))
      val lm = new org.locationtech.jts.operation.linemerge.LineMerger()
      segs.foreach(w => lm.add(reader.read(w)))
      import scala.jdk.CollectionConverters._
      val jls = lm.getMergedLineStrings.asScala.toSeq
        .map(_.asInstanceOf[org.locationtech.jts.geom.LineString])
      val gotN = merged match {
        case m: MultiLineString => m.lines.length
        case _: LineString => 1
        case _ => 0
      }
      check(gotN == jls.length, s"linemerge count $gotN vs ${jls.length}: ${segs.mkString(" | ")}")
      check(math.abs(Ops.length(merged) - jls.map(_.getLength).sum) < 1e-9,
        s"linemerge length: ${segs.mkString(" | ")}")
    } catch {
      case e: Exception => check(cond = false, s"util threw ${e.getMessage}: $wa $wb")
    }
  }

  /** st_isvalid vs JTS isValid over generators that produce BOTH valid and
    * invalid polygons (stars, random quads incl. bowties, rects with
    * random holes, pairs of rects as multipolygons). */
  def validCase(): Unit = {
    val fixed = nextInt(4) match {
      case 0 => Wkt.write(Polygon(Array(star(5, 5, 3 + frac() * 2))))
      case 1 => // random quad — frequently a bowtie
        val p = (0 until 4).map(_ => s"${nextInt(10)} ${nextInt(10)}")
        s"POLYGON ((${p.mkString(", ")}, ${p.head}))"
      case 2 => // rect with a random (often protruding/crossing) hole
        val hx = nextInt(12) - 2; val hy = nextInt(12) - 2
        s"POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), ($hx $hy, ${hx + 4} $hy, ${hx + 4} ${hy + 4}, $hx ${hy + 4}, $hx $hy))"
      case _ => // two rects — may overlap, touch, nest, or be disjoint
        val x = nextInt(8); val y = nextInt(8)
        s"MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), (($x $y, ${x + 4} $y, ${x + 4} ${y + 4}, $x ${y + 4}, $x $y)))"
    }
    try {
      val j = reader.read(fixed)
      val got = Valid.check(Wkt.read(fixed)).valid
      val want = j.isValid
      check(got == want, s"isvalid $got vs JTS $want: $fixed")
    } catch {
      case e: Exception => check(cond = false, s"isvalid threw ${e.getMessage}: $fixed")
    }
  }

  /** r5 axis: st_dwithin differential vs JTS isWithinDistance on mixed
    * geometry pairs (skipping exact-boundary radii where libm ulps decide),
    * plus st_expand envelope arithmetic. */
  def dwithinCase(): Unit = {
    def rnd(k: Int): String = k match {
      case 0 => point(20); case 1 => line(20)
      case _ => if (nextInt(2) == 0) rect(15, 5) else tri(20)
    }
    val wa = rnd(nextInt(3)); val wb = rnd(nextInt(3))
    val d = frac() * 10
    try {
      val ja = reader.read(wa); val jb = reader.read(wb)
      val ba = Wkb.write(Wkt.read(wa)); val bb = Wkb.write(Wkt.read(wb))
      val got = graft.sql.K.dwithin(ba, bb, d)
      val jd = ja.distance(jb)
      if (math.abs(jd - d) > 1e-9) // away from the ulp boundary
        check(got == ja.isWithinDistance(jb, d),
          s"dwithin($d) $got vs JTS (dist=$jd): $wa | $wb")
      val e = Wkb.read(graft.sql.K.expand(ba, d)).envelope
      val g = Wkt.read(wa).envelope
      check(e.xmin == g.xmin - d && e.ymin == g.ymin - d &&
            e.xmax == g.xmax + d && e.ymax == g.ymax + d,
        s"expand($d) envelope mismatch: $wa")
    } catch {
      case e: Exception => check(cond = false, s"dwithin threw ${e.getMessage}: $wa | $wb")
    }
  }

  /** Ear-clip triangulation vs JTS: area conservation, positive parts,
    * centroid containment; hole-free rings additionally pin the n−2
    * count. Every other case gets a star hole (bridge splicing path). */
  def triangulateCase(): Unit = {
    val shell = star(5 + frac() * 2, 5 + frac() * 2, 3 + frac() * 2)
    val withHole = nextInt(2) == 0
    val wkt =
      if (!withHole) s"POLYGON ((${ringStr(shell)}))"
      else {
        val hole = star(5.5 + frac(), 5.5 + frac(), 0.4 + frac() * 0.4)
        s"POLYGON ((${ringStr(shell)}), (${ringStr(hole)}))"
      }
    val jg = reader.read(wkt)
    if (!jg.isValid) return
    try {
      val tris = Triangulate.triangulatePolygon(Wkt.read(wkt))
      val sum = tris.map(Ops.area).sum
      check(math.abs(sum - jg.getArea) <= 1e-9 * math.max(1.0, jg.getArea),
        s"triangulate area $sum vs ${jg.getArea}: $wkt")
      if (!withHole)
        check(tris.length == shell.length / 2 - 1 - 2,
          s"triangulate count ${tris.length} vs n-2: $wkt")
      tris.foreach { t =>
        check(Ops.area(t) > 0, s"degenerate triangle: $wkt")
        check(jg.covers(reader.read(Wkt.write(Ops.centroid(t)))),
          s"triangle centroid escaped: $wkt")
      }
    } catch {
      case e: Exception => check(cond = false, s"triangulate threw ${e.getMessage}: $wkt")
    }
  }

  private def ringStr(closed: Array[Double]): String =
    closed.grouped(2).map(p => s"${p(0)} ${p(1)}").mkString(", ")

  def main(args: Array[String]): Unit = {
    state = if (args.length > 0) args(0).toLong else 99991L
    val n = if (args.length > 1) args(1).toInt else 50000
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      (i % 15) match {
        case 0 => // concave star overlay (float coords)
          overlayCase(
            Wkt.write(Polygon(Array(star(5 + frac() * 2, 5 + frac() * 2, 3 + frac() * 2)))),
            Wkt.write(Polygon(Array(star(6 + frac() * 2, 6 + frac() * 2, 3 + frac() * 2)))), 1e-6)
        case 1 => // integer-grid degenerate contacts
          val wa = if (nextInt(2) == 0) rect(8, 5) else tri(12)
          val wb = if (nextInt(2) == 0) rect(8, 5) else tri(12)
          overlayCase(wa, wb, 1e-9)
        case 2 => // mixed-type predicates + relate + distance
          def rnd(k: Int): String = k match {
            case 0 => point(20); case 1 => line(20); case _ => if (nextInt(2) == 0) rect(15, 5) else tri(20)
          }
          predicateCase(rnd(nextInt(3)), rnd(nextInt(3)))
        case 3 => bufferCase()
        case 5 => clipCase()
        case 6 => hullCase()
        case 7 => polygonizeCase()
        case 8 => subdivideCase()
        case 9 => delaunayCase()
        case 10 => voronoiCase()
        case 11 => utilCase()
        case 12 => validCase()
        case 13 => dwithinCase()
        case 14 => triangulateCase()
        case _ => // web-mercator magnitude overlay (snap-grid adaptation).
          // Tolerance 1e-5: at 1e7 coordinate magnitude the snap grid is
          // ~2e-6 absolute, so a thin sliver's area differs from JTS's
          // full-precision answer by ~perimeter x grid step — a seed-77788899
          // case sat at 1.2e-6 relative, just over the old 1e-6.
          val s = 1e6
          overlayCase(
            Wkt.write(Polygon(Array(star(5 * s + frac() * 2 * s, 5 * s + frac() * 2 * s, (3 + frac() * 2) * s)))),
            Wkt.write(Polygon(Array(star(6 * s + frac() * 2 * s, 6 * s + frac() * 2 * s, (3 + frac() * 2) * s)))), 1e-5)
      }
      i += 1
      if (i % 10000 == 0) System.err.println(s"[deepfuzz] $i/$n, fails=$fails, ${(System.nanoTime() - t0) / 1e9}%.0f s")
    }
    println(s"""{"tool":"deepfuzz","seed":${args.headOption.getOrElse("99991")},"n":$n,"escapes":$fails,"sec":${(System.nanoTime() - t0) / 1e9}}""")
    if (fails > 0) sys.exit(1)
  }
}
