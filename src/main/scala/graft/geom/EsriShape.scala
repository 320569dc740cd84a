package graft.geom

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/**
 * ESRI Shapefile record-content codec (2D), written from the public
 * "ESRI Shapefile Technical Description" whitepaper (July 1998) — the
 * byte layout a shapefile stores per record, which is also what the
 * reference's IMPORT_FROM_ESRI_SHAPE / EXPORT_TO_ESRI_SHAPE operators
 * carry on the wire ⟨ref(engine): OperatorImportFromESRIShapeLocal /
 * OperatorExportToESRIShapeLocal⟩ (SURVEY §2.1 #7, previously scope-cut).
 *
 * Layout (all little-endian): int32 shapeType, then per type:
 *   Point(1):      X, Y doubles
 *   PolyLine(3):   box[4], numParts, numPoints, parts[], points[]
 *   Polygon(5):    same as PolyLine; rings CLOCKWISE = shells,
 *                  counter-clockwise = holes (note: opposite of our
 *                  internal CCW-shell convention — converted both ways)
 *   MultiPoint(8): box[4], numPoints, points[]
 *   Null(0):       empty geometry
 * Z/M variants (11/13/15/18/21/23/25/28) are rejected loudly (2D engine).
 */
object EsriShape {

  val NULL = 0; val POINT = 1; val POLYLINE = 3; val POLYGON = 5; val MULTIPOINT = 8

  // ---------------- writer ----------------

  def write(g0: Geometry): Array[Byte] = GeometryZM.strip(g0) match { // 2D-only codec
    case p: Point =>
      if (p.isEmpty) nullShape()
      else {
        val bb = alloc(4 + 16)
        bb.putInt(POINT); bb.putDouble(p.x); bb.putDouble(p.y)
        bb.array()
      }
    case m: MultiPoint =>
      if (m.isEmpty) nullShape()
      else {
        val bb = alloc(4 + 32 + 4 + m.coords.length * 8)
        bb.putInt(MULTIPOINT); putBox(bb, m.envelope)
        bb.putInt(m.numPoints)
        m.coords.foreach(bb.putDouble)
        bb.array()
      }
    case l: LineString      => writeParts(POLYLINE, Array(l.coords), l.envelope)
    case m: MultiLineString => writeParts(POLYLINE, m.lines, m.envelope)
    case p: Polygon         => writeParts(POLYGON, p.rings.zipWithIndex.map {
      case (r, i) => orientForShape(r, shell = i == 0)
    }, p.envelope)
    case m: MultiPolygon =>
      val rings = m.polys.flatMap(poly => poly.zipWithIndex.map {
        case (r, i) => orientForShape(r, shell = i == 0)
      })
      writeParts(POLYGON, rings, m.envelope)
    case _: GeometryCollection =>
      throw new IllegalArgumentException("ESRI shape has no GeometryCollection representation")
  }

  /** ESRI convention: shells clockwise, holes counter-clockwise. */
  private def orientForShape(r: Array[Double], shell: Boolean): Array[Double] = {
    val ccw = Ops.signedRingArea(r) > 0
    if (shell == ccw) PlanarOverlay.reverseRing(r) else r
  }

  private def writeParts(shapeType: Int, parts: Array[Array[Double]], env: Env): Array[Byte] = {
    if (parts.isEmpty) return nullShape()
    val nPts = parts.map(_.length / 2).sum
    val bb = alloc(4 + 32 + 8 + parts.length * 4 + nPts * 16)
    bb.putInt(shapeType); putBox(bb, env)
    bb.putInt(parts.length); bb.putInt(nPts)
    var off = 0
    parts.foreach { p => bb.putInt(off); off += p.length / 2 }
    parts.foreach(_.foreach(bb.putDouble))
    bb.array()
  }

  private def nullShape(): Array[Byte] = alloc(4).putInt(NULL).array()
  private def alloc(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
  private def putBox(bb: ByteBuffer, e: Env): Unit = {
    bb.putDouble(e.xmin); bb.putDouble(e.ymin); bb.putDouble(e.xmax); bb.putDouble(e.ymax)
  }

  // ---------------- reader ----------------

  def read(bytes: Array[Byte]): Geometry = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.getInt() match {
      case NULL  => GeometryCollection(Array.empty)
      case POINT => Point(bb.getDouble(), bb.getDouble())
      case MULTIPOINT =>
        skipBox(bb)
        val n = bb.getInt()
        val cs = new Array[Double](n * 2)
        var i = 0
        while (i < cs.length) { cs(i) = bb.getDouble(); i += 1 }
        if (n == 1) Point(cs(0), cs(1)) else MultiPoint(cs)
      case POLYLINE =>
        val parts = readParts(bb)
        if (parts.length == 1) LineString(parts(0)) else MultiLineString(parts)
      case POLYGON =>
        groupRings(readParts(bb))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported ESRI shape type $other (2D Point/MultiPoint/PolyLine/Polygon only)")
    }
  }

  private def skipBox(bb: ByteBuffer): Unit = { bb.getDouble(); bb.getDouble(); bb.getDouble(); bb.getDouble() }

  private def readParts(bb: ByteBuffer): Array[Array[Double]] = {
    skipBox(bb)
    val nParts = bb.getInt(); val nPts = bb.getInt()
    val offs = Array.fill(nParts)(bb.getInt()) :+ nPts
    Array.tabulate(nParts) { i =>
      val len = (offs(i + 1) - offs(i)) * 2
      val cs = new Array[Double](len)
      var j = 0
      while (j < len) { cs(j) = bb.getDouble(); j += 1 }
      cs
    }
  }

  /** Regroup a flat ESRI ring list (CW shells / CCW holes) into polygons
    * with our CCW-shell convention; holes attach to the smallest
    * containing shell. */
  private[geom] def groupRings(rings0: Array[Array[Double]]): Geometry = {
    val shells = new ArrayBuffer[(Array[Double], Double, ArrayBuffer[Array[Double]])]()
    val holes = new ArrayBuffer[Array[Double]]()
    rings0.foreach { r =>
      val a = Ops.signedRingArea(r)
      if (a < 0) shells += ((PlanarOverlay.reverseRing(r), -a, new ArrayBuffer[Array[Double]]()))
      else if (a > 0) holes += PlanarOverlay.reverseRing(r) // hole stored CW internally
    }
    if (shells.isEmpty) {
      // tolerate mis-oriented single-ring input (some writers emit CCW)
      if (holes.length == 1) return Polygon(Array(PlanarOverlay.reverseRing(holes(0))))
      if (holes.isEmpty) return Polygon(Array.empty)
    }
    val byArea = shells.sortBy(_._2)
    holes.foreach { h =>
      val (ix, iy) = Pred.interiorPoint(Array(h))
      byArea.find { case (shell, _, _) => Pred.pointInRing(shell, ix, iy) >= 0 } match {
        case Some((_, _, hs)) => hs += h
        case None             => // dangling hole: drop (matches lenient shapefile readers)
      }
    }
    val polys = byArea.map { case (shell, _, hs) => shell +: hs.toArray }.toArray
    if (polys.length == 1) Polygon(polys(0)) else MultiPolygon(polys)
  }
}
