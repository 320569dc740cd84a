package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/**
 * ISO WKB codec (2D, XDR/NDR on read; NDR on write).
 *
 * WKB doubles as the engine's storage encoding for geometry columns
 * (`BinaryType`), so import ≈ validate (SURVEY.md §2.1 #3/#4). Behavioral
 * counterpart of ⟨ref(engine): OperatorImportFromWkbLocal /
 * OperatorExportToWkbLocal⟩ — written from the ISO/OGC SFA spec, not the
 * reference code.
 *
 * Empty geometries: empty point = POINT(NaN NaN) (PostGIS convention);
 * other types = zero element count.
 */
object Wkb {

  def write(g: Geometry): Array[Byte] = {
    val buf = ByteBuffer.allocate(sizeOf(g)).order(ByteOrder.LITTLE_ENDIAN)
    put(buf, g)
    buf.array()
  }

  private def sizeOf(g: Geometry): Int = g match {
    case _: Point                => 21
    case m: MultiPoint           => 9 + m.numPoints * 21
    case l: LineString           => 9 + 4 + l.coords.length * 8
    case m: MultiLineString      => 9 + m.lines.map(l => 9 + 4 + l.length * 8).sum
    case p: Polygon              => 9 + 4 + p.rings.map(r => 4 + r.length * 8).sum
    case m: MultiPolygon         => 9 + m.polys.map(p => 9 + 4 + p.map(r => 4 + r.length * 8).sum).sum
    case c: GeometryCollection   => 9 + c.geoms.map(sizeOf).sum
  }

  private def put(buf: ByteBuffer, g: Geometry): Unit = {
    buf.put(1: Byte) // NDR
    buf.putInt(g.typeCode)
    g match {
      case p: Point =>
        buf.putDouble(p.x); buf.putDouble(p.y)
      case m: MultiPoint =>
        buf.putInt(m.numPoints)
        var i = 0
        while (i < m.coords.length) {
          buf.put(1: Byte); buf.putInt(Geometry.T_POINT)
          buf.putDouble(m.coords(i)); buf.putDouble(m.coords(i + 1))
          i += 2
        }
      case l: LineString =>
        putCoords(buf, l.coords)
      case m: MultiLineString =>
        buf.putInt(m.lines.length)
        m.lines.foreach { cs =>
          buf.put(1: Byte); buf.putInt(Geometry.T_LINESTRING); putCoords(buf, cs)
        }
      case p: Polygon =>
        buf.putInt(p.rings.length)
        p.rings.foreach(r => putCoords(buf, r))
      case m: MultiPolygon =>
        buf.putInt(m.polys.length)
        m.polys.foreach { rings =>
          buf.put(1: Byte); buf.putInt(Geometry.T_POLYGON)
          buf.putInt(rings.length)
          rings.foreach(r => putCoords(buf, r))
        }
      case c: GeometryCollection =>
        buf.putInt(c.geoms.length)
        c.geoms.foreach(put(buf, _))
    }
  }

  private def putCoords(buf: ByteBuffer, cs: Array[Double]): Unit = {
    buf.putInt(cs.length / 2)
    var i = 0
    while (i < cs.length) { buf.putDouble(cs(i)); i += 1 }
  }

  def read(bytes: Array[Byte]): Geometry = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  private def readGeom(buf: ByteBuffer): Geometry = {
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt()
    if ((rawType & 0x80000000) != 0 || (rawType & 0x40000000) != 0)
      throw new IllegalArgumentException(
        s"unsupported WKB type $rawType: EWKB Z/M flag set (2D ISO WKB only)")
    val t = rawType & 0x1FFFFFFF
    if ((rawType & 0x20000000) != 0) buf.getInt() // tolerate + skip EWKB SRID
    if (t < 1 || t > 7) // 2D only: 1001-style Z/M ids rejected loudly
      throw new IllegalArgumentException(s"unsupported WKB type $rawType (2D ISO WKB only)")
    t match {
      case Geometry.T_POINT =>
        Point(buf.getDouble(), buf.getDouble())
      case Geometry.T_LINESTRING =>
        LineString(readCoords(buf))
      case Geometry.T_POLYGON =>
        val n = buf.getInt()
        Polygon(Array.fill(n)(readCoords(buf)))
      case Geometry.T_MULTIPOINT =>
        val n = buf.getInt()
        val cs = new Array[Double](n * 2)
        var i = 0
        while (i < n) {
          val sub = readGeom(buf).asInstanceOf[Point]
          cs(2 * i) = sub.x; cs(2 * i + 1) = sub.y
          i += 1
        }
        MultiPoint(cs)
      case Geometry.T_MULTILINESTRING =>
        val n = buf.getInt()
        MultiLineString(Array.fill(n)(readGeom(buf).asInstanceOf[LineString].coords))
      case Geometry.T_MULTIPOLYGON =>
        val n = buf.getInt()
        MultiPolygon(Array.fill(n)(readGeom(buf).asInstanceOf[Polygon].rings))
      case Geometry.T_GEOMETRYCOLLECTION =>
        val n = buf.getInt()
        GeometryCollection(Array.fill(n)(readGeom(buf)))
      case other =>
        throw new IllegalArgumentException(s"unknown WKB geometry type $other")
    }
  }

  private def readCoords(buf: ByteBuffer): Array[Double] = {
    val n = buf.getInt()
    val cs = new Array[Double](n * 2)
    var i = 0
    while (i < cs.length) { cs(i) = buf.getDouble(); i += 1 }
    cs
  }
}
