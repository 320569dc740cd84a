package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/**
 * ISO WKB codec (XDR/NDR on read; NDR on write), 2D + Z/M vertex
 * attributes (round 3 — previously an explicit scope cut with loud
 * rejection; now parsed into [[GeometryZM]] attribute streams).
 *
 * WKB doubles as the engine's storage encoding for geometry columns
 * (`BinaryType`), so import ≈ validate (SURVEY.md §2.1 #3/#4). Behavioral
 * counterpart of ⟨ref(engine): OperatorImportFromWkbLocal /
 * OperatorExportToWkbLocal⟩ — written from the ISO/OGC SFA spec, not the
 * reference code.
 *
 * Dimension flags accepted on read: ISO (+1000 Z, +2000 M, +3000 ZM) and
 * EWKB (0x80000000 Z, 0x40000000 M, SRID tolerated and dropped). Writes
 * are ISO. Children of multi-geometries carry the parent's flags; a
 * GeometryCollection's children each carry their own.
 *
 * Empty geometries: empty point = POINT(NaN NaN) (PostGIS convention);
 * other types = zero element count.
 */
object Wkb {

  def write(g: Geometry): Array[Byte] = {
    val buf = ByteBuffer.allocate(sizeOf(g)).order(ByteOrder.LITTLE_ENDIAN)
    put(buf, g)
    require(!buf.hasRemaining, s"WKB size accounting bug: ${buf.remaining()} bytes over")
    buf.array()
  }

  /** Mutable read cursor over a ZM geometry's flat attribute streams. */
  private final class ZmCursor(val zs: Array[Double], val ms: Array[Double]) {
    var i = 0
    def hasZ: Boolean = zs != null
    def hasM: Boolean = ms != null
  }

  private def vsize(hasZ: Boolean, hasM: Boolean): Int =
    8 * (2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0))

  private def sizeOf(g: Geometry): Int = g match {
    case zm: GeometryZM => sizeOf2(zm.base, zm.hasZ, zm.hasM)
    case other => sizeOf2(other, hasZ = false, hasM = false)
  }

  private def sizeOf2(g: Geometry, hasZ: Boolean, hasM: Boolean): Int = {
    val v = vsize(hasZ, hasM)
    g match {
      case _: Point              => 5 + v
      case m: MultiPoint         => 9 + m.numPoints * (5 + v)
      case l: LineString         => 9 + l.numPoints * v
      case m: MultiLineString    => 9 + m.lines.map(l => 9 + (l.length / 2) * v).sum
      case p: Polygon            => 9 + p.rings.map(r => 4 + (r.length / 2) * v).sum
      case m: MultiPolygon       => 9 + m.polys.map(p => 9 + p.map(r => 4 + (r.length / 2) * v).sum).sum
      case c: GeometryCollection => 9 + c.geoms.map(sizeOf).sum
    }
  }

  private def typeWord(code: Int, hasZ: Boolean, hasM: Boolean): Int =
    code + (if (hasZ && hasM) 3000 else if (hasM) 2000 else if (hasZ) 1000 else 0)

  private def put(buf: ByteBuffer, g: Geometry): Unit = g match {
    case zm: GeometryZM => put2(buf, zm.base, new ZmCursor(zm.zs, zm.ms))
    case other => put2(buf, other, new ZmCursor(null, null))
  }

  private def put2(buf: ByteBuffer, g: Geometry, zc: ZmCursor): Unit = {
    buf.put(1: Byte) // NDR
    buf.putInt(typeWord(g.typeCode, zc.hasZ, zc.hasM))
    @inline def attrs(): Unit = {
      if (zc.hasZ) buf.putDouble(if (zc.i < zc.zs.length) zc.zs(zc.i) else Double.NaN)
      if (zc.hasM) buf.putDouble(if (zc.i < zc.ms.length) zc.ms(zc.i) else Double.NaN)
      zc.i += 1
    }
    @inline def coords(cs: Array[Double], withCount: Boolean): Unit = {
      if (withCount) buf.putInt(cs.length / 2)
      var i = 0
      while (i + 1 < cs.length) {
        buf.putDouble(cs(i)); buf.putDouble(cs(i + 1)); attrs()
        i += 2
      }
    }
    g match {
      case p: Point =>
        buf.putDouble(p.x); buf.putDouble(p.y); attrs()
      case m: MultiPoint =>
        buf.putInt(m.numPoints)
        var i = 0
        while (i < m.coords.length) {
          buf.put(1: Byte); buf.putInt(typeWord(Geometry.T_POINT, zc.hasZ, zc.hasM))
          buf.putDouble(m.coords(i)); buf.putDouble(m.coords(i + 1)); attrs()
          i += 2
        }
      case l: LineString =>
        coords(l.coords, withCount = true)
      case m: MultiLineString =>
        buf.putInt(m.lines.length)
        m.lines.foreach { cs =>
          buf.put(1: Byte); buf.putInt(typeWord(Geometry.T_LINESTRING, zc.hasZ, zc.hasM))
          coords(cs, withCount = true)
        }
      case p: Polygon =>
        buf.putInt(p.rings.length)
        p.rings.foreach(r => coords(r, withCount = true))
      case m: MultiPolygon =>
        buf.putInt(m.polys.length)
        m.polys.foreach { rings =>
          buf.put(1: Byte); buf.putInt(typeWord(Geometry.T_POLYGON, zc.hasZ, zc.hasM))
          buf.putInt(rings.length)
          rings.foreach(r => coords(r, withCount = true))
        }
      case c: GeometryCollection =>
        buf.putInt(c.geoms.length)
        c.geoms.foreach(put(buf, _))
      case _: GeometryZM =>
        throw new IllegalStateException("nested GeometryZM")
    }
  }

  def read(bytes: Array[Byte]): Geometry = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  private def wrap(base: Geometry, hasZ: Boolean, hasM: Boolean,
                   zs: Array[Double], ms: Array[Double]): Geometry =
    if ((!hasZ && !hasM) || base.isEmpty) base // empty point: parsed NaN attrs dropped
    else GeometryZM(base, if (hasZ) zs else null, if (hasM) ms else null)

  private def readGeom(buf: ByteBuffer): Geometry = {
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val rawType = buf.getInt()
    val ewkbZ = (rawType & 0x80000000) != 0
    val ewkbM = (rawType & 0x40000000) != 0
    if ((rawType & 0x20000000) != 0) buf.getInt() // tolerate + drop EWKB SRID
    val t0 = rawType & 0x1FFFFFFF
    val isoDims = t0 / 1000
    val t = t0 % 1000
    if (t < 1 || t > 7 || isoDims > 3)
      throw new IllegalArgumentException(s"unknown WKB geometry type $rawType")
    val hasZ = ewkbZ || isoDims == 1 || isoDims == 3
    val hasM = ewkbM || isoDims == 2 || isoDims == 3
    val nAttrs = (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)

    // per-vertex reader: xy into cs, attributes into zb/mb
    def readVerts(n: Int, cs: Array[Double], off: Int,
                  zb: scala.collection.mutable.ArrayBuilder[Double],
                  mb: scala.collection.mutable.ArrayBuilder[Double]): Unit = {
      var i = 0
      while (i < n) {
        cs(off + 2 * i) = buf.getDouble(); cs(off + 2 * i + 1) = buf.getDouble()
        if (hasZ) zb += buf.getDouble()
        if (hasM) mb += buf.getDouble()
        i += 1
      }
    }
    val zb = Array.newBuilder[Double]
    val mb = Array.newBuilder[Double]
    // Multi-geometry dimensionality can legally live on the CHILD headers
    // only (EWKB writers differ); derive the wrap flags as parent OR child,
    // and reject mixed child dimensionality at parse time instead of
    // failing late in GeometryZM's stream-length require.
    var childZ = false; var childM = false
    var childSeen = false
    def noteChild(z: Boolean, m: Boolean): Unit = {
      if (childSeen && (z != childZ || m != childM))
        throw new IllegalArgumentException(
          "mixed child Z/M dimensionality in multi-geometry WKB")
      childZ = z; childM = m; childSeen = true
    }
    def coordsWithCount(): Array[Double] = {
      val n = buf.getInt()
      val cs = new Array[Double](n * 2)
      readVerts(n, cs, 0, zb, mb)
      cs
    }

    val base: Geometry = t match {
      case Geometry.T_POINT =>
        val cs = new Array[Double](2)
        readVerts(1, cs, 0, zb, mb)
        Point(cs(0), cs(1))
      case Geometry.T_LINESTRING =>
        LineString(coordsWithCount())
      case Geometry.T_POLYGON =>
        val n = buf.getInt()
        Polygon(Array.fill(n)(coordsWithCount()))
      case Geometry.T_MULTIPOINT =>
        val n = buf.getInt()
        val cs = new Array[Double](n * 2)
        var i = 0
        while (i < n) {
          readGeom(buf) match {
            case p: Point => noteChild(false, false); cs(2 * i) = p.x; cs(2 * i + 1) = p.y
            case zm: GeometryZM =>
              noteChild(zm.hasZ, zm.hasM)
              val p = zm.base.asInstanceOf[Point]
              cs(2 * i) = p.x; cs(2 * i + 1) = p.y
              if (zm.zs != null) zb ++= zm.zs
              if (zm.ms != null) mb ++= zm.ms
            case other => throw new IllegalArgumentException(s"bad multipoint child $other")
          }
          i += 1
        }
        MultiPoint(cs)
      case Geometry.T_MULTILINESTRING =>
        val n = buf.getInt()
        MultiLineString(Array.fill(n)(readGeom(buf) match {
          case l: LineString => noteChild(false, false); l.coords
          case zm: GeometryZM =>
            noteChild(zm.hasZ, zm.hasM)
            if (zm.zs != null) zb ++= zm.zs
            if (zm.ms != null) mb ++= zm.ms
            zm.base.asInstanceOf[LineString].coords
          case other => throw new IllegalArgumentException(s"bad multilinestring child $other")
        }))
      case Geometry.T_MULTIPOLYGON =>
        val n = buf.getInt()
        MultiPolygon(Array.fill(n)(readGeom(buf) match {
          case p: Polygon => noteChild(false, false); p.rings
          case zm: GeometryZM =>
            noteChild(zm.hasZ, zm.hasM)
            if (zm.zs != null) zb ++= zm.zs
            if (zm.ms != null) mb ++= zm.ms
            zm.base.asInstanceOf[Polygon].rings
          case other => throw new IllegalArgumentException(s"bad multipolygon child $other")
        }))
      case Geometry.T_GEOMETRYCOLLECTION =>
        val n = buf.getInt()
        // children wrap themselves; the collection node stays plain
        return GeometryCollection(Array.fill(n)(readGeom(buf)))
      case other =>
        throw new IllegalArgumentException(s"unknown WKB geometry type $other")
    }
    if (childSeen && nAttrs > 0 && !childZ && !childM)
      throw new IllegalArgumentException(
        "multi-geometry WKB declares Z/M on the parent header but its children carry no attributes")
    if (nAttrs == 0 && !childZ && !childM) base
    else wrap(base, hasZ || childZ, hasM || childM, zb.result(), mb.result())
  }
}
