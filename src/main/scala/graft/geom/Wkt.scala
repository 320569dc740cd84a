package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * WKT reader/writer — hand-written recursive descent, zero deps.
 * 2D + Z/M vertex attributes ("POINT Z (1 2 3)", "LINESTRING ZM (…)" —
 * round 3; attribute streams ride in [[GeometryZM]]).
 *
 * Behavioral counterpart of ⟨ref(engine): OperatorImportFromWktLocal /
 * OperatorExportToWktLocal + WktParser⟩ (SURVEY.md §2.1 #1/#2).
 *
 * Canonical number formatting (SURVEY §7.5 item 3): integral values are
 * printed without a fractional part ("POINT (1 2)"), everything else uses
 * shortest-roundtrip `Double.toString`. Golden tests pin this. 2D output
 * is byte-identical to rounds 1–2.
 */
object Wkt {

  // ---------------- writer ----------------

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeAny(g, sb)
    sb.toString
  }

  private final class Cur(val zs: Array[Double], val ms: Array[Double]) {
    var i = 0
    def hasZ: Boolean = zs != null
    def hasM: Boolean = ms != null
    def dimsTag: String = if (hasZ && hasM) "ZM " else if (hasM) "M " else if (hasZ) "Z " else ""
  }
  private val CUR2D = new Cur(null, null)

  private def writeAny(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case zm: GeometryZM => writeGeom(zm.base, sb, new Cur(zm.zs, zm.ms))
    case other => writeGeom(other, sb, CUR2D)
  }

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder, c: Cur): Unit = g match {
    case p: Point =>
      sb.append("POINT ").append(c.dimsTag)
      if (p.isEmpty) sb.append("EMPTY")
      else { sb.append('('); vertex(p.x, p.y, sb, c); sb.append(')') }
    case m: MultiPoint =>
      sb.append("MULTIPOINT ").append(c.dimsTag)
      if (m.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.coords.length) {
          if (i > 0) sb.append(", ")
          sb.append('('); vertex(m.coords(i), m.coords(i + 1), sb, c); sb.append(')')
          i += 2
        }
        sb.append(')')
      }
    case l: LineString =>
      sb.append("LINESTRING ").append(c.dimsTag)
      if (l.isEmpty) sb.append("EMPTY") else coordSeq(l.coords, sb, c)
    case m: MultiLineString =>
      sb.append("MULTILINESTRING ").append(c.dimsTag)
      if (m.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.lines.length) {
          if (i > 0) sb.append(", ")
          coordSeq(m.lines(i), sb, c)
          i += 1
        }
        sb.append(')')
      }
    case p: Polygon =>
      sb.append("POLYGON ").append(c.dimsTag)
      if (p.isEmpty) sb.append("EMPTY") else rings(p.rings, sb, c)
    case m: MultiPolygon =>
      sb.append("MULTIPOLYGON ").append(c.dimsTag)
      if (m.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.polys.length) {
          if (i > 0) sb.append(", ")
          rings(m.polys(i), sb, c)
          i += 1
        }
        sb.append(')')
      }
    case col: GeometryCollection =>
      sb.append("GEOMETRYCOLLECTION ")
      if (col.geoms.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < col.geoms.length) {
          if (i > 0) sb.append(", ")
          writeAny(col.geoms(i), sb) // children carry their own Z/M
          i += 1
        }
        sb.append(')')
      }
    case _: GeometryZM => throw new IllegalStateException("nested GeometryZM")
  }

  @inline private def vertex(x: Double, y: Double, sb: java.lang.StringBuilder, c: Cur): Unit = {
    num(x, sb); sb.append(' '); num(y, sb)
    if (c.hasZ) { sb.append(' '); num(if (c.i < c.zs.length) c.zs(c.i) else Double.NaN, sb) }
    if (c.hasM) { sb.append(' '); num(if (c.i < c.ms.length) c.ms(c.i) else Double.NaN, sb) }
    c.i += 1
  }

  private def rings(rs: Array[Array[Double]], sb: java.lang.StringBuilder, c: Cur): Unit = {
    sb.append('(')
    var i = 0
    while (i < rs.length) {
      if (i > 0) sb.append(", ")
      coordSeq(rs(i), sb, c)
      i += 1
    }
    sb.append(')')
  }

  private def coordSeq(cs: Array[Double], sb: java.lang.StringBuilder, c: Cur): Unit = {
    sb.append('(')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(", ")
      vertex(cs(i), cs(i + 1), sb, c)
      i += 2
    }
    sb.append(')')
  }

  /** Canonical double formatting: integral → no fraction; else shortest-roundtrip. */
  def num(d: Double, sb: java.lang.StringBuilder): Unit = {
    if (d == math.rint(d) && math.abs(d) < 1e15 && !java.lang.Double.isInfinite(d))
      sb.append(d.toLong)
    else sb.append(d)
  }

  def fmt(d: Double): String = { val sb = new java.lang.StringBuilder(24); num(d, sb); sb.toString }

  // ---------------- parser ----------------

  def read(s: String): Geometry = {
    val p = new Parser(s)
    val g = p.parseGeometry()
    p.skipWs()
    if (!p.eof) throw new IllegalArgumentException(s"trailing content in WKT at ${p.pos}: '$s'")
    g
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length

    def skipWs(): Unit = while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WKT parse error at $pos: $msg in '$s'")

    def word(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && Character.isLetter(s.charAt(pos))) pos += 1
      if (pos == start) fail("expected keyword")
      s.substring(start, pos).toUpperCase
    }

    def expect(c: Char): Unit = {
      skipWs()
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def peekChar(): Char = { skipWs(); if (eof) fail("unexpected end"); s.charAt(pos) }

    def tryConsume(c: Char): Boolean = {
      skipWs()
      if (!eof && s.charAt(pos) == c) { pos += 1; true } else false
    }

    def number(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && {
        val c = s.charAt(pos)
        (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E'
      }) pos += 1
      if (pos == start) fail("expected number")
      java.lang.Double.parseDouble(s.substring(start, pos))
    }

    /** True if next token is EMPTY (consumed). */
    def emptyTag(): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, "EMPTY", 0, 5)) { pos += 5; true } else false
    }

    // per-geometry dimension state (set right after the type keyword)
    private var hasZ = false
    private var hasM = false
    private var zb: ArrayBuffer[Double] = null
    private var mb: ArrayBuffer[Double] = null

    /** Optional Z / M / ZM tag after the type keyword ("NaN"-proof: EMPTY
      * and coordinates never start with these letters). */
    private def dimsTag(): Unit = {
      hasZ = false; hasM = false; zb = null; mb = null
      skipWs()
      if (!eof) {
        val c = s.charAt(pos)
        if (c == 'Z' || c == 'z') {
          pos += 1
          if (!eof && (s.charAt(pos) == 'M' || s.charAt(pos) == 'm')) { pos += 1; hasM = true }
          hasZ = true
        } else if ((c == 'M' || c == 'm') &&
                   !s.regionMatches(true, pos, "MULTI", 0, 5)) { // not a nested keyword
          pos += 1; hasM = true
        }
      }
      if (hasZ) zb = new ArrayBuffer[Double](16)
      if (hasM) mb = new ArrayBuffer[Double](16)
    }

    @inline private def isNumStart(c: Char): Boolean =
      (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.'

    @inline private def vertexInto(buf: ArrayBuffer[Double]): Unit = {
      buf += number(); buf += number()
      if (!hasZ && !hasM && buf.length == 2) {
        // untagged extra ordinates on the FIRST vertex (PostGIS/JTS accept
        // "POINT (1 2 3)"): 3 ordinates ⇒ Z, 4 ⇒ ZM
        skipWs()
        if (!eof && isNumStart(s.charAt(pos))) {
          hasZ = true; zb = new ArrayBuffer[Double](16); zb += number()
          skipWs()
          if (!eof && isNumStart(s.charAt(pos))) {
            hasM = true; mb = new ArrayBuffer[Double](16); mb += number()
          }
        }
        return
      }
      if (hasZ) zb += number()
      if (hasM) mb += number()
    }

    private def wrap(base: Geometry): Geometry =
      if ((!hasZ && !hasM) || base.isEmpty) base
      else GeometryZM(base,
        if (hasZ) zb.toArray else null,
        if (hasM) mb.toArray else null)

    def coordSeq(): Array[Double] = {
      expect('(')
      val buf = new ArrayBuffer[Double](16)
      var more = true
      while (more) {
        vertexInto(buf)
        more = tryConsume(',')
      }
      expect(')')
      buf.toArray
    }

    def ringList(): Array[Array[Double]] = {
      expect('(')
      val buf = new ArrayBuffer[Array[Double]](4)
      var more = true
      while (more) {
        buf += coordSeq()
        more = tryConsume(',')
      }
      expect(')')
      buf.toArray
    }

    def parseGeometry(): Geometry = word() match {
      case "POINT" =>
        dimsTag()
        if (emptyTag()) Point.EMPTY
        else {
          expect('(')
          val buf = new ArrayBuffer[Double](2)
          vertexInto(buf)
          expect(')')
          wrap(Point(buf(0), buf(1)))
        }
      case "LINESTRING" =>
        dimsTag()
        if (emptyTag()) LineString(Array.empty) else wrap(LineString(coordSeq()))
      case "POLYGON" =>
        dimsTag()
        if (emptyTag()) Polygon(Array.empty) else wrap(Polygon(ringList()))
      case "MULTIPOINT" =>
        dimsTag()
        if (emptyTag()) MultiPoint(Array.empty)
        else {
          // accept both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
          expect('(')
          val buf = new ArrayBuffer[Double](16)
          var more = true
          while (more) {
            if (peekChar() == '(') { expect('('); vertexInto(buf); expect(')') }
            else vertexInto(buf)
            more = tryConsume(',')
          }
          expect(')')
          wrap(MultiPoint(buf.toArray))
        }
      case "MULTILINESTRING" =>
        dimsTag()
        if (emptyTag()) MultiLineString(Array.empty) else wrap(MultiLineString(ringList()))
      case "MULTIPOLYGON" =>
        dimsTag()
        if (emptyTag()) MultiPolygon(Array.empty)
        else {
          expect('(')
          val buf = new ArrayBuffer[Array[Array[Double]]](4)
          var more = true
          while (more) {
            buf += ringList()
            more = tryConsume(',')
          }
          expect(')')
          wrap(MultiPolygon(buf.toArray))
        }
      case "GEOMETRYCOLLECTION" =>
        // a collection-level Z/M tag is consumed and ignored: children
        // declare (and wrap) their own per ISO output practice
        dimsTag()
        hasZ = false; hasM = false
        if (emptyTag()) GeometryCollection(Array.empty)
        else {
          expect('(')
          val buf = new ArrayBuffer[Geometry](4)
          var more = true
          while (more) {
            buf += parseGeometry()
            more = tryConsume(',')
          }
          expect(')')
          GeometryCollection(buf.toArray)
        }
      case other => fail(s"unknown geometry type '$other'")
    }
  }
}
