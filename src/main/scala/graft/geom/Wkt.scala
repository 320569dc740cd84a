package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * WKT reader/writer — hand-written recursive descent, zero deps.
 *
 * Behavioral counterpart of ⟨ref(engine): OperatorImportFromWktLocal /
 * OperatorExportToWktLocal + WktParser⟩ (SURVEY.md §2.1 #1/#2).
 *
 * Canonical number formatting (SURVEY §7.5 item 3): integral values are
 * printed without a fractional part ("POINT (1 2)"), everything else uses
 * shortest-roundtrip `Double.toString`. Golden tests pin this.
 */
object Wkt {

  // ---------------- writer ----------------

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, sb)
    sb.toString
  }

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("POINT ")
      if (p.isEmpty) sb.append("EMPTY")
      else { sb.append('('); num(p.x, sb); sb.append(' '); num(p.y, sb); sb.append(')') }
    case m: MultiPoint =>
      sb.append("MULTIPOINT ")
      if (m.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.coords.length) {
          if (i > 0) sb.append(", ")
          sb.append('('); num(m.coords(i), sb); sb.append(' '); num(m.coords(i + 1), sb); sb.append(')')
          i += 2
        }
        sb.append(')')
      }
    case l: LineString =>
      sb.append("LINESTRING ")
      if (l.isEmpty) sb.append("EMPTY") else coordSeq(l.coords, sb)
    case m: MultiLineString =>
      sb.append("MULTILINESTRING ")
      if (m.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.lines.length) {
          if (i > 0) sb.append(", ")
          coordSeq(m.lines(i), sb)
          i += 1
        }
        sb.append(')')
      }
    case p: Polygon =>
      sb.append("POLYGON ")
      if (p.isEmpty) sb.append("EMPTY") else rings(p.rings, sb)
    case m: MultiPolygon =>
      sb.append("MULTIPOLYGON ")
      if (m.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < m.polys.length) {
          if (i > 0) sb.append(", ")
          rings(m.polys(i), sb)
          i += 1
        }
        sb.append(')')
      }
    case c: GeometryCollection =>
      sb.append("GEOMETRYCOLLECTION ")
      if (c.geoms.isEmpty) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < c.geoms.length) {
          if (i > 0) sb.append(", ")
          writeGeom(c.geoms(i), sb)
          i += 1
        }
        sb.append(')')
      }
  }

  private def rings(rs: Array[Array[Double]], sb: java.lang.StringBuilder): Unit = {
    sb.append('(')
    var i = 0
    while (i < rs.length) {
      if (i > 0) sb.append(", ")
      coordSeq(rs(i), sb)
      i += 1
    }
    sb.append(')')
  }

  private def coordSeq(cs: Array[Double], sb: java.lang.StringBuilder): Unit = {
    sb.append('(')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(", ")
      num(cs(i), sb); sb.append(' '); num(cs(i + 1), sb)
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

    def coordSeq(): Array[Double] = {
      expect('(')
      val buf = new ArrayBuffer[Double](16)
      var more = true
      while (more) {
        buf += number(); buf += number()
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
        if (emptyTag()) Point.EMPTY
        else { expect('('); val x = number(); val y = number(); expect(')'); Point(x, y) }
      case "LINESTRING" =>
        if (emptyTag()) LineString(Array.empty) else LineString(coordSeq())
      case "POLYGON" =>
        if (emptyTag()) Polygon(Array.empty) else Polygon(ringList())
      case "MULTIPOINT" =>
        if (emptyTag()) MultiPoint(Array.empty)
        else {
          // accept both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
          expect('(')
          val buf = new ArrayBuffer[Double](16)
          var more = true
          while (more) {
            if (peekChar() == '(') { expect('('); buf += number(); buf += number(); expect(')') }
            else { buf += number(); buf += number() }
            more = tryConsume(',')
          }
          expect(')')
          MultiPoint(buf.toArray)
        }
      case "MULTILINESTRING" =>
        if (emptyTag()) MultiLineString(Array.empty) else MultiLineString(ringList())
      case "MULTIPOLYGON" =>
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
          MultiPolygon(buf.toArray)
        }
      case "GEOMETRYCOLLECTION" =>
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
