package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * GeoJSON (RFC 7946) geometry reader/writer with a minimal hand-written
 * JSON walker (exact number parsing, zero deps).
 *
 * Behavioral counterpart of ⟨ref(engine): OperatorImportFromGeoJsonLocal /
 * OperatorExportToGeoJsonLocal⟩ (SURVEY.md §2.1 #5/#6). Geometry objects
 * only (Feature/FeatureCollection are service-layer concerns the
 * reference also leaves to its proto envelope).
 */
object GeoJson {

  // ---------------- writer ----------------

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(96)
    writeAny(g, sb)
    sb.toString
  }

  /** Mutable Z cursor (GeoJSON positions carry Z as the 3rd element; M has
    * no RFC 7946 representation and is dropped on export — documented). */
  private final class ZCur(val zs: Array[Double]) { var i = 0 }
  private val Z2D = new ZCur(null)

  private def writeAny(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case zm: GeometryZM if zm.zs != null => writeGeom(zm.base, sb, new ZCur(zm.zs))
    case zm: GeometryZM => writeGeom(zm.base, sb, Z2D) // M-only: dropped
    case other => writeGeom(other, sb, Z2D)
  }

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder, zc: ZCur): Unit = g match {
    case p: Point =>
      sb.append("{\"type\":\"Point\",\"coordinates\":")
      if (p.isEmpty) sb.append("[]")
      else {
        sb.append('['); Wkt.num(p.x, sb); sb.append(','); Wkt.num(p.y, sb)
        if (zc.zs != null) { sb.append(','); Wkt.num(zc.zs(zc.i), sb); zc.i += 1 }
        sb.append(']')
      }
      sb.append('}')
    case m: MultiPoint =>
      sb.append("{\"type\":\"MultiPoint\",\"coordinates\":")
      coordArray(m.coords, sb, zc); sb.append('}')
    case l: LineString =>
      sb.append("{\"type\":\"LineString\",\"coordinates\":")
      coordArray(l.coords, sb, zc); sb.append('}')
    case m: MultiLineString =>
      sb.append("{\"type\":\"MultiLineString\",\"coordinates\":")
      nested(m.lines, sb, zc); sb.append('}')
    case p: Polygon =>
      sb.append("{\"type\":\"Polygon\",\"coordinates\":")
      nested(p.rings, sb, zc); sb.append('}')
    case m: MultiPolygon =>
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
      var i = 0
      while (i < m.polys.length) {
        if (i > 0) sb.append(',')
        nested(m.polys(i), sb, zc)
        i += 1
      }
      sb.append("]}")
    case c: GeometryCollection =>
      sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
      var i = 0
      while (i < c.geoms.length) {
        if (i > 0) sb.append(',')
        writeAny(c.geoms(i), sb) // children carry their own Z
        i += 1
      }
      sb.append("]}")
    case _: GeometryZM => throw new IllegalStateException("nested GeometryZM")
  }

  private def coordArray(cs: Array[Double], sb: java.lang.StringBuilder, zc: ZCur): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      sb.append('['); Wkt.num(cs(i), sb); sb.append(','); Wkt.num(cs(i + 1), sb)
      if (zc.zs != null) { sb.append(','); Wkt.num(zc.zs(zc.i), sb); zc.i += 1 }
      sb.append(']')
      i += 2
    }
    sb.append(']')
  }

  private def nested(parts: Array[Array[Double]], sb: java.lang.StringBuilder, zc: ZCur): Unit = {
    sb.append('[')
    var i = 0
    while (i < parts.length) {
      if (i > 0) sb.append(',')
      coordArray(parts(i), sb, zc)
      i += 1
    }
    sb.append(']')
  }

  // ---------------- parser ----------------

  def read(s: String): Geometry = new P(s).geometry()

  private[geom] def parseJson(s: String): J = new P(s).value()

  /** Minimal JSON value model, only what GeoJSON/EsriJSON geometries need. */
  private[geom] sealed trait J
  private[geom] case class JStr(v: String) extends J
  private[geom] case class JNum(v: Double) extends J
  private[geom] case class JArr(v: ArrayBuffer[J]) extends J
  private[geom] case class JObj(v: scala.collection.mutable.LinkedHashMap[String, J]) extends J
  private[geom] case object JNull extends J
  private[geom] case class JBool(v: Boolean) extends J

  private[geom] final class P(s: String) {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"GeoJSON parse error at $pos: $msg")
    def ws(): Unit = while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1
    def expect(c: Char): Unit = { ws(); if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'"); pos += 1 }
    def peek(): Char = { ws(); if (pos >= s.length) fail("eof"); s.charAt(pos) }

    def value(): J = peek() match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(str())
      case 't' => pos += 4; JBool(true)
      case 'f' => pos += 5; JBool(false)
      case 'n' => pos += 4; JNull
      case _   => JNum(num())
    }

    def obj(): JObj = {
      expect('{')
      val m = scala.collection.mutable.LinkedHashMap.empty[String, J]
      if (peek() == '}') { pos += 1; return JObj(m) }
      var more = true
      while (more) {
        val k = str(); expect(':'); m(k) = value()
        ws()
        if (pos < s.length && s.charAt(pos) == ',') { pos += 1; more = true } else more = false
      }
      expect('}')
      JObj(m)
    }

    def arr(): JArr = {
      expect('[')
      val b = new ArrayBuffer[J](8)
      if (peek() == ']') { pos += 1; return JArr(b) }
      var more = true
      while (more) {
        b += value()
        ws()
        if (pos < s.length && s.charAt(pos) == ',') { pos += 1; more = true } else more = false
      }
      expect(']')
      JArr(b)
    }

    def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder(16)
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case o => fail(s"bad escape '$o'")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }

    def num(): Double = {
      ws()
      val start = pos
      while (pos < s.length && {
        val c = s.charAt(pos)
        (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E'
      }) pos += 1
      if (pos == start) fail("expected number")
      java.lang.Double.parseDouble(s.substring(start, pos))
    }

    def geometry(): Geometry = toGeom(value())
  }

  private def toGeom(j: J): Geometry = j match {
    case JObj(m) =>
      val t = m.getOrElse("type", throw new IllegalArgumentException("missing 'type'")) match {
        case JStr(v) => v
        case _       => throw new IllegalArgumentException("'type' not a string")
      }
      if (t == "GeometryCollection") {
        val gs = m.get("geometries") match {
          case Some(JArr(b)) => b.map(toGeom).toArray
          case _             => Array.empty[Geometry]
        }
        return GeometryCollection(gs)
      }
      val coords = m.get("coordinates") match {
        case Some(a: JArr) => a
        case _             => throw new IllegalArgumentException("missing 'coordinates'")
      }
      val zb = Array.newBuilder[Double]
      var sawZ = false
      def flatZ(a: JArr): Array[Double] = {
        val out = new Array[Double](a.v.length * 2)
        var i = 0
        while (i < a.v.length) {
          val p = a.v(i).asInstanceOf[JArr]
          out(2 * i) = numAt(p, 0)
          out(2 * i + 1) = numAt(p, 1)
          if (p.v.length >= 3) { zb += numAt(p, 2); sawZ = true }
          else zb += Double.NaN
          i += 1
        }
        out
      }
      def withZ(base: Geometry): Geometry =
        if (sawZ && !base.isEmpty) GeometryZM(base, zb.result(), null) else base
      t match {
        case "Point" =>
          if (coords.v.isEmpty) Point.EMPTY
          else if (coords.v.length >= 3)
            GeometryZM(Point(numAt(coords, 0), numAt(coords, 1)), Array(numAt(coords, 2)), null)
          else Point(numAt(coords, 0), numAt(coords, 1))
        case "MultiPoint"      => withZ(MultiPoint(flatZ(coords)))
        case "LineString"      => withZ(LineString(flatZ(coords)))
        case "MultiLineString" => withZ(MultiLineString(coords.v.map(x => flatZ(x.asInstanceOf[JArr])).toArray))
        case "Polygon"         => withZ(Polygon(coords.v.map(x => flatZ(x.asInstanceOf[JArr])).toArray))
        case "MultiPolygon" =>
          withZ(MultiPolygon(coords.v.map { p =>
            p.asInstanceOf[JArr].v.map(r => flatZ(r.asInstanceOf[JArr])).toArray
          }.toArray))
        case other => throw new IllegalArgumentException(s"unknown GeoJSON type '$other'")
      }
    case _ => throw new IllegalArgumentException("GeoJSON root must be an object")
  }

  private[geom] def numAt(a: JArr, i: Int): Double = a.v(i) match {
    case JNum(v) => v
    case _       => throw new IllegalArgumentException("expected number")
  }

  private[geom] def flatPositions(a: JArr): Array[Double] = {
    val out = new Array[Double](a.v.length * 2)
    var i = 0
    while (i < a.v.length) {
      val p = a.v(i).asInstanceOf[JArr]
      out(2 * i) = numAt(p, 0)
      out(2 * i + 1) = numAt(p, 1)
      i += 1
    }
    out
  }
}
