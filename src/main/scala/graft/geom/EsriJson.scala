package graft.geom

import GeoJson.{J, JArr, JNum, JObj, JNull}

/**
 * Esri REST JSON geometry codec, written from the public ArcGIS REST API
 * "Geometry objects" documentation (SURVEY §2.1 #8, previously scope-cut).
 * Counterpart of ⟨ref(engine): OperatorImportFromJsonLocal /
 * OperatorExportToJsonLocal⟩.
 *
 * Shapes: {"x","y"} point, {"points":[[x,y],…]} multipoint,
 * {"paths":[[[x,y],…],…]} polyline, {"rings":[…]} polygon (shells
 * clockwise / holes counter-clockwise, same convention as ESRI shape).
 * spatialReference is ignored on read (the engine carries SRIDs as a
 * column convention) and omitted on write.
 */
object EsriJson {

  // ---------------- writer ----------------

  def write(g0: Geometry): String = {
    val g = GeometryZM.strip(g0) // Esri JSON codec is 2D-only (documented)
    val sb = new java.lang.StringBuilder(96)
    g match {
      case p: Point =>
        if (p.isEmpty) sb.append("{\"x\":null,\"y\":null}")
        else {
          sb.append("{\"x\":"); Wkt.num(p.x, sb)
          sb.append(",\"y\":"); Wkt.num(p.y, sb); sb.append('}')
        }
      case m: MultiPoint =>
        sb.append("{\"points\":"); coordArray(m.coords, sb); sb.append('}')
      case l: LineString =>
        sb.append("{\"paths\":["); coordArray(l.coords, sb); sb.append("]}")
      case m: MultiLineString =>
        sb.append("{\"paths\":[")
        appendParts(m.lines, sb)
        sb.append("]}")
      case p: Polygon =>
        sb.append("{\"rings\":[")
        appendParts(p.rings.zipWithIndex.map { case (r, i) => orient(r, shell = i == 0) }, sb)
        sb.append("]}")
      case m: MultiPolygon =>
        sb.append("{\"rings\":[")
        appendParts(m.polys.flatMap(poly =>
          poly.zipWithIndex.map { case (r, i) => orient(r, shell = i == 0) }), sb)
        sb.append("]}")
      case _: GeometryCollection =>
        throw new IllegalArgumentException("Esri JSON has no GeometryCollection representation")
    }
    sb.toString
  }

  private def orient(r: Array[Double], shell: Boolean): Array[Double] = {
    val ccw = Ops.signedRingArea(r) > 0
    if (shell == ccw) PlanarOverlay.reverseRing(r) else r
  }

  private def appendParts(parts: Array[Array[Double]], sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < parts.length) {
      if (i > 0) sb.append(',')
      coordArray(parts(i), sb)
      i += 1
    }
  }

  private def coordArray(cs: Array[Double], sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      sb.append('['); Wkt.num(cs(i), sb); sb.append(','); Wkt.num(cs(i + 1), sb); sb.append(']')
      i += 2
    }
    sb.append(']')
  }

  // ---------------- reader ----------------

  def read(s: String): Geometry = GeoJson.parseJson(s) match {
    case JObj(m) =>
      if (m.contains("x")) {
        (m("x"), m.getOrElse("y", JNull)) match {
          case (JNum(x), JNum(y)) => Point(x, y)
          case _                  => Point.EMPTY
        }
      } else if (m.contains("points")) {
        MultiPoint(GeoJson.flatPositions(arr(m("points"))))
      } else if (m.contains("paths")) {
        val parts = arr(m("paths")).v.map(p => GeoJson.flatPositions(arr(p))).toArray
        if (parts.length == 1) LineString(parts(0)) else MultiLineString(parts)
      } else if (m.contains("rings")) {
        EsriShape.groupRings(arr(m("rings")).v.map(r => GeoJson.flatPositions(arr(r))).toArray)
      } else throw new IllegalArgumentException(
        "Esri JSON geometry needs one of x/points/paths/rings")
    case _ => throw new IllegalArgumentException("Esri JSON root must be an object")
  }

  private def arr(j: J): JArr = j match {
    case a: JArr => a
    case _       => throw new IllegalArgumentException("expected JSON array")
  }
}
