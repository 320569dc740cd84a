package graft.geom

/**
 * Geometry ADT — the engine's internal geometry model.
 *
 * Design (SURVEY.md §1.2): a sealed ADT over flat interleaved
 * `Array[Double]` coordinate buffers (struct-of-arrays inside a value —
 * the same layout idea the reference engine uses for its attribute
 * streams ⟨ref(engine): com.esri.core.geometry.AttributeStreamOfDbl⟩),
 * which is cache- and codegen-friendly. Coordinates are 2D; per-vertex
 * Z/M attribute streams ride alongside via [[GeometryZM]] (r3+), with
 * interpolation through the vertex-mapped and splitting operators.
 *
 * Type codes match ISO WKB geometry type ids so the WKB codec is a thin
 * layer. Coordinates are interleaved `[x0, y0, x1, y1, ...]`.
 */
sealed trait Geometry extends Serializable {
  /** ISO WKB geometry type id (1=Point .. 7=GeometryCollection). */
  def typeCode: Int
  def isEmpty: Boolean
  /** 0 for puntal, 1 for lineal, 2 for polygonal; -1 for empty. */
  def dimension: Int
  def envelope: Env
  /** Total number of vertices. */
  def numPoints: Int
}

object Geometry {
  val T_POINT = 1
  val T_LINESTRING = 2
  val T_POLYGON = 3
  val T_MULTIPOINT = 4
  val T_MULTILINESTRING = 5
  val T_MULTIPOLYGON = 6
  val T_GEOMETRYCOLLECTION = 7
}

/** Axis-aligned bounding box. Empty iff xmin > xmax. */
final case class Env(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def isEmpty: Boolean = xmin > xmax
  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
  def intersects(o: Env): Boolean =
    !isEmpty && !o.isEmpty &&
      xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
  def contains(x: Double, y: Double): Boolean =
    !isEmpty && x >= xmin && x <= xmax && y >= ymin && y <= ymax
  def containsEnv(o: Env): Boolean =
    !isEmpty && !o.isEmpty &&
      o.xmin >= xmin && o.xmax <= xmax && o.ymin >= ymin && o.ymax <= ymax
  def expand(o: Env): Env =
    if (isEmpty) o
    else if (o.isEmpty) this
    else Env(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
             math.max(xmax, o.xmax), math.max(ymax, o.ymax))
  def buffer(d: Double): Env = Env(xmin - d, ymin - d, xmax + d, ymax + d)
  /** Min distance between envelopes (0 if they intersect). */
  def distance(o: Env): Double = {
    val dx = math.max(0.0, math.max(o.xmin - xmax, xmin - o.xmax))
    val dy = math.max(0.0, math.max(o.ymin - ymax, ymin - o.ymax))
    math.sqrt(dx * dx + dy * dy)
  }
  def toPolygon: Polygon =
    Polygon(Array(Array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin)))
}

object Env {
  val EMPTY: Env = Env(1.0, 1.0, -1.0, -1.0)
  def ofCoords(cs: Array[Double]): Env = {
    if (cs.length < 2) return EMPTY
    var x0 = Double.PositiveInfinity; var y0 = Double.PositiveInfinity
    var x1 = Double.NegativeInfinity; var y1 = Double.NegativeInfinity
    var i = 0
    while (i < cs.length) {
      val x = cs(i); val y = cs(i + 1)
      if (x < x0) x0 = x; if (x > x1) x1 = x
      if (y < y0) y0 = y; if (y > y1) y1 = y
      i += 2
    }
    Env(x0, y0, x1, y1)
  }
  def ofRings(rings: Array[Array[Double]]): Env =
    rings.foldLeft(EMPTY)((e, r) => e.expand(ofCoords(r)))
}

/** Point; empty encoded as (NaN, NaN). */
final case class Point(x: Double, y: Double) extends Geometry {
  def typeCode: Int = Geometry.T_POINT
  def isEmpty: Boolean = java.lang.Double.isNaN(x)
  def dimension: Int = if (isEmpty) -1 else 0
  def envelope: Env = if (isEmpty) Env.EMPTY else Env(x, y, x, y)
  def numPoints: Int = if (isEmpty) 0 else 1
}
object Point { val EMPTY: Point = Point(Double.NaN, Double.NaN) }

final case class MultiPoint(coords: Array[Double]) extends Geometry {
  def typeCode: Int = Geometry.T_MULTIPOINT
  def isEmpty: Boolean = coords.isEmpty
  def dimension: Int = if (isEmpty) -1 else 0
  def envelope: Env = Env.ofCoords(coords)
  def numPoints: Int = coords.length / 2
}

final case class LineString(coords: Array[Double]) extends Geometry {
  def typeCode: Int = Geometry.T_LINESTRING
  def isEmpty: Boolean = coords.isEmpty
  def dimension: Int = if (isEmpty) -1 else 1
  def envelope: Env = Env.ofCoords(coords)
  def numPoints: Int = coords.length / 2
  def isClosed: Boolean = {
    val n = coords.length
    n >= 8 && coords(0) == coords(n - 2) && coords(1) == coords(n - 1)
  }
}

final case class MultiLineString(lines: Array[Array[Double]]) extends Geometry {
  def typeCode: Int = Geometry.T_MULTILINESTRING
  def isEmpty: Boolean = lines.isEmpty
  def dimension: Int = if (isEmpty) -1 else 1
  def envelope: Env = Env.ofRings(lines)
  def numPoints: Int = { var n = 0; var i = 0; while (i < lines.length) { n += lines(i).length / 2; i += 1 }; n }
}

/** rings(0) = shell; rings(1..) = holes. Rings are closed (first == last vertex). */
final case class Polygon(rings: Array[Array[Double]]) extends Geometry {
  def typeCode: Int = Geometry.T_POLYGON
  def isEmpty: Boolean = rings.isEmpty
  def dimension: Int = if (isEmpty) -1 else 2
  def envelope: Env = if (isEmpty) Env.EMPTY else Env.ofCoords(rings(0))
  def numPoints: Int = { var n = 0; var i = 0; while (i < rings.length) { n += rings(i).length / 2; i += 1 }; n }
  def shell: Array[Double] = rings(0)
}

/** polys(i) = rings of polygon i (shell first). */
final case class MultiPolygon(polys: Array[Array[Array[Double]]]) extends Geometry {
  def typeCode: Int = Geometry.T_MULTIPOLYGON
  def isEmpty: Boolean = polys.isEmpty
  def dimension: Int = if (isEmpty) -1 else 2
  def envelope: Env = polys.foldLeft(Env.EMPTY)((e, p) => e.expand(Env.ofRings(p)))
  def numPoints: Int = { var n = 0; var i = 0; while (i < polys.length) { var j = 0; while (j < polys(i).length) { n += polys(i)(j).length / 2; j += 1 }; i += 1 }; n }
}

final case class GeometryCollection(geoms: Array[Geometry]) extends Geometry {
  def typeCode: Int = Geometry.T_GEOMETRYCOLLECTION
  def isEmpty: Boolean = geoms.forall(_.isEmpty)
  def dimension: Int = if (geoms.isEmpty) -1 else geoms.map(_.dimension).max
  def envelope: Env = geoms.foldLeft(Env.EMPTY)((e, g) => e.expand(g.envelope))
  def numPoints: Int = geoms.map(_.numPoints).sum
}

/**
 * Geometry with per-vertex Z and/or M attribute streams (SURVEY §1.1
 * "VertexDescription" row ⟨ref(engine): com.esri.core.geometry
 * .VertexDescription⟩): `zs`/`ms` run parallel to the base geometry's
 * vertices in storage order (rings concatenated shell-first, polygons in
 * sequence — the same order `K.dumpPoints` walks). Either stream may be
 * null (Z-only, M-only, or ZM).
 *
 * Semantics: computational operators are 2D — they receive the stripped
 * `base` (OGC relate/measure semantics ignore Z/M) — while storage, the
 * WKT/WKB/GeoJSON codecs, and the accessor surface (`st_z`, `st_m`,
 * `st_hasz`, `st_hasm`, `st_force2d`) preserve the attribute streams.
 * Collections carry ZM per CHILD (each element wraps itself); the
 * collection node stays plain.
 */
final case class GeometryZM(base: Geometry, zs: Array[Double], ms: Array[Double]) extends Geometry {
  require(!base.isInstanceOf[GeometryZM], "GeometryZM must not nest")
  require((zs == null || zs.length == base.numPoints) &&
          (ms == null || ms.length == base.numPoints),
    s"attribute stream length != vertex count ${base.numPoints}")
  def hasZ: Boolean = zs != null
  def hasM: Boolean = ms != null
  def typeCode: Int = base.typeCode
  def isEmpty: Boolean = base.isEmpty
  def dimension: Int = base.dimension
  def envelope: Env = base.envelope
  def numPoints: Int = base.numPoints
}

object GeometryZM {
  /** 2D view for operators: unwrap, recursing into collection children. */
  def strip(g: Geometry): Geometry = g match {
    case zm: GeometryZM => zm.base
    case c: GeometryCollection if c.geoms.exists(_.isInstanceOf[GeometryZM]) =>
      GeometryCollection(c.geoms.map(strip))
    case other => other
  }
}
