package graft.tile

import graft.geom._
import graft.cell.Cells

/**
 * Mapbox-Vector-Tile-style geometry command encoding (the missing output
 * half of a production tiling engine — PostGIS's ST_AsMVTGeom role; the
 * encoding is the PUBLIC MVT 2.1 spec: CommandInteger = (id & 0x7) |
 * (count << 3) with MoveTo=1 / LineTo=2 / ClosePath=7 and zigzag-encoded
 * parameter deltas, cursor persisting across parts).
 *
 * Pipeline per geometry: clip to the lon/lat envelope of slippy tile
 * (z, tx, ty) → quantize each vertex to tile-local integer coords
 * (extent × extent, y screen-down in web-mercator) → drop consecutive
 * duplicate points → drop degenerate parts (< 2 line points / < 3 ring
 * points / zero ring area) → normalize rings (exterior positive screen
 * shoelace area, holes negative — the MVT winding rule) → emit commands.
 *
 * CANONICAL FORM (beyond the spec, for determinism): every ring is
 * rotated to start at its (min py, then min px) vertex, so the encoding
 * is a pure function of the point SET of the ring — independent of the
 * clipper's output vertex order. This makes tile blobs byte-stable
 * across runs/plans (cacheable, dedupable) and lets the DuckDB oracle
 * reproduce rect encodings in closed form (SparkEntry q102).
 *
 * Returns null for geometries that vanish under clip + quantization
 * (the PostGIS contract). Row-parallel, no state — scale is inherited
 * from the surrounding tile job.
 *
 * ⟨ref(engine): no MVT counterpart — the reference serves single
 * geometries over gRPC; tiling output encoding is the Spark-side scale
 * surface this engine adds.⟩
 */
object Mvt {

  @inline def zigzag(v: Int): Int = (v << 1) ^ (v >> 31)
  @inline private def cmd(id: Int, count: Int): Int = (id & 0x7) | (count << 3)

  /** Quantize interleaved lon/lat coords to tile-local ints (half-up),
    * dropping consecutive duplicates; `ring` also drops a duplicate
    * closing vertex. Returns interleaved (px, py) pairs. */
  private def quantize(cs: Array[Double], z: Int, tx: Long, ty: Long,
                       extent: Int, ring: Boolean): Array[Int] = {
    val n2 = 1L << z
    val out = new Array[Int](cs.length)
    var m = 0
    var i = 0
    while (i < cs.length) {
      val px = math.floor((Cells.normX(cs(i)) * n2 - tx) * extent + 0.5).toInt
      val py = math.floor((Cells.normY(cs(i + 1)) * n2 - ty) * extent + 0.5).toInt
      if (m == 0 || out(m - 2) != px || out(m - 1) != py) {
        out(m) = px; out(m + 1) = py; m += 2
      }
      i += 2
    }
    // drop the closing duplicate of a ring (stored closed)
    if (ring && m >= 4 && out(0) == out(m - 2) && out(1) == out(m - 1)) m -= 2
    java.util.Arrays.copyOf(out, m)
  }

  /** Signed double area in screen coords (positive = MVT exterior). */
  private def shoelace2(p: Array[Int]): Long = {
    var s = 0L
    var i = 0
    val n = p.length / 2
    while (i < n) {
      val j = (i + 1) % n
      s += p(2 * i).toLong * p(2 * j + 1) - p(2 * j).toLong * p(2 * i + 1)
      i += 1
    }
    s
  }

  /** Drop ring vertices that lie strictly between collinear neighbours
    * (cross = 0, forward dot > 0) — the clipper can emit them mid-edge,
    * and the canonical form must be a pure function of the ring SHAPE.
    * Spikes (direction reversals) are kept. Iterates to a fixpoint. */
  private def dropCollinear(p0: Array[Int]): Array[Int] = {
    var p = p0
    var changed = true
    while (changed && p.length >= 8) {
      changed = false
      val n = p.length / 2
      val keep = new Array[Boolean](n)
      java.util.Arrays.fill(keep, true)
      var i = 0
      while (i < n) {
        val a = (i + n - 1) % n; val c = (i + 1) % n
        val abx = p(2 * i) - p(2 * a); val aby = p(2 * i + 1) - p(2 * a + 1)
        val bcx = p(2 * c) - p(2 * i); val bcy = p(2 * c + 1) - p(2 * i + 1)
        val cross = abx.toLong * bcy - aby.toLong * bcx
        val dot = abx.toLong * bcx + aby.toLong * bcy
        if (cross == 0L && dot > 0L) { keep(i) = false; changed = true; i = n }
        else i += 1
      }
      if (changed) {
        val out = new Array[Int](p.length - 2)
        var j = 0; var k = 0
        while (j < n) {
          if (keep(j)) { out(2 * k) = p(2 * j); out(2 * k + 1) = p(2 * j + 1); k += 1 }
          j += 1
        }
        p = out
      }
    }
    p
  }

  private def reverse(p: Array[Int]): Array[Int] = {
    val n = p.length / 2
    val out = new Array[Int](p.length)
    var i = 0
    while (i < n) { out(2 * i) = p(2 * (n - 1 - i)); out(2 * i + 1) = p(2 * (n - 1 - i) + 1); i += 1 }
    out
  }

  /** Rotate ring to start at the (min py, then min px) vertex. */
  private def canonStart(p: Array[Int]): Array[Int] = {
    val n = p.length / 2
    var best = 0
    var i = 1
    while (i < n) {
      if (p(2 * i + 1) < p(2 * best + 1) ||
          (p(2 * i + 1) == p(2 * best + 1) && p(2 * i) < p(2 * best))) best = i
      i += 1
    }
    if (best == 0) p
    else {
      val out = new Array[Int](p.length)
      var j = 0
      while (j < n) {
        val s = (best + j) % n
        out(2 * j) = p(2 * s); out(2 * j + 1) = p(2 * s + 1)
        j += 1
      }
      out
    }
  }

  private final class Emitter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    private var cx = 0
    private var cy = 0
    var emitted = false
    def moveTo(pts: Array[Int], upto: Int): Unit = { // first `upto` points
      buf += cmd(1, upto)
      var i = 0
      while (i < upto) { delta(pts(2 * i), pts(2 * i + 1)); i += 1 }
      emitted = true
    }
    def lineTo(pts: Array[Int], from: Int): Unit = {
      val n = pts.length / 2 - from
      buf += cmd(2, n)
      var i = from
      while (i < pts.length / 2) { delta(pts(2 * i), pts(2 * i + 1)); i += 1 }
    }
    def closePath(): Unit = buf += cmd(7, 1)
    @inline private def delta(x: Int, y: Int): Unit = {
      buf += zigzag(x - cx); buf += zigzag(y - cy)
      cx = x; cy = y
    }
    def result: Array[Int] = buf.toArray
  }

  private def emitLine(e: Emitter, p: Array[Int]): Unit =
    if (p.length >= 4) { e.moveTo(p, 1); e.lineTo(p, 1) }

  /** Orient + canonicalize + emit one ring; returns false if degenerate. */
  private def emitRing(e: Emitter, q0: Array[Int], exterior: Boolean): Boolean = {
    val q = dropCollinear(q0)
    if (q.length < 6) return false
    val a2 = shoelace2(q)
    if (a2 == 0) return false
    val oriented = if ((a2 > 0) != exterior) reverse(q) else q
    val p = canonStart(oriented)
    e.moveTo(p, 1); e.lineTo(p, 1); e.closePath()
    true
  }

  private def emitPolygon(e: Emitter, rings: Array[Array[Double]],
                          z: Int, tx: Long, ty: Long, extent: Int): Unit = {
    if (rings.isEmpty) return
    val shell = quantize(rings(0), z, tx, ty, extent, ring = true)
    if (!emitRing(e, shell, exterior = true)) return // shell gone ⇒ holes go too
    var i = 1
    while (i < rings.length) {
      emitRing(e, quantize(rings(i), z, tx, ty, extent, ring = true), exterior = false)
      i += 1
    }
  }

  // ---------------- full tile blob (vector-tile-spec 2.1 protobuf) ----------------

  private final class PbBuf {
    private var buf = new Array[Byte](64)
    private var len = 0
    @inline private def ensure(n: Int): Unit =
      if (len + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def varint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7FL) != 0) { buf(len) = ((v & 0x7F) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = v.toByte; len += 1
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length)
      ensure(b.length); System.arraycopy(b, 0, buf, len, b.length); len += b.length
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Geometry type from a command stream: ClosePath ⇒ POLYGON(3),
    * LineTo ⇒ LINESTRING(2), else POINT(1). */
  def geomType(cmds: Array[Int]): Int = {
    var t = 1
    var i = 0
    while (i < cmds.length) {
      val id = cmds(i) & 0x7; val n = cmds(i) >>> 3
      if (id == 7) return 3
      if (id == 2) t = 2
      i += 1 + 2 * n // id ∈ {1, 2} here — ClosePath returned above
    }
    t
  }

  /**
   * Complete MVT tile blob: one layer ("layer", extent 4096, version 2,
   * no attributes) over (feature id, command stream) pairs — the caller
   * (StAsMvtAgg) passes them already sorted for byte-stability. Proto
   * schema is the public vector-tile-spec 2.1: Tile.layers = field 3;
   * Layer.version/name/features/extent = 15/1/2/5; Feature.id/type/
   * geometry = 1/3/4 (geometry packed).
   */
  def layerBlob(features: Array[(Long, Array[Int])]): Array[Byte] = {
    val layer = new PbBuf
    layer.tag(15, 0); layer.varint(2) // version
    layer.bytes(1, "layer".getBytes("UTF-8")) // name
    layer.tag(5, 0); layer.varint(4096) // extent
    features.foreach { case (id, cmds) =>
      val f = new PbBuf
      f.tag(1, 0); f.varint(id)
      f.tag(3, 0); f.varint(geomType(cmds))
      val g = new PbBuf
      cmds.foreach(c => g.varint(c.toLong & 0xFFFFFFFFL))
      f.bytes(4, g.result)
      layer.bytes(2, f.result)
    }
    val tile = new PbBuf
    tile.bytes(3, layer.result)
    tile.result
  }

  /** MVT command-integer encoding of `g` in tile (z, tx, ty); null if the
    * geometry vanishes under clip + quantization. */
  def encode(g: Geometry, z: Int, tx: Long, ty: Long, extent: Int): Array[Int] = {
    require(z >= 0 && z <= Cells.MAX_LEVEL, s"mvt zoom $z out of range")
    require(extent > 0 && extent <= (1 << 16), s"mvt extent $extent out of range")
    val n = (1L << z).toDouble
    val env = Env(Cells.tileXToLon(tx / n), Cells.tileYToLat((ty + 1) / n),
      Cells.tileXToLon((tx + 1) / n), Cells.tileYToLat(ty / n))
    val clipped = Ops.clip(GeometryZM.strip(g), env)
    if (clipped.isEmpty) return null
    val e = new Emitter
    clipped match {
      case Point(x, y) =>
        e.moveTo(quantize(Array(x, y), z, tx, ty, extent, ring = false), 1)
      case MultiPoint(cs) =>
        val q = quantize(cs, z, tx, ty, extent, ring = false)
        if (q.nonEmpty) e.moveTo(q, q.length / 2)
      case LineString(cs) =>
        emitLine(e, quantize(cs, z, tx, ty, extent, ring = false))
      case MultiLineString(ls) =>
        ls.foreach(cs => emitLine(e, quantize(cs, z, tx, ty, extent, ring = false)))
      case Polygon(rings) =>
        emitPolygon(e, rings, z, tx, ty, extent)
      case MultiPolygon(polys) =>
        polys.foreach(rings => emitPolygon(e, rings, z, tx, ty, extent))
      case other =>
        throw new IllegalArgumentException(
          s"st_asmvt_geom: unsupported geometry type ${other.getClass.getSimpleName}")
    }
    if (e.emitted) e.result else null
  }
}
