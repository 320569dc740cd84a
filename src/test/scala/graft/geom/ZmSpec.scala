package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Z/M vertex attributes (round 3): codec round-trips for every geometry
  * type, EWKB flag parsing, JTS cross-validation, 2D operator semantics,
  * and the exact-size WKB fix. */
class ZmSpec extends AnyFunSuite {

  private val zWkts = Seq(
    "POINT Z (1 2 3)",
    "LINESTRING Z (0 0 1, 1 1 2, 2 0 3)",
    "POLYGON Z ((0 0 5, 4 0 6, 4 4 7, 0 4 8, 0 0 5))",
    "MULTIPOINT Z ((1 2 9), (3 4 10))",
    "MULTILINESTRING Z ((0 0 1, 1 0 2), (2 2 3, 3 3 4))",
    "MULTIPOLYGON Z (((0 0 1, 1 0 2, 1 1 3, 0 0 1)))",
    "GEOMETRYCOLLECTION (POINT Z (1 2 3), LINESTRING (0 0, 1 1))")

  test("WKT Z / M / ZM round-trips for every type") {
    zWkts.foreach { w =>
      assert(Wkt.write(Wkt.read(w)) == w, s"WKT Z round-trip: $w")
    }
    val m = "POINT M (1 2 4)"
    assert(Wkt.write(Wkt.read(m)) == m)
    val zm = "LINESTRING ZM (0 0 1 10, 1 1 2 20)"
    assert(Wkt.write(Wkt.read(zm)) == zm)
    // 2D output strings unchanged
    assert(Wkt.write(Wkt.read("POINT (1 2)")) == "POINT (1 2)")
  }

  test("WKB round-trips preserve Z/M; 2D WKB is exact-sized (no trailing zeros)") {
    zWkts.foreach { w =>
      val g = Wkt.read(w)
      assert(Wkt.write(Wkb.read(Wkb.write(g))) == w, s"WKB Z round-trip: $w")
    }
    val zm = Wkt.read("LINESTRING ZM (0 0 1 10, 1 1 2 20)")
    assert(Wkt.write(Wkb.read(Wkb.write(zm))) == "LINESTRING ZM (0 0 1 10, 1 1 2 20)")
    // exact sizes: 2D linestring = 9 + 2*16 = 41 (round-2 wrote 4 spare bytes)
    assert(Wkb.write(Wkt.read("LINESTRING (0 0, 1 1)")).length == 41)
    assert(Wkb.write(Wkt.read("POINT (1 2)")).length == 21)
    // Z point = 5 + 24
    assert(Wkb.write(Wkt.read("POINT Z (1 2 3)")).length == 29)
  }

  test("EWKB Z flag (0x80000000) parses as Z") {
    val buf = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(0x80000001).putDouble(1).putDouble(2).putDouble(3)
    assert(Wkt.write(Wkb.read(buf.array())) == "POINT Z (1 2 3)")
  }

  test("EWKB multi-geometry Z on CHILD headers only still parses as Z (advisor r3)") {
    // parent = plain MULTIPOINT, children = EWKB Z points (how some EWKB
    // writers emit multis)
    val buf = java.nio.ByteBuffer.allocate(9 + 2 * 29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(4).putInt(2)
    buf.put(1: Byte).putInt(0x80000001).putDouble(1).putDouble(2).putDouble(3)
    buf.put(1: Byte).putInt(0x80000001).putDouble(4).putDouble(5).putDouble(6)
    assert(Wkt.write(Wkb.read(buf.array())) == "MULTIPOINT Z ((1 2 3), (4 5 6))")
  }

  test("EWKB multi-geometry with MIXED child dimensionality is a clear parse error") {
    val buf = java.nio.ByteBuffer.allocate(9 + 29 + 21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(4).putInt(2)
    buf.put(1: Byte).putInt(0x80000001).putDouble(1).putDouble(2).putDouble(3)
    buf.put(1: Byte).putInt(1).putDouble(4).putDouble(5)
    val ex = intercept[IllegalArgumentException](Wkb.read(buf.array()))
    assert(ex.getMessage.contains("mixed child"), ex.getMessage)
  }

  test("EWKB multi-geometry with PARENT-only Z flag is a clear parse error") {
    val buf = java.nio.ByteBuffer.allocate(9 + 2 * 21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(0x80000004).putInt(2)
    buf.put(1: Byte).putInt(1).putDouble(1).putDouble(2)
    buf.put(1: Byte).putInt(1).putDouble(4).putDouble(5)
    val ex = intercept[IllegalArgumentException](Wkb.read(buf.array()))
    assert(ex.getMessage.contains("children carry no attributes"), ex.getMessage)
  }

  test("st_z/st_m accessor semantics: null for missing attribute, throw for non-points") {
    import graft.sql.K
    assert(K.z(Wkb.write(Wkt.read("POINT Z (1 2 3)"))) == 3.0)
    assert(K.z(Wkb.write(Wkt.read("POINT (1 2)"))) == null)
    assert(K.m(Wkb.write(Wkt.read("POINT Z (1 2 3)"))) == null) // Z point, no M
    // non-point: throws whether or not it carries Z (advisor r3 — was null for LINESTRING Z)
    intercept[IllegalArgumentException](K.z(Wkb.write(Wkt.read("LINESTRING (0 0, 1 1)"))))
    intercept[IllegalArgumentException](K.z(Wkb.write(Wkt.read("LINESTRING Z (0 0 1, 1 1 2)"))))
    intercept[IllegalArgumentException](K.m(Wkb.write(Wkt.read("LINESTRING Z (0 0 1, 1 1 2)"))))
  }

  test("CLIP interpolates Z/M at split points; XY bit-equal to the 2D path (r4)") {
    // z ≡ x so the interpolated z must be bit-equal to the clipped x
    val zm = Wkt.read("LINESTRING Z (0 0 0, 10 0 10)").asInstanceOf[GeometryZM]
    val env = Env(2, -1, 8, 1)
    val out = ZmOps.clipZM(zm, env).asInstanceOf[GeometryZM]
    val l = out.base.asInstanceOf[LineString]
    assert(l.coords.toSeq == Seq(2.0, 0.0, 8.0, 0.0))
    assert(out.zs.toSeq == Seq(2.0, 8.0))
    // fully inside: attrs verbatim
    val in = ZmOps.clipZM(zm, Env(-1, -1, 11, 1)).asInstanceOf[GeometryZM]
    assert(in.zs.toSeq == Seq(0.0, 10.0))
    // ZM both interpolate, multi-part output when the line exits and re-enters
    val zz = Wkt.read("LINESTRING ZM (0 0 0 100, 10 0 10 200, 10 5 20 300, 0 5 30 400)")
      .asInstanceOf[GeometryZM]
    val out2 = ZmOps.clipZM(zz, Env(0, -1, 6, 6)).asInstanceOf[GeometryZM]
    assert(out2.base.isInstanceOf[MultiLineString])
    val parts = out2.base.asInstanceOf[MultiLineString].lines
    assert(parts.length == 2)
    assert(out2.zs.toSeq == Seq(0.0, 6.0, 20.0 + 0.4 * 10.0, 30.0)) // z at re-entry x=6: t=0.4 on seg 3
    assert(out2.ms.toSeq == Seq(100.0, 100.0 + 0.6 * 100.0, 300.0 + 0.4 * 100.0, 400.0))
    // XY parity: the 2D view equals clipping the stripped geometry
    val flat = Ops.clip(GeometryZM.strip(zz), Env(0, -1, 6, 6))
    assert(Wkt.write(flat) == Wkt.write(GeometryZM.strip(out2)))
    // points keep attrs; outside points vanish
    val p = Wkt.read("POINT Z (1 2 3)").asInstanceOf[GeometryZM]
    assert(Wkt.write(ZmOps.clipZM(p, Env(0, 0, 5, 5))) == "POINT Z (1 2 3)")
    assert(ZmOps.clipZM(p, Env(10, 10, 11, 11)).isEmpty)
    val mp = Wkt.read("MULTIPOINT Z ((1 1 7), (9 9 8))").asInstanceOf[GeometryZM]
    assert(Wkt.write(ZmOps.clipZM(mp, Env(0, 0, 5, 5))) == "MULTIPOINT Z ((1 1 7))")
  }

  test("CUT interpolates Z/M at blade crossings; XY bit-equal to the 2D path (r4)") {
    val zm = Wkt.read("LINESTRING Z (0 0 0, 10 0 10)").asInstanceOf[GeometryZM]
    val blade = Wkt.read("LINESTRING (5 -1, 5 1)")
    val parts = ZmOps.cutZM(zm, blade)
    assert(parts.length == 2)
    val p0 = parts(0).asInstanceOf[GeometryZM]; val p1 = parts(1).asInstanceOf[GeometryZM]
    assert(p0.zs.toSeq == Seq(0.0, 5.0), "z at the crossing is the lerp at t")
    assert(p1.zs.toSeq == Seq(5.0, 10.0))
    // XY parity with the 2D cut
    val flat = Ops.cut(GeometryZM.strip(zm), blade)
    assert(flat.length == 2)
    flat.zip(parts).foreach { case (f, z) =>
      assert(Wkt.write(f) == Wkt.write(GeometryZM.strip(z)))
    }
    // M-only cut
    val m = Wkt.read("LINESTRING M (0 0 100, 10 0 300)").asInstanceOf[GeometryZM]
    val mp = ZmOps.cutZM(m, blade)
    assert(mp(0).asInstanceOf[GeometryZM].ms.toSeq == Seq(100.0, 200.0))
    assert(mp(1).asInstanceOf[GeometryZM].ms.toSeq == Seq(200.0, 300.0))
  }

  test("st_dumppoints carries Z/M per vertex (r4)") {
    import graft.sql.K
    val wkb = Wkb.write(Wkt.read("LINESTRING Z (0 0 7, 1 1 8)"))
    val pts = K.dumpPoints(wkb)
    assert(pts.length == 2)
    assert(K.z(pts(0)) == 7.0 && K.z(pts(1)) == 8.0)
  }

  test("JTS cross-validation: our WKT Z parses in JTS with the same Z") {
    val rdr = new org.locationtech.jts.io.WKTReader()
    val g = rdr.read("LINESTRING Z (0 0 1, 1 1 2, 2 0 3)")
    val ours = Wkt.read("LINESTRING Z (0 0 1, 1 1 2, 2 0 3)").asInstanceOf[GeometryZM]
    val cs = g.getCoordinates
    (0 until 3).foreach { i =>
      assert(cs(i).getZ == ours.zs(i), s"vertex $i z")
    }
    // and JTS reads what we write
    val jts2 = rdr.read(Wkt.write(ours))
    assert(jts2.getCoordinates()(2).getZ == 3.0)
  }

  test("untagged 3/4-ordinate WKT parses as Z/ZM (PostGIS/JTS style); JTS fuzz") {
    assert(Wkt.write(Wkt.read("POINT (1 2 3)")) == "POINT Z (1 2 3)")
    assert(Wkt.write(Wkt.read("LINESTRING (0 0 1 9, 1 1 2 8)")) == "LINESTRING ZM (0 0 1 9, 1 1 2 8)")
    assert(Wkt.write(Wkt.read("POLYGON ((0 0 1, 1 0 2, 1 1 3, 0 0 1))")) ==
      "POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))")
    // fuzz: random Z linestrings survive our-write → JTS-read and
    // JTS-write → our-read with exact doubles
    var state = 99L
    def rnd(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      val m = (state >>> 11).toDouble / (1L << 53).toDouble
      (m - 0.5) * math.pow(10.0, (state % 7).toInt - 3)
    }
    val rdr = new org.locationtech.jts.io.WKTReader()
    val wtr = new org.locationtech.jts.io.WKTWriter(3)
    (0 until 200).foreach { _ =>
      val n = 2 + (math.abs(state) % 5).toInt
      val cs = Array.fill(n * 2)(rnd())
      val zs = Array.fill(n)(rnd())
      val ours = GeometryZM(LineString(cs), zs, null)
      val jts = rdr.read(Wkt.write(ours))
      (0 until n).foreach { i =>
        assert(jts.getCoordinates()(i).x == cs(2 * i))
        assert(jts.getCoordinates()(i).y == cs(2 * i + 1))
        assert(jts.getCoordinates()(i).getZ == zs(i))
      }
      // JTS-write leg checks OUR PARSER handles JTS's tag/format style;
      // JTS's writer rounds to ~14 sig digits, so compare relatively
      val back = Wkt.read(wtr.write(jts)) match {
        case zm: GeometryZM => zm
        case other => fail(s"JTS output lost Z: ${wtr.write(jts)} -> $other")
      }
      // JTS prints ~16 decimal PLACES (absolute, not sig figs): floor at 1e-15
      def close(a: Double, b: Double): Boolean =
        a == b || math.abs(a - b) <= math.max(1e-15, 1e-12 * math.max(math.abs(a), math.abs(b)))
      val bcs = back.base.asInstanceOf[LineString].coords
      (0 until n).foreach { i =>
        assert(close(bcs(2 * i), cs(2 * i)) && close(bcs(2 * i + 1), cs(2 * i + 1)))
        assert(close(back.zs(i), zs(i)))
      }
    }
  }

  test("GeoJSON: 3rd position element round-trips as Z (M dropped, documented)") {
    val g = Wkt.read("LINESTRING Z (0 0 1, 1 1 2)")
    val json = GeoJson.write(g)
    assert(json.contains("[0,0,1]") && json.contains("[1,1,2]"), json)
    assert(Wkt.write(GeoJson.read(json)) == "LINESTRING Z (0 0 1, 1 1 2)")
    val zm = Wkt.read("POINT ZM (1 2 3 4)")
    assert(Wkt.write(GeoJson.read(GeoJson.write(zm))) == "POINT Z (1 2 3)") // M dropped
  }

  test("vertex-mapped operators PRESERVE Z/M: transform, affine, densify") {
    // transform: xy reprojected, Z carried verbatim
    val zl = Wkt.read("LINESTRING ZM (10 50 100 1, 11 51 200 2)")
    val t = Ops.transform(zl, 4326, 3857)
    val tz = t.asInstanceOf[GeometryZM]
    assert(tz.zs.toSeq == Seq(100.0, 200.0) && tz.ms.toSeq == Seq(1.0, 2.0))
    val back = Ops.transform(t, 3857, 4326).asInstanceOf[GeometryZM]
    assert(back.zs.toSeq == Seq(100.0, 200.0))
    // affine keeps streams too (through the K facade, as SQL would)
    val ab = graft.sql.K.affine(Wkb.write(zl), 2, 0, 0, 2, 1, 1)
    val az = Wkb.read(ab).asInstanceOf[GeometryZM]
    assert(az.zs.toSeq == Seq(100.0, 200.0) && az.base.asInstanceOf[LineString].coords(0) == 21.0)
    // densify: same vertex placement as the 2D path, Z/M linearly interpolated
    val dz = Wkt.read("LINESTRING Z (0 0 0, 10 0 100)")
    val dd = Wkb.read(graft.sql.K.densify(Wkb.write(dz), 2.5)).asInstanceOf[GeometryZM]
    val flat = Ops.densify(GeometryZM.strip(dz), 2.5).asInstanceOf[LineString]
    assert(dd.base.asInstanceOf[LineString].coords.toSeq == flat.coords.toSeq,
      "ZM densify must place vertices exactly like the 2D path")
    assert(dd.zs.toSeq == Seq(0.0, 25.0, 50.0, 75.0, 100.0), dd.zs.toSeq.toString)
    // polygon ring: closing vertex keeps its duplicated attribute
    val pz = Wkt.read("POLYGON Z ((0 0 1, 4 0 2, 4 4 3, 0 0 1))")
    val pd = Wkb.read(graft.sql.K.densify(Wkb.write(pz), 2.0)).asInstanceOf[GeometryZM]
    val ring = pd.base.asInstanceOf[Polygon].rings(0)
    assert(pd.zs.length == ring.length / 2)
    assert(pd.zs.head == 1.0 && pd.zs.last == 1.0)
  }

  test("operators are 2D: Z inputs give identical answers to force2d") {
    val zPoly = Wkt.read("POLYGON Z ((0 0 5, 4 0 6, 4 4 7, 0 4 8, 0 0 5))")
    val flat = GeometryZM.strip(zPoly)
    assert(Ops.area(GeometryZM.strip(zPoly)) == 16.0)
    assert(Pred.intersects(flat, Point(2, 2)))
    // through the K facade (as SQL would): predicates/measures strip
    val zb = Wkb.write(zPoly)
    assert(graft.sql.K.area(zb) == 16.0)
    assert(graft.sql.K.containsXY(zb, 2, 2))
    val dumped = graft.sql.K.dumpPoints(zb)
    assert(dumped.length == 5)
    // force2d strips the attribute stream
    assert(Wkt.write(Wkb.read(graft.sql.K.force2D(zb))) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // accessors
    val pz = graft.sql.K.makePointZ(1, 2, 3)
    assert(graft.sql.K.z(pz) == 3.0 && graft.sql.K.m(pz) == null)
    assert(graft.sql.K.hasZ(pz) && !graft.sql.K.hasM(pz))
    val pzm = graft.sql.K.makePointZM(1, 2, 3, 4)
    assert(graft.sql.K.z(pzm) == 3.0 && graft.sql.K.m(pzm) == 4.0)
  }

  /** Vertices of a base geometry in attribute storage order. */
  private def verts(g: Geometry): Seq[(Double, Double)] = g match {
    case p: Point => if (p.isEmpty) Seq.empty else Seq((p.x, p.y))
    case mp: MultiPoint => mp.coords.grouped(2).map(a => (a(0), a(1))).toSeq
    case l: LineString => l.coords.grouped(2).map(a => (a(0), a(1))).toSeq
    case ml: MultiLineString => ml.lines.toSeq.flatMap(_.grouped(2).map(a => (a(0), a(1))))
    case pg: Polygon => pg.rings.toSeq.flatMap(_.grouped(2).map(a => (a(0), a(1))))
    case mp: MultiPolygon =>
      mp.polys.toSeq.flatMap(_.toSeq.flatMap(_.grouped(2).map(a => (a(0), a(1)))))
    case c: GeometryCollection => c.geoms.toSeq.flatMap(g2 => verts(GeometryZM.strip(g2)))
    case zm: GeometryZM => verts(zm.base)
  }

  test("overlay populates Z through intersection/union/difference (r4): z ≡ x+y survives") {
    // both boundaries carry z = x + y, linear along every axis-aligned
    // edge, so EVERY output vertex (original or edge×edge node) must get
    // exactly z = x + y — exact at vertex hits, exact through the lerp.
    val a = Wkt.read("POLYGON Z ((0 0 0, 4 0 4, 4 4 8, 0 4 4, 0 0 0))")
    val b = Wkt.read("POLYGON Z ((2 2 4, 6 2 8, 6 6 12, 2 6 8, 2 2 4))")
    val wa = Wkb.write(a); val wb = Wkb.write(b)
    def checkXpY(bytes: Array[Byte]): Unit = {
      val g = Wkb.read(bytes)
      val zm = g.asInstanceOf[GeometryZM]
      assert(zm.hasZ && !zm.hasM)
      val vs = verts(zm.base)
      assert(vs.nonEmpty && zm.zs.length == vs.length)
      vs.zip(zm.zs.toSeq).foreach { case ((x, y), z) =>
        assert(z == x + y, s"z at ($x,$y) was $z, expected ${x + y}")
      }
    }
    checkXpY(graft.sql.K.intersection(wa, wb))
    checkXpY(graft.sql.K.unionGeom(wa, wb))
    checkXpY(graft.sql.K.difference(wa, wb))
    checkXpY(graft.sql.K.symDifference(wa, wb))
    // dim-1 shared edge: two squares touching along x=4 → LINESTRING Z
    val c = Wkt.read("POLYGON Z ((4 0 4, 8 0 8, 8 4 12, 4 4 8, 4 0 4))")
    checkXpY(graft.sql.K.intersectionDim(wa, Wkb.write(c), 2))
    // XY bit-parity: the 2D view equals the plain 2D overlay
    val z2d = Wkb.read(graft.sql.K.intersection(wa, wb))
    val flat = Wkb.read(graft.sql.K.intersection(
      graft.sql.K.force2D(wa), graft.sql.K.force2D(wb)))
    assert(Wkt.write(GeometryZM.strip(z2d)) == Wkt.write(flat))
    // mixed: 2D ∩ 2D stays 2D (populate is a no-op)
    assert(!Wkb.read(graft.sql.K.intersection(
      graft.sql.K.force2D(wa), graft.sql.K.force2D(wb))).isInstanceOf[GeometryZM])
    // one-sided Z: result still carries Z, populated from A's boundary
    val oneSided = Wkb.read(graft.sql.K.intersection(wa, graft.sql.K.force2D(wb)))
      .asInstanceOf[GeometryZM]
    assert(oneSided.hasZ)
    // vertices ON a's boundary are exact; B-only vertices take nearest-A
    verts(oneSided.base).zip(oneSided.zs.toSeq).foreach { case ((x, y), z) =>
      if (x == 4.0 || y == 4.0 || x == 0.0 || y == 0.0) assert(z == x + y)
      else assert(z >= 0 && z <= 8, s"nearest-boundary z out of range at ($x,$y): $z")
    }
  }

  test("polygon CLIP populates Z: boundary vertices exact, corners nearest-boundary (r4)") {
    val a = Wkt.read("POLYGON Z ((0 0 0, 4 0 4, 4 4 8, 0 4 4, 0 0 0))").asInstanceOf[GeometryZM]
    // window covering everything: all vertices are exact hits
    val full = ZmOps.clipZM(a, Env(-1, -1, 5, 5)).asInstanceOf[GeometryZM]
    verts(full.base).zip(full.zs.toSeq).foreach { case ((x, y), z) => assert(z == x + y) }
    // half-window: result rect (2,0)-(4,4); every vertex lies ON a's boundary
    val half = ZmOps.clipZM(a, Env(2, -1, 5, 5)).asInstanceOf[GeometryZM]
    verts(half.base).zip(half.zs.toSeq).foreach { case ((x, y), z) => assert(z == x + y) }
    // interior corner (2,2): equidistant to bottom (2,0,z=2) and left
    // (0,2,z=2) edges — both interpolate to 2, so the rule is unambiguous here
    val corner = ZmOps.clipZM(a, Env(2, 2, 5, 5)).asInstanceOf[GeometryZM]
    val cz = verts(corner.base).zip(corner.zs.toSeq).toMap
    assert(cz((2.0, 2.0)) == 2.0)
    assert(cz((4.0, 4.0)) == 8.0 && cz((4.0, 2.0)) == 6.0 && cz((2.0, 4.0)) == 6.0)
  }
}
