package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader

/** ESRI shape record + Esri JSON codecs (SURVEY §2.1 #7/#8): golden byte
  * layouts pinned from the public shapefile whitepaper, plus round-trip
  * topology equality (via JTS) over a mixed corpus. */
class EsriIoSpec extends AnyFunSuite {

  val reader = new WKTReader()
  def ours(w: String): Geometry = Wkt.read(w)

  test("point shape golden bytes (type 1 + two LE doubles)") {
    val b = EsriShape.write(Point(3.0, -4.5))
    assert(b.length == 20)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() == 1)
    assert(bb.getDouble() == 3.0 && bb.getDouble() == -4.5)
    assert(EsriShape.read(b) == Point(3.0, -4.5))
  }

  test("polygon shape writes clockwise shell, reads back CCW-internal") {
    val p = ours("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))") // CCW source
    val b = EsriShape.write(p)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt() == 5)
    // box
    assert(bb.getDouble() == 0.0 && bb.getDouble() == 0.0 && bb.getDouble() == 4.0 && bb.getDouble() == 4.0)
    assert(bb.getInt() == 1 && bb.getInt() == 5 && bb.getInt() == 0)
    // first two vertices of the CW ring: (0,0) then (0,4)
    assert(bb.getDouble() == 0.0 && bb.getDouble() == 0.0)
    assert(bb.getDouble() == 0.0 && bb.getDouble() == 4.0)
    val back = EsriShape.read(b).asInstanceOf[Polygon]
    assert(Ops.signedRingArea(back.rings(0)) > 0) // internal convention restored
    assert(Ops.area(back) == 16.0)
  }

  test("shape round-trip over mixed corpus preserves topology (JTS equalsTopo)") {
    val corpus = Seq(
      "POINT (7 8)",
      "MULTIPOINT ((1 1), (2 3), (5 0))",
      "LINESTRING (0 0, 3 1, 5 5)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 5, 5 5, 5 2, 2 2))",
      "MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0)), ((5 5, 8 5, 8 8, 5 8, 5 5), (6 6, 6 7, 7 7, 7 6, 6 6)))")
    corpus.foreach { w =>
      val back = EsriShape.read(EsriShape.write(ours(w)))
      assert(reader.read(Wkt.write(back)).equalsTopo(reader.read(w)), s"shape roundtrip $w")
    }
  }

  test("Z/M shape types rejected loudly") {
    val bb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(11) // PointZ
    intercept[IllegalArgumentException] { EsriShape.read(bb.array()) }
  }

  test("esri json golden strings") {
    assert(EsriJson.write(Point(1.5, 2.0)) == "{\"x\":1.5,\"y\":2}")
    assert(EsriJson.write(ours("LINESTRING (0 0, 1 1)")) == "{\"paths\":[[[0,0],[1,1]]]}")
    val poly = EsriJson.write(ours("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(poly.startsWith("{\"rings\":[[[0,0],[0,4]"), poly) // clockwise
    assert(EsriJson.read("{\"x\":null,\"y\":null}").isEmpty)
    assert(EsriJson.read("{\"x\":1,\"y\":2,\"spatialReference\":{\"wkid\":4326}}") == Point(1.0, 2.0))
  }

  test("esri json round-trip over mixed corpus") {
    val corpus = Seq(
      "POINT (7 8)",
      "MULTIPOINT ((1 1), (2 3))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 5, 5 5, 5 2, 2 2))",
      "MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0)), ((5 5, 8 5, 8 8, 5 8, 5 5)))")
    corpus.foreach { w =>
      val back = EsriJson.read(EsriJson.write(ours(w)))
      assert(reader.read(Wkt.write(back)).equalsTopo(reader.read(w)), s"esrijson roundtrip $w")
    }
  }
}
