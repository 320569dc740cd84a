package graft.tile

import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** st_asmvt_agg / Mvt.layerBlob: golden protobuf bytes (hand-derived from
  * the public vector-tile-spec 2.1), a varint/field decoder round-trip,
  * geometry-type derivation, and partition independence of the blob. */
class MvtLayerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("golden: single-point layer blob, hand-derived bytes") {
    val blob = Mvt.layerBlob(Array((7L, Array(9, 128, 128))))
    val exp = Array(
      0x1A, 0x19, // Tile.layers, len 25
      0x78, 0x02, // version 2
      0x0A, 0x05, 'l', 'a', 'y', 'e', 'r', // name
      0x28, 0x80, 0x20, // extent 4096
      0x12, 0x0B, // feature, len 11
      0x08, 0x07, // id 7
      0x18, 0x01, // type POINT
      0x22, 0x05, 0x09, 0x80, 0x01, 0x80, 0x01 // packed geometry
    ).map(_.toByte)
    assert(blob.toSeq == exp.toSeq,
      s"got ${blob.map(b => f"${b & 0xFF}%02X").mkString(" ")}")
  }

  test("geometry type derivation from command streams") {
    assert(Mvt.geomType(Array(9, 128, 128)) == 1) // MoveTo only
    assert(Mvt.geomType(Array(9, 0, 0, 10, 2, 2)) == 2) // + LineTo
    assert(Mvt.geomType(Array(9, 0, 0, 26, 2, 0, 0, 2, 1, 0, 15)) == 3) // + ClosePath
  }

  private def readVarint(b: Array[Byte], pos: Array[Int]): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val x = b(pos(0)); pos(0) += 1
      v |= (x & 0x7FL) << shift
      if ((x & 0x80) == 0) return v
      shift += 7
    }
    v
  }

  test("decoder round-trip: ids, types, geometry arrays survive") {
    val feats = Array(
      (3L, Array(9, 50, 50)),
      (11L, Array(9, 0, 0, 26, 8192, 0, 0, 8192, 8191, 0, 15)),
      (12L, Array(9, 2, 2, 10, 4, 4)))
    val blob = Mvt.layerBlob(feats)
    val pos = Array(0)
    assert(readVarint(blob, pos) == 0x1A) // Tile.layers tag
    val layerLen = readVarint(blob, pos)
    assert(pos(0) + layerLen == blob.length)
    var version = -1L; var name = ""; var extent = -1L
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Long])]
    while (pos(0) < blob.length) {
      val tag = readVarint(blob, pos)
      (tag >> 3, tag & 7) match {
        case (15, 0) => version = readVarint(blob, pos)
        case (5, 0) => extent = readVarint(blob, pos)
        case (1, 2) =>
          val n = readVarint(blob, pos).toInt
          name = new String(blob, pos(0), n, "UTF-8"); pos(0) += n
        case (2, 2) =>
          val end = readVarint(blob, pos) + pos(0)
          var id = -1L; var tpe = -1L; var geom = Seq.empty[Long]
          while (pos(0) < end) {
            val ft = readVarint(blob, pos)
            (ft >> 3, ft & 7) match {
              case (1, 0) => id = readVarint(blob, pos)
              case (3, 0) => tpe = readVarint(blob, pos)
              case (4, 2) =>
                val gEnd = readVarint(blob, pos) + pos(0)
                val g = scala.collection.mutable.ArrayBuffer.empty[Long]
                while (pos(0) < gEnd) g += readVarint(blob, pos)
                geom = g.toSeq
              case other => fail(s"unexpected feature field $other")
            }
          }
          got += ((id, tpe, geom))
        case other => fail(s"unexpected layer field $other")
      }
    }
    assert(version == 2 && name == "layer" && extent == 4096)
    assert(got.toSeq == Seq(
      (3L, 1L, Seq(9L, 50L, 50L)),
      (11L, 3L, Seq(9L, 0L, 0L, 26L, 8192L, 0L, 0L, 8192L, 8191L, 0L, 15L)),
      (12L, 2L, Seq(9L, 2L, 2L, 10L, 4L, 4L))))
  }

  test("duplicate feature ids: blob still canonical (secondary command-stream sort)") {
    GraftFunctions.install(spark)
    import spark.implicits._
    // same id, different geometries — a plain id sort would leak the
    // partition-merge order into the bytes
    val rows = Seq((0L, 5L, Array(9, 10, 10)), (0L, 5L, Array(9, 20, 20)),
      (0L, 5L, Array(9, 2, 2)), (0L, 1L, Array(9, 4, 4)))
    def h(df: org.apache.spark.sql.DataFrame): String =
      df.groupBy("tile")
        .agg(md5(call_function("st_asmvt_agg", col("fid"), col("cmds"))).as("h"))
        .head.getString(1)
    val a = h(rows.toDF("tile", "fid", "cmds").repartition(1))
    val b = h(rows.reverse.toDF("tile", "fid", "cmds").repartition(4, col("cmds")))
    assert(a == b, "duplicate-id blobs must not depend on merge order")
  }

  test("null feature id fails loudly (count/blob consistency contract)") {
    GraftFunctions.install(spark)
    import spark.implicits._
    val df = Seq((Some(1L), Array(9, 2, 2)), (None, Array(9, 4, 4)))
      .toDF("fid", "cmds")
    val ex = intercept[Exception] {
      df.agg(call_function("st_asmvt_agg", col("fid"), col("cmds"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("st_asmvt_agg: blob independent of partitioning and input order") {
    GraftFunctions.install(spark)
    import spark.implicits._
    val rows = (0L until 200L).map(i =>
      (i % 5, i, Array(9, (i % 97).toInt * 2, (i % 89).toInt * 2)))
    val base = rows.toDF("tile", "fid", "cmds")
    def blobs(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.groupBy("tile")
        .agg(md5(call_function("st_asmvt_agg", col("fid"), col("cmds"))).as("h"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = blobs(base.repartition(1))
    val b = blobs(base.repartition(13, col("fid")).sortWithinPartitions(desc("fid")))
    assert(a == b)
  }
}
