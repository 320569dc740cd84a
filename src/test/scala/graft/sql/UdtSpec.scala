package graft.sql

import graft.geom.{Geometry, Ops, Wkt}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GeometryUDT
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset ergonomics: Geometry rides through encoders via the UDT. */
class UdtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Dataset[Zone] round-trips geometries and supports typed transforms") {
    GeometryUDT.register()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val zones = Seq(
      UdtSpec.Zone("a", Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
      UdtSpec.Zone("b", Wkt.read("POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))")),
      UdtSpec.Zone("c", Wkt.read("POINT (1 1)"))
    )
    val ds = spark.createDataset(zones)
    // typed map using the geometry kernels directly
    val areas = ds.map(z => (z.zoneId, Ops.area(z.geom))).collect().toMap
    assert(areas("a") == 16.0 && areas("b") == 4.0 && areas("c") == 0.0)
    // round-trip through parquet (stored as WKB binary)
    val tmp = java.nio.file.Files.createTempDirectory("udt").toString
    ds.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).as[UdtSpec.Zone].collect().sortBy(_.zoneId)
    assert(back.length == 3)
    assert(Wkt.write(back(0).geom) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // salted count helper equals plain count on skewed data
    val skewed = spark.range(10000)
      .selectExpr("CASE WHEN id % 5 = 0 THEN 'hot' ELSE concat('k', id % 37) END AS key", "id")
    val direct = skewed.groupBy("key").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.join.SpatialJoins.saltedCount(skewed, Seq("key"), "id", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(direct == salted)
  }
}

object UdtSpec {
  case class Zone(zoneId: String, geom: Geometry)
}
