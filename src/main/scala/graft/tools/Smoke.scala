package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sql.GraftFunctions

/**
 * Smoke drive: exercises the library end-to-end through its public
 * surface (registered SQL functions on a real SparkSession over the
 * driver testdata). Run: sbt "runMain graft.tools.Smoke"
 */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)

    // geometry expressions over SQL, end to end through Catalyst + codegen
    spark.sql("""
      SELECT st_aswkt(st_buffer(st_geomfromwkt('POINT (1 2)'), 1.0d)) AS buf_wkt,
             st_area(st_buffer(st_geomfromwkt('POINT (0 0)'), 2.0d)) AS buf_area,
             st_intersects(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                           st_geomfromwkt('POINT (2 2)')) AS pip,
             st_relate(st_geomfromwkt('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                       st_geomfromwkt('POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))')) AS de9im,
             st_cellid(12.5d, 41.9d, 12) AS cell,
             st_tile_x(12.5d, 8) AS tx, st_tile_y(41.9d, 8) AS ty
    """).show(20, 60)

    // over a real table: distance + cell join shape on lineitem-derived points
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT count(*) AS n,
             count(DISTINCT st_cellid(cast(l_partkey % 360 - 180 AS DOUBLE),
                                      cast(l_suppkey % 170 - 85 AS DOUBLE), 10)) AS cells
      FROM lineitem
    """).show()

    // image kernels end-to-end: synth -> encode -> decode -> phash/psnr in SQL
    import graft.img.Images
    val rgb = Images.synthRgb(7L, 32, 32)
    val png = Images.encode(32, 32, rgb, "png")
    val jpg = Images.encode(32, 32, rgb, "jpg")
    import spark.implicits._
    Seq((png, jpg)).toDF("png", "jpg").createOrReplaceTempView("imgs")
    spark.sql("""
      SELECT img_width(png) w, img_height(png) h, img_phash(png) ph_png,
             bit_hamming(img_phash(png), img_phash(jpg)) ph_dist,
             img_psnr(png, jpg) psnr_db
      FROM imgs
    """).show(truncate = false)

    // aggregate + explode (client-stream fold + server-stream shapes)
    spark.sql("""
      SELECT st_aswkt(st_convexhull_agg(st_point(cast(x AS DOUBLE), cast(x*x % 7 AS DOUBLE)))) hull
      FROM range(10) t(x)
    """).show(20, 60)
    spark.sql("""
      SELECT count(*) n FROM (
        SELECT explode(st_cover(st_geomfromwkt('POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))'), 10)) c)
    """).show()

    // tile job + icelite snapshot + resume-read path
    {
      import graft.data.GeoTables
      import graft.tile.{IceLite, TileJob}
      GeoTables.ensure(spark, "/root/testdata/sf0.001")
      val root = java.nio.file.Files.createTempDirectory("smoke_tiles").toString
      val snap = TileJob.run(spark, GeoTables.imagesPath("/root/testdata/sf0.001"), root,
        zoom = 6, bucketLevel = 1)
      println(s"tile snapshot: id=${snap.snapshotId} buckets=${snap.buckets.length} " +
        s"rows=${snap.buckets.map(_.rows).sum} snapshots=${IceLite.listSnapshots(root).length}")
      TileJob.readCurrent(spark, root)
        .groupBy("tx", "ty").count().orderBy(org.apache.spark.sql.functions.desc("count"))
        .show(3)
    }

    // collection utilities round-trip
    spark.sql("""
      SELECT st_num_geometries(st_collect(array(
               st_geomfromwkt('POINT (1 2)'),
               st_geomfromwkt('LINESTRING (0 0, 1 1)')))) AS n_parts,
             size(st_dump(st_geomfromwkt('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))'))) AS n_dumped
    """).show()

    // validity + new constructive surface (r4 cont.)
    spark.sql("""
      SELECT st_isvalid(st_geomfromwkt('POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))')) AS bowtie_valid,
             st_isvalid_reason(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS rect_reason,
             size(st_delaunay(st_geomfromwkt('MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 1))'))) AS n_tris,
             size(st_voronoi(st_geomfromwkt('MULTIPOINT ((1 1), (3 3))'))) AS n_cells,
             round(st_area(st_concavehull(st_geomfromwkt('MULTIPOINT ((0 0), (1 0), (1 0.5), (0 0.5), (0.5 0.2))'), 0.75D)) * 100) AS chi_area_pct
    """).show()

    // geodesic direct problem (r4): project 100 km east, azimuth back ≈ 90°+
    spark.sql("""
      SELECT round(st_x(p) * 1e4) / 1e4 AS lon2,
             round(st_azimuth_geodesic(0.0D, 45.0D, st_x(p), st_y(p)) * 1e3) / 1e3 AS az
      FROM (SELECT st_geodesic_project(0.0D, 45.0D, 90.0D, 100000.0D) AS p)
    """).show()

    // r5 surface: fixed-radius predicates, spherical distance, geohash
    spark.sql("""
      SELECT st_dwithin(st_geomfromwkt('POINT (0 0)'), st_geomfromwkt('POINT (3 4)'), 5.0D) AS dw5,
             st_dwithin(st_geomfromwkt('POINT (0 0)'), st_geomfromwkt('POINT (3 4)'), 4.9D) AS dw49,
             st_aswkt(st_expand(st_geomfromwkt('POINT (2 3)'), 1.0D)) AS expanded,
             round(st_distance_sphere(0.0D, 0.0D, 1.0D, 0.0D) / 1000) AS km_per_deg,
             st_geohash(-5.603D, 42.605D, 5) AS gh
    """).show(20, 60)

    // r5 late surface: hex density binning + slippy-tile envelopes
    spark.sql("""
      SELECT st_hexbin(12.5D, 41.9D, 2.5D) AS hex,
             round(st_hexbin_centerx(st_hexbin(12.5D, 41.9D, 2.5D), 2.5D), 3) AS hcx,
             round(st_hexbin_centery(st_hexbin(12.5D, 41.9D, 2.5D), 2.5D), 3) AS hcy,
             st_hexbin(st_hexbin_centerx(st_hexbin(12.5D, 41.9D, 2.5D), 2.5D),
                       st_hexbin_centery(st_hexbin(12.5D, 41.9D, 2.5D), 2.5D), 2.5D)
               = st_hexbin(12.5D, 41.9D, 2.5D) AS hex_roundtrip,
             round(st_area(st_hexbin_geom(st_hexbin(12.5D, 41.9D, 2.5D), 2.5D)), 4) AS hex_area,
             st_aswkt(st_tile_envelope(2, 2L, 1L)) AS tile_env,
             st_contains(st_tile_envelope(8, st_tile_x(12.5D, 8), st_tile_y(41.9D, 8)),
                         st_point(12.5D, 41.9D)) AS tile_contains
    """).show(20, 80)

    // compact multi-level covers: coarse interior + fine boundary, and the
    // point-side ancestor chain that meets a disjoint cover exactly once
    spark.sql("""
      SELECT size(st_cover(st_makeenvelope(0.0D, 40.0D, 8.0D, 46.0D), 12)) AS flat12,
             size(st_cover_compact(st_makeenvelope(0.0D, 40.0D, 8.0D, 46.0D), 5, 12)) AS compact,
             size(st_cell_ancestors(st_cellid(4.0D, 43.0D, 12), 12, 5)) AS chain_len,
             size(array_intersect(st_cell_ancestors(st_cellid(4.0D, 43.0D, 12), 12, 5),
                                  st_cover_compact(st_makeenvelope(0.0D, 40.0D, 8.0D, 46.0D), 5, 12))) AS hits
    """).show()

    println("SMOKE OK")
    spark.stop()
  }
}
