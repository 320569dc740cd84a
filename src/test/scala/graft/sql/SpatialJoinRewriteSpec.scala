package graft.sql

import graft.data.GeoTables
import graft.join.SpatialJoins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The naive PIP join is auto-rewritten to the cell equi-join and returns
  * identical rows to both the manual API and a brute-force evaluation. */
class SpatialJoinRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join on st_intersects_xy alone plans as a hash join with identical results") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val sfDir = "/root/testdata/sf0.001"
    GeoTables.ensure(spark, sfDir)
    val images = GeoTables.images(spark, sfDir).select("image_id", "lon", "lat")
    val zones = GeoTables.zones(spark, sfDir)
      .withColumn("zone_geom", call_function("st_geomfromwkt", col("wkt")))
      .select("zone_id", "zone_geom")

    val naive = images.join(zones,
      call_function("st_intersects_xy", col("zone_geom"), col("lon"), col("lat")))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rewrite did not fire:\n$plan")

    val got = naive.select("zone_id", "image_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = SpatialJoins.pipJoin(GeoTables.images(spark, sfDir), GeoTables.zones(spark, sfDir))
      .select("zone_id", "image_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)

    // flipped sides also rewrite
    val flipped = zones.join(images,
      call_function("st_intersects_xy", col("zone_geom"), col("lon"), col("lat")))
    val planF = flipped.queryExecution.executedPlan.toString
    assert(!planF.contains("BroadcastNestedLoopJoin") && !planF.contains("CartesianProduct"))
    val gotF = flipped.select("zone_id", "image_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotF == want)

    // st_contains_xy rewrites too
    val viaContains = images.join(zones,
      call_function("st_contains_xy", col("zone_geom"), col("lon"), col("lat")))
    val planC = viaContains.queryExecution.executedPlan.toString
    assert(!planC.contains("BroadcastNestedLoopJoin") && !planC.contains("CartesianProduct"),
      s"contains_xy rewrite did not fire:\n$planC")
    assert(viaContains.count() > 0)

    // PIP predicate inside a conjunction rewrites, extra conjunct still applies
    val conj = images.join(zones,
      call_function("st_intersects_xy", col("zone_geom"), col("lon"), col("lat"))
        && col("zone_id") =!= "zone00000")
    val planJ = conj.queryExecution.executedPlan.toString
    assert(!planJ.contains("BroadcastNestedLoopJoin") && !planJ.contains("CartesianProduct"),
      s"conjunction rewrite did not fire:\n$planJ")
    val gotJ = conj.select("zone_id", "image_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotJ == want.filterNot(_._1 == "zone00000") && gotJ.nonEmpty)
  }

  test("rule does NOT re-rewrite the already-cell-joined manual pipJoin (r2 regression)") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val sfDir = "/root/testdata/sf0.001"
    GeoTables.ensure(spark, sfDir)
    val images = GeoTables.images(spark, sfDir)
    val zones = GeoTables.zones(spark, sfDir)

    val joined = SpatialJoins.pipJoin(images, zones)
    // the defect stacked a second explode(st_cover) on the zones side:
    // the executed plan must contain exactly ONE cover Generate. (String
    // count, not collect{GenerateExec}: AQE hides children pre-execution.)
    def coverGenerates(df: org.apache.spark.sql.DataFrame): Int =
      "Generate explode\\(stcover".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(coverGenerates(joined) == 1,
      s"expected exactly one cover Generate in pipJoin's executed plan:\n" +
        joined.queryExecution.executedPlan.toString)

    // and it must run at naive-join speed, not quadratic-broadcast speed
    // (63-88 s when broken even on a degraded host; < 5 s healthy)
    val t0 = System.nanoTime()
    val n = joined.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n > 0)
    assert(secs < 10.0, s"pipJoin at sf0.001 took $secs s — quadratic rewrite is back?")

    // a join that already has an ordinary equi key + PIP refine is left alone
    val zcells = SpatialJoins.zoneCover(zones, 8).select("zone_id", "zone_geom", "cell")
    val pts = images.withColumn("cell",
      call_function("st_cellid", col("lon"), col("lat"), lit(8)))
    val manual = pts.join(zcells, pts("cell") === zcells("cell") &&
      call_function("st_intersects_xy", col("zone_geom"), col("lon"), col("lat")))
    assert(coverGenerates(manual) == 1, s"equi-keyed join was re-rewritten:\n" +
      manual.queryExecution.executedPlan.toString)
  }
}
