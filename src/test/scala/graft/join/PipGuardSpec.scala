package graft.join

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipJoin's broadcast dispatch (judge r3 #3): under the zones≪points
  * asymmetry the exploded cover is broadcast; above `broadcastMaxZones` the
  * hint is dropped so a huge polygon side degrades to a shuffled join
  * instead of OOMing the driver — with bit-identical results. */
class PipGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // hint-free joins must NOT silently re-broadcast, or the plan
    // assertion below would be vacuous
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("pipJoin broadcasts small zone sides and shuffle-joins large ones, identically") {
    spark.sparkContext.setLogLevel("WARN")
    val images = GeoTables.images(spark, sfDir)
    val zones = GeoTables.zones(spark, sfDir)

    val hinted = SpatialJoins.pipJoin(images, zones)
      .select("image_id", "zone_id")
    assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "small zone side must ride the broadcast hint")

    val guarded = SpatialJoins.pipJoin(images, zones, broadcastMaxZones = 0)
      .select("image_id", "zone_id")
    val gPlan = guarded.queryExecution.executedPlan.toString
    assert(!gPlan.contains("BroadcastHashJoin"),
      s"above the zone threshold the broadcast hint must be dropped:\n$gPlan")

    val a = hinted.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = guarded.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b && a.nonEmpty, s"hinted=${a.size} guarded=${b.size}")
  }
}
