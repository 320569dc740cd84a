package graft.join

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cell-bucketed co-located layout must make the recurring PIP join
  * shuffle-free: both sides bucketBy(cell, n) + sortBy(cell) ⇒ the join
  * plans as a SortMergeJoin with ZERO Exchange (shuffle or broadcast)
  * anywhere in the plan — and returns exactly the pipJoin pair set. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", "/tmp/graft_bucketed_spec/warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed cell join: zero Exchange in the plan, exact pipJoin parity") {
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    val img = GeoTables.images(spark, sfDir)
    val zon = GeoTables.zones(spark, sfDir)
    Bucketed.layoutPip(img, zon, level = 8, nBuckets = 8,
      dir = "/tmp/graft_bucketed_spec/data", tag = "spec")

    val j = Bucketed.pipJoinBucketed(spark, "spec").select("zone_id", "image_id")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle or broadcast either side:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"expected bucketed scans:\n$plan")

    val got = j.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expect = SpatialJoins.pipJoin(img, zon, level = 8)
      .select("zone_id", "image_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expect && got.nonEmpty, s"got=${got.size} expect=${expect.size}")

    // the layout is refreshable: overwriting in place keeps the contract
    Bucketed.layoutPip(img, zon, level = 8, nBuckets = 8,
      dir = "/tmp/graft_bucketed_spec/data", tag = "spec")
    assert(Bucketed.pipJoinBucketed(spark, "spec").count() == got.size)
  }
}
