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

    // regional queries prune bucket FILES: a literal cell filter over the
    // bucketed table scans strictly fewer than all 8 buckets. (Plain
    // filter scans need autoBucketedScan off — Spark's planner otherwise
    // reads the table unbucketed; JOIN probes like AnnSpec's q65 get the
    // bucketed scan + pruning automatically.)
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val someCells = spark.table("graft_pts_spec").select("cell")
        .limit(3).collect().map(_.getLong(0)).distinct
      val regional = spark.table("graft_pts_spec")
        .where(col("cell").isin(someCells.map(Long.box): _*))
      val rplan = regional.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(rplan)
      assert(m.isDefined, s"expected a bucketed scan:\n$rplan")
      assert(m.get.group(1).toInt < 8, s"expected bucket pruning:\n$rplan")
      assert(regional.count() > 0)
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }
}
