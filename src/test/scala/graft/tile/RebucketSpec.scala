package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partition-spec evolution (rebucket): the row set must be bit-identical
  * across the rewrite in BOTH directions (refine L1→L3, coarsen L3→L1),
  * snapshots must conserve rows + XOR checksum, bucket ids must equal the
  * row's cell parent at the new level, time travel must read the OLD
  * layout, expireSnapshots must reclaim it, and evolved extra columns
  * must ride through the rewrite. */
class RebucketSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
    df.select("image_id", "cell", "tx", "ty").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("refine then coarsen: identical row set, conserved manifest, correct bucket ids") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val root = Files.createTempDirectory("rebkt").toString
    val s1 = TileJob.run(spark, GeoTables.imagesPath(sfDir), root, zoom = 6, bucketLevel = 1)
    val before = rowsOf(TileJob.readCurrent(spark, root))
    val rows1 = s1.buckets.map(_.rows).sum
    val cs1 = IceLite.mask53(s1.buckets.filter(_.rows > 0).map(_.checksum).reduce(_ ^ _))

    // REFINE 1 → 3: more buckets, same rows
    val s2 = TileJob.rebucket(spark, root, zoom = 6, newBucketLevel = 3)
    assert(s2.snapshotId == s1.snapshotId + 1 && s2.parentId == s1.snapshotId)
    assert(rowsOf(TileJob.readCurrent(spark, root)) == before)
    assert(s2.buckets.map(_.rows).sum == rows1)
    assert(IceLite.mask53(s2.buckets.map(_.checksum).reduce(_ ^ _)) == cs1)
    assert(s2.buckets.size > s1.buckets.count(_.rows > 0),
      "refining to L3 must split into more live buckets")
    // every entry's bucket id == the cell parent of its own rows
    // (readCurrent doesn't recover the dir-name partition column, so
    // check each manifest entry against its own data dir)
    val bad = s2.buckets.map { e =>
      spark.read.parquet(e.dataDir)
        .where(call_function("st_cell_parent", col("cell"), lit(6), lit(3))
          =!= lit(e.bucket.toLong)).count()
    }.sum
    assert(bad == 0)

    // COARSEN 3 → 1: back to few buckets, still the same rows
    val s3 = TileJob.rebucket(spark, root, zoom = 6, newBucketLevel = 1)
    assert(rowsOf(TileJob.readCurrent(spark, root)) == before)
    assert(s3.buckets.map(_.rows).sum == rows1)
    assert(IceLite.mask53(s3.buckets.map(_.checksum).reduce(_ ^ _)) == cs1)
    assert(s3.buckets.map(_.bucket).toSet == s1.buckets.filter(_.rows > 0).map(_.bucket).toSet)

    // time travel reads the OLD layouts from their own dirs
    assert(rowsOf(TileJob.readAt(spark, root, s1.snapshotId)) == before)
    assert(rowsOf(TileJob.readAt(spark, root, s2.snapshotId)) == before)

    // expire retires superseded layout dirs; current still reads clean
    val (expired, _) = IceLite.expireSnapshots(root, keep = 1)
    assert(expired >= 2)
    assert(rowsOf(TileJob.readCurrent(spark, root)) == before)
  }

  test("evolved extra columns ride through a rebucket") {
    GeoTables.ensure(spark, sfDir)
    val images = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .orderBy("image_id").limit(30).cache()
    val root = Files.createTempDirectory("rebktev").toString
    TileJob.ingestBatch(spark, images.limit(15), root, batchId = 0, zoom = 6)
    TileJob.ingestBatch(spark,
      images.orderBy(desc("image_id")).limit(15)
        .withColumn("quality", (length(col("caption")) % 7).cast("long")),
      root, batchId = 1, zoom = 6, extraCols = Seq("quality"))
    TileJob.rebucket(spark, root, zoom = 6, newBucketLevel = 2)
    val ev = TileJob.readEvolved(spark, root)
    assert(ev.count() == 30)
    assert(ev.where(col("quality").isNotNull).count() == 15)
    assert(ev.where(col("quality").isNull).count() == 15)
  }

  test("rebucket rejects a level finer than the stored cell") {
    GeoTables.ensure(spark, sfDir)
    val root = Files.createTempDirectory("rebktbad").toString
    TileJob.run(spark, GeoTables.imagesPath(sfDir), root, zoom = 6, bucketLevel = 1)
    intercept[IllegalArgumentException] {
      TileJob.rebucket(spark, root, zoom = 6, newBucketLevel = 7)
    }
  }
}
