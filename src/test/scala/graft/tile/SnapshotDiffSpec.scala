package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CDC changelog between snapshots (Iceberg incremental/changelog scan):
  * append → inserts, mergeUpsert → updates (+ inserts), deleteWhere →
  * deletes, compaction → EMPTY changelog, and the manifest prune never
  * reads a bucket whose data dir is shared by both snapshots. */
class SnapshotDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  private def ops(root: String, a: Long, b: Long): Map[String, Set[String]] =
    TileJob.snapshotDiff(spark, root, a, b)
      .collect().groupBy(_.getString(0)).map { case (k, v) =>
        k -> v.map(_.getString(1)).toSet }

  test("append → inserts; merge → updates; delete → deletes; compact → empty") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val images = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .orderBy("image_id").limit(40).cache()
    val first = images.limit(25)
    val extra = images.orderBy(desc("image_id")).limit(15)
    val root = Files.createTempDirectory("snapdiff").toString

    val s1 = TileJob.ingestBatch(spark, first, root, batchId = 0, zoom = 6)
    val s2 = TileJob.ingestBatch(spark, extra, root, batchId = 1, zoom = 6)
    val extraIds = extra.select("image_id").collect().map(_.getString(0)).toSet
    val d12 = ops(root, s1.snapshotId, s2.snapshotId)
    assert(d12.getOrElse("insert", Set()) == extraIds)
    assert(!d12.contains("delete") && !d12.contains("update"))

    // update 3 rows (caption change) via mergeUpsert
    val updIds = first.select("image_id").orderBy("image_id").limit(3)
      .collect().map(_.getString(0)).toSet
    val upd = first.where(col("image_id").isInCollection(updIds.toSeq))
      .withColumn("caption", concat(col("caption"), lit(" v2")))
    val s3 = TileJob.mergeUpsert(spark, root, upd, zoom = 6)
    val d23 = ops(root, s2.snapshotId, s3.snapshotId)
    assert(d23.getOrElse("update", Set()) == updIds)
    assert(!d23.contains("insert") && !d23.contains("delete"))

    // delete 2 rows
    val delIds = extraIds.take(2)
    val s4 = TileJob.deleteWhere(spark, root, col("image_id").isInCollection(delIds.toSeq))
    val d34 = ops(root, s3.snapshotId, s4.snapshotId)
    assert(d34.getOrElse("delete", Set()) == delIds)
    assert(!d34.contains("insert") && !d34.contains("update"))

    // compaction rewrites files but changes no rows → empty changelog
    val s5 = TileJob.compact(spark, root)
    assert(ops(root, s4.snapshotId, s5.snapshotId).isEmpty)

    // composed diff s1 → s4: inserts minus the later deletes, plus updates
    val d14 = ops(root, s1.snapshotId, s4.snapshotId)
    assert(d14.getOrElse("insert", Set()) == (extraIds -- delIds))
    assert(d14.getOrElse("update", Set()) == updIds)
    assert(!d14.contains("delete"))

    // self-diff: empty, and the manifest prune selects NOTHING to read
    assert(ops(root, s3.snapshotId, s3.snapshotId).isEmpty)
    assert(TileJob.changedDirs(s3, s3) == ((Seq(), Seq())))

    // append touches only the new batch's buckets: the from side reads
    // nothing, the to side reads only dirs of batch 1
    val (f12, t12) = TileJob.changedDirs(s1, s2)
    assert(f12.isEmpty, s"append must not rewrite old buckets: $f12")
    assert(t12.nonEmpty && t12.forall(!s1.buckets.map(_.dataDir).contains(_)))
    images.unpersist()
  }
}
