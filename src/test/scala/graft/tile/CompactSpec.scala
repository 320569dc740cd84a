package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Compaction (small-file rewrite) + retention GC: the rewritten table
  * must be row-identical and checksum-verified, pre-compaction snapshots
  * must stay time-travelable until expired, and expiry must reclaim
  * exactly the unreferenced dirs while the current read stays intact. */
class CompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  private def partFiles(dir: String): Int = {
    val f = new java.io.File(dir)
    if (!f.exists()) 0
    else f.listFiles().count(x => x.getName.startsWith("part-") && x.getName.endsWith(".parquet"))
  }

  test("compact rewrites multi-file buckets to one file, exactly, with history intact") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val root = Files.createTempDirectory("tilejob_compact").toString
    val snap0 = TileJob.run(spark, GeoTables.imagesPath(sfDir), root, zoom = 6, bucketLevel = 2)

    val before = TileJob.readCurrent(spark, root).orderBy("image_id")
      .collect().map(_.toString).toSeq
    val multi = snap0.buckets.filter(b => b.rows > 0 && partFiles(b.dataDir) > 1)
    assert(multi.nonEmpty, "fixture must have at least one multi-file bucket to compact")

    val snap1 = TileJob.compact(spark, root)
    assert(snap1.snapshotId == snap0.snapshotId + 1 && snap1.parentId == snap0.snapshotId)
    assert(IceLite.fromJson(IceLite.toJson(snap1)) == snap1)

    // every compacted bucket: exactly one file, new dir, manifest stats unchanged
    val byBucket = snap1.buckets.map(b => b.bucket -> b).toMap
    multi.foreach { old =>
      val nb = byBucket(old.bucket)
      assert(nb.dataDir != old.dataDir && partFiles(nb.dataDir) == 1, s"bucket ${old.bucket}")
      assert((nb.rows, nb.checksum, nb.cellMin, nb.cellMax) ==
        ((old.rows, old.checksum, old.cellMin, old.cellMax)))
      assert(nb.lineage.last.stage == "compact" && nb.lineage.last.outputRows == old.rows)
    }
    // untouched buckets keep their dirs
    snap0.buckets.filterNot(b => multi.exists(_.bucket == b.bucket)).foreach { old =>
      assert(byBucket(old.bucket).dataDir == old.dataDir)
    }

    // row-identical read after compaction
    val after = TileJob.readCurrent(spark, root).orderBy("image_id")
      .collect().map(_.toString).toSeq
    assert(after == before)

    // time travel to the pre-compaction snapshot still reads the OLD dirs
    val travel = TileJob.readAt(spark, root, snap0.snapshotId).orderBy("image_id")
      .collect().map(_.toString).toSeq
    assert(travel == before)

    // manifest-driven pruning unchanged
    val mid = snap1.buckets.filter(_.rows > 0)(1)
    assert(TileJob.readCellRange(spark, root, mid.cellMin, mid.cellMax).count() ==
      TileJob.readCurrent(spark, root)
        .where(org.apache.spark.sql.functions.col("cell").between(mid.cellMin, mid.cellMax))
        .count())

    // idempotence: nothing left above the threshold → no-op, same snapshot
    val snap2 = TileJob.compact(spark, root)
    assert(snap2.snapshotId == snap1.snapshotId)

    // expiry: keep only the current snapshot; compacted buckets' old dirs
    // are reclaimed, shared (untouched) dirs survive, current read intact
    val (snapsGone, dirsGone) = IceLite.expireSnapshots(root, keep = 1)
    assert(snapsGone >= 1 && dirsGone == multi.size, s"$snapsGone snaps, $dirsGone dirs")
    multi.foreach(b => assert(!Files.exists(Paths.get(b.dataDir)), b.dataDir))
    assert(IceLite.snapshotById(root, snap0.snapshotId).isEmpty)
    val afterExpire = TileJob.readCurrent(spark, root).orderBy("image_id")
      .collect().map(_.toString).toSeq
    assert(afterExpire == before)
    intercept[IllegalArgumentException](TileJob.readAt(spark, root, snap0.snapshotId))
  }
}
