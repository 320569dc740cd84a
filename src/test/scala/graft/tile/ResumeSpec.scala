package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** FIXTURES.md §F4: kill after N bucket commits → rerun → byte-identical
  * manifest entries + row-level outputs vs an uninterrupted run. */
class ResumeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("tile job resumes exactly after injected failure") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val images = GeoTables.imagesPath(sfDir)
    val rootA = Files.createTempDirectory("tilejob_a").toString
    val rootB = Files.createTempDirectory("tilejob_b").toString

    val snapA = TileJob.run(spark, images, rootA, zoom = 6, bucketLevel = 2)

    intercept[TileJob.Failpoint] {
      TileJob.run(spark, images, rootB, zoom = 6, bucketLevel = 2, failAfter = 3)
    }
    val partial = IceLite.currentSnapshot(rootB)
    assert(partial.isDefined && partial.get.buckets.length == 3, "checkpoint after 3 buckets")
    val snapB = TileJob.run(spark, images, rootB, zoom = 6, bucketLevel = 2)

    // manifest equality (modulo data dir roots and snapshot ids)
    def canon(s: IceLite.Snapshot) =
      s.buckets.sortBy(_.bucket).map(b => (b.bucket, b.rows, b.checksum, b.cellMin, b.cellMax))
    assert(canon(snapA) == canon(snapB))
    assert(snapA.buckets.map(_.rows).sum == GeoTables.nImages(sfDir))

    // row-level equality via full sorted compare
    val a = TileJob.readCurrent(spark, rootA).orderBy("image_id")
      .collect().map(_.toString).toSeq
    val b = TileJob.readCurrent(spark, rootB).orderBy("image_id")
      .collect().map(_.toString).toSeq
    assert(a == b)

    // lineage row counts sum to bucket totals
    snapA.buckets.foreach { bk =>
      assert(bk.lineage.map(_.outputRows).sum == bk.rows, s"bucket ${bk.bucket}")
    }

    // snapshot JSON round-trips
    assert(IceLite.fromJson(IceLite.toJson(snapA)) == snapA)

    // manifest-driven pruning returns the same rows as a full-scan filter
    val mid = snapA.buckets.filter(_.rows > 0)(1)
    val pruned = TileJob.readCellRange(spark, rootA, mid.cellMin, mid.cellMax).count()
    val full = TileJob.readCurrent(spark, rootA)
      .where(org.apache.spark.sql.functions.col("cell").between(mid.cellMin, mid.cellMax)).count()
    assert(pruned == full)

    // TIME TRAVEL: the pre-resume 3-bucket snapshot stays readable AFTER
    // the resumed commit superseded it, returning exactly its own rows
    val oldId = partial.get.snapshotId
    assert(TileJob.readAt(spark, rootB, oldId).count() ==
      partial.get.buckets.map(_.rows).sum)
    assert(TileJob.readAt(spark, rootB, snapB.snapshotId).count() ==
      TileJob.readCurrent(spark, rootB).count())
    // the resume commits once per bucket, so the superseded snapshot is an
    // ANCESTOR of the final one — walk the parent chain to it
    val chain = Iterator.iterate(snapB.snapshotId)(id =>
      IceLite.snapshotById(rootB, id).map(_.parentId).getOrElse(-1L))
      .takeWhile(_ >= 0).take(64).toSeq
    assert(chain.contains(oldId), s"parent chain $chain must reach $oldId")
    intercept[IllegalArgumentException](TileJob.readAt(spark, rootB, -12345L))
  }
}
