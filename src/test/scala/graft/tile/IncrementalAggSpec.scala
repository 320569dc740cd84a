package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental materialized-view maintenance over the snapshot table:
  * the per-tile aggregate advanced by [[TileJob.incrementalTileAgg]]
  * must equal [[TileJob.tileAggAt]]'s full recompute after every kind of
  * table mutation (append, upsert, delete, compaction), while the
  * manifest prune keeps the delta read to the changed buckets only. */
class IncrementalAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  private def mv(df: DataFrame): Map[(Long, Long), (Long, Long)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("tx")), r.getLong(r.fieldIndex("ty"))) ->
      (r.getLong(r.fieldIndex("n_img")), r.getLong(r.fieldIndex("sum_w")))).toMap

  test("incrementally maintained MV equals full recompute across append/upsert/delete/compact") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val images = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .orderBy("image_id").limit(40).cache()
    val first = images.limit(25)
    val extra = images.orderBy(desc("image_id")).limit(15)
    val root = Files.createTempDirectory("incragg").toString

    val s1 = TileJob.ingestBatch(spark, first, root, batchId = 0, zoom = 6)
    var view = TileJob.tileAggAt(spark, root, s1.snapshotId) // bootstrap: full agg once
    assert(mv(view).nonEmpty)

    // append: delta reads only batch-1 dirs
    val s2 = TileJob.ingestBatch(spark, extra, root, batchId = 1, zoom = 6)
    view = TileJob.incrementalTileAgg(spark, root, view, s1.snapshotId, s2.snapshotId)
    assert(mv(view) == mv(TileJob.tileAggAt(spark, root, s2.snapshotId)), "after append")

    // upsert: width change on 3 rows must move sum_w but not n_img totals
    val updIds = first.select("image_id").orderBy("image_id").limit(3)
      .collect().map(_.getString(0)).toSet
    val upd = first.where(col("image_id").isInCollection(updIds.toSeq))
      .withColumn("w", col("w") + lit(7))
    val s3 = TileJob.mergeUpsert(spark, root, upd, zoom = 6)
    view = TileJob.incrementalTileAgg(spark, root, view, s2.snapshotId, s3.snapshotId)
    val full3 = mv(TileJob.tileAggAt(spark, root, s3.snapshotId))
    assert(mv(view) == full3, "after upsert")
    assert(full3.values.map(_._1).sum == 40)

    // delete: keys whose count reaches zero must drop out of the MV
    val delIds = extra.select("image_id").collect().map(_.getString(0)).take(5).toSet
    val s4 = TileJob.deleteWhere(spark, root, col("image_id").isInCollection(delIds.toSeq))
    // prune check BEFORE advancing: the delete rewrote only matched buckets
    val (fDirs, tDirs) = TileJob.changedDirs(
      IceLite.snapshotById(root, s3.snapshotId).get,
      IceLite.snapshotById(root, s4.snapshotId).get)
    val allDirs = IceLite.snapshotById(root, s3.snapshotId).get.buckets.map(_.dataDir).distinct
    assert(fDirs.nonEmpty && fDirs.size < allDirs.size,
      s"delete delta must read a strict subset of buckets: ${fDirs.size} of ${allDirs.size}")
    view = TileJob.incrementalTileAgg(spark, root, view, s3.snapshotId, s4.snapshotId)
    assert(mv(view) == mv(TileJob.tileAggAt(spark, root, s4.snapshotId)), "after delete")

    // compaction: rows identical → zero delta → MV unchanged
    val s5 = TileJob.compact(spark, root)
    val before = mv(view)
    view = TileJob.incrementalTileAgg(spark, root, view, s4.snapshotId, s5.snapshotId)
    assert(mv(view) == before, "compaction must be a zero delta")
    assert(mv(view) == mv(TileJob.tileAggAt(spark, root, s5.snapshotId)))

    // no-op advance (same snapshot): the prev frame comes back untouched
    val same = TileJob.incrementalTileAgg(spark, root, view, s5.snapshotId, s5.snapshotId)
    assert(mv(same) == mv(view))
    images.unpersist()
  }
}
