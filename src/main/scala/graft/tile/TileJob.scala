package graft.tile

import graft.sql.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * Raster↔vector tiling job with checkpointed manifests and exact resume
 * (SURVEY.md §2.6 #48/#51; north_rule: "resumable from checkpoint with
 * per-partition lineage + metrics").
 *
 * Work is partitioned into `nBuckets` contiguous ranges of the level-
 * `bucketLevel` Morton cell space — the checkpoint granularity. Each bucket:
 *   images in range → tile assignment (zoom z) + pHash verification
 *   → one immutable parquet dir → lineage rows → snapshot commit.
 * A rerun reads the current snapshot and skips completed buckets; outputs
 * are deterministic, so resume-after-crash produces byte-identical results
 * (ResumeSpec pins this).
 *
 * At 10^12 scale, buckets = coarse Morton ranges ≡ Iceberg partition ranges:
 * each bucket is an independent distributed job over a cell-range predicate
 * that prunes at the parquet/row-group level (min/max on the cell column).
 */
object TileJob {

  /** Deterministic per-row checksum, folded order-independently with XOR
    * (no overflow under ANSI mode, which Spark 4 enables by default). */
  private def checksumCol = xxhash64(col("image_id"), col("tx"), col("ty"), col("phash"))

  final case class Failpoint(afterBuckets: Int) extends RuntimeException(
    s"injected failure after $afterBuckets buckets (test hook)")

  def run(spark: SparkSession, imagesPath: String, outRoot: String,
          zoom: Int = 8, bucketLevel: Int = 2, failAfter: Int = -1): IceLite.Snapshot = {
    GraftFunctions.install(spark)
    val nBuckets = 1 << (2 * bucketLevel) // full level-L morton space
    val prev = IceLite.currentSnapshot(outRoot)
    val done = prev.map(_.buckets.map(_.bucket).toSet).getOrElse(Set.empty)
    val jobId = s"tile-z$zoom-L$bucketLevel"

    val images = spark.read.parquet(imagesPath)
      .withColumn("bucket_cell",
        call_function("st_cellid", col("lon"), col("lat"), lit(bucketLevel)))

    var entries = prev.map(_.buckets.toVector).getOrElse(Vector.empty)
    var snapId = prev.map(_.snapshotId).getOrElse(0L)
    var parent = prev.map(_.parentId).getOrElse(-1L)
    var processed = 0
    (0 until nBuckets).foreach { b =>
      if (!done.contains(b)) {
        if (failAfter >= 0 && processed >= failAfter) throw Failpoint(failAfter)
        val dataDir = s"$outRoot/data/bucket=$b"
        val slice = images.where(col("bucket_cell") === b)
          .withColumn("tx", call_function("st_tile_x", col("lon"), lit(zoom)))
          .withColumn("ty", call_function("st_tile_y", col("lat"), lit(zoom)))
          .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(zoom)))
          .withColumn("phash_ok", call_function("img_phash", col("bytes")) === col("phash"))
          .select("image_id", "caption", "w", "h", "fmt", "lon", "lat",
            "cell", "tx", "ty", "phash", "phash_ok")
        // deterministic file layout: one file per bucket, rows sorted by id
        slice.sortWithinPartitions("image_id").coalesce(1)
          .write.mode("overwrite").parquet(dataDir)
        // lineage + stats from the committed files (read-back = what readers see)
        val committed = spark.read.parquet(dataDir)
          .withColumn("pid", spark_partition_id())
          .withColumn("cs", checksumCol)
        val lineage = committed.groupBy("pid")
          .agg(count(lit(1)).as("rows"), expr("bit_xor(cs)").as("cs"))
          .collect().map { r =>
            IceLite.LineageRow(jobId, r.getInt(0), r.getLong(1), r.getLong(1),
              IceLite.mask53(r.getLong(2)))
          }.toSeq
        val stats = committed.agg(count(lit(1)).as("rows"),
          coalesce(min("cell"), lit(Long.MaxValue)).as("cmin"),
          coalesce(max("cell"), lit(Long.MinValue)).as("cmax"),
          coalesce(expr("bit_xor(cs)"), lit(0L)).as("cs")).collect()(0)
        entries :+= IceLite.BucketEntry(b, stats.getLong(0), IceLite.mask53(stats.getLong(3)),
          stats.getLong(1), stats.getLong(2), dataDir, lineage)
        snapId += 1
        IceLite.commit(outRoot, IceLite.Snapshot(snapId, parent, jobId, entries))
        parent = snapId
        processed += 1
      }
    }
    IceLite.currentSnapshot(outRoot).getOrElse(
      throw new IllegalStateException("no snapshot after run"))
  }

  /** Read the table as of the current snapshot (manifest-driven file list). */
  def readCurrent(spark: SparkSession, outRoot: String): DataFrame = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    val dirs = snap.buckets.map(_.dataDir).filter(d => Files.exists(Paths.get(d)))
    spark.read.parquet(dirs: _*)
  }

  /** Manifest-driven pruning: only buckets whose cell range intersects. */
  def readCellRange(spark: SparkSession, outRoot: String,
                    cellMin: Long, cellMax: Long): DataFrame = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    val dirs = snap.buckets
      .filter(b => b.rows > 0 && b.cellMin <= cellMax && b.cellMax >= cellMin)
      .map(_.dataDir)
    if (dirs.isEmpty) TileJob.readCurrent(spark, outRoot).limit(0)
    else spark.read.parquet(dirs: _*)
      .where(col("cell") >= cellMin && col("cell") <= cellMax)
  }
}
