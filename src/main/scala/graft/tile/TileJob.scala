package graft.tile

import graft.sql.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

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

    val pending = (0 until nBuckets).filterNot(done.contains)

    // ONE pass over the input for all pending buckets (the per-bucket
    // `where(bucket_cell === b)` of the old design got no parquet pushdown
    // — bucket_cell is computed — so it rescanned the input once per
    // bucket). Big buckets split across tasks by (cell, image_id) ranges
    // instead of a coalesce(1) single-task choke; dynamic partition
    // overwrite only replaces the bucket dirs we actually write, so
    // committed buckets from a previous run are never touched.
    if (pending.nonEmpty) {
      val nParts = math.max(spark.sparkContext.defaultParallelism, pending.size)
      spark.read.parquet(imagesPath)
        .withColumn("bucket",
          call_function("st_cellid", col("lon"), col("lat"), lit(bucketLevel)))
        .where(col("bucket").isInCollection(pending.map(_.toLong)))
        .withColumn("tx", call_function("st_tile_x", col("lon"), lit(zoom)))
        .withColumn("ty", call_function("st_tile_y", col("lat"), lit(zoom)))
        .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(zoom)))
        .withColumn("phash_ok", call_function("img_phash", col("bytes")) === col("phash"))
        .select(col("bucket"), col("image_id"), col("caption"), col("w"), col("h"),
          col("fmt"), col("lon"), col("lat"), col("cell"), col("tx"), col("ty"),
          col("phash"), col("phash_ok"))
        .repartitionByRange(nParts, col("bucket"), col("cell"), col("image_id"))
        .sortWithinPartitions("bucket", "cell", "image_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(s"$outRoot/data")
    }

    // stats + lineage for every pending bucket in one read-back of the
    // committed files (what readers will see), keyed by bucket
    val statRows: Map[Long, (Long, Long, Long, Long, Seq[IceLite.LineageRow])] =
      if (pending.isEmpty) Map.empty
      else {
        val dirs = pending.map(b => s"$outRoot/data/bucket=$b")
          .filter(d => Files.exists(Paths.get(d)))
        if (dirs.isEmpty) Map.empty
        else {
          val back = spark.read
            .option("basePath", s"$outRoot/data")
            .parquet(dirs: _*)
            .withColumn("bucket", col("bucket").cast("long"))
            .withColumn("pid", spark_partition_id())
            .withColumn("cs", checksumCol)
          val lin = back.groupBy("bucket", "pid")
            .agg(count(lit(1)).as("rows"), expr("bit_xor(cs)").as("cs"))
            .collect()
            .groupBy(_.getLong(0))
            .map { case (b, rows) =>
              b -> rows.sortBy(_.getInt(1)).map(r => IceLite.LineageRow(
                jobId, r.getInt(1), r.getLong(2), r.getLong(2),
                IceLite.mask53(r.getLong(3)))).toSeq
            }
          back.groupBy("bucket").agg(count(lit(1)).as("rows"),
            min("cell").as("cmin"), max("cell").as("cmax"),
            expr("bit_xor(cs)").as("cs")).collect().map { r =>
            r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
              IceLite.mask53(r.getLong(4)), lin.getOrElse(r.getLong(0), Seq.empty)))
          }.toMap
        }
      }

    // per-bucket snapshot commits (driver-only) keep the resume granularity:
    // a crash between commits loses at most one bucket's bookkeeping
    var entries = prev.map(_.buckets.toVector).getOrElse(Vector.empty)
    var snapId = prev.map(_.snapshotId).getOrElse(0L)
    var parent = prev.map(_.snapshotId).getOrElse(-1L)
    var processed = 0
    pending.foreach { b =>
      if (failAfter >= 0 && processed >= failAfter) throw Failpoint(failAfter)
      val dataDir = s"$outRoot/data/bucket=$b"
      val (rows, cmin, cmax, cs, lineage) =
        statRows.getOrElse(b.toLong, (0L, Long.MaxValue, Long.MinValue, 0L, Seq.empty))
      entries :+= IceLite.BucketEntry(b, rows, cs, cmin, cmax, dataDir, lineage)
      snapId += 1
      IceLite.commit(outRoot, IceLite.Snapshot(snapId, parent, jobId, entries))
      parent = snapId
      processed += 1
    }
    IceLite.currentSnapshot(outRoot).getOrElse(
      throw new IllegalStateException("no snapshot after run"))
  }

  /**
   * COMPACTION — the small-file problem at 10^12 rows: a resumed/parallel
   * ingest leaves each bucket dir with many small parquet files, and scan
   * cost at scale is dominated by file-open overhead + lost row-group
   * locality. Rewrites every bucket whose dir holds more than
   * `maxFilesPerBucket` part files into EXACTLY ONE sorted file under a
   * fresh immutable dir (`data-c<snapId>/bucket=<b>`), verifies the
   * rewrite (row count + order-independent xxhash64 checksum must equal
   * the manifest entry — a mismatch aborts BEFORE publishing, leaving
   * only orphan files readers never see), then commits one new snapshot
   * whose entries point at the new dirs. Old dirs are untouched, so time
   * travel to pre-compaction snapshots keeps working; space is reclaimed
   * separately by [[IceLite.expireSnapshots]]. One distributed job
   * rewrites all selected buckets (repartition on the bucket key — a
   * bucket lives in exactly one task, so each new dir gets exactly one
   * file); nothing is collected to the driver but the per-bucket stats.
   */
  def compact(spark: SparkSession, outRoot: String,
              maxFilesPerBucket: Int = 1): IceLite.Snapshot = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    def partFiles(dir: String): Int = {
      val p = Paths.get(dir)
      if (!Files.exists(p)) 0
      else {
        val s = Files.list(p)
        try s.iterator().asScala.count { f =>
          val n = f.getFileName.toString
          n.startsWith("part-") && n.endsWith(".parquet")
        } finally s.close()
      }
    }
    val selected = snap.buckets
      .filter(b => b.rows > 0 && partFiles(b.dataDir) > maxFilesPerBucket)
    if (selected.isEmpty) return snap

    val newId = snap.snapshotId + 1
    val newRoot = s"$outRoot/data-c$newId"
    def newDir(b: Int): String = s"$newRoot/bucket=$b"
    // bucket rides as a literal per source (the dir-name partition column
    // is not stored in the files), so one union plan rewrites every
    // selected bucket in a single job
    selected.map(b => spark.read.parquet(b.dataDir)
        .withColumn("bucket", lit(b.bucket.toLong)))
      .reduce(_ unionByName _)
      .repartition(selected.size, col("bucket"))
      .sortWithinPartitions("bucket", "cell", "image_id")
      // overwrite: a compaction that crashed between write and commit
      // leaves data-c<id> orphaned (no manifest references it) — the
      // retry recomputes the same id and must be able to reclaim it
      .write.mode("overwrite").partitionBy("bucket").parquet(newRoot)

    // verify the rewrite against the committed manifest BEFORE publishing
    val back = selected.map(b => spark.read.parquet(newDir(b.bucket))
        .withColumn("bucket", lit(b.bucket.toLong)))
      .reduce(_ unionByName _)
      .withColumn("cs", checksumCol)
      .groupBy("bucket")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(cs)").as("cs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), IceLite.mask53(r.getLong(2)))))
      .toMap
    selected.foreach { b =>
      val (rows, cs) = back.getOrElse(b.bucket.toLong, (-1L, -1L))
      if (rows != b.rows || cs != b.checksum)
        throw new IllegalStateException(
          s"compaction verify failed for bucket ${b.bucket}: " +
            s"rows $rows vs ${b.rows}, checksum $cs vs ${b.checksum} — not committed")
    }

    val selectedIds = selected.map(_.bucket).toSet
    val entries = snap.buckets.map { b =>
      if (!selectedIds.contains(b.bucket)) b
      else b.copy(dataDir = newDir(b.bucket),
        lineage = b.lineage :+ IceLite.LineageRow(
          "compact", b.bucket, b.rows, b.rows, b.checksum))
    }
    val out = IceLite.Snapshot(newId, snap.snapshotId, s"compact-${snap.jobId}", entries)
    IceLite.commit(outRoot, out)
    out
  }

  /** Read the table as of the current snapshot (manifest-driven file list). */
  def readCurrent(spark: SparkSession, outRoot: String): DataFrame = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    val dirs = snap.buckets.map(_.dataDir).filter(d => Files.exists(Paths.get(d)))
    spark.read.parquet(dirs: _*)
  }

  /** TIME TRAVEL: read the table as of an older committed snapshot.
    * Data files are immutable and snapshots are never rewritten, so any
    * historical id reproduces exactly the rows visible at that commit —
    * the audit/rollback read an Iceberg catalog would serve with
    * `VERSION AS OF`. */
  def readAt(spark: SparkSession, outRoot: String, snapshotId: Long): DataFrame = {
    val snap = IceLite.snapshotById(outRoot, snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $snapshotId at $outRoot (have: ${IceLite.listSnapshots(outRoot).mkString(", ")})"))
    val dirs = snap.buckets.map(_.dataDir).filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) readCurrent(spark, outRoot).limit(0)
    else spark.read.parquet(dirs: _*)
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
